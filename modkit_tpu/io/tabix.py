"""Tabix (.tbi) indexed access to bgzip-compressed text (bedMethyl) files.

Reference equivalent: src/tabix.rs HtsTabixHandler (htslib-backed). TBI
binary layout mirrors BAI with a text-format header (format, column
indices, meta char, names).
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np

from .bam import _PSEUDO_BIN, reg2bins
from .bgzf import BgzfReader


class TabixIndex:
    def __init__(self, path: str):
        # .tbi is BGZF = concatenated gzip members; decompress them all
        with open(path, "rb") as fh:
            raw = fh.read()
        blob = bytearray()
        while raw:
            d = zlib.decompressobj(wbits=47)
            blob += d.decompress(raw)
            raw = d.unused_data
        data = bytes(blob)
        if data[:4] != b"TBI\x01":
            raise ValueError(f"{path}: bad tabix magic")
        (n_ref, fmt, col_seq, col_beg, col_end, meta, skip, l_nm) = (
            struct.unpack_from("<8i", data, 4)
        )
        self.format = fmt
        self.col_seq, self.col_beg, self.col_end = col_seq, col_beg, col_end
        self.meta = chr(meta & 0xFF)
        p = 36
        names_blob = data[p : p + l_nm]
        self.names = [n.decode() for n in names_blob.split(b"\x00") if n]
        self.name_to_id = {n: i for i, n in enumerate(self.names)}
        p += l_nm
        per_ref = []
        for _ in range(n_ref):
            (n_bin,) = struct.unpack_from("<i", data, p); p += 4
            bins = {}
            for _ in range(n_bin):
                bin_id, n_chunk = struct.unpack_from("<Ii", data, p); p += 8
                chunks = np.frombuffer(
                    data, dtype="<u8", count=2 * n_chunk, offset=p
                )
                p += 16 * n_chunk
                if bin_id != _PSEUDO_BIN:
                    bins[bin_id] = chunks.reshape(-1, 2)
            (n_intv,) = struct.unpack_from("<i", data, p); p += 4
            ioffsets = np.frombuffer(data, dtype="<u8", count=n_intv, offset=p)
            p += 8 * n_intv
            per_ref.append((bins, ioffsets))
        self._per_ref = per_ref

    def query_chunks(self, rid: int, beg: int, end: int):
        bins, ioffsets = self._per_ref[rid]
        min_off = 0
        if len(ioffsets):
            w = min(beg >> 14, len(ioffsets) - 1)
            while w >= 0 and ioffsets[w] == 0:
                w -= 1
            if w >= 0:
                min_off = int(ioffsets[w])
        chunks = []
        for b in reg2bins(beg, end):
            arr = bins.get(b)
            if arr is not None:
                for cbeg, cend in arr:
                    if cend > min_off:
                        chunks.append((max(int(cbeg), min_off), int(cend)))
        if not chunks:
            return []
        chunks.sort()
        merged = [chunks[0]]
        for cbeg, cend in chunks[1:]:
            if cbeg <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], cend))
            else:
                merged.append((cbeg, cend))
        return merged


class TabixFile:
    """Region fetch over a bgzipped, tabix-indexed text file
    (tabix.rs:77 HtsTabixHandler)."""

    def __init__(self, path: str, io_threads: int | None = None,
                 index_path: str | None = None):
        self.path = os.fspath(path)
        # Explicit index path = the reference's dmr --index-a/--index-b
        # (advanced_usage.md:2280: "or the --index-a option must be provided")
        idx_path = os.fspath(index_path) if index_path else self.path + ".tbi"
        if not os.path.exists(idx_path):
            raise FileNotFoundError(f"no tabix index for {path}")
        self.index = TabixIndex(idx_path)
        # io_threads = BGZF inflate workers per fetch (the reference's
        # htslib tpool / --io-threads, tabix.rs:146)
        self._bgzf = BgzfReader(self.path, io_threads=io_threads)

    @property
    def contigs(self) -> list[str]:
        return list(self.index.names)

    def has_contig(self, name: str) -> bool:
        return name in self.index.name_to_id

    def fetch(self, chrom: str, start: int, end: int):
        """Yield text lines overlapping [start, end) on chrom."""
        rid = self.index.name_to_id.get(chrom)
        if rid is None:
            return
        cb, ce = self.index.col_beg - 1, self.index.col_end - 1
        cs = self.index.col_seq - 1
        zero_based = bool(self.index.format & 0x10000)
        for cbeg, cend in self.index.query_chunks(rid, start, end):
            buf = bytearray(self._bgzf.read_span(cbeg, cend))
            # may need the tail of the last line
            self._bgzf.seek_voffset(cend)
            tail = self._bgzf.read(1 << 12)
            while tail and b"\n" not in tail:
                buf += tail
                tail = self._bgzf.read(1 << 12)
            if tail:
                buf += tail.split(b"\n", 1)[0] + b"\n"
            for line in bytes(buf).split(b"\n"):
                if not line or line.startswith(self.index.meta.encode()):
                    continue
                fields = line.split(b"\t")
                if len(fields) <= max(cb, ce, cs):
                    continue
                if fields[cs].decode() != chrom:
                    continue
                b0 = int(fields[cb])
                if not zero_based:
                    b0 -= 1
                e0 = int(fields[ce]) if ce != cb else b0 + 1
                if b0 < end and e0 > start:
                    yield line.decode()
