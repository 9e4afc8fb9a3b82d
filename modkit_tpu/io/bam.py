"""BAM reader/writer and BAI index, implemented from scratch on BGZF.

Provides the functionality the reference tool gets from htslib/rust-htslib
(reference ``src/command_utils.rs:212-240`` get_serial_reader/get_bam_writer,
``src/reads_sampler/sampling_schedule.rs:622`` IdxStats): header parsing,
sequential record iteration, BAI-indexed region fetch, idxstats, and BAM
writing. Record fields decode lazily into numpy arrays so the per-read
decode pipeline stays vectorized.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass

import numpy as np

from .bgzf import BgzfReader, BgzfWriter

# 4-bit encoded seq alphabet per SAM spec
SEQ_NT16 = np.frombuffer(b"=ACMGRSVTWYHKDBN", dtype=np.uint8)
_NIB_HI = SEQ_NT16[np.arange(256) >> 4]
_NIB_LO = SEQ_NT16[np.arange(256) & 0xF]

# reverse complement table over ASCII
_COMPL = np.arange(256, dtype=np.uint8)
for _a, _b in [(65, 84), (67, 71), (71, 67), (84, 65), (97, 116), (99, 103), (103, 99), (116, 97)]:
    _COMPL[_a] = _b
_COMPL[ord("N")] = ord("N")
_COMPL[ord("n")] = ord("n")
_COMPL[ord("U")] = ord("A")

CIGAR_OPS = "MIDNSHP=X"
# per-op: (consumes_query, consumes_ref)
CIGAR_CONSUMES = np.array(
    [(1, 1), (1, 0), (0, 1), (0, 1), (1, 0), (0, 0), (0, 0), (1, 1), (1, 1)],
    dtype=np.int64,
)

FLAG_PAIRED = 0x1
FLAG_UNMAPPED = 0x4
FLAG_REVERSE = 0x10
FLAG_SECONDARY = 0x100
FLAG_QCFAIL = 0x200
FLAG_DUP = 0x400
FLAG_SUPPLEMENTARY = 0x800


class BamRecord:
    """One alignment record, lazily decoded from its raw BAM bytes."""

    __slots__ = (
        "_buf", "ref_id", "pos", "mapq", "flag", "l_seq", "next_ref_id",
        "next_pos", "tlen", "_l_read_name", "_n_cigar", "_name", "_cigar",
        "_seq_off", "_aux_off", "_aux", "_fwd_seq",
    )

    def __init__(self, buf: bytes):
        self._buf = buf
        (self.ref_id, self.pos, self._l_read_name, self.mapq, _bin,
         self._n_cigar, self.flag, self.l_seq, self.next_ref_id,
         self.next_pos, self.tlen) = struct.unpack_from("<iiBBHHHIiii", buf, 0)
        self._name = None
        self._cigar = None
        seq_off = 32 + self._l_read_name + 4 * self._n_cigar
        self._seq_off = seq_off
        self._aux_off = seq_off + (self.l_seq + 1) // 2 + self.l_seq
        self._aux = None
        self._fwd_seq = None

    # --- flags ---
    @property
    def is_unmapped(self) -> bool:
        return bool(self.flag & FLAG_UNMAPPED)

    @property
    def is_reverse(self) -> bool:
        return bool(self.flag & FLAG_REVERSE)

    @property
    def is_secondary(self) -> bool:
        return bool(self.flag & FLAG_SECONDARY)

    @property
    def is_supplementary(self) -> bool:
        return bool(self.flag & FLAG_SUPPLEMENTARY)

    @property
    def is_duplicate(self) -> bool:
        return bool(self.flag & FLAG_DUP)

    @property
    def is_not_primary(self) -> bool:
        """reference util.rs:405 record_is_not_primary"""
        return bool(self.flag & (FLAG_SECONDARY | FLAG_SUPPLEMENTARY | FLAG_DUP))

    @property
    def name(self) -> str:
        if self._name is None:
            off = 32
            self._name = self._buf[off : off + self._l_read_name - 1].decode()
        return self._name

    @property
    def cigar(self) -> np.ndarray:
        """uint32 array of raw cigar values (len<<4 | op)."""
        if self._cigar is None:
            off = 32 + self._l_read_name
            self._cigar = np.frombuffer(
                self._buf, dtype="<u4", count=self._n_cigar, offset=off
            )
        return self._cigar

    def seq_bytes(self) -> np.ndarray:
        """Aligned-orientation sequence as ASCII uint8 array."""
        nb = np.frombuffer(
            self._buf, dtype=np.uint8, count=(self.l_seq + 1) // 2,
            offset=self._seq_off,
        )
        out = np.empty(2 * len(nb), dtype=np.uint8)
        out[0::2] = _NIB_HI[nb]
        out[1::2] = _NIB_LO[nb]
        return out[: self.l_seq]

    def forward_seq(self) -> np.ndarray:
        """Sequence in instrument orientation (revcomp if reverse-aligned).

        reference util.rs:153 get_forward_sequence.
        """
        if self._fwd_seq is None:
            s = self.seq_bytes()
            if self.is_reverse:
                s = _COMPL[s[::-1]]
            self._fwd_seq = s
        return self._fwd_seq

    def quals(self) -> np.ndarray:
        off = self._seq_off + (self.l_seq + 1) // 2
        return np.frombuffer(self._buf, dtype=np.uint8, count=self.l_seq, offset=off)

    # --- aux tags ---
    def _scan_aux(self) -> dict:
        if self._aux is not None:
            return self._aux
        buf = self._buf
        p = self._aux_off
        end = len(buf)
        out = {}
        while p + 3 <= end:
            tag = buf[p : p + 2].decode("ascii", "replace")
            typ = chr(buf[p + 2])
            p += 3
            if typ == "A":
                out[tag] = ("A", chr(buf[p])); p += 1
            elif typ in "cC":
                v = buf[p] if typ == "C" else struct.unpack_from("<b", buf, p)[0]
                out[tag] = (typ, v); p += 1
            elif typ in "sS":
                v = struct.unpack_from("<h" if typ == "s" else "<H", buf, p)[0]
                out[tag] = (typ, v); p += 2
            elif typ in "iI":
                v = struct.unpack_from("<i" if typ == "i" else "<I", buf, p)[0]
                out[tag] = (typ, v); p += 4
            elif typ == "f":
                out[tag] = ("f", struct.unpack_from("<f", buf, p)[0]); p += 4
            elif typ in "ZH":
                q = buf.index(b"\x00", p)
                out[tag] = (typ, buf[p:q].decode("ascii", "replace")); p = q + 1
            elif typ == "B":
                sub = chr(buf[p])
                n = struct.unpack_from("<I", buf, p + 1)[0]
                dt = {"c": "<i1", "C": "<u1", "s": "<i2", "S": "<u2",
                      "i": "<i4", "I": "<u4", "f": "<f4"}[sub]
                arr = np.frombuffer(buf, dtype=dt, count=n, offset=p + 5)
                itemsize = np.dtype(dt).itemsize
                out[tag] = ("B" + sub, arr)
                p += 5 + n * itemsize
            else:
                raise ValueError(f"unknown aux type {typ!r} in tag {tag}")
        self._aux = out
        return out

    def get_aux(self, tag: str):
        """Return (type_char, value) or None."""
        return self._scan_aux().get(tag)

    def aux_items(self):
        return self._scan_aux().items()

    # --- alignment geometry ---
    def reference_span(self) -> int:
        cg = self.cigar
        ops = cg & 0xF
        lens = (cg >> 4).astype(np.int64)
        return int(lens[CIGAR_CONSUMES[ops, 1].astype(bool)].sum())

    def reference_end(self) -> int:
        return self.pos + self.reference_span()

    def aligned_pairs(self) -> tuple[np.ndarray, np.ndarray]:
        """(qpos, rpos) int64 arrays for match columns (M/=/X only).

        Mirrors rust-htslib ``aligned_pairs`` as consumed at
        reference util.rs:122 (match-only pairs).
        """
        cg = self.cigar
        ops = cg & 0xF
        lens = (cg >> 4).astype(np.int64)
        cq = CIGAR_CONSUMES[ops, 0] * lens
        cr = CIGAR_CONSUMES[ops, 1] * lens
        q_starts = np.concatenate([[0], np.cumsum(cq)[:-1]])
        r_starts = self.pos + np.concatenate([[0], np.cumsum(cr)[:-1]])
        is_match = (ops == 0) | (ops == 7) | (ops == 8)
        if not is_match.any():
            z = np.empty(0, dtype=np.int64)
            return z, z
        m_lens = lens[is_match]
        mq = q_starts[is_match]
        mr = r_starts[is_match]
        total = int(m_lens.sum())
        # vectorized expansion of [start, start+len) runs
        reps = np.repeat(np.arange(len(m_lens)), m_lens)
        within = np.arange(total) - np.repeat(
            np.concatenate([[0], np.cumsum(m_lens)[:-1]]), m_lens
        )
        return mq[reps] + within, mr[reps] + within

    def aligned_pairs_forward(self) -> tuple[np.ndarray, np.ndarray]:
        """(forward_qpos, rpos): query positions in instrument orientation.

        reference util.rs:122 get_aligned_pairs_forward.
        """
        q, r = self.aligned_pairs()
        if self.is_reverse:
            q = self.l_seq - 1 - q
        return q, r

    def deletion_ref_positions(self) -> np.ndarray:
        """Reference positions covered by D ops (htslib pileup is_del)."""
        cg = self.cigar
        ops = cg & 0xF
        lens = (cg >> 4).astype(np.int64)
        cr = CIGAR_CONSUMES[ops, 1] * lens
        r_starts = self.pos + np.concatenate([[0], np.cumsum(cr)[:-1]])
        is_del = ops == 2
        if not is_del.any():
            return np.empty(0, dtype=np.int64)
        d_lens = lens[is_del]
        d_starts = r_starts[is_del]
        reps = np.repeat(np.arange(len(d_lens)), d_lens)
        within = np.arange(int(d_lens.sum())) - np.repeat(
            np.concatenate([[0], np.cumsum(d_lens)[:-1]]), d_lens
        )
        return d_starts[reps] + within

    def aux_spans(self) -> list[tuple[str, int, int]]:
        """[(tag, start, end)] byte spans of each aux item."""
        buf = self._buf
        p = self._aux_off
        end = len(buf)
        out = []
        while p + 3 <= end:
            start = p
            tag = buf[p : p + 2].decode("ascii", "replace")
            typ = chr(buf[p + 2])
            p += 3
            if typ == "A" or typ in "cC":
                p += 1
            elif typ in "sS":
                p += 2
            elif typ in "iIf":
                p += 4
            elif typ in "ZH":
                p = buf.index(b"\x00", p) + 1
            elif typ == "B":
                sub = chr(buf[p])
                n = struct.unpack_from("<I", buf, p + 1)[0]
                itemsize = {"c": 1, "C": 1, "s": 2, "S": 2, "i": 4, "I": 4, "f": 4}[sub]
                p += 5 + n * itemsize
            else:
                raise ValueError(f"unknown aux type {typ!r}")
            out.append((tag, start, p))
        return out

    def with_replaced_aux(
        self, remove_tags: set[str], new_items: list[bytes]
    ) -> bytes:
        """New raw record bytes with ``remove_tags`` stripped and
        ``new_items`` (pre-encoded aux blobs) appended."""
        buf = self._buf
        out = bytearray(buf[: self._aux_off])
        for tag, s, e in self.aux_spans():
            if tag not in remove_tags:
                out += buf[s:e]
        for item in new_items:
            out += item
        return bytes(out)

    def raw(self) -> bytes:
        return self._buf


def encode_aux_string(tag: str, value: str) -> bytes:
    return tag.encode() + b"Z" + value.encode() + b"\x00"


def encode_aux_array_u8(tag: str, values) -> bytes:
    arr = np.asarray(values, dtype=np.uint8)
    return (
        tag.encode() + b"B" + b"C" + struct.pack("<I", len(arr)) + arr.tobytes()
    )


def encode_aux_int(tag: str, value: int) -> bytes:
    return tag.encode() + b"i" + struct.pack("<i", int(value))


@dataclass
class Reference:
    name: str
    length: int


class BamHeader:
    def __init__(self, text: str, refs: list[Reference]):
        self.text = text
        self.refs = refs
        self.name_to_tid = {r.name: i for i, r in enumerate(refs)}

    def tid2name(self, tid: int) -> str:
        return self.refs[tid].name

    def to_bytes(self) -> bytes:
        text = self.text.encode()
        out = [b"BAM\x01", struct.pack("<i", len(text)), text,
               struct.pack("<i", len(self.refs))]
        for r in self.refs:
            nm = r.name.encode() + b"\x00"
            out += [struct.pack("<i", len(nm)), nm, struct.pack("<i", r.length)]
        return b"".join(out)


def add_modkit_pg_records(header: BamHeader) -> BamHeader:
    """New header with a modkit @PG record appended (util.rs:607
    add_modkit_pg_records, used by the BAM-rewriting subcommands at
    commands.rs:375): ID chains as modkit, modkit.1, ... with PP pointing
    at the previous invocation, PN/VN/CL carrying program, version and the
    full command line."""
    import sys

    from .. import __version__

    runs = []
    for line in header.text.splitlines():
        if not line.startswith("@PG"):
            continue
        for fld in line.split("\t")[1:]:
            if fld.startswith("ID:") and "modkit" in fld[3:]:
                parts = fld[3:].split(".")
                seg = parts[1] if len(parts) > 1 else "0"
                if seg.isdigit():
                    runs.append(int(seg))
    pp = None
    if runs:
        latest = max(runs)
        pp = f"modkit.{latest}" if latest > 0 else "modkit"
        pg_id = f"modkit.{latest + 1}"
    else:
        pg_id = "modkit"
    rec = f"@PG\tID:{pg_id}\tPN:modkit\tVN:{__version__}"
    if pp is not None:
        rec += f"\tPP:{pp}"
    rec += "\tCL:" + " ".join(sys.argv) + "\n"
    text = header.text
    if text and not text.endswith("\n"):
        text += "\n"
    return BamHeader(text + rec, header.refs)


class BamReader:
    def __init__(self, path: str | os.PathLike, io_threads: int | None = None):
        self.path = os.fspath(path)
        self._bgzf = BgzfReader(self.path, io_threads=io_threads)
        magic = self._bgzf.read(4)
        if magic != b"BAM\x01":
            raise ValueError(f"{path} is not a BAM file")
        (l_text,) = struct.unpack("<i", self._bgzf.read(4))
        text = self._bgzf.read(l_text).rstrip(b"\x00").decode()
        (n_ref,) = struct.unpack("<i", self._bgzf.read(4))
        refs = []
        for _ in range(n_ref):
            (l_name,) = struct.unpack("<i", self._bgzf.read(4))
            name = self._bgzf.read(l_name)[:-1].decode()
            (l_ref,) = struct.unpack("<i", self._bgzf.read(4))
            refs.append(Reference(name, l_ref))
        self.header = BamHeader(text, refs)
        self._body_voffset = self._bgzf.tell_voffset()
        self._index = None

    # --- sequential iteration ---
    def __iter__(self):
        return self.records()

    def records(self, from_voffset: int | None = None):
        """Iterate records sequentially from the body start (or a voffset)."""
        data = self._bgzf.read_all_from(
            self._body_voffset if from_voffset is None else from_voffset
        )
        yield from _iter_records_in(data)

    # --- index ---
    @property
    def index(self) -> "BaiIndex":
        if self._index is None:
            for ext in (".bai", ".csi"):
                p = self.path + ext
                if os.path.exists(p):
                    self._index = (
                        BaiIndex.from_path(p)
                        if ext == ".bai"
                        else CsiIndex.from_path(p)
                    )
                    break
            else:
                base, _ = os.path.splitext(self.path)
                for ext in (".bai", ".csi"):
                    p = base + ext
                    if os.path.exists(p):
                        self._index = (
                            BaiIndex.from_path(p)
                            if ext == ".bai"
                            else CsiIndex.from_path(p)
                        )
                        break
                else:
                    raise FileNotFoundError(f"no index for {self.path}")
        return self._index

    def has_index(self) -> bool:
        try:
            _ = self.index
            return True
        except (FileNotFoundError, NotImplementedError):
            return False

    def fetch(self, tid: int, start: int, end: int):
        """Yield records overlapping [start, end) on tid, via the BAI index.

        Chunks are read EXACTLY over [cbeg, cend) (htslib semantics):
        reading past cend to the block end can re-visit records that also
        belong to a later chunk and silently double-count them.
        """
        chunks = self.index.query(tid, start, end)
        for cbeg, cend in chunks:
            buf = self._bgzf.read_span(cbeg, cend)
            for rec in _iter_records_in(buf, allow_partial_tail=True):
                if rec.ref_id != tid or rec.pos >= end:
                    if rec.ref_id > tid or (rec.ref_id == tid and rec.pos >= end):
                        return
                    continue
                if rec.is_unmapped:
                    continue
                if rec.reference_end() > start:
                    yield rec

    @property
    def bam_raw(self) -> bytes:
        """The compressed BAM bytes (for the native BGZF inflate+decode
        tile path, native.decode_tile_bgzf)."""
        return self._bgzf._raw

    def fetch_chunk_voffsets(self, tid: int, start: int, end: int):
        """BAI/CSI chunk (vbeg, vend) virtual-offset pairs for the region."""
        return self.index.query(tid, start, end)

    def fetch_chunks_raw(self, tid: int, start: int, end: int) -> list[bytes]:
        """Decompressed byte buffers of the BAI chunks overlapping the
        region — the exact bytes ``fetch`` iterates, for the native C++
        record decoder (region/flag filtering happens there). Spans are
        exact [cbeg, cend) — see fetch."""
        chunks = self.index.query(tid, start, end)
        return [
            self._bgzf.read_span(cbeg, cend) for cbeg, cend in chunks
        ]

    def fetch_unmapped(self):
        """Yield unmapped-unplaced records from the tail of the file.

        The seek shortcut (start scanning past the last mapped chunk)
        assumes coordinate sorting, which puts unmapped-unplaced records
        last; when the header does not declare SO:coordinate, fall back to
        a full scan so no unmapped record can be missed."""
        voff = self.index.first_unmapped_voffset()
        coord_sorted = "SO:coordinate" in self.header.text.split("\n", 1)[0]
        if voff is None or not coord_sorted:
            # fall back: scan everything
            for rec in self.records():
                if rec.ref_id < 0:
                    yield rec
            return
        self._bgzf.seek_voffset(voff)
        data = self._bgzf.read_all_from(voff)
        for rec in _iter_records_in(data):
            if rec.ref_id < 0:
                yield rec

    def idxstats(self) -> list[tuple[str, int, int, int]]:
        """(name, length, n_mapped, n_unmapped) per reference; samtools idxstats.

        reference sampling_schedule.rs:622 IdxStats.
        """
        idx = self.index
        out = []
        for tid, ref in enumerate(self.header.refs):
            mapped, unmapped = idx.counts(tid)
            out.append((ref.name, ref.length, mapped, unmapped))
        return out

    def n_no_coor(self) -> int:
        return self.index.n_no_coor


def _iter_records_in(data: bytes, allow_partial_tail: bool = False):
    p = 0
    n = len(data)
    while p + 4 <= n:
        (block_size,) = struct.unpack_from("<i", data, p)
        if p + 4 + block_size > n:
            if allow_partial_tail:
                return
            raise ValueError("truncated BAM record")
        yield BamRecord(data[p + 4 : p + 4 + block_size])
        p += 4 + block_size


# ---------------------------------------------------------------- BAI index

_MAX_BIN = 37450  # ((1<<18)-1)/7 + 1
_PSEUDO_BIN = 37450


def reg2bins(beg: int, end: int) -> list[int]:
    """Standard UCSC/BAM binning: bins overlapping [beg, end)."""
    end -= 1
    bins = [0]
    for shift, offset in ((26, 1), (23, 9), (20, 73), (17, 585), (14, 4681)):
        bins.extend(range(offset + (beg >> shift), offset + (end >> shift) + 1))
    return bins


class BaiIndex:
    def __init__(self, per_ref: list, n_no_coor: int):
        # per_ref: list of (bins: dict[bin -> list[(beg,end)]], ioffsets: ndarray,
        #                   stats: (mapped, unmapped) | None)
        self._per_ref = per_ref
        self.n_no_coor = n_no_coor

    @classmethod
    def from_path(cls, path: str) -> "BaiIndex":
        with open(path, "rb") as fh:
            data = fh.read()
        if data[:4] != b"BAI\x01":
            raise ValueError(f"{path}: bad BAI magic")
        p = 4
        (n_ref,) = struct.unpack_from("<i", data, p); p += 4
        per_ref = []
        for _ in range(n_ref):
            (n_bin,) = struct.unpack_from("<i", data, p); p += 4
            bins = {}
            stats = None
            for _ in range(n_bin):
                bin_id, n_chunk = struct.unpack_from("<Ii", data, p); p += 8
                chunks = np.frombuffer(data, dtype="<u8", count=2 * n_chunk, offset=p)
                p += 16 * n_chunk
                if bin_id == _PSEUDO_BIN and n_chunk == 2:
                    stats = (int(chunks[2]), int(chunks[3]))
                else:
                    bins[bin_id] = chunks.reshape(-1, 2)
            (n_intv,) = struct.unpack_from("<i", data, p); p += 4
            ioffsets = np.frombuffer(data, dtype="<u8", count=n_intv, offset=p)
            p += 8 * n_intv
            per_ref.append((bins, ioffsets, stats))
        n_no_coor = 0
        if p + 8 <= len(data):
            (n_no_coor,) = struct.unpack_from("<Q", data, p)
        return cls(per_ref, int(n_no_coor))

    def counts(self, tid: int) -> tuple[int, int]:
        stats = self._per_ref[tid][2]
        return stats if stats is not None else (0, 0)

    def query(self, tid: int, beg: int, end: int) -> list[tuple[int, int]]:
        """Merged (voffset_beg, voffset_end) chunks overlapping region."""
        bins, ioffsets, _ = self._per_ref[tid]
        min_off = 0
        if len(ioffsets):
            # linear index: lowest voffset of any record overlapping each
            # 16kb window; zero entries mean "no data", walk back for a bound
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

    def first_unmapped_voffset(self) -> int | None:
        """voffset just past the last mapped chunk (start of unmapped tail)."""
        best = 0
        for bins, _, _ in self._per_ref:
            for arr in bins.values():
                if len(arr):
                    best = max(best, int(arr[:, 1].max()))
        return best or None

    def linear_voffsets(self) -> list[int]:
        """All nonzero linear-index voffsets — each is a record boundary
        (the voffset of the first record overlapping a 16 kb window);
        multi-host extract uses them as shard split candidates."""
        out = []
        for _, ioffsets, _ in self._per_ref:
            for v in np.asarray(ioffsets).ravel():
                if v:
                    out.append(int(v))
        return out

    def any_mapped_reads(self) -> bool:
        return any(
            (stats is not None and stats[0] > 0) or bins
            for bins, _, stats in self._per_ref
        )


def reg2bins_csi(beg: int, end: int, min_shift: int, depth: int) -> list[int]:
    """Bins overlapping [beg, end) for a CSI index's (min_shift, depth)."""
    end -= 1
    bins = []
    level_offset = 0
    shift = min_shift + 3 * depth
    for level in range(depth + 1):
        bins.extend(
            range(level_offset + (beg >> shift), level_offset + (end >> shift) + 1)
        )
        level_offset = (level_offset << 3) + 1
        shift -= 3
    return bins


def reg2bin_csi(beg: int, end: int, min_shift: int, depth: int) -> int:
    end -= 1
    level_start = ((1 << 3 * depth) - 1) // 7
    shift = min_shift
    while depth >= 0:
        if beg >> shift == end >> shift:
            return level_start + (beg >> shift)
        level_start = (level_start - 1) >> 3
        shift += 3
        depth -= 1
    return 0


class CsiIndex:
    """CSI (.csi) coordinate-sorted index (BGZF-compressed, generalized
    binning with per-bin loffset instead of a linear index). Exposes the
    BaiIndex interface so BamReader.fetch works unchanged
    (command_utils.rs:212 — the reference gets CSI support via htslib)."""

    def __init__(self, min_shift: int, depth: int, per_ref: list, n_no_coor: int):
        self.min_shift = min_shift
        self.depth = depth
        self._per_ref = per_ref  # (bins: {id: (chunks, loffset)}, stats)
        self.n_no_coor = n_no_coor
        # pseudo-bin id = max_bin + 1 for this geometry
        self._pseudo = ((1 << 3 * (depth + 1)) - 1) // 7 + 1

    @classmethod
    def from_path(cls, path: str) -> "CsiIndex":
        import gzip

        with gzip.open(path, "rb") as fh:
            data = fh.read()
        if data[:4] != b"CSI\x01":
            raise ValueError(f"{path}: bad CSI magic")
        min_shift, depth, l_aux = struct.unpack_from("<iii", data, 4)
        p = 16 + l_aux
        (n_ref,) = struct.unpack_from("<i", data, p); p += 4
        pseudo = ((1 << 3 * (depth + 1)) - 1) // 7 + 1
        per_ref = []
        for _ in range(n_ref):
            (n_bin,) = struct.unpack_from("<i", data, p); p += 4
            bins = {}
            stats = None
            for _ in range(n_bin):
                bin_id, loffset, n_chunk = struct.unpack_from("<IQi", data, p)
                p += 16
                chunks = np.frombuffer(
                    data, dtype="<u8", count=2 * n_chunk, offset=p
                )
                p += 16 * n_chunk
                if bin_id == pseudo and n_chunk == 2:
                    stats = (int(chunks[2]), int(chunks[3]))
                else:
                    bins[bin_id] = (chunks.reshape(-1, 2), int(loffset))
            per_ref.append((bins, stats))
        n_no_coor = 0
        if p + 8 <= len(data):
            (n_no_coor,) = struct.unpack_from("<Q", data, p)
        return cls(min_shift, depth, per_ref, int(n_no_coor))

    def counts(self, tid: int) -> tuple[int, int]:
        stats = self._per_ref[tid][1]
        return stats if stats is not None else (0, 0)

    def linear_voffsets(self) -> list[int]:
        """Record-boundary voffsets (per-bin loffsets — the CSI
        counterpart of the BAI linear index)."""
        out = []
        for bins, _ in self._per_ref:
            for _chunks, loffset in bins.values():
                if loffset:
                    out.append(int(loffset))
        return out

    def query(self, tid: int, beg: int, end: int) -> list[tuple[int, int]]:
        bins, _ = self._per_ref[tid]
        # loffset of the smallest bin containing beg bounds the search
        # (the CSI replacement for the BAI linear index)
        min_off = 0
        b = reg2bin_csi(beg, beg + 1, self.min_shift, self.depth)
        while b:
            if b in bins:
                min_off = bins[b][1]
                break
            b = (b - 1) >> 3
        chunks = []
        for b in reg2bins_csi(beg, end, self.min_shift, self.depth):
            entry = bins.get(b)
            if entry is not None:
                for cbeg, cend in entry[0]:
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

    def first_unmapped_voffset(self) -> int | None:
        best = 0
        for bins, _ in self._per_ref:
            for arr, _lo in bins.values():
                if len(arr):
                    best = max(best, int(arr[:, 1].max()))
        return best or None

    def any_mapped_reads(self) -> bool:
        return any(
            (stats is not None and stats[0] > 0) or bins
            for bins, stats in self._per_ref
        )


def reg2bin(beg: int, end: int) -> int:
    """Standard BAM bin for [beg, end)."""
    end -= 1
    if beg >> 14 == end >> 14:
        return ((1 << 15) - 1) // 7 + (beg >> 14)
    if beg >> 17 == end >> 17:
        return ((1 << 12) - 1) // 7 + (beg >> 17)
    if beg >> 20 == end >> 20:
        return ((1 << 9) - 1) // 7 + (beg >> 20)
    if beg >> 23 == end >> 23:
        return ((1 << 6) - 1) // 7 + (beg >> 23)
    if beg >> 26 == end >> 26:
        return ((1 << 3) - 1) // 7 + (beg >> 26)
    return 0


def build_bai(bam_path: str, out_path: str | None = None) -> str:
    """Build a .bai index for a (coordinate-sorted) BAM, like samtools index.

    The reference builds indexes via htslib (bam::index::build in its
    tests); rewritten modBAMs need one for the pileup fetch path.
    """
    out_path = out_path or bam_path + ".bai"
    reader = BamReader(bam_path)
    n_ref = len(reader.header.refs)
    bins: list[dict] = [dict() for _ in range(n_ref)]
    linear: list[dict] = [dict() for _ in range(n_ref)]
    stats = [[0, 0] for _ in range(n_ref)]  # mapped, unmapped per ref
    ref_span: list[list] = [[None, None] for _ in range(n_ref)]
    n_no_coor = 0

    bg = reader._bgzf
    bg.seek_voffset(reader._body_voffset)
    while True:
        if bg.at_eof():
            break
        v_start = bg.tell_voffset()
        head = bg.read(4)
        if len(head) < 4:
            break
        (block_size,) = struct.unpack("<i", head)
        buf = bg.read(block_size)
        v_end = bg.tell_voffset()
        rec = BamRecord(buf)
        if rec.ref_id < 0:
            n_no_coor += 1
            continue
        tid = rec.ref_id
        if rec.is_unmapped:
            stats[tid][1] += 1
            beg, end = rec.pos, rec.pos + 1
        else:
            stats[tid][0] += 1
            beg = rec.pos
            end = max(rec.reference_end(), beg + 1)
        b = reg2bin(beg, end)
        bins[tid].setdefault(b, []).append((v_start, v_end))
        for w in range(beg >> 14, ((end - 1) >> 14) + 1):
            cur = linear[tid].get(w)
            if cur is None or v_start < cur:
                linear[tid][w] = v_start
        sp = ref_span[tid]
        sp[0] = v_start if sp[0] is None else min(sp[0], v_start)
        sp[1] = v_end if sp[1] is None else max(sp[1], v_end)

    out = [b"BAI\x01", struct.pack("<i", n_ref)]
    for tid in range(n_ref):
        tid_bins = {}
        for b, chunks in bins[tid].items():
            chunks.sort()
            merged = [list(chunks[0])]
            for s, e in chunks[1:]:
                if s <= merged[-1][1]:
                    merged[-1][1] = max(merged[-1][1], e)
                else:
                    merged.append([s, e])
            tid_bins[b] = merged
        n_bin = len(tid_bins) + (1 if ref_span[tid][0] is not None else 0)
        out.append(struct.pack("<i", n_bin))
        for b in sorted(tid_bins):
            merged = tid_bins[b]
            out.append(struct.pack("<Ii", b, len(merged)))
            for s, e in merged:
                out.append(struct.pack("<QQ", s, e))
        if ref_span[tid][0] is not None:
            # pseudo-bin with ref span + mapped/unmapped counts
            out.append(struct.pack("<Ii", _PSEUDO_BIN, 2))
            out.append(struct.pack("<QQ", ref_span[tid][0], ref_span[tid][1]))
            out.append(struct.pack("<QQ", stats[tid][0], stats[tid][1]))
        if linear[tid]:
            n_intv = max(linear[tid]) + 1
            ioff = [0] * n_intv
            for w, v in linear[tid].items():
                ioff[w] = v
            # fill zeros with previous offsets for correct lower bounds
            prev = 0
            for i in range(n_intv):
                if ioff[i] == 0:
                    ioff[i] = prev
                else:
                    prev = ioff[i]
            out.append(struct.pack("<i", n_intv))
            out.append(np.asarray(ioff, dtype="<u8").tobytes())
        else:
            out.append(struct.pack("<i", 0))
    out.append(struct.pack("<Q", n_no_coor))
    with open(out_path, "wb") as fh:
        fh.write(b"".join(out))
    return out_path


def build_csi(
    bam_path: str,
    out_path: str | None = None,
    min_shift: int = 14,
    depth: int = 5,
) -> str:
    """Build a .csi index (samtools index -c equivalent): generalized
    binning, per-bin loffset, BGZF-compressed container."""
    out_path = out_path or bam_path + ".csi"
    reader = BamReader(bam_path)
    n_ref = len(reader.header.refs)
    bins: list[dict] = [dict() for _ in range(n_ref)]
    # linear window map painted over EVERY leaf window a record overlaps
    # (mirrors build_bai/htslib): a record spanning a window boundary is
    # assigned to a parent bin, so deriving loffset only from records
    # assigned to a bin would miss overlapping records with earlier
    # voffsets, and CsiIndex.query would clamp/drop their chunks
    linear: list[dict] = [dict() for _ in range(n_ref)]
    stats = [[0, 0] for _ in range(n_ref)]
    ref_span: list[list] = [[None, None] for _ in range(n_ref)]
    n_no_coor = 0
    pseudo = ((1 << 3 * (depth + 1)) - 1) // 7 + 1

    bg = reader._bgzf
    bg.seek_voffset(reader._body_voffset)
    while not bg.at_eof():
        v_start = bg.tell_voffset()
        head = bg.read(4)
        if len(head) < 4:
            break
        (block_size,) = struct.unpack("<i", head)
        buf = bg.read(block_size)
        v_end = bg.tell_voffset()
        rec = BamRecord(buf)
        if rec.ref_id < 0:
            n_no_coor += 1
            continue
        tid = rec.ref_id
        if rec.is_unmapped:
            stats[tid][1] += 1
            beg, end = rec.pos, rec.pos + 1
        else:
            stats[tid][0] += 1
            beg = rec.pos
            end = max(rec.reference_end(), beg + 1)
        b = reg2bin_csi(beg, end, min_shift, depth)
        bins[tid].setdefault(b, []).append((v_start, v_end))
        for w in range(beg >> min_shift, ((end - 1) >> min_shift) + 1):
            cur = linear[tid].get(w)
            if cur is None or v_start < cur:
                linear[tid][w] = v_start
        sp = ref_span[tid]
        sp[0] = v_start if sp[0] is None else min(sp[0], v_start)
        sp[1] = v_end if sp[1] is None else max(sp[1], v_end)

    import bisect

    level_firsts = [((1 << 3 * lv) - 1) // 7 for lv in range(depth + 1)]

    def bin_loffset(tid: int, b: int) -> int:
        """loffset of bin b = linear-index value at the leaf window covering
        the bin's genomic start (htslib semantics), guaranteeing
        loffset <= voffset of every record overlapping the bin."""
        level = max(lv for lv, f in enumerate(level_firsts) if f <= b)
        first_window = (b - level_firsts[level]) << (3 * (depth - level))
        wins = sorted_wins[tid]
        i = bisect.bisect_right(wins, first_window) - 1
        # windows with no overlapping record inherit the previous painted
        # window's offset (a valid lower bound in a coordinate-sorted BAM)
        return linear[tid][wins[i]] if i >= 0 else 0

    sorted_wins = [sorted(linear[tid]) for tid in range(n_ref)]
    out = [
        b"CSI\x01",
        struct.pack("<iii", min_shift, depth, 0),
        struct.pack("<i", n_ref),
    ]
    for tid in range(n_ref):
        tid_bins = {}
        for b, chunks in bins[tid].items():
            chunks.sort()
            merged = [list(chunks[0])]
            for s, e in chunks[1:]:
                if s <= merged[-1][1]:
                    merged[-1][1] = max(merged[-1][1], e)
                else:
                    merged.append([s, e])
            tid_bins[b] = merged
        n_bin = len(tid_bins) + (1 if ref_span[tid][0] is not None else 0)
        out.append(struct.pack("<i", n_bin))
        for b in sorted(tid_bins):
            merged = tid_bins[b]
            out.append(struct.pack("<IQi", b, bin_loffset(tid, b), len(merged)))
            for s, e in merged:
                out.append(struct.pack("<QQ", s, e))
        if ref_span[tid][0] is not None:
            out.append(struct.pack("<IQi", pseudo, 0, 2))
            out.append(struct.pack("<QQ", ref_span[tid][0], ref_span[tid][1]))
            out.append(struct.pack("<QQ", stats[tid][0], stats[tid][1]))
    out.append(struct.pack("<Q", n_no_coor))
    from .bgzf import BgzfWriter

    with BgzfWriter(out_path) as bgw:
        bgw.write(b"".join(out))
    return out_path


# ---------------------------------------------------------------- writer

class BamWriter:
    def __init__(self, path_or_fileobj, header: BamHeader, level: int = 6):
        self._bgzf = BgzfWriter(path_or_fileobj, level=level)
        self._bgzf.write(header.to_bytes())
        self.header = header

    def write(self, rec: BamRecord) -> None:
        buf = rec.raw()
        self._bgzf.write(struct.pack("<i", len(buf)) + buf)

    def write_raw(self, buf: bytes) -> None:
        self._bgzf.write(struct.pack("<i", len(buf)) + buf)

    def close(self) -> None:
        self._bgzf.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def cigar_string(rec: BamRecord) -> str:
    if rec._n_cigar == 0:
        return "*"
    return "".join(
        f"{int(c) >> 4}{CIGAR_OPS[int(c) & 0xF]}" for c in rec.cigar
    )


def record_to_sam(rec: BamRecord, header: BamHeader) -> str:
    """Render one record as a SAM text line (htslib sam_format1
    semantics: 1-based positions, '=' for same-ref mate, '%g' floats)."""
    rname = header.tid2name(rec.ref_id) if rec.ref_id >= 0 else "*"
    if rec.next_ref_id < 0:
        rnext = "*"
    elif rec.next_ref_id == rec.ref_id:
        rnext = "="
    else:
        rnext = header.tid2name(rec.next_ref_id)
    seq = rec.seq_bytes().tobytes().decode("ascii") if rec.l_seq else "*"
    qual = "*"
    if rec.l_seq:
        q = rec.quals()
        if len(q) and not (q == 0xFF).all():
            qual = (q + 33).astype(np.uint8).tobytes().decode("ascii")
    fields = [
        rec.name, str(rec.flag), rname, str(rec.pos + 1), str(rec.mapq),
        cigar_string(rec), rnext, str(rec.next_pos + 1), str(rec.tlen),
        seq, qual,
    ]
    for tag, (typ, val) in rec.aux_items():
        if typ == "A":
            fields.append(f"{tag}:A:{val}")
        elif typ in "cCsSiI":
            fields.append(f"{tag}:i:{val}")
        elif typ == "f":
            fields.append(f"{tag}:f:{format(float(val), 'g')}")
        elif typ in "ZH":
            fields.append(f"{tag}:{typ}:{val}")
        elif typ.startswith("B"):
            sub = typ[1]
            if sub == "f":
                vals = ",".join(format(float(x), "g") for x in val)
            else:
                vals = ",".join(str(int(x)) for x in val)
            fields.append(f"{tag}:B:{sub},{vals}")
        else:
            raise ValueError(f"cannot render aux type {typ!r} as SAM")
    return "\t".join(fields) + "\n"


class SamWriter:
    """SAM text writer with the BamWriter surface (--output-sam on the
    rewriters; reference command_utils.rs:222-240 get_bam_writer with
    Format::Sam)."""

    def __init__(self, path_or_fileobj, header: BamHeader):
        import sys

        if isinstance(path_or_fileobj, (str, os.PathLike)):
            p = os.fspath(path_or_fileobj)
            if p in ("-", "stdout"):
                self._fh = sys.stdout
                self._owns = False
            else:
                self._fh = open(p, "w")
                self._owns = True
        else:
            self._fh = path_or_fileobj
            self._owns = False
        self.header = header
        text = header.text
        if text and not text.endswith("\n"):
            text += "\n"
        self._fh.write(text)

    def write(self, rec: BamRecord) -> None:
        self._fh.write(record_to_sam(rec, self.header))

    def write_raw(self, buf: bytes) -> None:
        self._fh.write(record_to_sam(BamRecord(buf), self.header))

    def close(self) -> None:
        self._fh.flush()
        if self._owns:
            self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
