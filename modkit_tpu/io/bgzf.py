"""BGZF (blocked gzip) reader/writer.

BGZF is the block-compressed container underneath BAM and tabix-indexed
text files (bgzip). Each block is an independent gzip member whose gzip
extra field carries a ``BC`` subfield with the total compressed block size,
allowing random access via *virtual offsets*: ``voffset = coffset << 16 |
uoffset`` where ``coffset`` is the file offset of the block and ``uoffset``
the offset inside the uncompressed block.

This is a from-scratch implementation of the same container format that the
reference tool consumes through htslib (see reference ``Cargo.toml:49``
rust-htslib). zlib does the actual (de)compression in C, so throughput is
dominated by C code even from Python.
"""

from __future__ import annotations

import io
import os
import struct
import zlib
from concurrent.futures import ThreadPoolExecutor

# 28-byte EOF marker block mandated by the SAM spec for BGZF files.
BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)

_HDR = struct.Struct("<4BI2BH")  # magic(4) mtime xfl os xlen


def _parse_block_header(buf: bytes, off: int) -> tuple[int, int]:
    """Return (bsize, data_start) for the BGZF block at ``off`` in ``buf``.

    ``bsize`` is the total compressed size of the block including header and
    footer. ``data_start`` is the offset of the deflate payload.
    """
    if buf[off] != 0x1F or buf[off + 1] != 0x8B:
        raise ValueError(f"not a gzip block at offset {off}")
    flg = buf[off + 3]
    if not flg & 4:  # FEXTRA must be set for BGZF
        raise ValueError("gzip block without extra field (not BGZF)")
    xlen = struct.unpack_from("<H", buf, off + 10)[0]
    extra_end = off + 12 + xlen
    p = off + 12
    bsize = None
    while p < extra_end:
        si1, si2, slen = buf[p], buf[p + 1], struct.unpack_from("<H", buf, p + 2)[0]
        if si1 == 0x42 and si2 == 0x43 and slen == 2:  # 'B','C'
            bsize = struct.unpack_from("<H", buf, p + 4)[0] + 1
        p += 4 + slen
    if bsize is None:
        raise ValueError("BGZF BC subfield missing")
    return bsize, extra_end


def _inflate_block(buf: bytes, off: int) -> tuple[bytes, int]:
    """Decompress one BGZF block starting at ``off``; return (data, bsize)."""
    bsize, data_start = _parse_block_header(buf, off)
    payload = buf[data_start : off + bsize - 8]
    data = zlib.decompress(payload, wbits=-15)
    return data, bsize


class BgzfReader:
    """Random-access BGZF reader with a small block cache.

    Supports sequential ``read`` as well as ``seek_voffset`` to a virtual
    offset (as used by BAI/tabix indices).
    """

    def __init__(self, path: str | os.PathLike, io_threads: int | None = None):
        self.path = os.fspath(path)
        # BGZF inflate worker count (the analog of htslib's tpool,
        # reference commands.rs:371-378); None = min(8, cpus)
        self.io_threads = io_threads
        if self.path in ("-", "stdin"):
            # streaming input (the reference's bam::Reader::from_stdin,
            # command_utils.rs:212-219); buffered fully since BGZF blocks
            # are only bounded once read
            import sys

            self._raw = sys.stdin.buffer.read()
        else:
            import mmap

            fd = os.open(self.path, os.O_RDONLY)
            try:
                size = os.fstat(fd).st_size
                if size:
                    # MAP_PRIVATE copy-on-write: read-only use never
                    # dirties pages, so WGS-scale inputs stay file-backed
                    # and evictable instead of resident (and ctypes can
                    # wrap the map zero-copy via from_buffer)
                    self._raw = mmap.mmap(fd, 0, access=mmap.ACCESS_COPY)
                else:
                    self._raw = b""
            finally:
                os.close(fd)
        self._coffset = 0  # file offset of current block
        self._block: bytes = b""
        self._bsize = 0
        self._uoffset = 0
        self._cache: dict[int, tuple[bytes, int]] = {}
        if self._raw:
            self._load_block(0)

    @property
    def raw_size(self) -> int:
        return len(self._raw)

    def _load_block(self, coffset: int) -> None:
        hit = self._cache.get(coffset)
        if hit is None:
            if coffset >= len(self._raw):
                self._block, self._bsize = b"", 0
                self._coffset = coffset
                self._uoffset = 0
                return
            data, bsize = _inflate_block(self._raw, coffset)
            if len(self._cache) > 64:
                self._cache.clear()
            self._cache[coffset] = (data, bsize)
            hit = (data, bsize)
        self._block, self._bsize = hit
        self._coffset = coffset
        self._uoffset = 0

    def seek_voffset(self, voffset: int) -> None:
        coffset, uoffset = voffset >> 16, voffset & 0xFFFF
        if coffset != self._coffset or not self._block:
            self._load_block(coffset)
        self._uoffset = uoffset

    def tell_voffset(self) -> int:
        return (self._coffset << 16) | self._uoffset

    def at_eof(self) -> bool:
        while True:
            if self._uoffset < len(self._block):
                return False
            nxt = self._coffset + self._bsize
            if nxt >= len(self._raw) or self._bsize == 0:
                return True
            self._load_block(nxt)

    def read(self, n: int) -> bytes:
        out = bytearray()
        while n > 0:
            avail = len(self._block) - self._uoffset
            if avail <= 0:
                nxt = self._coffset + self._bsize
                if self._bsize == 0 or nxt >= len(self._raw):
                    break
                self._load_block(nxt)
                continue
            take = min(avail, n)
            out += self._block[self._uoffset : self._uoffset + take]
            self._uoffset += take
            n -= take
        return bytes(out)

    def read_all_from(self, voffset: int = 0) -> bytes:
        """Decompress everything from ``voffset`` to EOF (parallel blocks)."""
        coffset, uoffset = voffset >> 16, voffset & 0xFFFF
        offs = []
        off = coffset
        raw = self._raw
        while off < len(raw):
            bsize, _ = _parse_block_header(raw, off)
            offs.append(off)
            off += bsize
        if not offs:
            return b""
        chunks = self._inflate_many(offs)
        chunks[0] = chunks[0][uoffset:]
        return b"".join(chunks)

    def _inflate_many(self, offs: list[int]) -> list[bytes]:
        raw = self._raw
        workers = self.io_threads or min(8, os.cpu_count() or 1)
        if len(offs) > 4 and workers > 1:
            with ThreadPoolExecutor(workers) as ex:
                return list(ex.map(lambda o: _inflate_block(raw, o)[0], offs))
        return [_inflate_block(raw, o)[0] for o in offs]

    def read_span(self, v_start: int, v_end: int) -> bytes:
        """Decompress exactly the virtual-offset span [v_start, v_end),
        inflating blocks in parallel across ``io_threads`` workers (the hot
        path for tabix chunk fetches)."""
        c_start, u_start = v_start >> 16, v_start & 0xFFFF
        c_end, u_end = v_end >> 16, v_end & 0xFFFF
        raw = self._raw
        offs = []
        off = c_start
        while off < len(raw) and (off < c_end or (off == c_end and u_end > 0)):
            bsize, _ = _parse_block_header(raw, off)
            offs.append(off)
            off += bsize
        if not offs:
            return b""
        chunks = self._inflate_many(offs)
        if offs[-1] == c_end:
            chunks[-1] = chunks[-1][:u_end]
        chunks[0] = chunks[0][u_start:]
        return b"".join(chunks)


def _compress_block(data: bytes, level: int) -> bytes:
    # native codec (libdeflate, ~2-3x zlib — htslib's accelerated path)
    # when available; pure-zlib fallback below is byte-compatible BGZF
    from .. import native as _native

    blk = _native.compress_block(data, level)
    if blk is not None:
        return blk
    comp = zlib.compressobj(level, zlib.DEFLATED, -15)
    payload = comp.compress(data) + comp.flush()
    bsize = len(payload) + 26
    if bsize > 0x10000:
        raise ValueError("BGZF block too large after compression")
    return (
        b"\x1f\x8b\x08\x04\x00\x00\x00\x00\x00\xff"
        + struct.pack("<H", 6)
        + b"BC"
        + struct.pack("<H", 2)
        + struct.pack("<H", bsize - 1)
        + payload
        + struct.pack("<I", zlib.crc32(data) & 0xFFFFFFFF)
        + struct.pack("<I", len(data) & 0xFFFFFFFF)
    )


class ParallelBgzfWriter:
    """BGZF writer compressing 64 KiB blocks on a thread pool with ordered
    emission — the analog of the reference's gzp parallel compressor
    (extract --bgzf, extract/subcommand.rs:270). zlib releases the GIL, so
    block compression scales across Python threads."""

    def __init__(
        self,
        fileobj_or_path,
        level: int = 6,
        threads: int = 4,
        max_pending: int = 64,
    ):
        import collections
        from concurrent.futures import ThreadPoolExecutor

        if isinstance(fileobj_or_path, (str, os.PathLike)):
            self._fh = open(fileobj_or_path, "wb")
            self._owns = True
        else:
            self._fh = fileobj_or_path
            self._owns = False
        self._level = level
        self._buf = bytearray()
        self._pool = ThreadPoolExecutor(max(threads, 1))
        self._pending = collections.deque()
        self._max_pending = max_pending

    def write(self, data: bytes) -> None:
        self._buf += data
        while len(self._buf) >= 0xFF00:
            self._submit(bytes(self._buf[:0xFF00]))
            del self._buf[:0xFF00]

    def _submit(self, data: bytes) -> None:
        self._pending.append(
            self._pool.submit(_compress_block, data, self._level)
        )
        while len(self._pending) >= self._max_pending:
            self._fh.write(self._pending.popleft().result())

    def close(self) -> None:
        if self._buf:
            self._submit(bytes(self._buf))
            self._buf.clear()
        while self._pending:
            self._fh.write(self._pending.popleft().result())
        self._pool.shutdown()
        self._fh.write(BGZF_EOF)
        self._fh.flush()
        if self._owns:
            self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class BgzfTextWriter:
    """Text-mode adapter over a BGZF writer (for TSV outputs)."""

    def __init__(self, fileobj_or_path, level: int = 6, threads: int = 4):
        self._bg = ParallelBgzfWriter(fileobj_or_path, level, threads)

    def write(self, s: str) -> None:
        self._bg.write(s.encode())

    def writelines(self, lines) -> None:
        for s in lines:
            self._bg.write(s.encode())

    def flush(self) -> None:
        pass

    def close(self) -> None:
        self._bg.close()


class BgzfWriter:
    """Streaming BGZF writer (with terminating EOF block)."""

    def __init__(self, fileobj_or_path, level: int = 6):
        if isinstance(fileobj_or_path, (str, os.PathLike)):
            self._fh = open(fileobj_or_path, "wb")
            self._owns = True
        else:
            self._fh = fileobj_or_path
            self._owns = False
        self._level = level
        self._buf = bytearray()
        self._coffset = 0

    def tell_voffset(self) -> int:
        return (self._coffset << 16) | len(self._buf)

    def write(self, data: bytes) -> None:
        self._buf += data
        while len(self._buf) >= 0xFF00:
            self._flush_block(self._buf[:0xFF00])
            del self._buf[:0xFF00]

    def _flush_block(self, data: bytes) -> None:
        block = _compress_block(bytes(data), self._level)
        self._fh.write(block)
        self._coffset += len(block)

    def flush(self) -> None:
        if self._buf:
            self._flush_block(self._buf)
            self._buf.clear()

    def close(self) -> None:
        self.flush()
        self._fh.write(BGZF_EOF)
        self._fh.flush()
        if self._owns:
            self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def is_bgzf(path: str | os.PathLike) -> bool:
    with open(path, "rb") as fh:
        head = fh.read(18)
    if len(head) < 18 or head[0] != 0x1F or head[1] != 0x8B:
        return False
    return head[12] == 0x42 and head[13] == 0x43
