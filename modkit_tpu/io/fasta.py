"""FASTA + faidx reading (the reference uses bio/faidx: fasta.rs:17-229).

Provides indexed slice access used for motif scans per genome tile. Builds
the .fai on the fly if absent.
"""

from __future__ import annotations

import os

import numpy as np


class FastaReader:
    def __init__(self, path: str | os.PathLike):
        self.path = os.fspath(path)
        self._fh = open(self.path, "rb")
        fai = self.path + ".fai"
        self.index: dict[str, tuple[int, int, int, int]] = {}
        if os.path.exists(fai):
            with open(fai) as idx:
                for line in idx:
                    parts = line.rstrip("\n").split("\t")
                    if len(parts) >= 5:
                        self.index[parts[0]] = tuple(int(x) for x in parts[1:5])
        else:
            self._build_index()

    def _build_index(self) -> None:
        self._fh.seek(0)
        name = None
        length = offset = linebases = linewidth = 0
        pos = 0
        for raw in self._fh:
            if raw.startswith(b">"):
                if name is not None:
                    self.index[name] = (length, offset, linebases, linewidth)
                name = raw[1:].split()[0].decode()
                pos += len(raw)
                offset = pos
                length = linebases = linewidth = 0
            else:
                stripped = len(raw.rstrip(b"\r\n"))
                if linebases == 0:
                    linebases = stripped
                    linewidth = len(raw)
                length += stripped
                pos += len(raw)
        if name is not None:
            self.index[name] = (length, offset, linebases, linewidth)

    def names(self) -> list[str]:
        return list(self.index)

    def length(self, name: str) -> int:
        return self.index[name][0]

    def fetch(self, name: str, start: int = 0, end: int | None = None) -> np.ndarray:
        """Uppercased sequence slice as ASCII uint8 array, [start, end)."""
        length, offset, linebases, linewidth = self.index[name]
        start = max(0, start)
        end = length if end is None else min(end, length)
        if start >= end:
            return np.empty(0, dtype=np.uint8)
        byte_start = offset + (start // linebases) * linewidth + start % linebases
        byte_end = offset + ((end - 1) // linebases) * linewidth + (end - 1) % linebases + 1
        self._fh.seek(byte_start)
        raw = self._fh.read(byte_end - byte_start)
        arr = np.frombuffer(raw, dtype=np.uint8)
        arr = arr[(arr != 10) & (arr != 13)]  # strip newlines
        # uppercase a-z
        arr = np.where((arr >= 97) & (arr <= 122), arr - 32, arr)
        return arr.astype(np.uint8)

    def fetch_str(self, name: str, start: int = 0, end: int | None = None) -> str:
        return self.fetch(name, start, end).tobytes().decode()
