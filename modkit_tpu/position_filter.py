"""BED-driven stranded include/exclude position masks.

Equivalent of reference StrandedPositionFilter (position_filter.rs:21):
per-(tid, strand) merged interval sets from a BED3/BED6 file. BED3 rows
apply to both strands; BED6 uses column 6 ('.' = both). 4/5-column rows are
skipped (position_filter.rs:292).
"""

from __future__ import annotations

import numpy as np


def _merge(ivs: list[tuple[int, int]]) -> np.ndarray:
    if not ivs:
        return np.empty((0, 2), dtype=np.int64)
    ivs.sort()
    out = [list(ivs[0])]
    for s, e in ivs[1:]:
        if s < out[-1][1]:
            out[-1][1] = max(out[-1][1], e)
        else:
            out.append([s, e])
    return np.array(out, dtype=np.int64)


class StrandedPositionFilter:
    def __init__(self, pos: dict, neg: dict):
        # {tid: [n,2] merged interval array}
        self.pos = pos
        self.neg = neg

    @classmethod
    def from_bed_file(cls, bed_fp: str, chrom_to_tid: dict) -> "StrandedPositionFilter":
        pos: dict[int, list] = {}
        neg: dict[int, list] = {}
        n_valid = 0
        with open(bed_fp) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                parts = line.split()
                if len(parts) < 3:
                    continue
                tid = chrom_to_tid.get(parts[0])
                if tid is None:
                    continue
                try:
                    start, end = int(parts[1]), int(parts[2])
                except ValueError:
                    continue
                if len(parts) == 3:
                    p, n = True, True
                elif len(parts) >= 6:
                    if parts[5] == "+":
                        p, n = True, False
                    elif parts[5] == "-":
                        p, n = False, True
                    elif parts[5] == ".":
                        p, n = True, True
                    else:
                        continue
                else:
                    continue
                if p:
                    pos.setdefault(tid, []).append((start, end))
                if n:
                    neg.setdefault(tid, []).append((start, end))
                n_valid += 1
        if n_valid == 0:
            raise ValueError("zero valid positions parsed from BED file")
        return cls(
            {t: _merge(v) for t, v in pos.items()},
            {t: _merge(v) for t, v in neg.items()},
        )

    def _contains(self, table: dict, tid: int, position) -> np.ndarray:
        ivs = table.get(tid)
        position = np.atleast_1d(np.asarray(position, dtype=np.int64))
        if ivs is None or not len(ivs):
            return np.zeros(len(position), dtype=bool)
        idx = np.searchsorted(ivs[:, 0], position, side="right") - 1
        ok = idx >= 0
        idxc = np.clip(idx, 0, len(ivs) - 1)
        return ok & (position < ivs[idxc, 1])

    def contains(self, tid: int, position, strand: int) -> np.ndarray:
        """Vectorized membership; strand 0 = '+', 1 = '-'."""
        return self._contains(self.pos if strand == 0 else self.neg, tid, position)

    def rule_array(self, tid: int, start: int, end: int) -> np.ndarray:
        """int8 [end-start]: -1 none, 0 pos-only, 1 neg-only, 2 both."""
        positions = np.arange(start, end, dtype=np.int64)
        p = self.contains(tid, positions, 0)
        n = self.contains(tid, positions, 1)
        rule = np.full(end - start, -1, dtype=np.int8)
        rule[p & ~n] = 0
        rule[~p & n] = 1
        rule[p & n] = 2
        return rule

    def optimize_spans(self, spans):
        """Shrink (tid, start, end) work spans to BED-covered ranges
        (position_filter.rs:147 optimize_reference_records)."""
        out = []
        for tid, start, end in spans:
            ivs = [self.pos.get(tid), self.neg.get(tid)]
            lo, hi = None, None
            for arr in ivs:
                if arr is not None and len(arr):
                    lo = int(arr[0, 0]) if lo is None else min(lo, int(arr[0, 0]))
                    hi = int(arr[-1, 1]) if hi is None else max(hi, int(arr[-1, 1]))
            if lo is None:
                continue
            s, e = max(start, lo), min(end, hi)
            if s < e:
                out.append((tid, s, e))
        return out
