"""IUPAC motif matching and per-tile focus positions.

From-scratch equivalent of the reference's RegexMotif machinery
(find_motifs/motif_bed.rs:66-338, find_motifs/iupac.rs) and FocusPositions
(interval_chunks.rs:32-408). Instead of overlapping regex scans we match
IUPAC classes with vectorized boolean masks over the reference slice —
every overlapping occurrence is found by construction.

A motif hit contributes its *focus position* (start + offset on the forward
strand; start + reverse offset on the reverse strand). Focus positions per
tile carry a strand rule (+/-/both) and per-strand motif-id lists used for
bedMethyl row labeling and strand combining.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

IUPAC = {
    "A": "A", "C": "C", "G": "G", "T": "T", "U": "T",
    "R": "AG", "Y": "CT", "S": "CG", "W": "AT", "K": "GT", "M": "AC",
    "B": "CGT", "D": "AGT", "H": "ACT", "V": "ACG", "N": "ACGT",
}
_COMP = {"A": "T", "C": "G", "G": "C", "T": "A"}


def _revcomp_classes(classes: list[frozenset]) -> list[frozenset]:
    return [frozenset(_COMP[b] for b in c) for c in reversed(classes)]


STRAND_POS, STRAND_NEG, STRAND_BOTH = 0, 1, 2


@dataclass(frozen=True)
class Motif:
    raw: str
    offset: int  # focus-base offset within the motif (forward strand)

    def __post_init__(self):
        for ch in self.raw:
            if ch not in IUPAC:
                raise ValueError(f"invalid IUPAC symbol {ch!r} in motif {self.raw}")
        if self.offset >= len(self.raw):
            raise ValueError(f"motif {self.raw} not long enough for offset {self.offset}")
        if len(self.raw) == 1 and self.raw not in "ACGT":
            raise ValueError(
                "degenerate bases are not supported as single base motifs"
            )

    @property
    def length(self) -> int:
        return len(self.raw)

    @property
    def forward_offset(self) -> int:
        return self.offset

    @property
    def reverse_offset(self) -> int:
        return len(self.raw) - self.offset - 1

    def classes(self) -> list[frozenset]:
        # memoized: per-window motif scans call this hundreds of
        # thousands of times (entropy sliding windows)
        c = getattr(self, "_classes", None)
        if c is None:
            c = [frozenset(IUPAC[ch]) for ch in self.raw]
            object.__setattr__(self, "_classes", c)
        return c

    def _rev_classes(self) -> list:
        r = getattr(self, "_revc", None)
        if r is None:
            r = _revcomp_classes(self.classes())
            object.__setattr__(self, "_revc", r)
        return r

    @property
    def is_palindrome(self) -> bool:
        """Motif equal to its own reverse complement (motif_bed.rs:225)."""
        return self.classes() == self._rev_classes()

    def negative_strand_position(self, positive_position: int) -> int | None:
        """Partner '-' strand focus position for a '+' hit (motif_bed.rs:126)."""
        if not self.is_palindrome:
            return None
        adj = positive_position + (self.reverse_offset - self.forward_offset)
        return adj if adj >= 0 else None

    def label(self) -> str:
        return f"{self.raw},{self.offset}"

    # --- matching ---

    def _match_starts(self, seq: np.ndarray, classes: list[frozenset]) -> np.ndarray:
        """Start indices where ``classes`` match ``seq`` (ASCII uint8)."""
        L = len(classes)
        n = len(seq)
        if n < L:
            return np.empty(0, dtype=np.int64)
        ok = np.ones(n - L + 1, dtype=bool)
        for j, cls in enumerate(classes):
            m = np.zeros(256, dtype=bool)
            for b in cls:
                m[ord(b)] = True
            ok &= m[seq[j : n - L + 1 + j]]
        return np.flatnonzero(ok)

    def find_hits(self, seq: np.ndarray) -> list[tuple[int, int]]:
        """All (focus_position, strand) hits in ``seq``; overlaps included.

        Mirrors find_motif_hits (motif_bed.rs:288-337): palindromes emit
        both strands per match ordered by offset; otherwise results are
        sorted by position.
        """
        fwd = self.classes()
        rev = self._rev_classes()
        out: list[tuple[int, int]] = []
        if self.is_palindrome:
            for s in self._match_starts(seq, fwd):
                a = (int(s) + self.forward_offset, STRAND_POS)
                b = (int(s) + self.reverse_offset, STRAND_NEG)
                out.extend((a, b) if self.forward_offset <= self.reverse_offset else (b, a))
        else:
            for s in self._match_starts(seq, fwd):
                out.append((int(s) + self.forward_offset, STRAND_POS))
            for s in self._match_starts(seq, rev):
                out.append((int(s) + self.reverse_offset, STRAND_NEG))
            out.sort(key=lambda x: x[0])
        return out


def parse_motifs(raw_parts: list[str], cpg: bool = False) -> list[Motif]:
    """--motif M OFFSET pairs + --cpg (motif_bed.rs:152 from_raw_parts)."""
    parts = list(raw_parts)
    if len(parts) % 2 != 0:
        raise ValueError("motif arguments must be <motif> <offset> pairs")
    pairs = [(parts[i], parts[i + 1]) for i in range(0, len(parts), 2)]
    if len(set(pairs)) != len(pairs):
        raise ValueError("cannot have the same motif more than once")
    if cpg and ("CG", "0") not in pairs:
        pairs.append(("CG", "0"))
    return [Motif(m, int(o)) for m, o in pairs]


@dataclass
class FocusPositions:
    """Focus positions for one genome tile (interval_chunks.rs:32).

    ``rule``: int8 [tile_len], -1 = not focus, else STRAND_POS/NEG/BOTH.
    ``pos_motif_ids``/``neg_motif_ids``: {absolute position: [motif ids]}.
    ``positive_motifs``: {absolute '+'-focus position: [(motif, id)]} for
    strand combining.
    """

    start: int
    rule: np.ndarray
    pos_motif_ids: dict
    neg_motif_ids: dict
    positive_motifs: dict


def _hits_to_focus(
    motifs: list[Motif],
    all_hits: list[list[tuple[int, int]]],
    offset: int,
    start: int,
    end: int,
    position_filter=None,
    tid: int | None = None,
) -> FocusPositions:
    """Build FocusPositions [start, end) from per-motif hit lists whose
    positions are relative to ``offset``."""
    p = end - start
    rule = np.full(p, -1, dtype=np.int8)
    pos_ids: dict[int, list] = {}
    neg_ids: dict[int, list] = {}
    positive_motifs: dict[int, list] = {}
    for mid, (motif, hits) in enumerate(zip(motifs, all_hits)):
        for fpos, strand in hits:
            abs_pos = offset + fpos
            if not (start <= abs_pos < end):
                continue
            if position_filter is not None and not bool(
                position_filter.contains(tid, abs_pos, strand)[0]
            ):
                continue
            li = abs_pos - start
            if rule[li] == -1:
                rule[li] = strand
            elif rule[li] != strand and rule[li] != STRAND_BOTH:
                rule[li] = STRAND_BOTH
            if strand == STRAND_POS:
                ids = pos_ids.setdefault(abs_pos, [])
                if mid not in ids:
                    ids.append(mid)
                    positive_motifs.setdefault(abs_pos, []).append((motif, mid))
            else:
                ids = neg_ids.setdefault(abs_pos, [])
                if mid not in ids:
                    ids.append(mid)
    return FocusPositions(start, rule, pos_ids, neg_ids, positive_motifs)


def scan_focus_positions(
    motifs: list[Motif],
    fasta,
    chrom: str,
    start: int,
    end: int,
    position_filter=None,
    tid: int | None = None,
) -> FocusPositions:
    """Non-combine-strands scan: exactly the [start, end) slice is searched
    (fasta.rs:204-229 get_motif_positions without combine), so motifs
    straddling a tile boundary are not matched — identical to the
    reference's behavior."""
    seq = fasta.fetch(chrom, start, end)
    hits = [m.find_hits(seq) for m in motifs]
    return _hits_to_focus(motifs, hits, start, start, end, position_filter, tid)


def scan_focus_positions_combine(
    motifs: list[Motif],
    fasta,
    chrom: str,
    tid: int,
    ref_end: int,
    start: int,
    end: int,
    position_filter=None,
) -> tuple[FocusPositions, int]:
    """Combine-strands scan with boundary extension (fasta.rs:96-188
    get_motif_positions_combine_strands).

    Fetches [start, end + 5*max_len) and extends the tile end to the stop of
    the merged motif-footprint interval overlapping the boundary, so motifs
    are never split between tiles. Returns (focus, new_end).
    """
    max_len = max(m.length for m in motifs)
    buffer_size = max_len * 5
    end_w_buffer = min(end + buffer_size, ref_end)
    too_close = max(end_w_buffer - max_len, 0)
    while True:
        seq = fasta.fetch(chrom, start, end_w_buffer)
        hits = [m.find_hits(seq) for m in motifs]
        # merged footprint intervals [pos, pos + (len - fwd_offset))
        ivs = []
        for motif, hlist in zip(motifs, hits):
            adj = motif.length - motif.forward_offset
            for fpos, _strand in hlist:
                a = start + fpos
                ivs.append((a, a + adj))
        search_end = end
        if ivs:
            ivs.sort()
            merged = [list(ivs[0])]
            for a, b in ivs[1:]:
                if a < merged[-1][1]:
                    merged[-1][1] = max(merged[-1][1], b)
                else:
                    merged.append([a, b])
            for a, b in merged:
                if a < end and b > end - 1:
                    search_end = b
                    break
        if search_end < too_close or end_w_buffer >= ref_end:
            focus = _hits_to_focus(
                motifs, hits, start, start, min(search_end, ref_end),
                position_filter, tid,
            )
            return focus, min(search_end, ref_end)
        end = end_w_buffer
        end_w_buffer = min(end_w_buffer + buffer_size, ref_end)
        too_close = max(end_w_buffer - max_len, 0)
