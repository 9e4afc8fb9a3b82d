"""MM/ML/MN tag decoding: the per-read base-modification data model.

This is a from-scratch, numpy-vectorized implementation of the SAM-spec
base-modification tag semantics that the reference implements record-by-
record in ``src/mod_bam.rs``:

- ``MmTagInfo::parse`` (mod_bam.rs:909): sub-tag headers like ``C+h?`` /
  ``C+hm.`` / ``C+21839?`` with ChEBI numeric codes and ``?``/``.`` modes.
- ``DeltaListConverter`` (mod_bam.rs:659): delta lists <-> forward-sequence
  positions via cumulative base counts; here via flatnonzero + fancy index.
- ``get_base_mod_probs`` (mod_bam.rs:1213): ML byte -> probability
  ``(q + 0.5) / 256`` (mod_bam.rs:808) and **implicit-canonical inference**
  for ``.``/default modes (mod_bam.rs:1265-1292).
- ``combine_positions_to_probs`` / ``combine_checked`` (mod_bam.rs:626-658,
  1041-1057): merging multiple sub-tags with conflict checks
  (sum > 1.01 = MAX_PROB, explicit-vs-inferred mismatch).
- ``format_mm_ml_tag`` (mod_bam.rs:1299): re-encoding for modBAM rewriting.

Positions are *forward-sequence* (instrument orientation) coordinates.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from . import modcodes
from .errors import (
    CONFLICT_INFERRED, CONFLICT_PROB_GT_ONE, INVALID_ML, INVALID_MM,
    INVALID_MN, ML_MISSING, MM_MISSING, NON_PRIMARY_MISSING_MN,
    ModKitError,
)
from .modcodes import ModCode, mod_code_sort_key

MAX_PROB = np.float32(1.01)  # mod_bam.rs:26

# skip modes (mod_bam.rs:326 SkipMode)
EXPLICIT = "?"
IMPLICIT = "."
DEFAULT_IMPLICIT = "default"


def skip_mode_is_implicit(mode: str) -> bool:
    return mode != EXPLICIT


_BASE_BYTES = {"A": ord("A"), "C": ord("C"), "G": ord("G"), "T": ord("T")}


@dataclass
class MmSubTag:
    """One ``;``-separated element of the MM tag (mod_bam.rs:856 MmTagInfo)."""

    fundamental_base: str  # A C G T U N
    mod_strand: int  # 0 = '+', 1 = '-'
    mode: str  # EXPLICIT / IMPLICIT / DEFAULT_IMPLICIT
    codes: list  # list[ModCode]
    deltas: np.ndarray  # uint32

    @property
    def stride(self) -> int:
        return len(self.codes)

    @property
    def size(self) -> int:
        return len(self.deltas) * len(self.codes)


def parse_mm_subtag(raw: str) -> MmSubTag:
    """Parse one MM sub-tag, e.g. ``C+hm?,0,2,3`` (mod_bam.rs:909)."""
    head_end = raw.find(",")
    header = raw if head_end < 0 else raw[:head_end]
    if len(header) < 2:
        raise ModKitError(INVALID_MM, f"truncated MM header {raw[:40]!r}")
    base = header[0]
    if base not in "ACGTUN":
        raise ModKitError(INVALID_MM, f"invalid fundamental base {base!r}")
    strand_ch = header[1]
    if strand_ch == "+":
        strand = 0
    elif strand_ch == "-":
        strand = 1
    else:
        raise ModKitError(INVALID_MM, f"invalid strand {strand_ch!r}")

    body = header[2:]
    codes: list[ModCode] = []
    mode = DEFAULT_IMPLICIT
    i = 0
    if i < len(body) and body[i].isdigit():
        # ChEBI numeric code; cannot be combined with char codes
        j = i
        while j < len(body) and body[j].isdigit():
            j += 1
        codes.append(int(body[i:j]))
        i = j
        while i < len(body):
            c = body[i]
            if c in "?.":
                mode = c
            elif c.isdigit():
                raise ModKitError(INVALID_MM, "cannot have a second ChEBI code")
            else:
                raise ModKitError(
                    INVALID_MM, "cannot combine ChEBI and char codes"
                )
            i += 1
    else:
        while i < len(body):
            c = body[i]
            if c in "?.":
                mode = c
            elif c.isdigit():
                raise ModKitError(INVALID_MM, "digit mod code is illegal here")
            else:
                codes.append(c)
            i += 1

    if head_end < 0:
        deltas = np.empty(0, dtype=np.int64)
    else:
        tail = raw[head_end + 1 :]
        if not tail:
            deltas = np.empty(0, dtype=np.int64)
        else:
            # fast path: C-level text parse; np.fromstring silently stops
            # at the first invalid token, so verify the count and fall
            # back to the strict parser for the error message
            import warnings

            with warnings.catch_warnings():
                warnings.simplefilter("ignore", DeprecationWarning)
                deltas = np.fromstring(tail, dtype=np.int64, sep=",")
            if len(deltas) != tail.count(",") + 1 or (deltas < 0).any():
                try:
                    deltas = np.array(tail.split(","), dtype=np.int64)
                    if (deltas < 0).any():
                        raise ValueError("negative delta")
                except ValueError as e:
                    raise ModKitError(INVALID_MM, f"invalid delta list: {e}")
    return MmSubTag(base, strand, mode, codes, deltas)


def parse_mm_tag(raw: str) -> list[MmSubTag]:
    return [parse_mm_subtag(part) for part in raw.split(";") if part]


def deltas_to_positions(
    deltas: np.ndarray, fundamental_base: str, fwd_seq: np.ndarray,
    base_positions: np.ndarray | None = None,
) -> np.ndarray:
    """Delta list -> forward-seq positions (mod_bam.rs:694 to_positions).

    ``base_positions`` may be precomputed ``flatnonzero(fwd_seq == base)``.
    """
    if len(deltas) == 0:
        return np.empty(0, dtype=np.int64)
    if fundamental_base == "N":
        pos = np.cumsum(deltas) + np.arange(len(deltas))
        if (pos >= len(fwd_seq)).any():
            raise ModKitError(INVALID_MM, "delta list beyond end of seq")
        return pos
    if base_positions is None:
        base_positions = base_occurrence_positions(fwd_seq, fundamental_base)
    occ = np.cumsum(deltas + 1) - 1
    if len(base_positions) == 0 or occ[-1] >= len(base_positions):
        raise ModKitError(INVALID_MM, "delta list beyond end of seq")
    return base_positions[occ]


def base_occurrence_positions(fwd_seq: np.ndarray, base: str) -> np.ndarray:
    """Positions of ``base`` in the forward sequence (U matches T)."""
    b = "T" if base == "U" else base
    return np.flatnonzero(fwd_seq == _BASE_BYTES[b])


def positions_to_deltas(
    positions: np.ndarray, base_positions: np.ndarray
) -> np.ndarray:
    """Inverse transform (mod_bam.rs:733 to_delta_list). ``positions`` sorted."""
    occ = np.searchsorted(base_positions, positions)
    return np.diff(occ, prepend=-1) - 1


def quals_to_probs(quals: np.ndarray) -> np.ndarray:
    """ML byte -> prob, f32 ``(q + 0.5)/256`` (mod_bam.rs:808); exact in f32."""
    return (quals.astype(np.float32) + np.float32(0.5)) / np.float32(256.0)


def prob_to_qual(prob: float) -> int:
    """prob -> ML byte (mod_bam.rs:798): 255 if exactly 1.0 else floor(p*256),
    saturating u8 cast."""
    p = np.float32(prob)
    if p == np.float32(1.0):
        return 255
    q = int(np.floor(p * np.float32(256.0)))
    return max(0, min(255, q))


def probs_to_quals(probs: np.ndarray) -> np.ndarray:
    p = probs.astype(np.float32)
    q = np.floor(p * np.float32(256.0)).astype(np.int64)
    q = np.clip(q, 0, 255)
    q[p == np.float32(1.0)] = 255
    return q.astype(np.uint8)


@dataclass
class ModProbGroup:
    """All base-mod probabilities for one (primary base, mod strand) of a read.

    Equivalent of reference ``SeqPosBaseModProbs`` (mod_bam.rs:1059) with the
    per-position ``BaseModProbs`` maps flattened into a dense [n, m] matrix.

    probs[i, j] semantics: -1.0 = code j absent at position i (not a call
    candidate); >= 0.0 = probability of code j at position i. Canonical prob
    at i is ``1 - sum(max(probs[i], 0))``.
    """

    base: str  # primary DNA base of the calls ('A'/'C'/'G'/'T')
    mod_strand: int  # 0 = same strand as the read, 1 = opposite (duplex)
    skip_mode: str
    codes: list  # column order = insertion order (tie-break order)
    positions: np.ndarray  # int64, sorted ascending, forward-seq coords
    probs: np.ndarray  # float32 [n, m]
    inferred: np.ndarray  # bool [n]

    def is_empty(self) -> bool:
        return len(self.positions) == 0

    def canonical_probs(self) -> np.ndarray:
        return np.float32(1.0) - np.clip(self.probs, 0, None).sum(
            axis=1, dtype=np.float32
        )

    def code_set(self) -> set:
        return set(self.codes)

    def present_codes_per_position(self) -> np.ndarray:
        return self.probs >= 0


class ModBaseInfo:
    """Decoded modification info for one read (mod_bam.rs:1470 ModBaseInfo).

    ``groups`` maps (primary_base, mod_strand) -> ModProbGroup, where
    primary_base is the DNA base the probabilities are anchored to in
    forward-sequence space (the tag's fundamental base, or the actual
    sequence base for N-fundamental tags).
    """

    def __init__(self, groups: dict):
        self.groups = groups

    def is_empty(self) -> bool:
        return all(g.is_empty() for g in self.groups.values())

    def iter_groups(self):
        """Positive mod-strand groups then negative (mod_bam.rs:1584)."""
        for strand in (0, 1):
            for (base, s), g in self.groups.items():
                if s == strand:
                    yield base, strand, g


def decode_read_mods(
    fwd_seq: np.ndarray,
    raw_mm: str,
    raw_ml: np.ndarray,
) -> ModBaseInfo:
    """Decode MM/ML into per-(base, strand) probability groups.

    Mirrors ModBaseInfo::new (mod_bam.rs:1489-1566): iterate sub-tags with a
    running ML pointer, convert deltas to positions, group by actual
    sequence base, apply implicit-canonical inference, merge groups from
    multiple sub-tags with conflict checks.
    """
    subtags = parse_mm_tag(raw_mm)
    ml = np.asarray(raw_ml, dtype=np.uint16)

    # pieces[(base, strand)] -> list of piece dicts to merge
    pieces: dict[tuple[str, int], list[dict]] = {}
    base_pos_cache: dict[str, np.ndarray] = {}

    pointer = 0
    for st in subtags:
        fb = st.fundamental_base
        if fb not in base_pos_cache and fb != "N":
            base_pos_cache[fb] = base_occurrence_positions(fwd_seq, fb)
        positions = deltas_to_positions(
            st.deltas, fb, fwd_seq, base_pos_cache.get(fb)
        )
        end = pointer + st.size
        if end > len(ml):
            raise ModKitError(
                INVALID_ML, f"ML array too short, need {end} have {len(ml)}"
            )
        probs = quals_to_probs(ml[pointer:end]).reshape(-1, st.stride)
        pointer = end

        # group explicit positions by their actual sequence base
        if len(positions):
            seq_bases = fwd_seq[positions]
        else:
            seq_bases = np.empty(0, dtype=np.uint8)
        target_bases: dict[str, np.ndarray] = {}
        if fb == "N":
            for b in "ACGT":
                mask = seq_bases == _BASE_BYTES[b]
                if mask.any():
                    target_bases[b] = mask
            n_known = sum(int(m.sum()) for m in target_bases.values())
            if n_known != len(positions):
                raise ModKitError(
                    INVALID_MM, "mod position on non-ACGT sequence base"
                )
        else:
            b = "T" if fb == "U" else fb
            if len(positions) and not (seq_bases == _BASE_BYTES[b]).all():
                raise ModKitError(
                    INVALID_MM,
                    f"delta-list position does not fall on a {b} base",
                )
            target_bases[b] = np.ones(len(positions), dtype=bool)

        for b, mask in target_bases.items():
            pieces.setdefault((b, st.mod_strand), []).append(
                dict(
                    mode=st.mode,
                    codes=list(st.codes),
                    positions=positions[mask],
                    probs=probs[mask],
                    inferred=np.zeros(int(mask.sum()), dtype=bool),
                )
            )

        # implicit-canonical inference (mod_bam.rs:1265-1292): every
        # occurrence of the fundamental base not already explicit becomes an
        # inferred-unmodified position with prob 0 for all sub-tag codes.
        if skip_mode_is_implicit(st.mode) and fb != "N":
            b = "T" if fb == "U" else fb
            all_pos = base_pos_cache[fb]
            explicit = positions
            inferred_pos = np.setdiff1d(all_pos, explicit, assume_unique=True)
            if len(inferred_pos):
                pieces.setdefault((b, st.mod_strand), []).append(
                    dict(
                        mode=st.mode,
                        codes=list(st.codes),
                        positions=inferred_pos,
                        probs=np.zeros(
                            (len(inferred_pos), st.stride), dtype=np.float32
                        ),
                        inferred=np.ones(len(inferred_pos), dtype=bool),
                    )
                )

    groups: dict[tuple[str, int], ModProbGroup] = {}
    for key, plist in pieces.items():
        groups[key] = _merge_pieces(key, plist)
    return ModBaseInfo(groups)


def _merge_pieces(key: tuple[str, int], plist: list[dict]) -> ModProbGroup:
    """Merge sub-tag pieces for one (base, strand) with conflict checks
    (combine_positions_to_probs, mod_bam.rs:1041; combine_checked :626)."""
    base, strand = key
    # resulting skip mode: first piece's mode; if any differ -> ImplicitUnmodified
    modes = [p["mode"] for p in plist]
    mode = modes[0]
    if any(m != mode for m in modes):
        mode = IMPLICIT

    codes: list[ModCode] = []
    code_idx: dict[ModCode, int] = {}
    for p in plist:
        for c in p["codes"]:
            if c not in code_idx:
                code_idx[c] = len(codes)
                codes.append(c)

    if len(plist) == 1:
        p = plist[0]
        order = np.argsort(p["positions"], kind="stable")
        return ModProbGroup(
            base, strand, mode, codes,
            p["positions"][order].astype(np.int64),
            np.ascontiguousarray(p["probs"][order], dtype=np.float32),
            p["inferred"][order],
        )

    all_pos = np.concatenate([p["positions"] for p in plist])
    union = np.unique(all_pos)
    m = len(codes)
    probs = np.full((len(union), m), -1.0, dtype=np.float32)
    inferred = np.zeros(len(union), dtype=bool)
    seen = np.zeros(len(union), dtype=bool)
    multi = np.zeros(len(union), dtype=bool)

    for p in plist:
        if len(p["positions"]) == 0:
            continue
        rows = np.searchsorted(union, p["positions"])
        clash = seen[rows]
        # explicit/inferred flag mismatch at a shared position -> conflict
        if clash.any():
            if (inferred[rows[clash]] != p["inferred"][clash]).any():
                raise ModKitError(
                    CONFLICT_INFERRED,
                    "position is explicit in one sub-tag, inferred in another",
                )
        inferred[rows[~clash]] = p["inferred"][~clash]
        multi[rows] |= clash
        seen[rows] = True
        for j, c in enumerate(p["codes"]):
            col = code_idx[c]
            cur = probs[rows, col]
            add = p["probs"][:, j]
            probs[rows, col] = np.where(cur < 0, add, cur + add)

    if multi.any():
        sums = np.clip(probs[multi], 0, None).sum(axis=1, dtype=np.float32)
        if (sums > MAX_PROB).any():
            raise ModKitError(
                CONFLICT_PROB_GT_ONE, "combined probability greater than one"
            )
    return ModProbGroup(
        base, strand, mode, codes, union.astype(np.int64), probs, inferred
    )


def parse_raw_mod_tags(rec) -> tuple[str, np.ndarray, str, str]:
    """Extract (mm_string, ml_array, mm_style, ml_style) from a BamRecord,
    validating MN (mod_bam.rs:1455 parse_raw_mod_tags)."""
    mm = rec.get_aux("MM")
    mm_style = "MM"
    if mm is None:
        mm = rec.get_aux("Mm")
        mm_style = "Mm"
    if mm is None or mm[0] not in ("Z",):
        if mm is None:
            raise ModKitError(MM_MISSING, "MM tag missing")
        raise ModKitError(INVALID_MM, "MM tag wrong type")
    ml = rec.get_aux("ML")
    ml_style = "ML"
    if ml is None:
        ml = rec.get_aux("Ml")
        ml_style = "Ml"
    if ml is None or not ml[0].startswith("B") or ml[0] != "BC":
        if ml is None:
            raise ModKitError(ML_MISSING, "ML tag missing")
        raise ModKitError(INVALID_ML, "ML tag wrong type")
    mn = rec.get_aux("MN")
    if mn is not None:
        if mn[0] not in ("c", "C", "s", "S", "i", "I"):
            raise ModKitError(INVALID_MN, "MN tag wrong type")
        if int(mn[1]) != rec.l_seq:
            raise ModKitError(
                INVALID_MN,
                f"MN tag length {mn[1]} and seq length {rec.l_seq} don't match",
            )
    elif rec.is_not_primary:
        raise ModKitError(
            NON_PRIMARY_MISSING_MN, "non-primary record missing MN tag"
        )
    return mm[1], np.asarray(ml[1], dtype=np.uint16), mm_style, ml_style


def decode_record(rec) -> ModBaseInfo:
    """BamRecord -> ModBaseInfo (mod_bam.rs:1481 new_from_record)."""
    raw_mm, raw_ml, _, _ = parse_raw_mod_tags(rec)
    return decode_read_mods(rec.forward_seq(), raw_mm, raw_ml)


# ------------------------------------------------------------- re-encoding

def format_mm_ml(
    group: ModProbGroup,
    fwd_seq: np.ndarray,
    base_positions: np.ndarray | None = None,
) -> tuple[str, np.ndarray]:
    """Re-encode one group to (mm_string, ml_bytes) (mod_bam.rs:1299).

    Inferred positions are not written in implicit modes; sub-tags are
    emitted per mod code sorted by (code, strand), positions ascending.
    """
    if base_positions is None:
        base_positions = base_occurrence_positions(fwd_seq, group.base)
    mode_label = {EXPLICIT: "?", IMPLICIT: ".", DEFAULT_IMPLICIT: ""}[
        group.skip_mode
    ]
    strand_ch = "+" if group.mod_strand == 0 else "-"
    implicit = skip_mode_is_implicit(group.skip_mode)

    write_mask = ~(group.inferred & implicit)
    mm_parts: list[str] = []
    ml: list[np.ndarray] = []
    any_entry = False
    for code in sorted(group.codes, key=mod_code_sort_key):
        col = group.codes.index(code)
        present_col = group.probs[:, col] >= 0
        if not present_col.any():
            # code never appears at any position -> no sub-tag entry
            continue
        any_entry = True
        written = present_col & write_mask
        pos = group.positions[written]
        header = f"{group.base}{strand_ch}{code}{mode_label}"
        if len(pos) == 0:
            # code only at inferred positions: bare header, keeps the code
            # and mode in the tag (mod_bam.rs:1310-1317, 1352-1366)
            mm_parts.append(header + ";")
            continue
        deltas = positions_to_deltas(pos, base_positions)
        mm_parts.append(
            header + "," + ",".join(str(int(d)) for d in deltas) + ";"
        )
        ml.append(probs_to_quals(group.probs[written, col]))
    if not any_entry:
        # no codes at all: "any mod" char for the base (mod_bam.rs:1332-1340)
        mm_parts.append(
            f"{group.base}{strand_ch}{modcodes.any_mod_code(group.base)}"
            f"{mode_label};"
        )
    ml_arr = (
        np.concatenate(ml) if ml else np.empty(0, dtype=np.uint8)
    )
    return "".join(mm_parts), ml_arr
