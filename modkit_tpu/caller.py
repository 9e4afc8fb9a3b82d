"""Threshold-based modification calling configuration.

Host-side representation of the reference's ``MultipleThresholdModCaller``
(threshold_mod_caller.rs:7-63). The actual per-call argmax/threshold math
runs on device (see ops/pileup_counts.py); this class resolves the threshold
lookup chain into dense arrays the kernel can index:

    per-mod threshold lookup order (threshold_mod_caller.rs:34-42):
      per_mod[code] -> per_mod[any_mod_code(base)] -> per_base[base] -> default
    canonical threshold (threshold_mod_caller.rs:52-55):
      per_base[base] -> default

Call semantics (threshold_mod_caller.rs:28-63): every mod class whose
probability passes its threshold is a candidate; canonical is a candidate if
``1 - sum(probs)`` passes the base threshold. The winner is the candidate
with max probability; on ties canonical wins (it is pushed last and Rust's
``Iterator::max`` keeps the last maximum). If no candidate passes, the call
is Filtered.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .modcodes import DNA_BASES, any_mod_code


@dataclass
class ThresholdCaller:
    per_base: dict = field(default_factory=dict)  # base char -> f32
    per_mod: dict = field(default_factory=dict)  # mod code -> f32
    default_threshold: float = 0.0

    @classmethod
    def passthrough(cls) -> "ThresholdCaller":
        """No filtering: every call passes (threshold_mod_caller.rs:16)."""
        return cls({}, {}, 0.0)

    def mod_threshold(self, code, base: str) -> float:
        t = self.per_mod.get(code)
        if t is None:
            t = self.per_mod.get(any_mod_code(base))
        if t is None:
            t = self.per_base.get(base)
        if t is None:
            t = self.default_threshold
        return float(t)

    def canonical_threshold(self, base: str) -> float:
        return float(self.per_base.get(base, self.default_threshold))

    def threshold_arrays(self, codes: list) -> tuple[np.ndarray, np.ndarray]:
        """(thr_mod [M, 4], thr_can [4]) resolved for a code vocabulary."""
        m = len(codes)
        thr_mod = np.zeros((max(m, 1), 4), dtype=np.float32)
        for j, code in enumerate(codes):
            for b, base in enumerate(DNA_BASES):
                thr_mod[j, b] = self.mod_threshold(code, base)
        thr_can = np.array(
            [self.canonical_threshold(b) for b in DNA_BASES], dtype=np.float32
        )
        return thr_mod, thr_can

    # ---- scalar reference implementation (for host paths and tests) ----

    def call(self, base: str, probs: dict, inferred: bool = False):
        """Return ('canonical', p) | ('mod', p, code) | ('filtered',).

        ``probs``: mapping code -> prob, in candidate (insertion) order.
        """
        best = None  # (p, kind_rank, code); later candidates win ties
        for code, p in probs.items():
            if p >= self.mod_threshold(code, base):
                if best is None or p >= best[0]:
                    best = (p, "mod", code)
        canon = np.float32(1.0) - np.float32(sum(np.float32(p) for p in probs.values()))
        if canon >= self.canonical_threshold(base):
            if best is None or canon >= best[0]:
                best = (float(canon), "canonical", None)
        if best is None:
            return ("filtered",)
        if best[1] == "canonical":
            return ("canonical", best[0])
        return ("mod", best[0], best[2])
