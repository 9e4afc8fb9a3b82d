"""Collapse/convert transforms over per-position mod probabilities.

Equivalent of reference ``CollapseMethod`` (mod_bam.rs:306) and
``BaseModProbs::into_collapsed`` (mod_bam.rs:530-626), vectorized over a
[n, m] probability matrix (-1 = absent class).

- ``norm`` (ReNormalize): remove class, renormalize the rest + canonical.
- ``dist`` (ReDistribute): remove class, split its mass evenly across the
  remaining classes + canonical (the canonical share simply vanishes since
  canonical is implicit 1 - sum).
- ``convert``: move probability mass from one set of codes to another code.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class CollapseMethod:
    kind: str  # "norm" | "dist" | "convert"
    codes: tuple  # codes to remove/convert-from
    to_code: object = None  # convert target

    @classmethod
    def parse(cls, raw: str, code) -> "CollapseMethod":
        if raw not in ("norm", "dist"):
            raise ValueError(f"invalid collapse method {raw!r}")
        return cls(raw, (code,))


def apply_collapse(
    codes: list, probs: np.ndarray, method: CollapseMethod
) -> tuple[list, np.ndarray]:
    """Return (new_codes, new_probs[n, m'])."""
    present = probs >= 0
    live = np.clip(probs, 0, None).astype(np.float32)

    if method.kind in ("norm", "dist"):
        drop = [j for j, c in enumerate(codes) if c in method.codes]
        if not drop:
            return codes, probs
        keep = [j for j in range(len(codes)) if j not in drop]
        new_codes = [codes[j] for j in keep]
        if method.kind == "norm":
            # total marginal prob of kept classes + canonical
            canonical = np.float32(1.0) - live.sum(axis=1, dtype=np.float32)
            kept_sum = live[:, keep].sum(axis=1, dtype=np.float32)
            denom = kept_sum + canonical
            with np.errstate(divide="ignore", invalid="ignore"):
                new = live[:, keep] / denom[:, None]
            new = new.astype(np.float32)
        else:  # dist: removed mass split over kept classes + canonical
            removed = live[:, drop].sum(axis=1, dtype=np.float32)
            share = removed / np.float32(len(keep) + 1)
            new = (live[:, keep] + share[:, None]).astype(np.float32)
        out = np.where(present[:, keep], new, np.float32(-1.0))
        return new_codes, out

    if method.kind == "convert":
        src = [j for j, c in enumerate(codes) if c in method.codes]
        if not src:
            return codes, probs
        keep = [j for j in range(len(codes)) if j not in src]
        new_codes = [codes[j] for j in keep]
        moved = live[:, src].sum(axis=1, dtype=np.float32)
        moved_present = present[:, src].any(axis=1)
        out = np.where(present[:, keep], live[:, keep], np.float32(-1.0))
        if method.to_code in new_codes:
            t = new_codes.index(method.to_code)
            cur = out[:, t]
            # add moved mass; treat absent target as 0 when mass arrives
            add_mask = moved_present & (moved > 0)
            newv = np.where(cur < 0, moved, cur + moved)
            out[:, t] = np.where(add_mask, newv, cur)
        else:
            # only create the target class where mass actually moved
            add_mask = moved_present & (moved > 0)
            if add_mask.any():
                new_codes = new_codes + [method.to_code]
                col = np.where(add_mask, moved, np.float32(-1.0))
                out = np.concatenate([out, col[:, None]], axis=1)
        return new_codes, out.astype(np.float32)

    raise ValueError(f"unknown collapse kind {method.kind}")
