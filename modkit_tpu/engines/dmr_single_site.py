"""Single-site DMR (no --regions): per-position scores, MAP-based p-values
via the Beta-difference distribution, and HMM segmentation.

Reference: src/dmr/single_site.rs, src/dmr/beta_diff.rs, src/hmm.rs.
"""

from __future__ import annotations


def run_single_site(args, code_lookup) -> int:
    raise SystemExit("dmr single-site mode is not implemented yet")
