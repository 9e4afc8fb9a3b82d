"""Typed error taxonomy for per-record skip/fail accounting.

Mirrors the behavior of reference ``src/errs.rs``: decode failures are
counted per error kind and the record is skipped, not fatal (see reference
``mod_bam.rs:27-121`` TrackingModRecordIter).
"""

from __future__ import annotations

from collections import Counter


class ModKitError(Exception):
    """Error with a short machine-readable kind used for error tables."""

    def __init__(self, kind: str, message: str = ""):
        super().__init__(message or kind)
        self.kind = kind


# canonical kinds (errs.rs:6-82)
MM_MISSING = "MM-tag-missing"
ML_MISSING = "ML-tag-missing"
INVALID_MM = "invalid-MM-tag"
INVALID_ML = "invalid-ML-tag"
INVALID_MN = "invalid-MN-tag"
NON_PRIMARY_MISSING_MN = "non-primary-missing-MN"
CONFLICT_PROB_GT_ONE = "conflict-probability-greater-than-one"
CONFLICT_INFERRED = "conflict-explicit-prob-and-inferred"
NO_MOD_INFO = "no-modified-base-information"
INVALID_IMPLICIT_MODE = "invalid-implicit-mode"
INVALID_RECORD_NAME = "invalid-record-name"
INVALID_SEQUENCE = "invalid-sequence"
EMPTY_SEQUENCE = "empty-sequence"


class ErrorTally(Counter):
    """Per-kind error counts; printed as a table at end of commands
    (reference commands.rs:1361-1365 format_errors_table)."""

    def add(self, err: ModKitError) -> None:
        self[err.kind] += 1

    def format_table(self) -> str:
        if not self:
            return ""
        width = max(len(k) for k in self)
        lines = [f"{'error':<{width}}  count"]
        for kind, n in sorted(self.items(), key=lambda kv: (-kv[1], kv[0])):
            lines.append(f"{kind:<{width}}  {n}")
        return "\n".join(lines)
