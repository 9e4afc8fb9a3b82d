"""The full reference flag surface is wired: every long flag in the
reference's generated advanced-usage doc exists somewhere in our CLI
(VERDICT r4 #7 done-criterion: the flag diff returns empty)."""

import re


def test_all_reference_flags_exist():
    from modkit_tpu.cli import build_parser

    text = open("/root/reference/book/src/advanced_usage.md").read()
    # underscores: the reference exposes --min_refine_frac_mod verbatim
    ref_flags = set(re.findall(r"--[a-z0-9][a-z0-9_-]+", text))
    ours = set()

    def walk(parser):
        for a in parser._actions:
            for s in a.option_strings:
                if s.startswith("--"):
                    ours.add(s)
            if hasattr(a, "choices") and isinstance(a.choices, dict):
                for sub in a.choices.values():
                    walk(sub)

    walk(build_parser())
    missing = sorted(ref_flags - ours)
    assert not missing, f"reference flags absent from the CLI: {missing}"
    assert len(ref_flags) >= 150  # guard against the doc moving
