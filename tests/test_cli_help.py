"""Every subcommand's --help renders (the reference runs --help smoke
tests across its CLI surface: test_pileup_help, test_extract_help,
test_dmr_helps, test_modbam_helps, ...)."""

import pytest

from modkit_tpu.cli import main

TOP = [
    ["pileup"], ["summary"], ["sample-probs"], ["adjust-mods"],
    ["call-mods"], ["update-tags"], ["extract", "full"],
    ["extract", "calls"], ["dmr", "pair"], ["dmr", "multi"],
    ["entropy"], ["find-motifs"], ["motif", "search"], ["motif", "refine"],
    ["motif", "evaluate"], ["motif", "bed"], ["validate"], ["localize"],
    ["stats"], ["repair"], ["pileup-hemi"], ["modbam", "check-tags"],
    ["bedmethyl", "merge"], ["bedmethyl", "tobigwig"],
]


@pytest.mark.parametrize("cmd", TOP, ids=lambda c: "_".join(c))
def test_subcommand_help(cmd):
    with pytest.raises(SystemExit) as e:
        main(cmd + ["--help"])
    assert e.value.code == 0


def test_top_level_help():
    with pytest.raises(SystemExit) as e:
        main(["--help"])
    assert e.value.code == 0
