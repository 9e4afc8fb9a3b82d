"""validate: contingency tables, balancing, threshold/accuracy plumbing."""

import numpy as np
import pytest

RES = "/root/reference/tests/resources"
BAM = f"{RES}/bc_anchored_10_reads.sorted.bam"


def _parse_out(path):
    out = {}
    for line in open(path):
        key, val = line.rstrip("\n").split(": ", 1)
        out[key] = val
    return out


def test_validate_two_samples(tmp_path):
    """Both a modified and canonical ground truth (mirrors the shape of
    tests/test_validate.rs; its exact fixture BAMs are not shipped)."""
    from modkit_tpu.cli import main

    out = tmp_path / "val.tsv"
    rc = main(
        [
            "validate",
            "--bam-and-bed", BAM, f"{RES}/CGI_ladder_3.6kb_ref_CG_5mC.bed",
            "--bam-and-bed", BAM, f"{RES}/CGI_ladder_3.6kb_ref_CG_C.bed",
            "-o", str(out),
        ]
    )
    assert rc == 0
    vals = _parse_out(str(out))
    assert set(vals) == {
        "full_contingency_table", "raw_accuracy", "raw_contingency_table",
        "filter_threshold", "percent_of_mod_called_removed",
        "filtered_accuracy", "filtered_contingency_table",
    }
    raw_acc = float(vals["raw_accuracy"])
    filt_acc = float(vals["filtered_accuracy"])
    assert 0.0 <= raw_acc <= 100.0
    assert 0.0 <= filt_acc <= 100.0
    # filtering should not reduce accuracy on this data
    assert filt_acc >= raw_acc - 5.0
    # raw table: parse and check balancing invariant
    import json

    tbl = json.loads(vals["raw_contingency_table"])
    header, rows = tbl[0], tbl[1:]
    assert header[0] == "ground_truth_label"
    # ground truths are '-' (C) and m
    gt_labels = [r[0] for r in rows]
    assert set(gt_labels) == {"C", "m"}
    totals = {r[0]: sum(r[1:]) for r in rows}
    # balanced: each ground-truth class has the same total
    assert len(set(totals.values())) == 1


def test_validate_fixed_threshold(tmp_path):
    from modkit_tpu.cli import main

    out = tmp_path / "val.tsv"
    rc = main(
        [
            "validate",
            "--bam-and-bed", BAM, f"{RES}/CGI_ladder_3.6kb_ref_CG_5mC.bed",
            "--filter-threshold", "0.9",
            "-o", str(out),
        ]
    )
    assert rc == 0
    vals = _parse_out(str(out))
    assert vals["filter_threshold"] == "0.9"


def test_balance_ground_truth():
    from modkit_tpu.engines.validate import balance_ground_truth

    probs = {
        (("mod", "m"), ("mod", "m")): [0.9] * 80,
        (("mod", "m"), ("canonical",)): [0.8] * 20,
        (("canonical",), ("canonical",)): [0.7] * 50,
    }
    balance_ground_truth(probs)
    gt_m = len(probs[(("mod", "m"), ("mod", "m"))]) + len(
        probs[(("mod", "m"), ("canonical",))]
    )
    gt_c = len(probs[(("canonical",), ("canonical",))])
    assert gt_c == 50
    assert gt_m == 50


def test_ground_truth_parsing():
    from modkit_tpu.engines.validate import (
        derive_canonical_base,
        parse_ground_truth_bed,
    )

    gt = parse_ground_truth_bed(f"{RES}/CGI_ladder_3.6kb_ref_CG_5mC.bed")
    assert "oligo_1512_adapters" in gt
    strands = gt["oligo_1512_adapters"]
    assert strands["+"][9] == ("mod", "m")
    assert strands["-"][10] == ("mod", "m")
    assert derive_canonical_base([gt], None) == "C"
    gt_c = parse_ground_truth_bed(f"{RES}/CGI_ladder_3.6kb_ref_CG_C.bed")
    assert gt_c["oligo_1512_adapters"]["+"][9] == ("canonical",)
