"""sample-probs --hist histogram TSV + HTML charts (writers.rs:692+
SampledProbs) and localize --chart (localise/subcommand.rs:291)."""

import json
import os
import re

import numpy as np

from tests.test_bedmethyl_tools import _write_sizes
from tests.test_dmr import A_BM

BAM = "bc_anchored_10_reads.sorted.bam"


def _chart_payload(path):
    text = open(path).read()
    m = re.search(
        r'<script type="application/json" id="data">(.*?)</script>',
        text,
        re.S,
    )
    assert m, "chart HTML must embed a JSON data block"
    assert "<svg" in text
    return json.loads(m.group(1))


def test_sample_probs_hist_outputs(resources, tmp_path):
    from modkit_tpu.cli import main

    out_dir = str(tmp_path / "probs")
    rc = main(
        [
            "sample-probs", os.path.join(resources, BAM),
            "-o", out_dir, "--hist", "--force", "--no-sampling",
        ]
    )
    assert rc == 0
    files = sorted(os.listdir(out_dir))
    assert files == [
        "counts.html", "probabilities.tsv", "proportion.html",
        "thresholds.tsv",
    ]
    lines = open(os.path.join(out_dir, "probabilities.tsv")).read().splitlines()
    assert lines[0] == (
        "code\tprimary_base\trange_start\trange_end\tcount\tfrac"
        "\tpercentile_rank"
    )
    rows = [ln.split("\t") for ln in lines[1:]]
    assert rows, "expected histogram rows"
    # the anchored fixture carries C+h / C+m calls: canonical + both codes
    codes = {r[0] for r in rows}
    assert codes == {"-", "h", "m"}
    assert {r[1] for r in rows} == {"C"}
    # counts are positive ints; ranks ascend within a (code, base) group
    for code in codes:
        ranks = [float(r[6]) for r in rows if r[0] == code]
        assert all(x < y for x, y in zip(ranks, ranks[1:]))
        # fracs of a group sum to ~1
        fracs = sum(float(r[5]) for r in rows if r[0] == code)
        assert abs(fracs - 1.0) < 1e-4
    # bin edges are (q/256, (q+1)/256)
    for r in rows[:5]:
        lo, hi = float(r[2]), float(r[3])
        q = round(lo * 256)
        assert abs(hi - (q + 1) / 256) < 1e-6

    counts = _chart_payload(os.path.join(out_dir, "counts.html"))
    prop = _chart_payload(os.path.join(out_dir, "proportion.html"))
    assert [s["name"] for s in counts["series"]] == ["C:-", "C:h", "C:m"]
    assert counts["x_categories"] == prop["x_categories"]
    # total chart counts equal total TSV counts
    tsv_total = sum(int(r[4]) for r in rows)
    chart_total = sum(sum(s["data"]) for s in counts["series"])
    assert tsv_total == chart_total
    for s in prop["series"]:
        assert abs(sum(s["data"]) - 1.0) < 1e-4


def test_sample_probs_hist_refuses_overwrite(resources, tmp_path):
    import pytest

    from modkit_tpu.cli import main

    out_dir = str(tmp_path / "probs2")
    args = [
        "sample-probs", os.path.join(resources, BAM),
        "-o", out_dir, "--hist", "--no-sampling",
    ]
    assert main(args) == 0
    with pytest.raises(SystemExit):
        main(args)  # no --force


def test_localize_chart(tmp_path):
    from modkit_tpu.cli import main

    regions = tmp_path / "feat.bed"
    regions.write_text("chr20\t9838900\t9838900\tctcf\n")
    out = tmp_path / "loc.tsv"
    chart = tmp_path / "loc.html"
    rc = main(
        [
            "localize", A_BM,
            "--regions", str(regions),
            "-r", _write_sizes(tmp_path),
            "-w", "300",
            "-o", str(out),
            "--chart", str(chart),
            "--name", "ctcf_patterns",
            "-f",
        ]
    )
    assert rc == 0
    payload = _chart_payload(str(chart))
    assert payload["title"] == "ctcf_patterns"
    # chart series values match the TSV table
    table = {}
    for ln in open(out).read().splitlines()[1:]:
        code, off, n_valid, n_mod, pct = ln.split("\t")
        table.setdefault(code, {})[float(off)] = float(pct)
    assert {s["name"] for s in payload["series"]} == set(table)
    for s in payload["series"]:
        for x, y in s["data"]:
            assert abs(table[s["name"]][x] - y) < 1e-4
