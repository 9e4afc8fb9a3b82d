"""Single-site DMR: beta-difference estimator, HMM segmentation, and the
end-to-end `dmr pair` (no --regions) path on the chr20 fixtures."""

import numpy as np
import pytest

from tests.test_dmr import A_BM, B_BM, RES, synthetic_chr20_fa  # noqa: F401


def test_appell_f1_stable_reference_values():
    """beta_diff.rs:288-325 test_appell_f1_stable."""
    from modkit_tpu.ops.beta_diff import appell_f1_stable

    answers = [
        3.4631730691211176,
        2.655223346206384,
        0.8708215438706287,
        0.4887961579016729,
        1.0,
    ]
    xy = [(0.9, 0.0), (0.7, 0.3), (-0.5, 0.2), (-0.9, -0.5), (0.0, 0.0)]
    for (x, y), expected in zip(xy, answers):
        got = float(
            np.exp(
                appell_f1_stable(
                    np.array([x]), np.array([y]), 2.0, 1.0, 1.0, 3.0
                )
            )[0]
        )
        assert got == pytest.approx(expected, abs=1e-3)


def test_pmap_estimator_ordering():
    from modkit_tpu.ops.beta_diff import PMapEstimator

    est = PMapEstimator((30, 30), 1, 1)
    # strong difference -> small p-value
    p_strong, eff_strong = est.predict_batch([28], [30], [2], [30])
    # identical -> in ROPE -> p = 1
    p_null, eff_null = est.predict_batch([15], [30], [15], [30])
    # mild difference -> intermediate
    p_mild, _ = est.predict_batch([20], [30], [15], [30])
    assert p_null[0] == 1.0
    assert eff_null[0] == 0.0
    assert p_strong[0] < p_mild[0] < 1.0
    assert eff_strong[0] == pytest.approx(28 / 30 - 2 / 30)
    # coverage resize: 600x gets capped to max coverage
    p_cap, eff = est.predict_batch([540], [600], [60], [600])
    assert eff[0] == pytest.approx(0.8)
    assert p_cap[0] < 1e-3


def test_hmm_viterbi_segments():
    from modkit_tpu.hmm import DIFFERENT, SAME, HmmModel, path_to_region_labels

    hmm = HmmModel()
    # low scores (same) then high scores (different), 10 bp apart
    scores = [0.1] * 10 + [25.0] * 10 + [0.1] * 10
    positions = [100 + 10 * i for i in range(30)]
    path = hmm.viterbi_path(scores, positions)
    assert len(path) == len(scores) - 1
    labels = path_to_region_labels(path, positions)
    states = [s for (_, _, s) in labels]
    assert DIFFERENT in states and SAME in states
    # middle block should be called different
    mid = [s for (start, end, s) in labels if start <= 200 < end]
    assert mid == [DIFFERENT]


def test_hmm_single_score_no_segments():
    from modkit_tpu.hmm import HmmModel, path_to_region_labels

    hmm = HmmModel()
    path = hmm.viterbi_path([5.0], [100])
    assert path == []
    assert path_to_region_labels(path, [100]) == []


def test_single_site_end_to_end(tmp_path, synthetic_chr20_fa):  # noqa: F811
    from modkit_tpu.cli import main

    out = tmp_path / "ss.bed"
    seg = tmp_path / "segments.bed"
    rc = main(
        [
            "dmr", "pair",
            "-a", A_BM,
            "-b", B_BM,
            "-o", str(out),
            "--segment", str(seg),
            "--ref", synthetic_chr20_fa,
            "-f",
            "--base", "C",
            "--header",
            "--max-coverages", "30", "30",
        ]
    )
    assert rc == 0
    lines = out.read_text().rstrip("\n").split("\n")
    header, rows = lines[0], lines[1:]
    assert header.split("\t") == [
        "chrom", "start", "end", "name", "score", "strand",
        "a_counts", "a_total", "b_counts", "b_total",
        "a_mod_percentages", "b_mod_percentages",
        "a_pct_modified", "b_pct_modified", "map_pvalue", "effect_size",
    ]
    assert len(rows) > 10_000
    prev_pos = -1
    import zlib

    def read_bgz(path):
        raw = open(path, "rb").read()
        blob = bytearray()
        while raw:
            d = zlib.decompressobj(wbits=47)
            blob += d.decompress(raw)
            raw = d.unused_data
        return [l.decode() for l in bytes(blob).split(b"\n") if l]

    # oracle: per-position aggregated counts from the raw files
    def agg_by_pos(path):
        out = {}
        for l in read_bgz(path):
            f = l.split("\t")
            pos, strand = int(f[1]), f[5]
            rest = f[9].split()
            n_mod, valid = int(rest[2]), int(rest[0])
            key = (pos, strand)
            cur = out.get(key, (0, 0, set()))
            out[key] = (cur[0] + n_mod, cur[1], cur[2] | {int(rest[0])})
        # valid coverage counted once per position
        return {
            k: (m, sum(vs)) for k, (m, _, vs) in out.items()
        }

    a_oracle = agg_by_pos(A_BM)
    b_oracle = agg_by_pos(B_BM)
    checked = 0
    for row in rows:
        f = row.split("\t")
        assert len(f) == 16
        pos = int(f[1])
        assert f[2] == str(pos + 1)
        assert pos >= prev_pos
        prev_pos = pos
        key = (pos, f[5])
        if key in a_oracle and key in b_oracle:
            assert int(f[7]) == a_oracle[key][1], row
            assert int(f[9]) == b_oracle[key][1], row
            checked += 1
        pv = float(f[14])
        assert 0.0 <= pv <= 1.0
    assert checked == len(rows)
    # every site in both oracles must be present
    both = set(a_oracle) & set(b_oracle)
    assert len(rows) == len(both)

    # segmentation: this fixture has low per-site contrast (max llk ~11)
    # with no sustained runs, so the HMM calls the whole span "same"
    seg_lines = seg.read_text().rstrip("\n").split("\n")
    assert len(seg_lines) >= 1
    states = set()
    for l in seg_lines:
        f = l.split("\t")
        assert len(f) == 13
        assert f[0] == "chr20"
        states.add(f[3])
    assert states <= {"same", "different"}


def test_hmm_segmenter_multi_segments(tmp_path):
    """Synthetic strongly-differential blocks produce multiple segments
    with correct counts and effect sizes."""
    from modkit_tpu.bedmethyl import AggregatedCounts
    from modkit_tpu.engines.dmr_single_site import HmmSegmenter
    from modkit_tpu.hmm import HmmModel

    seg_fp = tmp_path / "segs.bed"
    seg = HmmSegmenter(str(seg_fp), HmmModel(), max_gap_size=5000)
    sites = []
    pos = 1000
    for block, differential in enumerate([False, True, False]):
        for _ in range(20):
            if differential:
                ca = AggregatedCounts({"m": 28}, 30)
                cb = AggregatedCounts({"m": 2}, 30)
                score = 40.0
            else:
                ca = AggregatedCounts({"m": 15}, 30)
                cb = AggregatedCounts({"m": 15}, 30)
                score = 0.05
            sites.append((pos, score, ca, cb))
            pos += 10
    seg.add_sites("chrX", sites)
    seg.finish()
    lines = seg_fp.read_text().rstrip("\n").split("\n")
    states = [l.split("\t")[3] for l in lines]
    assert "different" in states and "same" in states
    assert len(lines) >= 3
    for l in lines:
        f = l.split("\t")
        assert int(f[1]) < int(f[2])
        assert int(f[5]) > 0  # num_sites
    # gap > max_gap_size forces a chunk split
    seg2 = HmmSegmenter(str(tmp_path / "s2.bed"), HmmModel(), 5000)
    ca = AggregatedCounts({"m": 15}, 30)
    seg2.add_sites("chr1", [(100 + i * 10, 0.05, ca, ca) for i in range(5)])
    seg2.add_sites("chr1", [(90000 + i * 10, 0.05, ca, ca) for i in range(5)])
    seg2.finish()
    lines = (tmp_path / "s2.bed").read_text().rstrip("\n").split("\n")
    assert len(lines) == 2
