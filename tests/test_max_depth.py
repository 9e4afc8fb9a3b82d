"""--max-depth enforcement: cap reads contributing per pileup column.

The reference caps pileup depth at 8000 records per column via htslib's
set_max_depth (pileup/subcommand.rs:57-63, pileup/mod.rs:755-758): excess
alignments at a column are dropped, keeping the first reads in file
(position) order. These tests pin that semantics on a synthetic stack of
reads where the expected per-column contributions are hand-computable, and
assert the native C++ tile decoder matches the Python oracle path.
"""

import numpy as np
import pytest

from modkit_tpu.caller import ThresholdCaller
from modkit_tpu.io.bam import BamHeader, BamReader, BamWriter, Reference, build_bai
from modkit_tpu.pileup.engine import PileupOptions, TileProcessor
from modkit_tpu.pileup.runner import PileupConfig, run_pileup
from modkit_tpu.utils.synth import _encode_record


@pytest.fixture(scope="module")
def stacked_bam(tmp_path_factory):
    """6 forward reads: five covering [0,100), one covering [50,150).

    Every base is C with a high-confidence 5mC call, so with
    --no-filtering each admitted read contributes one n_mod count per
    covered column.
    """
    path = str(tmp_path_factory.mktemp("maxdepth") / "stack.bam")
    header = BamHeader(
        "@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:ctg\tLN:200\n",
        [Reference("ctg", 200)],
    )
    seq = np.full(100, ord("C"), dtype=np.uint8)
    deltas = ",".join("0" for _ in range(100))
    mm = f"C+m?,{deltas};"
    ml = np.full(100, 230, dtype=np.uint8)
    with BamWriter(path, header) as w:
        for i in range(5):
            w.write_raw(
                _encode_record(f"r{i}".encode(), 0, 0, seq, mm, ml)
            )
        w.write_raw(_encode_record(b"r5", 0, 50, seq, mm, ml))
    build_bai(path)
    return path


def _rows(bed_path):
    rows = {}
    for line in open(bed_path):
        f = line.split()
        rows[(int(f[1]), f[5])] = dict(
            code=f[3], valid=int(f[9]), n_mod=int(f[11])
        )
    return rows


def test_max_depth_caps_columns(stacked_bam, tmp_path):
    out = str(tmp_path / "d3.bed")
    run_pileup(
        PileupConfig(
            in_bam=stacked_bam, out=out, no_filtering=True, max_depth=3
        )
    )
    rows = _rows(out)
    # [0,50): 5 reads stacked, capped at 3
    assert rows[(0, "+")]["valid"] == 3
    assert rows[(49, "+")]["n_mod"] == 3
    # [50,100): 6 reads overlap; first 3 in file order admitted (r0-r2)
    assert rows[(50, "+")]["valid"] == 3
    # [100,150): only r5 covers -> depth 1, admitted even though it was
    # rejected at earlier columns (cap is per column, not per read)
    assert rows[(100, "+")]["valid"] == 1
    assert rows[(149, "+")]["valid"] == 1


def test_max_depth_default_no_cap(stacked_bam, tmp_path):
    out = str(tmp_path / "nocap.bed")
    run_pileup(
        PileupConfig(in_bam=stacked_bam, out=out, no_filtering=True)
    )
    rows = _rows(out)
    assert rows[(0, "+")]["valid"] == 5
    assert rows[(50, "+")]["valid"] == 6


def test_max_depth_native_matches_python(stacked_bam):
    reader = BamReader(stacked_bam)
    results = []
    for use_native in (True, False):
        proc = TileProcessor(
            ThresholdCaller.passthrough(),
            PileupOptions(max_depth=2, use_device=False, use_native=use_native),
        )
        res = proc.process_tile(reader, 0, 0, 200)
        flat = [
            (pos, r.strand, str(r.mod_code), r.valid_coverage, r.n_modified,
             r.n_canonical, r.n_filtered, r.n_nocall, r.n_delete, r.n_diff)
            for pos, rows in (res if isinstance(res, list) else [])
            for r in rows
        ]
        if not flat:  # columnar fast path
            flat = [
                (int(p), int(s), res.labels[c], int(v), int(nm), int(nc2),
                 int(nf), int(nn), int(nd), int(ndiff))
                for p, s, c, v, nm, nc2, nf, nn, nd, ndiff in zip(
                    res.pos, res.strand, res.code_idx, res.valid,
                    res.n_mod, res.n_can, res.n_filt, res.n_nocall,
                    res.n_del, res.n_diff,
                )
            ]
        results.append(flat)
    assert results[0] == results[1]
    assert all(r[3] <= 2 for r in results[0])
