"""Native BGZF inflate+decode path (mk_decode_tile_bgzf): identical tile
output to the Python-fetch + decode_tile path, across fixture BAMs and
tile sizes (the host feed-ceiling fix — blocks inflate on the native
thread pool with early stop past the tile end)."""

import os

import numpy as np
import pytest

from modkit_tpu import native
from modkit_tpu.io.bam import BamReader

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def _tile_signature(tile):
    if tile is None:
        return None
    n, m = tile.n_events, tile.m
    rpos, strand, base, probs = tile.export_events()
    return (
        tile.n_used,
        tile.n_skipped,
        tuple(sorted(tile.errors.items())),
        tuple(tile.vocab),
        n,
        rpos[:n].tobytes(),
        strand[:n].tobytes(),
        base[:n].tobytes(),
        probs[:n, :m].tobytes(),
        None if tile.nc_counts is None else tile.nc_counts.tobytes(),
        None if tile.del_counts is None else tile.del_counts.tobytes(),
        None if tile.observed is None else np.asarray(tile.observed).tobytes(),
    )


@pytest.mark.parametrize(
    "name,interval",
    [
        ("bc_anchored_10_reads.sorted.bam", 25),
        ("bc_anchored_10_reads.sorted.bam", 100_000),
        ("bc_anchored_10_reads.haplotyped.sorted.bam", 50),
        (
            "CG_5mC_20230207_1700_6A_PAG66026_3c0abf27_oligo_741_adapters"
            "_modcalls_0th_sort_10_reads.bam",
            40,
        ),
    ],
)
def test_bgzf_decode_matches_python_fetch(resources, name, interval):
    reader = BamReader(os.path.join(resources, name))
    for tid in range(len(reader.header.refs)):
        length = reader.header.refs[tid].length
        for start in range(0, length, interval):
            end = min(start + interval, length)
            want = native.decode_tile(
                reader.fetch_chunks_raw(tid, start, end), tid, start, end
            )
            got = native.decode_tile_bgzf(
                reader.bam_raw,
                reader.fetch_chunk_voffsets(tid, start, end),
                tid, start, end,
            )
            assert _tile_signature(got) == _tile_signature(want), (
                name, tid, start, end,
            )


def test_bgzf_decode_synthetic_many_tiles(tmp_path):
    """WGS-style synthetic input: every tile's decode matches, including
    tiles whose BAI chunks extend far past the tile end (the early-stop
    case)."""
    from modkit_tpu.utils.synth import make_synthetic_modbam

    bam = str(tmp_path / "synth.bam")
    stats = make_synthetic_modbam(
        bam, n_reads=2000, read_len=3000, coverage=20.0, seed=3
    )
    reader = BamReader(bam)
    contig = stats["contig_len"]
    n_events = 0
    for start in range(0, contig, 50_000):
        end = min(start + 50_000, contig)
        want = native.decode_tile(
            reader.fetch_chunks_raw(0, start, end), 0, start, end
        )
        got = native.decode_tile_bgzf(
            reader.bam_raw,
            reader.fetch_chunk_voffsets(0, start, end),
            0, start, end,
        )
        assert _tile_signature(got) == _tile_signature(want), (start, end)
        n_events += got.n_events
    assert n_events > 100_000


def test_fetch_no_duplicate_records_wgs_scale(tmp_path):
    """Regression (found at 50k-read bench scale): reading BAI chunks past
    cend to a block/64K boundary can re-visit records that also belong to
    a later chunk, silently double-counting reads (one duplicate occurs
    in this exact config with the old over-reading fetch). Chunks must be
    read exactly over [cbeg, cend), htslib semantics."""
    from modkit_tpu.utils.synth import make_synthetic_modbam

    bam = str(tmp_path / "wgs.bam")
    stats = make_synthetic_modbam(
        bam, n_reads=40000, read_len=5000, coverage=25.0, seed=1
    )
    reader = BamReader(bam)
    contig = stats["contig_len"]
    total = 0
    for start in range(0, contig, 100_000):
        end = min(start + 100_000, contig)
        names = [r.name for r in reader.fetch(0, start, end)]
        assert len(names) == len(set(names)), (start, end)
        want = native.decode_tile(
            reader.fetch_chunks_raw(0, start, end), 0, start, end
        )
        got = native.decode_tile_bgzf(
            reader.bam_raw,
            reader.fetch_chunk_voffsets(0, start, end),
            0, start, end,
        )
        assert got.n_used == want.n_used, (start, end)
        total += got.n_used
    assert total >= 40000  # boundary reads decode once per spanned tile
