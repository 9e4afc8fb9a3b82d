"""Sampling-schedule fidelity (sampling_schedule.rs): proportional
per-contig quotas with min(count) capping and low-count pruning, and
interval fan-out so count-quota sampling spreads across each contig
instead of taking the first N reads."""

import numpy as np

from modkit_tpu.thresholds import _count_quota_schedule, sample_reads
from modkit_tpu.utils.synth import make_synthetic_modbam


def test_schedule_proportional_quotas():
    q = _count_quota_schedule(
        100, {0: 900, 1: 90, 2: 10}, 0, include_unmapped=False
    )
    # ceil(100 * frac) per contig, capped at the contig's own count
    assert q == {0: 90, 1: 9, 2: 1}


def test_schedule_caps_at_contig_count():
    q = _count_quota_schedule(
        1000, {0: 5, 1: 5}, 0, include_unmapped=False
    )
    assert q == {0: 5, 1: 5}


def test_schedule_prunes_low_count_contigs():
    # 1000 contigs of 1 read each + one big contig: scheduling ceil() for
    # every tiny contig would sample 2x the request, so the floor loop
    # drops them (sampling_schedule.rs:225-247)
    mapped = {i: 1 for i in range(1000)}
    mapped[1000] = 1000
    q = _count_quota_schedule(100, mapped, 0, include_unmapped=False)
    assert sum(q.values()) <= 150
    assert 1000 in q and q[1000] >= 50


def test_count_quota_sampling_spreads_across_contig(tmp_path):
    """Quota sampling must draw from the whole contig, not the first N
    reads in file order (the round-1 behavior this replaces)."""
    bam = str(tmp_path / "spread.bam")
    make_synthetic_modbam(bam, n_reads=2000, read_len=500, coverage=10.0)
    from modkit_tpu.io.bam import BamReader

    reader = BamReader(bam)
    contig_len = reader.header.refs[0].length
    sampled = sample_reads(
        reader, num_reads=200, sample_frac=None, seed=1,
        include_unmapped=False, interval_size=contig_len // 20,
    )
    # duplicates at interval borders consume quota before dedup, so the
    # unique count lands a little under the 200-read request (ceil slack
    # can push it slightly over)
    assert 150 <= len(sampled) <= 320
    # read names are read_{i} with i in position order
    idx = np.array(sorted(int(n.split("_")[1]) for n in sampled))
    # first-N would give max index ~= len(sampled) (~200); even spread
    # reaches the last merged region of the contig. Within each merged
    # region the first x reads are taken (the reference's RecordSampler
    # first-N semantics), so the sample forms ~50-read clusters at the
    # merged-region starts — the largest index gap between consecutive
    # samples is one region (~500 reads), not the 1800-read hole first-N
    # leaves at the contig tail.
    assert idx.max() > 1400
    assert idx.min() < 100
    gaps = np.diff(idx)
    assert gaps.max() < 600
    # cluster sizes are even: each merged region drew ~quota/4 reads
    clusters = np.split(idx, np.flatnonzero(gaps > 100) + 1)
    assert len(clusters) == 4
    sizes = [len(c) for c in clusters]
    assert max(sizes) - min(sizes) <= 10


def test_quota_sampling_exact_on_small_fixture(resources):
    """On a fixture smaller than the quota every read is sampled, keeping
    the estimated-threshold goldens unchanged."""
    import os

    from modkit_tpu.io.bam import BamReader

    reader = BamReader(
        os.path.join(resources, "bc_anchored_10_reads.sorted.bam")
    )
    sampled = sample_reads(
        reader, num_reads=10042, sample_frac=None, seed=None,
        include_unmapped=True,
    )
    assert len(sampled) == 10
