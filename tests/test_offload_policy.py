"""Adaptive offload policy: pileup output is byte-identical whether the
threshold+count stage runs on device or on the host C++ path, and the
policy picks device on fast links / host on slow ones."""

import os

from modkit_tpu.parallel.devices import offload_events_to_device
from modkit_tpu.pileup.runner import PileupConfig, run_pileup


def test_offload_modes_byte_identical(resources, tmp_path, monkeypatch):
    texts = {}
    for mode in ("always", "never"):
        monkeypatch.setenv("MODKIT_TPU_OFFLOAD", mode)
        out = str(tmp_path / f"{mode}.bed")
        run_pileup(
            PileupConfig(
                in_bam=os.path.join(
                    resources, "bc_anchored_10_reads.sorted.bam"
                ),
                out=out, interval_size=25, no_filtering=True,
            )
        )
        texts[mode] = open(out).read()
    assert texts["always"] == texts["never"]
    golden = open(
        os.path.join(resources, "modbam.modpileup_nofilt.methyl.bed")
    ).read()
    assert texts["always"] == golden


def test_offload_modes_with_estimated_thresholds(
    resources, tmp_path, monkeypatch
):
    texts = {}
    for mode in ("always", "never"):
        monkeypatch.setenv("MODKIT_TPU_OFFLOAD", mode)
        out = str(tmp_path / f"t_{mode}.bed")
        run_pileup(
            PileupConfig(
                in_bam=os.path.join(
                    resources, "bc_anchored_10_reads.sorted.bam"
                ),
                out=out, interval_size=25, sample_frac=1.0,
                filter_percentile=0.25, include_unmapped=True,
            )
        )
        texts[mode] = open(out).read()
    assert texts["always"] == texts["never"]


def test_policy_thresholds(monkeypatch):
    monkeypatch.setenv("MODKIT_TPU_OFFLOAD", "auto")
    monkeypatch.setenv("MODKIT_TPU_HOST_EVENT_RATE", "30000000")
    import modkit_tpu.parallel.devices as dv

    # fast link (PCIe-class): offload wins
    monkeypatch.setattr(dv, "_bw_cache", 10e9)
    assert offload_events_to_device(1_000_000, 5.0)
    # slow tunnel: host wins
    monkeypatch.setattr(dv, "_bw_cache", 50e6)
    assert not offload_events_to_device(1_000_000, 5.0)
    # forced modes
    monkeypatch.setenv("MODKIT_TPU_OFFLOAD", "always")
    assert offload_events_to_device(1, 5.0)
    monkeypatch.setenv("MODKIT_TPU_OFFLOAD", "never")
    assert not offload_events_to_device(10**9, 5.0)
