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


def test_host_rate_probe_and_policy_log(monkeypatch, caplog):
    """The host event rate is MEASURED via the native probe (not the
    hardcoded fallback), and the auto policy logs its decision + inputs
    once at INFO."""
    import logging

    import modkit_tpu.parallel.devices as dv
    from modkit_tpu import native

    monkeypatch.delenv("MODKIT_TPU_HOST_EVENT_RATE", raising=False)
    monkeypatch.setattr(dv, "_host_rate_cache", None)
    rate = dv.host_event_rate()
    if native.available():
        # a real measurement: positive, not exactly the fallback constant
        assert rate > 0 and rate != dv._HOST_EVENT_RATE_FALLBACK
        assert dv._host_rate_cache == rate  # cached for the process
    else:
        assert rate == dv._HOST_EVENT_RATE_FALLBACK

    monkeypatch.setenv("MODKIT_TPU_OFFLOAD", "auto")
    monkeypatch.setattr(dv, "_bw_cache", 10e9)
    monkeypatch.setattr(dv, "_policy_logged", False)
    # init_logging (run by earlier tests) sets propagate=False, which would
    # hide records from caplog's root handler
    monkeypatch.setattr(
        logging.getLogger("modkit_tpu"), "propagate", True
    )
    with caplog.at_level(logging.INFO, logger="modkit_tpu"):
        dv.offload_events_to_device(1_000_000, 5.0)
        dv.offload_events_to_device(1_000_000, 5.0)
    lines = [r for r in caplog.records if "offload policy" in r.getMessage()]
    assert len(lines) == 1  # logged once, not per batch
    msg = lines[0].getMessage()
    assert "MB/s" in msg and "Mevent/s" in msg
