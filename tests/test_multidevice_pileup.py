"""Production multi-device pileup: tiles dispatch round-robin across local
devices (SURVEY §2.5 row 1) and the FULL pileup path produces byte-identical
bedMethyl at 1 and 8 virtual devices (the single-vs-multi-chip equivalence
test SURVEY §4 calls for)."""

import os

import jax
import pytest

from modkit_tpu.caller import ThresholdCaller
from modkit_tpu.io.bam import BamReader
from modkit_tpu.parallel.devices import compute_devices, reset_devices_cache
from modkit_tpu.pileup.engine import PileupOptions, TileProcessor
from modkit_tpu.pileup.runner import PileupConfig, run_pileup

BAM = "bc_anchored_10_reads.sorted.bam"
GOLDEN = "modbam.modpileup_nofilt.methyl.bed"


@pytest.fixture
def device_cap(monkeypatch):
    def set_cap(n):
        monkeypatch.setenv("MODKIT_TPU_DEVICES", str(n))
        reset_devices_cache()

    yield set_cap
    reset_devices_cache()


def test_full_pileup_byte_identical_1_vs_8_devices(
    resources, tmp_path, device_cap
):
    assert len(jax.devices()) == 8  # conftest forces 8 virtual CPU devices
    texts = {}
    for n in (1, 8):
        device_cap(n)
        out = str(tmp_path / f"out_{n}.bed")
        run_pileup(
            PileupConfig(
                in_bam=os.path.join(resources, BAM),
                out=out,
                interval_size=25,  # many tiles -> real round-robin
                no_filtering=True,
            )
        )
        texts[n] = open(out).read()
    assert texts[1] == texts[8]
    golden = open(os.path.join(resources, GOLDEN)).read()
    assert texts[8] == golden


def test_estimated_threshold_pileup_1_vs_8_devices(
    resources, tmp_path, device_cap
):
    texts = {}
    for n in (1, 8):
        device_cap(n)
        out = str(tmp_path / f"filt_{n}.bed")
        run_pileup(
            PileupConfig(
                in_bam=os.path.join(resources, BAM),
                out=out,
                interval_size=25,
                sample_frac=1.0,
                filter_percentile=0.25,
                include_unmapped=True,
            )
        )
        texts[n] = open(out).read()
    assert texts[1] == texts[8]
    golden = open(
        os.path.join(resources, "modbam.modpileup_filt025.methyl.bed")
    ).read()
    assert texts[8] == golden


def test_tiles_actually_land_on_multiple_devices(
    tmp_path, device_cap, monkeypatch
):
    from modkit_tpu.utils.synth import make_synthetic_modbam

    # force the offload so device placement is observable regardless of
    # the adaptive policy's bandwidth probe
    monkeypatch.setenv("MODKIT_TPU_OFFLOAD", "always")
    bam = str(tmp_path / "multi.bam")
    make_synthetic_modbam(bam, n_reads=400, read_len=500, coverage=10.0)
    device_cap(8)
    assert len(compute_devices()) == 8
    reader = BamReader(bam)
    proc = TileProcessor(
        ThresholdCaller.passthrough(), PileupOptions(use_device=True)
    )
    used = set()
    end = reader.header.refs[0].length
    pendings = []
    for start in range(0, end, 2000):
        pend = proc.launch_tile(reader, 0, start, min(start + 2000, end))
        if pend is None:
            continue
        arr = pend.states if pend.states is not None else pend.modc
        if hasattr(arr, "devices"):
            used |= {d.id for d in arr.devices()}
        pendings.append(pend)
    assert len(used) >= 4, f"expected round-robin over devices, used {used}"
    for p in pendings:  # results still decode fine from every device
        proc.finish_tile(p)


def test_dryrun_multichip_drives_real_engine():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
