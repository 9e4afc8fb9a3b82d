"""Multi-host `extract full`/`calls`: N real processes + jax.distributed,
byte-equality with the single-host native stream. Ranks own record-aligned
compressed byte ranges split at BAI linear-index voffsets; shard files
concatenate in rank order (engines/extract.py shard path)."""

import os
import socket
import subprocess
import sys

import pytest

from modkit_tpu import native

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)

_DRIVER = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
sys.path.insert(0, {repo!r})
from modkit_tpu.cli import main
rc = main([
    "extract", {mode!r}, {bam!r}, {out!r},
    "--suppress-progress", "--force",
] + {extra!r})
sys.exit(rc)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _make_bam(tmp_path):
    from modkit_tpu.utils.synth import make_synthetic_modbam

    bam = str(tmp_path / "s.bam")
    make_synthetic_modbam(
        bam, n_reads=1200, read_len=800, coverage=8, seed=11
    )
    return bam


@pytest.mark.parametrize("nproc,mode,extra", [
    (2, "full", []),
    (3, "full", []),
    (2, "calls", ["--no-filtering"]),
])
def test_multihost_extract_byte_equal(tmp_path, nproc, mode, extra):
    bam = _make_bam(tmp_path)
    port = _free_port()
    driver = tmp_path / "driver.py"

    def run(nproc_env, pidx, out):
        driver.write_text(
            _DRIVER.format(
                repo=REPO, mode=mode, bam=bam, out=str(out), extra=extra
            )
        )
        env = dict(os.environ)
        env.pop("MODKIT_TPU_DEVICES", None)
        if nproc_env > 1:
            env["MODKIT_TPU_COORD"] = f"localhost:{port}"
            env["MODKIT_TPU_NPROC"] = str(nproc_env)
            env["MODKIT_TPU_PROC_ID"] = str(pidx)
        else:
            env.pop("MODKIT_TPU_COORD", None)
        return subprocess.Popen(
            [sys.executable, str(driver)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
        )

    single_out = tmp_path / "single.tsv"
    p = run(1, 0, single_out)
    _, err = p.communicate(timeout=300)
    assert p.returncode == 0, err.decode()

    multi_out = tmp_path / "multi.tsv"
    procs = [run(nproc, i, multi_out) for i in range(nproc)]
    for p in procs:
        _, err = p.communicate(timeout=300)
        assert p.returncode == 0, err.decode()

    single = single_out.read_bytes()
    multi = multi_out.read_bytes()
    assert len(multi) == len(single)
    assert multi == single
    from modkit_tpu.parallel.devices import shard_path

    for i in range(nproc):
        assert not os.path.exists(shard_path(str(multi_out), i))


def test_shard_voffsets_partition(tmp_path):
    """Shard boundaries are record-aligned and partition the whole body."""
    from modkit_tpu.engines.extract import _shard_voffsets
    from modkit_tpu.io.bam import BamReader

    bam = _make_bam(tmp_path)
    reader = BamReader(bam)
    bounds = _shard_voffsets(reader, 3)
    assert bounds[0] == reader._body_voffset
    assert bounds[-1] == len(reader.bam_raw) << 16
    assert bounds == sorted(bounds)
    # each interior boundary is a known record voffset
    cands = set(reader.index.linear_voffsets())
    for b in bounds[1:-1]:
        assert b in cands
