"""Multi-chip scaling quantification (VERDICT r4 #5).

Three measurements feeding the BASELINE.md efficiency model:

1. HOST FEED CURVE — native decode feed rate vs worker count and per-tile
   decode threads on synthetic WGS data. Multi-chip pileup is
   embarrassingly parallel over genome tiles with no inter-chip
   communication (one psum-free merge per tile), so scaling efficiency is
   set by how many chips one host's decode feed can saturate.

2. VIRTUAL-MESH DISPATCH OVERHEAD — full CLI pileup wall-clock at 1/2/4/8
   virtual devices (xla_force_host_platform_device_count, forced-device
   tile round-robin). Device compute shares the same host cores, so the
   DIFFERENCE across N isolates per-device dispatch/merge overhead.

3. PER-TILE DEVICE WORK — the honest kernel pipeline rate (bench.py
   rooflines) converts the feed rate into a chips-saturated estimate.

Writes MULTICHIP_MODEL.json and prints a summary.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def feed_curve(bam, n_reads):
    """Tile-launch feed rate (BGZF fetch + native decode, no counting) at
    1 and 2 workers; per-worker native threads = cores // workers."""
    import numpy as np

    from modkit_tpu.caller import ThresholdCaller
    from modkit_tpu.io.bam import BamReader
    from modkit_tpu.pileup.engine import PileupOptions, TileProcessor

    reader = BamReader(bam)
    length = reader.header.refs[0].length
    tiles = [
        (0, s, min(s + 100_000, length)) for s in range(0, length, 100_000)
    ]
    cores = os.cpu_count() or 1
    out = {}
    for workers in (1, 2):
        threads = max(1, cores // workers)
        opts = PileupOptions(use_device=False, decode_threads=threads)
        proc = TileProcessor(ThresholdCaller.passthrough(), opts)
        from concurrent.futures import ThreadPoolExecutor

        readers = [BamReader(bam) for _ in range(workers)]

        def launch(args):
            w, (tid, s, e) = args
            return proc.launch_tile(readers[w], tid, s, e, None)

        t0 = time.perf_counter()
        if workers == 1:
            for t in tiles:
                launch((0, t))
        else:
            with ThreadPoolExecutor(workers) as pool:
                list(
                    pool.map(
                        launch,
                        [(i % workers, t) for i, t in enumerate(tiles)],
                    )
                )
        dt = time.perf_counter() - t0
        out[workers] = dict(
            wall_s=round(dt, 3),
            reads_per_s=round(n_reads / dt, 1),
            decode_threads=threads,
        )
    return out


def virtual_mesh_curve(bam):
    """Full CLI pileup wall at N virtual devices (forced device counting,
    round-robin tiles)."""
    out = {}
    for n in (1, 2, 4, 8):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS=f"--xla_force_host_platform_device_count={n}",
            MODKIT_TPU_OFFLOAD="always",
            MODKIT_TPU_DEVICES=str(n),
        )
        dest = f"/tmp/vmesh_{n}.bed"
        best = None
        for rep in range(2):  # rep 0 warms the persistent compile cache
            t0 = time.perf_counter()
            subprocess.run(
                [sys.executable, "-m", "modkit_tpu", "pileup", bam, dest,
                 "--no-filtering", "--suppress-progress"],
                check=True, env=env, cwd=REPO,
            )
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[n] = round(best, 3)
    texts = {n: open(f"/tmp/vmesh_{n}.bed").read() for n in out}
    assert all(t == texts[1] for t in texts.values()), "outputs differ!"
    return out


def main():
    from modkit_tpu.utils.synth import make_synthetic_modbam

    n_reads = int(os.environ.get("MC_READS", "20000"))
    bam = "/tmp/mc_synth.bam"
    if not os.path.exists(bam):
        make_synthetic_modbam(
            bam, n_reads=n_reads, read_len=5000, coverage=25.0, seed=4
        )
    feed = feed_curve(bam, n_reads)
    mesh = virtual_mesh_curve(bam)
    result = dict(
        host_feed_curve=feed,
        virtual_mesh_wall_s=mesh,
        note=(
            "feed = tile fetch+decode only (the per-host serial resource); "
            "virtual mesh devices share host cores, so deltas vs n=1 "
            "isolate dispatch/merge overhead per added device"
        ),
    )
    with open(os.path.join(REPO, "MULTICHIP_MODEL.json"), "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
