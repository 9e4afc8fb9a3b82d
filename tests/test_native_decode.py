"""Equivalence tests: native C++ tile decoder vs the Python oracle.

The native decoder (native/modkit_native.cpp via modkit_tpu.native) must
produce byte-identical tile event assemblies to the Python implementation
(modkit_tpu/pileup/events.py read_to_events + engine.launch_tile assembly)
on every fixture BAM and option combination.
"""

import glob
import os

import numpy as np
import pytest

from modkit_tpu import native
from modkit_tpu.collapse import CollapseMethod
from modkit_tpu.errors import ModKitError
from modkit_tpu.io.bam import BamReader
from modkit_tpu.pileup.events import (
    EdgeFilter, read_to_events, skipped_read_events,
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def python_tile_assembly(
    reader, tid, start, end, *, collapse=None, edge_filter=None,
    force_allow=False, focus_rule=None, cache=None,
):
    """Reference (oracle) implementation of the tile assembly, mirroring
    TileProcessor.launch_tile's Python path. ``cache`` memoizes the
    per-read decode across tiles of a sweep (read_to_events is tile-
    independent, exactly like the production TileProcessor cache)."""
    reads = []
    n_used = n_skipped = 0
    errors = {}
    for rec in reader.fetch(tid, start, end):
        if rec.is_not_primary or rec.l_seq == 0:
            continue
        key = (tid, rec.name, rec.pos, rec.flag)
        hit = cache.get(key) if cache is not None else None
        if hit is not None:
            ev, err_kind = hit
        else:
            try:
                ev = read_to_events(
                    rec, collapse_methods=collapse, edge_filter=edge_filter,
                    force_allow=force_allow,
                )
                err_kind = None
            except ModKitError as e:
                err_kind = e.kind
                ev = skipped_read_events(rec)
            if cache is not None:
                cache[key] = (ev, err_kind)
        if err_kind is None:
            n_used += 1
        else:
            errors[err_kind] = errors.get(err_kind, 0) + 1
            n_skipped += 1
        reads.append(ev)

    vocab, vindex = [], {}
    for ev in reads:
        for c in ev.codes:
            if c not in vindex:
                vindex[c] = len(vocab)
                vocab.append(c)
    m = max(len(vocab), 1)
    p = end - start

    rpos_l, strand_l, base_l, probs_l = [], [], [], []
    nc_keys, del_keys = [], []
    for ev in reads:
        s = ev.aln_strand
        if len(ev.mod_rpos):
            sel = (ev.mod_rpos >= start) & (ev.mod_rpos < end)
            if focus_rule is not None and sel.any():
                li = (ev.mod_rpos - start)[sel]
                r = focus_rule[li]
                keep = (r == 2) | (r == ev.mod_out[sel])
                s2 = np.zeros(len(ev.mod_rpos), dtype=bool)
                s2[np.flatnonzero(sel)[keep]] = True
                sel = s2
            if sel.any():
                rpos_l.append(ev.mod_rpos[sel] - start)
                strand_l.append(ev.mod_out[sel])
                base_l.append(ev.mod_base[sel])
                pr = np.full((int(sel.sum()), m), -1.0, dtype=np.float32)
                if ev.mod_probs.shape[1]:
                    cols = [vindex[c] for c in ev.codes]
                    pr[:, cols] = ev.mod_probs[sel]
                probs_l.append(pr)
        if len(ev.nc_rpos):
            li = ev.nc_rpos - start
            sel = (li >= 0) & (li < p)
            if focus_rule is not None:
                r = focus_rule[np.clip(li, 0, p - 1)]
                sel &= (r == 2) | (r == s)
            if sel.any():
                nc_keys.append((li[sel] * 2 + s) * 4 + ev.nc_base[sel])
        if len(ev.del_rpos):
            li = ev.del_rpos - start
            sel = (li >= 0) & (li < p)
            if focus_rule is not None:
                r = focus_rule[np.clip(li, 0, p - 1)]
                sel &= (r == 2) | (r == s)
            if sel.any():
                del_keys.append(li[sel] * 2 + s)

    nc_counts = del_counts = None
    if nc_keys:
        nc_counts = np.bincount(
            np.concatenate(nc_keys), minlength=p * 2 * 4
        ).astype(np.int32).reshape(p, 2, 4)
    if del_keys:
        del_counts = np.bincount(
            np.concatenate(del_keys), minlength=p * 2
        ).astype(np.int32).reshape(p, 2)

    observed = np.zeros((p, 2, 4, m), dtype=bool)
    for ev in reads:
        if not ev.registered or ev.cover is None or not len(ev.cover):
            continue
        for (sk, tb), codes in ev.registered.items():
            cols = [vindex[c] for c in codes]
            if not cols:
                continue
            for a, b_ in ev.cover:
                a2, b2 = max(a - start, 0), min(b_ - start, p)
                if a2 < b2:
                    for c in cols:
                        observed[a2:b2, sk, tb, c] = True

    if rpos_l:
        rpos = np.concatenate(rpos_l)
        strand = np.concatenate(strand_l)
        base = np.concatenate(base_l)
        probs = np.concatenate(probs_l, axis=0)
    else:
        rpos = np.empty(0, dtype=np.int64)
        strand = base = np.empty(0, dtype=np.int8)
        probs = np.empty((0, m), dtype=np.float32)

    return dict(
        rpos=rpos, strand=strand, base=base, probs=probs,
        nc_counts=nc_counts, del_counts=del_counts, observed=observed,
        vocab=vocab, n_used=n_used, n_skipped=n_skipped, errors=errors,
    )


def compare_tile(reader, tid, start, end, cache=None, **opts):
    py = python_tile_assembly(reader, tid, start, end, cache=cache, **opts)
    nt = native.decode_tile(
        reader.fetch_chunks_raw(tid, start, end), tid, start, end,
        collapse=opts.get("collapse"),
        edge_filter=opts.get("edge_filter"),
        force_allow=opts.get("force_allow", False),
        focus_rule=opts.get("focus_rule"),
    )
    assert nt is not None
    assert nt["vocab"] == py["vocab"], (start, end)
    assert np.array_equal(
        nt["rpos"].astype(np.int64), py["rpos"].astype(np.int64)
    ), (start, end)
    assert np.array_equal(nt["strand"], py["strand"])
    assert np.array_equal(nt["base"], py["base"])
    # probabilities must be bit-identical (f32 semantics preserved)
    assert nt["probs"].shape == py["probs"].shape
    assert np.array_equal(
        nt["probs"].view(np.int32), py["probs"].view(np.int32)
    ), (start, end)
    for key in ("nc_counts", "del_counts"):
        if py[key] is None:
            assert nt[key] is None, (key, start, end)
        else:
            assert np.array_equal(nt[key], py[key]), (key, start, end)
    assert np.array_equal(nt["observed"], py["observed"]), (start, end)
    assert nt["n_used"] == py["n_used"]
    assert nt["n_skipped"] == py["n_skipped"]
    assert nt["errors"] == py["errors"]
    return py


def iter_fixture_bams(resources):
    for path in sorted(glob.glob(os.path.join(resources, "*.bam"))):
        if os.path.exists(path + ".bai"):
            yield path


def covered_span(reader, tid, length):
    """[lo, hi) span of mapped records on tid (fixtures declare contigs up
    to 83 Mbp holding 2 reads — sweeping every empty tile is pointless)."""
    lo, hi = length, 0
    for rec in reader.fetch(tid, 0, length):
        lo = min(lo, rec.pos)
        hi = max(hi, rec.reference_end())
    return (lo, hi) if hi > lo else None


def sweep(reader, step, **opts):
    n_reads_seen = 0
    cache = {}  # per-sweep: opts are fixed within one sweep
    for tid, ref in enumerate(reader.header.refs):
        mapped, _ = reader.index.counts(tid)
        if not mapped:
            continue
        span = covered_span(reader, tid, ref.length)
        if span is None:
            continue
        # include one flanking empty tile each side of the covered span
        lo = max(0, (span[0] // step - 1) * step)
        hi = min(ref.length, span[1] + step)
        for start in range(lo, hi, step):
            end = min(start + step, ref.length)
            py = compare_tile(reader, tid, start, end, cache=cache, **opts)
            n_reads_seen += py["n_used"] + py["n_skipped"]
    return n_reads_seen


def test_native_matches_python_default(resources):
    total = 0
    for bam in iter_fixture_bams(resources):
        reader = BamReader(bam)
        total += sweep(reader, 1000, force_allow=True)
    assert total > 0


def test_native_matches_python_small_tiles(resources):
    bam = os.path.join(resources, "bc_anchored_10_reads.sorted.bam")
    reader = BamReader(bam)
    assert sweep(reader, 25, force_allow=True) > 0


def test_native_matches_python_no_force_allow(resources):
    for bam in iter_fixture_bams(resources):
        reader = BamReader(bam)
        sweep(reader, 500, force_allow=False)


def test_native_matches_python_collapse_and_edge(resources):
    bam = os.path.join(resources, "bc_anchored_10_reads.sorted.bam")
    reader = BamReader(bam)
    sweep(
        reader, 100, force_allow=True,
        collapse=[CollapseMethod("norm", ("h",))],
    )
    sweep(
        reader, 100, force_allow=True,
        collapse=[CollapseMethod("dist", ("h",))],
    )
    sweep(
        reader, 100, force_allow=True,
        collapse=[CollapseMethod("convert", ("h",), "m")],
    )
    sweep(
        reader, 100, force_allow=True,
        edge_filter=EdgeFilter(10, 10),
    )
    sweep(
        reader, 100, force_allow=True,
        edge_filter=EdgeFilter(5, 5, inverted=True),
    )


def test_native_matches_python_focus_rule(resources):
    bam = os.path.join(resources, "bc_anchored_10_reads.sorted.bam")
    reader = BamReader(bam)
    rng = np.random.default_rng(7)
    for tid, ref in enumerate(reader.header.refs):
        mapped, _ = reader.index.counts(tid)
        if not mapped:
            continue
        for start in range(0, ref.length, 200):
            end = min(start + 200, ref.length)
            rule = rng.integers(-1, 3, size=end - start).astype(np.int8)
            compare_tile(
                reader, tid, start, end, force_allow=True, focus_rule=rule
            )


def test_native_matches_python_synthetic(tmp_path):
    from modkit_tpu.utils.synth import make_synthetic_modbam

    bam = str(tmp_path / "synth.bam")
    make_synthetic_modbam(bam, n_reads=200, read_len=800, coverage=8.0, seed=3)
    reader = BamReader(bam)
    assert sweep(reader, 1000, force_allow=True) > 0
