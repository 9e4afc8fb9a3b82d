"""Behavioral tests for `summary` mirroring reference tests/test_summary.rs."""

import os
import shutil

from modkit_tpu.caller import ThresholdCaller
from modkit_tpu.collapse import CollapseMethod
from modkit_tpu.pileup.events import EdgeFilter
from modkit_tpu.position_filter import StrandedPositionFilter
from modkit_tpu.summary import CANONICAL, summarize_modbam


def test_summary_with_regions(resources, tmp_path):
    # indexed vs serial (no .bai) must agree (test_summary.rs:17)
    bam = os.path.join(resources, "bc_anchored_10_reads.sorted.bam")
    unindexed = str(tmp_path / "copy.bam")
    shutil.copy(bam, unindexed)
    a = summarize_modbam(bam, interval_size=25)
    b = summarize_modbam(unindexed, interval_size=25)
    assert a.mod_call_counts == b.mod_call_counts
    assert a.filtered_mod_call_counts == b.filtered_mod_call_counts
    assert a.total_reads_used == b.total_reads_used


def test_summary_ignore(resources):
    # --ignore h removes the h state (test_summary.rs:31)
    bam = os.path.join(resources, "bc_anchored_10_reads.sorted.bam")
    a = summarize_modbam(bam, interval_size=25)
    states = set().union(*(d.keys() for d in a.mod_call_counts.values()))
    assert states == {CANONICAL, "m", "h"}
    b = summarize_modbam(
        bam, interval_size=25, collapse=[CollapseMethod("dist", ("h",))]
    )
    states = set().union(*(d.keys() for d in b.mod_call_counts.values()))
    assert states == {CANONICAL, "m"}


def test_summary_edge_filter(resources):
    # trimming reduces total calls, keeps read counts (test_summary.rs:73)
    bam = os.path.join(resources, "bc_anchored_10_reads.sorted.bam")
    a = summarize_modbam(bam, interval_size=25)
    b = summarize_modbam(
        bam, interval_size=25, edge_filter=EdgeFilter(50, 50, False)
    )
    assert a.reads_with_mod_calls["C"] == b.reads_with_mod_calls["C"]
    assert a.total_reads_used == b.total_reads_used
    assert sum(a.mod_call_counts["C"].values()) > sum(
        b.mod_call_counts["C"].values()
    )


def test_summary_implicit_calls(resources):
    # implicit-canonical inference + include positions (test_summary.rs:137)
    from modkit_tpu.io.bam import BamReader

    bam = os.path.join(resources, "single_read.bam")
    bed = os.path.join(resources, "include_bed_summary_test.bed")
    reader = BamReader(bam)
    pf = StrandedPositionFilter.from_bed_file(
        bed, dict(reader.header.name_to_tid)
    )
    s = summarize_modbam(
        bam, caller=ThresholdCaller.passthrough(), position_filter=pf,
        only_mapped=True, interval_size=32,
    )
    assert s.mod_call_counts["A"][CANONICAL] == 8
    assert s.reads_with_mod_calls["A"] == 1
    assert s.total_reads_used == 1
