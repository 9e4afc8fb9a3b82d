"""Logging subsystem (reference src/logging.rs:10-66): --log-filepath
writes the command line plus run records at DEBUG, the console appender
carries INFO, and log_once de-spams repeated warnings."""

import logging
import os
import sys

from modkit_tpu.logging import (
    get_logger, init_logging, log_once, reset_once_cache,
)


def test_log_file_contains_command_line_and_run_records(
    resources, tmp_path, monkeypatch
):
    from modkit_tpu.cli import main

    bam = os.path.join(resources, "bc_anchored_10_reads.sorted.bam")
    out = str(tmp_path / "out.bed")
    log_fp = str(tmp_path / "run.log")
    argv = [
        "pileup", bam, out, "--no-filtering",
        "--log-filepath", log_fp, "--suppress-progress",
    ]
    monkeypatch.setattr(sys, "argv", ["modkit"] + argv)
    assert main(argv) == 0
    text = open(log_fp).read()
    assert "command line: modkit pileup" in text
    assert "not performing filtering" in text
    assert "Done, processed" in text and "rows" in text
    # file appender format: [module::line][date][LEVEL] message
    assert "[INFO]" in text and "[DEBUG]" in text


def test_log_file_records_estimated_thresholds(resources, tmp_path):
    from modkit_tpu.cli import main

    bam = os.path.join(resources, "bc_anchored_10_reads.sorted.bam")
    out = str(tmp_path / "out.bed")
    log_fp = str(tmp_path / "thresh.log")
    assert (
        main(
            [
                "pileup", bam, out, "--sampling-frac", "1.0",
                "--filter-percentile", "0.25", "--include-unmapped",
                "--log-filepath", log_fp, "--suppress-progress",
            ]
        )
        == 0
    )
    text = open(log_fp).read()
    assert "estimated pass threshold" in text
    assert "sampling 100.0% of reads" in text


def test_log_once_despams(tmp_path, capsys):
    log_fp = str(tmp_path / "once.log")
    init_logging(log_fp, quiet_stdout=True)
    reset_once_cache()
    for _ in range(5):
        log_once("record xyz failed: invalid MM tag")
    get_logger().handlers[0].flush()
    text = open(log_fp).read()
    assert text.count("record xyz failed") == 1


def test_init_logging_quiet_has_no_console_handler():
    logger = init_logging(None, quiet_stdout=True)
    assert not any(
        isinstance(h, logging.StreamHandler)
        and not isinstance(h, logging.NullHandler)
        and getattr(h, "stream", None) is sys.stderr
        for h in logger.handlers
    )


def test_profiler_hook_writes_trace(resources, tmp_path, monkeypatch):
    """MODKIT_TPU_PROFILE=<dir> must capture a jax.profiler trace of the
    tile loop (SURVEY §5: structured device traces replace the
    reference's indicatif timing)."""
    import os

    from modkit_tpu.pileup.runner import PileupConfig, run_pileup

    trace_dir = tmp_path / "trace"
    monkeypatch.setenv("MODKIT_TPU_PROFILE", str(trace_dir))
    run_pileup(
        PileupConfig(
            in_bam=os.path.join(
                resources, "bc_anchored_10_reads.sorted.bam"
            ),
            out=str(tmp_path / "out.bed"),
            interval_size=25,
            no_filtering=True,
            suppress_progress=True,
        )
    )
    produced = [
        os.path.join(root, f)
        for root, _dirs, files in os.walk(trace_dir)
        for f in files
    ]
    assert produced, "no trace files written"
    assert any(
        f.endswith((".trace.json.gz", ".pb", ".xplane.pb")) for f in produced
    ), produced
