"""modbam check-tags vs reference goldens
(tests/test_modbam_utils.rs test_modbam_check_tags_expected_valid_reads_output)."""

RES = "/root/reference/tests/resources"


def test_check_tags_goldens(tmp_path):
    from modkit_tpu.cli import main

    out_dir = tmp_path / "ct"
    rc = main(
        [
            "modbam", "check-tags",
            f"{RES}/bc_anchored_10_reads.sorted.bam",
            "--interval-size", "20",
            "--force",
            "--out-dir", str(out_dir),
        ]
    )
    assert rc == 0
    for fname in ("modified_bases.tsv", "valid_mm_headers.tsv"):
        assert (out_dir / fname).read_text() == open(f"{RES}/{fname}").read()


def test_check_tags_invalid_records(tmp_path):
    """A BAM with empty/invalid tags yields error counts and exit 1."""
    from modkit_tpu.cli import main

    out_dir = tmp_path / "ct2"
    rc = main(
        [
            "modbam", "check-tags",
            f"{RES}/empty-tags.sorted.bam",
            "--force",
            "--out-dir", str(out_dir),
            "--permissive",
        ]
    )
    assert rc == 0  # permissive
