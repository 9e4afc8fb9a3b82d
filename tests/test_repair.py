"""repair: donor->acceptor MM/ML projection vs the hand-checked golden BAM
(mirrors tests/test_repair.rs)."""

RES = "/root/reference/tests/resources"


def test_repair_regression(tmp_path):
    from modkit_tpu.cli import main
    from modkit_tpu.io.bam import BamReader

    out = tmp_path / "repaired.bam"
    rc = main(
        [
            "repair",
            "--donor", f"{RES}/donor_read_sort.bam",
            "--acceptor", f"{RES}/trimmed_read_sort.mapped.bam",
            "-o", str(out),
        ]
    )
    assert rc == 0

    def load(path, strip_mn):
        return {
            rec.name: rec.with_replaced_aux({"MN"} if strip_mn else set(), [])
            for rec in BamReader(path).records()
        }

    mine = load(str(out), strip_mn=True)
    gold = load(f"{RES}/trimmed_read_sort_mods.mapped.bam", strip_mn=False)
    assert set(mine) == set(gold)
    for q in gold:
        assert mine[q] == gold[q], f"record {q} not the same"


def test_repair_mn_tag(tmp_path):
    from modkit_tpu.cli import main
    from modkit_tpu.io.bam import BamReader
    from modkit_tpu.modtags import decode_record

    out = tmp_path / "repaired_mn.bam"
    rc = main(
        [
            "repair",
            "--donor", f"{RES}/donor_read_sort_mn_tag.bam",
            "--acceptor", f"{RES}/trimmed_read_sort_mn_tag.mapped.bam",
            "-o", str(out),
        ]
    )
    assert rc == 0
    n_usable = 0
    for rec in BamReader(str(out)).records():
        mn = rec.get_aux("MN")
        assert mn is not None and mn[1] == rec.l_seq
        info = decode_record(rec)
        if not info.is_empty():
            n_usable += 1
    assert n_usable >= 10
