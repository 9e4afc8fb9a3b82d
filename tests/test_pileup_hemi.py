"""pileup-hemi conformance vs the reference goldens.

The GRCh38_chr20.fa fixture is not shipped; the reference sequence over
the covered region is reconstructed exactly from the duplex reads'
CIGAR+MD tags (uncovered bases become 'N', which contain no motifs and
produce no rows, matching the real FASTA's output on this region).
"""

import re

import numpy as np
import pytest

RES = "/root/reference/tests/resources"
DUPLEX_BAM = f"{RES}/duplex_modcalls_sort.bam"


def _reconstruct_ref(bam_path: str, chrom_len: int) -> np.ndarray:
    from modkit_tpu.io.bam import BamReader

    ref = np.zeros(chrom_len, dtype=np.uint8)
    for rec in BamReader(bam_path).records():
        if rec.is_unmapped:
            continue
        md = dict(rec.aux_items()).get("MD")
        if md is None:
            continue
        md = md[1]
        seq = rec.seq_bytes()
        cg = rec.cigar
        ops, lens = cg & 0xF, cg >> 4
        order = []
        q, rp = 0, rec.pos
        for op, ln in zip(ops, lens):
            if op in (0, 7, 8):
                for k in range(ln):
                    order.append((rp + k, q + k))
                q += ln
                rp += ln
            elif op in (1, 4):
                q += ln
            elif op == 2:
                for k in range(ln):
                    order.append((rp + k, None))
                rp += ln
            elif op == 3:
                rp += ln
        idx = 0
        for num, dele, sub in re.findall(
            r"(\d+)|(\^[A-Za-z]+)|([A-Za-z])", md
        ):
            if num:
                for _ in range(int(num)):
                    rpos, qpos = order[idx]
                    idx += 1
                    ref[rpos] = seq[qpos]
            elif dele:
                for ch in dele[1:]:
                    rpos, _ = order[idx]
                    idx += 1
                    ref[rpos] = ord(ch.upper())
            else:
                rpos, _ = order[idx]
                idx += 1
                ref[rpos] = ord(sub.upper())
    ref[ref == 0] = ord("N")
    return ref


@pytest.fixture(scope="module")
def chr20_fa(tmp_path_factory):
    ref = _reconstruct_ref(DUPLEX_BAM, 64_444_167)
    fa = tmp_path_factory.mktemp("hemi") / "chr20.fa"
    with open(fa, "w") as fh:
        fh.write(">chr20\n")
        s = ref.tobytes().decode()
        for i in range(0, len(s), 10_000):
            fh.write(s[i : i + 10_000] + "\n")
    return str(fa)


def test_pileup_hemi_nofilt(tmp_path, chr20_fa):
    """tests/test_pileup_hemi.rs test_pileup_hemi_hm."""
    from modkit_tpu.cli import main

    out = tmp_path / "hemi_nofilt.bed"
    rc = main(
        [
            "pileup-hemi", DUPLEX_BAM,
            "-o", str(out),
            "-r", chr20_fa,
            "--motif", "CG", "0",
            "--region", "chr20:22,613,835-22,640,468",
            "--no-filtering",
            "--mixed-delim",
        ]
    )
    assert rc == 0
    assert out.read_text() == open(f"{RES}/duplex_hemi_nofilt.bed").read()


def test_pileup_hemi_preset(tmp_path, chr20_fa):
    """tests/test_pileup_hemi.rs test_pileup_hemi_preset (--cpg with
    estimated threshold)."""
    from modkit_tpu.cli import main

    out = tmp_path / "hemi.bed"
    rc = main(
        [
            "pileup-hemi", DUPLEX_BAM,
            "-o", str(out),
            "-r", chr20_fa,
            "--cpg",
            "--region", "chr20:22,613,835-22,640,468",
            "--mixed-delim",
        ]
    )
    assert rc == 0
    assert out.read_text() == open(f"{RES}/duplex_hemi.bed").read()
