"""Synthetic modBAM generator for benchmarks and scale tests.

Builds a coordinate-sorted, indexed modBAM of reads tiled across a
synthetic contig with CpG 5mC/5hmC calls in MM/ML tags -- the WGS-style
workload used by bench.py (the reference ships no benchmark corpus;
BASELINE.md measures on synthetic 30x data).
"""

from __future__ import annotations

import struct

import numpy as np

from ..io.bam import BamHeader, BamRecord, BamWriter, Reference, build_bai


def _encode_record(
    name: bytes,
    tid: int,
    pos: int,
    seq: np.ndarray,  # uint8 ASCII
    mm: str,
    ml: np.ndarray,
    flag: int = 0,
    mapq: int = 60,
) -> bytes:
    l_seq = len(seq)
    cigar = np.array([(l_seq << 4) | 0], dtype="<u4")  # {L}M
    nib = np.zeros((l_seq + 1) // 2, dtype=np.uint8)
    code = np.zeros(l_seq, dtype=np.uint8)
    for b, v in ((ord("A"), 1), (ord("C"), 2), (ord("G"), 4), (ord("T"), 8)):
        code[seq == b] = v
    nib = (code[0::2] << 4).astype(np.uint8)
    if l_seq % 2 == 0:
        nib |= code[1::2]
    else:
        nib[:-1] |= code[1::2]
    quals = np.full(l_seq, 30, dtype=np.uint8)
    l_read_name = len(name) + 1
    bin_ = 0
    buf = struct.pack(
        "<iiBBHHHiiii",
        tid, pos, l_read_name, mapq, bin_, len(cigar), flag,
        l_seq, -1, -1, 0,
    )
    buf += name + b"\x00"
    buf += cigar.tobytes()
    buf += nib.tobytes()
    buf += quals.tobytes()
    buf += b"MMZ" + mm.encode() + b"\x00"
    buf += b"MLB" + b"C" + struct.pack("<I", len(ml)) + ml.astype(np.uint8).tobytes()
    buf += b"NMC" + bytes([0])
    return buf


def make_synthetic_modbam(
    path: str,
    n_reads: int = 2000,
    read_len: int = 5000,
    contig_len: int | None = None,
    coverage: float = 30.0,
    seed: int = 0,
    mods=("m", "h"),
    fasta_out: str | None = None,
) -> dict:
    """Write a sorted+indexed modBAM (and optionally the reference FASTA
    the reads were drawn from); returns summary stats."""
    rng = np.random.default_rng(seed)
    if contig_len is None:
        contig_len = max(int(n_reads * read_len / coverage), read_len + 1)
    # genome with ~5% CpG density
    genome = rng.choice(
        np.frombuffer(b"ACGT", dtype=np.uint8), size=contig_len
    )
    if fasta_out is not None:
        with open(fasta_out, "w") as fh:
            fh.write(">synth1\n")
            text = genome.tobytes().decode()
            for i in range(0, len(text), 80):
                fh.write(text[i : i + 80] + "\n")
    starts = np.sort(
        rng.integers(0, contig_len - read_len, size=n_reads)
    )
    header = BamHeader(
        "@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:synth1\tLN:%d\n" % contig_len,
        [Reference("synth1", contig_len)],
    )
    n_calls = 0
    with BamWriter(path, header) as writer:
        for i in range(n_reads):
            pos = int(starts[i])
            seq = genome[pos : pos + read_len].copy()
            c_pos = np.nonzero(seq == ord("C"))[0]
            if len(c_pos) == 0:
                continue
            # mod calls at every C (forward strand reads): the MM delta
            # list counts skipped C occurrences, so all-zero deltas
            deltas = np.zeros(len(c_pos), dtype=np.int64)
            # two mod codes share positions: C+h?,...;C+m?,...
            probs_m = rng.random(len(c_pos)).astype(np.float32)
            probs_h = (1.0 - probs_m) * rng.random(len(c_pos)).astype(
                np.float32
            )
            ml_h = np.clip((probs_h * 256).astype(np.int32), 0, 255)
            ml_m = np.clip((probs_m * 256).astype(np.int32), 0, 255)
            dstr = ",".join(str(int(d)) for d in deltas)
            mm = f"C+h?,{dstr};C+m?,{dstr};"
            ml = np.concatenate([ml_h, ml_m]).astype(np.uint8)
            raw = _encode_record(
                f"read_{i}".encode(), 0, pos, seq, mm, ml
            )
            writer.write_raw(raw)
            n_calls += 2 * len(c_pos)
    build_bai(path)
    return dict(
        n_reads=n_reads,
        read_len=read_len,
        contig_len=contig_len,
        n_mod_calls=n_calls,
    )
