"""Test-only CRAM 3.0 writers: block transcoding (recompress a fixture's
blocks with bzip2/lzma) and a minimal multi-reference container builder.
Wire format mirrors modkit_tpu/io/cram.py's parsers (CRAM 3.0 spec)."""

import bz2
import gzip
import lzma
import struct

from modkit_tpu.io.cram import Cursor


def itf8(v: int) -> bytes:
    v &= 0xFFFFFFFF
    if v < 0x80:
        return bytes([v])
    if v < 0x4000:
        return bytes([0x80 | (v >> 8), v & 0xFF])
    if v < 0x200000:
        return bytes([0xC0 | (v >> 16), (v >> 8) & 0xFF, v & 0xFF])
    if v < 0x10000000:
        return bytes(
            [0xE0 | (v >> 24), (v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF]
        )
    return bytes(
        [0xF0 | (v >> 28), (v >> 24) & 0xFF, (v >> 16) & 0xFF,
         (v >> 8) & 0xFF, v & 0xFF]
    )


def ltf8(v: int) -> bytes:
    if 0 <= v < 0x80:
        return bytes([v])
    # 8-byte form is always valid
    return bytes([0xFF]) + v.to_bytes(8, "big", signed=False)


def arr_itf8(vals) -> bytes:
    return itf8(len(vals)) + b"".join(itf8(v) for v in vals)


RAW, GZIP, BZIP2, LZMA = 0, 1, 2, 3


def write_block(method: int, ctype: int, cid: int, raw: bytes) -> bytes:
    if method == RAW:
        payload = raw
    elif method == GZIP:
        payload = gzip.compress(raw)
    elif method == BZIP2:
        payload = bz2.compress(raw)
    elif method == LZMA:
        payload = lzma.compress(raw)  # .xz container, as htslib writes
    else:
        raise ValueError(method)
    return (
        bytes([method, ctype]) + itf8(cid) + itf8(len(payload))
        + itf8(len(raw)) + payload + b"\x00\x00\x00\x00"
    )


def enc_external(cid: int) -> bytes:
    params = itf8(cid)
    return itf8(1) + itf8(len(params)) + params


def enc_byte_array_stop(stop: int, cid: int) -> bytes:
    params = bytes([stop]) + itf8(cid)
    return itf8(5) + itf8(len(params)) + params


def compression_header(series: dict, tag_dict_blob: bytes = b"\x00",
                       ref_required: bool = True) -> bytes:
    # preservation map: RN=1 names included, AP=0 absolute positions,
    # RR per flag, TD = one empty tag line
    pm = (
        b"RN\x01" + b"AP\x00"
        + b"RR" + (b"\x01" if ref_required else b"\x00")
        + b"TD" + itf8(len(tag_dict_blob)) + tag_dict_blob
    )
    pm_body = itf8(4) + pm
    out = itf8(len(pm_body)) + pm_body
    sr = itf8(len(series))
    for key, enc in series.items():
        sr += key + enc
    sr_body = sr
    out += itf8(len(sr_body)) + sr_body
    te_body = itf8(0)
    out += itf8(len(te_body)) + te_body
    return out


def file_header_container(text: str) -> bytes:
    raw = struct.pack("<i", len(text)) + text.encode()
    blk = write_block(RAW, 0, 0, raw)
    body = blk
    head = (
        itf8(0)            # ref  (htslib writes 0 here)
        + itf8(0) + itf8(0) + itf8(0)   # start span nrec
        + ltf8(0) + ltf8(0)             # counter bases
        + itf8(1)                        # nblocks
        + arr_itf8([0])                  # landmarks
    )
    return (
        struct.pack("<i", len(body)) + head + b"\x00\x00\x00\x00" + body
    )


def eof_container() -> bytes:
    head = (
        itf8(-1 & 0xFFFFFFFF)
        + itf8(0x454F46) + itf8(0) + itf8(0)
        + ltf8(0) + ltf8(0)
        + itf8(0) + arr_itf8([])
    )
    return struct.pack("<i", 0) + head + b"\x00\x00\x00\x00"


def build_multiref_cram(
    header_text: str, reads, method: int = RAW,
    ref_required: bool = True, seqs: dict | None = None,
    slice_ref: int = -2,
) -> bytes:
    """One multi-reference container (ref = -2, per-record RI) holding
    ``reads``: list of (name, flag, rid, pos0, length, quals bytes).
    Records are full reference matches (FN=0) so sequence reconstruction
    exercises the per-record reference lookup.

    ``ref_required=False`` writes an RR=0 file (no-ref CRAM): each
    record stores its bases verbatim via a single 'b' feature, pulled
    from ``seqs`` (contig name -> str). ``slice_ref`` overrides the
    slice header's reference id (e.g. a fixed >=0 rid inside a -2
    container — a spec-gray layout some writers produce)."""
    # per-series external streams
    keys = ["BF", "CF", "RI", "RL", "AP", "RG", "TL", "FN", "MQ"]
    if not ref_required:
        keys += ["FC", "FP"]
    streams = {k: bytearray() for k in keys}
    names = bytearray()
    quals = bytearray()
    seq_bytes = bytearray()
    contig_names = [
        l.split("\t")[1][3:]
        for l in header_text.splitlines()
        if l.startswith("@SQ")
    ]
    for name, flag, rid, pos0, length, q in reads:
        streams["BF"] += itf8(flag)
        streams["CF"] += itf8(1)          # quals stored
        streams["RI"] += itf8(rid)
        streams["RL"] += itf8(length)
        streams["AP"] += itf8(pos0 + 1)   # absolute (AP=0 preservation)
        streams["RG"] += itf8(-1 & 0xFFFFFFFF)
        streams["TL"] += itf8(0)
        if ref_required:
            streams["FN"] += itf8(0)      # perfect reference match
        else:
            # no-ref record: one 'b' feature stores the bases verbatim
            streams["FN"] += itf8(1)
            streams["FC"] += b"b"
            streams["FP"] += itf8(1)
            seq_bytes += seqs[contig_names[rid]][
                pos0 : pos0 + length
            ].encode() + b"\x00"
        streams["MQ"] += itf8(60)
        names += name.encode() + b"\t"
        quals += q
    cids = {k: i + 1 for i, k in enumerate(streams)}
    cids["RN"] = len(cids) + 1
    cids["QS"] = len(cids) + 1
    series = {k.encode(): enc_external(cids[k]) for k in streams}
    series[b"RN"] = enc_byte_array_stop(9, cids["RN"])  # '\t' stop
    series[b"QS"] = enc_external(cids["QS"])
    if not ref_required:
        cids["BB"] = len(cids) + 1
        series[b"BB"] = enc_byte_array_stop(0, cids["BB"])
    comp_raw = compression_header(series, ref_required=ref_required)

    n = len(reads)
    min_pos = min(r[3] for r in reads)
    max_end = max(r[3] + r[4] for r in reads)
    slice_hdr = (
        itf8(slice_ref & 0xFFFFFFFF)
        + itf8(min_pos + 1) + itf8(max_end - min_pos)
        + itf8(n) + ltf8(0)
        + itf8(1 + len(streams) + 2 + (0 if ref_required else 1))
        + arr_itf8(sorted(cids.values()))
        + itf8(-1 & 0xFFFFFFFF)   # no embedded ref
        + b"\x00" * 16            # md5
    )

    blocks = [write_block(method, 1, 0, comp_raw)]
    slice_blocks = [write_block(method, 2, 0, slice_hdr),
                    write_block(RAW, 5, 0, b"")]  # empty core
    for k, stream in streams.items():
        slice_blocks.append(
            write_block(method, 4, cids[k], bytes(stream))
        )
    slice_blocks.append(write_block(method, 4, cids["RN"], bytes(names)))
    slice_blocks.append(write_block(method, 4, cids["QS"], bytes(quals)))
    if not ref_required:
        slice_blocks.append(
            write_block(method, 4, cids["BB"], bytes(seq_bytes))
        )

    body = blocks[0]
    landmark = len(body)
    for b in slice_blocks:
        body += b
    head = (
        itf8(-2 & 0xFFFFFFFF)
        + itf8(min_pos + 1) + itf8(max_end - min_pos) + itf8(n)
        + ltf8(0) + ltf8(0)
        + itf8(1 + len(slice_blocks))
        + arr_itf8([landmark])
    )
    container = (
        struct.pack("<i", len(body)) + head + b"\x00\x00\x00\x00" + body
    )
    return (
        b"CRAM" + bytes([3, 0]) + b"\x00" * 20
        + file_header_container(header_text)
        + container
        + eof_container()
    )


def transcode_cram(data: bytes, method: int) -> bytes:
    """Recompress every data-container block with ``method`` (container
    structure, landmarks and lengths rebuilt; CRCs zeroed — parsers skip
    them)."""
    from modkit_tpu.io.cram import read_block

    out = bytearray(data[:26])
    cur = Cursor(data, 26)
    first = True
    while cur.pos < len(data):
        cont_start = cur.pos
        length = int.from_bytes(cur.bytes(4), "little", signed=True)
        ref = cur.itf8()
        start = cur.itf8()
        span = cur.itf8()
        nrec = cur.itf8()
        counter = cur.ltf8()
        bases = cur.ltf8()
        nblocks = cur.itf8()
        landmarks = cur.array_itf8()
        cur.bytes(4)
        body_start = cur.pos
        if not first and nrec == 0 and ref == -1:
            out += data[cont_start:]
            break
        if first:
            out += data[cont_start:body_start + length]
            cur.pos = body_start + length
            first = False
            continue
        # which body offsets hold slice-header blocks (landmark targets)?
        lm_set = set(landmarks)
        bcur = Cursor(data, body_start)
        new_body = bytearray()
        new_landmarks = []
        for _ in range(nblocks):
            off_in_body = bcur.pos - body_start
            blk = read_block(bcur)
            if off_in_body in lm_set:
                new_landmarks.append(len(new_body))
            m = RAW if blk.content_type == 5 and not blk.data else method
            new_body += write_block(
                m, blk.content_type, blk.content_id, blk.data
            )
        head = (
            itf8(ref & 0xFFFFFFFF) + itf8(start) + itf8(span) + itf8(nrec)
            + ltf8(counter) + ltf8(bases) + itf8(nblocks)
            + arr_itf8(new_landmarks)
        )
        out += (
            struct.pack("<i", len(new_body)) + head
            + b"\x00\x00\x00\x00" + bytes(new_body)
        )
        cur.pos = body_start + length
    return bytes(out)
