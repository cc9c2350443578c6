"""Hostile-input discipline for the media decoders/parsers — the same
contract the PDF tokenizer already carries (tests/test_hostile_inputs.py):
at 10^12 documents, corrupt and adversarial payloads are guaranteed, and
the failure mode must be a fast ValueError/NotImplementedError (poison
row), never a hang, an executor-memory event, or a non-Python crash.

Two layers: seeded random corruption sweeps (flips / truncations /
splices over valid payloads), and targeted malicious headers that
declare absurd dimensions or table counts a naive decoder would
allocate against (decompression bombs, 2^32 stts runs, 65k x 65k SOF)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from insurance_pdf_extractor_spark.operators.containers import (
    parse_mp3,
    parse_mp4,
    synth_mp3,
    synth_mp4,
)
from insurance_pdf_extractor_spark.operators.jpeg import decode_jpeg, encode_jpeg
from insurance_pdf_extractor_spark.operators.multimodal import (
    decode_bmp,
    decode_png,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_wav,
    synth_audio,
    synth_image,
)

OK = (ValueError, NotImplementedError)


def _corruptions(payload: bytes, seed: int, n: int = 40):
    """Deterministic corruption stream: byte flips, truncations, random
    splices, and garbage injection — every mutation yielded exactly
    once per seed."""
    rs = np.random.RandomState(seed)
    L = len(payload)
    for _ in range(n):
        kind = rs.randint(4)
        b = bytearray(payload)
        if kind == 0:  # flip 1-16 bytes
            for _ in range(rs.randint(1, 17)):
                b[rs.randint(L)] ^= 1 << rs.randint(8)
            yield bytes(b)
        elif kind == 1:  # truncate
            yield bytes(b[: rs.randint(L)])
        elif kind == 2:  # splice a random window over a random offset
            src = rs.randint(L)
            dst = rs.randint(L)
            ln = rs.randint(1, min(64, L - max(src, dst)) + 1)
            b[dst : dst + ln] = payload[src : src + ln]
            yield bytes(b)
        else:  # inject random garbage bytes
            off = rs.randint(L)
            ln = rs.randint(1, 33)
            b[off : off + ln] = bytes(rs.randint(0, 256, ln, dtype=np.uint8))
            yield bytes(b)


def _synth_mjpeg7():
    from insurance_pdf_extractor_spark.operators.containers import synth_mp4_mjpeg

    return synth_mp4_mjpeg(7)


def _synth_pcm7():
    from insurance_pdf_extractor_spark.operators.containers import synth_mp4_pcm

    return synth_mp4_pcm(7)


def _synth_sowt7():
    from insurance_pdf_extractor_spark.operators.containers import synth_mp4_pcm_sowt

    return synth_mp4_pcm_sowt(7)


def _synth_muxed7():
    from insurance_pdf_extractor_spark.operators.containers import synth_mp4_muxed

    return synth_mp4_muxed(7)


def _full_decode_mp4(b: bytes):
    return _full_decode_track(parse_mp4(b), b)


def _full_decode_muxed(b: bytes):
    """The kernels' view of a muxed file: handler-targeted parse per
    track, then full content decode of each."""
    return (
        _full_decode_track(parse_mp4(b, "vide"), b),
        _full_decode_track(parse_mp4(b, "soun"), b),
    )


def _full_decode_track(m: dict, b: bytes):
    """Scalar mirror of the r5 CONTENT-decode kernels: parse the sample
    table, then decode every sample's bytes (video → per-fourcc image
    decode; 'twos' audio → PCM reassembly + waveform features). The
    corruption sweep must land in ValueError/NotImplementedError/
    struct.error — never a crash, hang, or unbounded allocation."""
    from insurance_pdf_extractor_spark.operators.containers import _decode_mp4_frame
    from insurance_pdf_extractor_spark.operators.multimodal import wav_features
    if m["handler"] == "soun":
        if m["codec"] not in ("twos", "sowt"):
            raise NotImplementedError(m["codec"])
        nch = m["channels"] or 0
        if nch < 1 or m["sample_bits"] != 16:
            raise NotImplementedError("non 16-bit PCM")
        pcm = b"".join(b[off : off + size] for _, off, size, _ in m["samples"])
        if len(pcm) % (2 * nch):
            raise ValueError("partial PCM frame")
        x = np.frombuffer(pcm, dtype=">i2" if m["codec"] == "twos" else "<i2").astype(np.int16)
        if x.size == 0:
            raise ValueError("empty PCM stream")
        if nch > 1:
            x = (x.reshape(-1, nch).astype(np.int64).sum(axis=1) // nch).astype(np.int16)
        return wav_features(x, m["sample_rate_hz"] or 1)
    return [
        _decode_mp4_frame(m["codec"], b[off : off + size])
        for _, off, size, _ in m["samples"]
    ]


@pytest.mark.parametrize(
    "codec,make",
    [
        ("bmp", lambda: encode_bmp(synth_image(7))),
        ("png", lambda: encode_png(synth_image(7))),
        ("jpeg", lambda: encode_jpeg(synth_image(7, 24, 24), quality=90,
                                     subsample=True, restart_interval=2)),
        ("wav", lambda: encode_wav(synth_audio(7), 8000)),
        ("mp3", lambda: synth_mp3(7)),
        ("mp4", lambda: synth_mp4(7)),
        ("mjpeg_mp4", _synth_mjpeg7),
        ("pcm_mp4", _synth_pcm7),
        ("sowt_mp4", _synth_sowt7),
        ("muxed_mp4", _synth_muxed7),
    ],
)
def test_corruption_sweep_never_crashes(codec, make):
    decode = {
        "bmp": decode_bmp,
        "png": decode_png,
        "jpeg": decode_jpeg,
        "wav": decode_wav,
        "mp3": parse_mp3,
        "mp4": parse_mp4,
        "mjpeg_mp4": _full_decode_mp4,
        "pcm_mp4": _full_decode_mp4,
        "sowt_mp4": _full_decode_mp4,
        "muxed_mp4": _full_decode_muxed,
    }[codec]
    payload = make()
    survived = failed = 0
    # stable seed (hash() is per-process randomized; crc32 is not)
    for mutated in _corruptions(payload, seed=zlib.crc32(codec.encode())):
        try:
            decode(mutated)
            survived += 1  # mutation landed in don't-care bytes — fine
        except OK:
            failed += 1
    assert survived + failed == 40


def test_bmp_zero_dimensions_rejected():
    """A BMP declaring width or height 0 decodes to a zero-pixel array
    whose features are silent NaNs (0/0 block means) — it must poison
    loudly instead. Found by the muxed-path fuzz sweep."""
    for field_off in (18, 22):  # biWidth, biHeight
        b = bytearray(encode_bmp(synth_image(1, 8, 8)))
        struct.pack_into("<i", b, field_off, 0)
        with pytest.raises(ValueError, match="non-positive BMP"):
            decode_bmp(bytes(b))
    # negative width is equally hostile (height's sign is top-down)
    b = bytearray(encode_bmp(synth_image(1, 8, 8)))
    struct.pack_into("<i", b, 18, -8)
    with pytest.raises(ValueError, match="non-positive BMP"):
        decode_bmp(bytes(b))


def test_png_decompression_bomb_rejected():
    """A tiny IDAT claiming huge dimensions must be rejected BEFORE
    inflating: 8 KB of zlib-compressed zeros would expand to ~3 GB if
    the declared 32k x 32k header were trusted."""
    w = h = 32768
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    bomb = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 65536, 9))
            + chunk(b"IEND", b""))
    assert len(bomb) < 10_000
    with pytest.raises(ValueError, match="implausible"):
        decode_png(bomb)


def test_png_stream_longer_than_declared_rejected():
    """An IDAT holding MORE pixel data than the header declares is
    corrupt — the bounded inflate must flag it, not silently truncate."""
    img = synth_image(3, 8, 8)
    good = encode_png(img)
    # rebuild with one extra scanline's worth of data in the stream
    raw = bytearray()
    for y in range(8):
        raw.append(0)
        raw.extend(img[y].tobytes())
    raw.extend(b"\x00" * 25)

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    bad = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 8, 8, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
           + chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        decode_png(bad)
    assert (decode_png(good) == img).all()  # the guard spares legit files


def test_jpeg_absurd_sof_dimensions_rejected():
    """Rewrite a valid JPEG's SOF to declare 65500 x 65500: ~2.7e8
    MCUs against a 1 KB payload. Must reject by arithmetic, not by
    attempting the decode loop."""
    b = bytearray(encode_jpeg(synth_image(5)))
    sof = b.index(b"\xff\xc0")
    struct.pack_into(">HH", b, sof + 5, 65500, 65500)
    with pytest.raises(ValueError, match="implausible"):
        decode_jpeg(bytes(b))


def test_jpeg_zero_dimensions_rejected():
    b = bytearray(encode_jpeg(synth_image(5)))
    sof = b.index(b"\xff\xc0")
    struct.pack_into(">HH", b, sof + 5, 0, 0)
    with pytest.raises(ValueError):
        decode_jpeg(bytes(b))


def test_jpeg_sos_unknown_component_rejected():
    """A scan header naming a component id absent from SOF must raise
    ValueError, not leak StopIteration from the lookup."""
    b = bytearray(encode_jpeg(synth_image(5)))
    sos = b.index(b"\xff\xda")
    b[sos + 5] = 0xEE  # first scan component id -> unknown
    with pytest.raises(ValueError, match="unknown component"):
        decode_jpeg(bytes(b))


def test_jpeg_truncated_dqt_rejected():
    """A DQT segment shorter than its 65-byte table must raise
    ValueError, not leak IndexError from the dezigzag."""
    b = bytearray(encode_jpeg(synth_image(5)))
    dqt = b.index(b"\xff\xdb")
    # shrink the declared segment length below one full table
    struct.pack_into(">H", b, dqt + 2, 40)
    del b[dqt + 2 + 40 : dqt + 2 + 67]
    with pytest.raises(ValueError, match="DQT|truncated|marker"):
        decode_jpeg(bytes(b))


def test_jpeg_oversize_magnitude_category_rejected():
    """A DHT whose symbols decode to DC categories >11 (legal only in
    12-bit modes we don't support) must fail fast: unchecked, garbage
    entropy data walks receive(255) into multi-kilobit integers and
    overflows the int64 predictor."""
    img = synth_image(5)
    b = bytearray(encode_jpeg(img))
    dht = b.index(b"\xff\xc4")
    # DHT layout: marker(2) len(2) tc/th(1) bits[16] vals[n]; remap
    # EVERY value symbol of the first (DC) table to 0x3F so whichever
    # code the stream decodes first yields an oversize category
    n = sum(b[dht + 5 : dht + 5 + 16])
    for i in range(n):
        b[dht + 21 + i] = 0x3F
    with pytest.raises(ValueError):
        decode_jpeg(bytes(b))


def test_mp4_giant_stts_run_rejected():
    """stts with one (cnt=2^31, delta) run over a 7-sample stsz must be
    rejected by the cap, not expanded into a 2^31-entry list."""
    raw = bytearray(synth_mp4(3))
    i = raw.index(b"stts")
    # payload layout: ver/flags(4) entry_count(4) then (cnt, delta) runs
    struct.pack_into(">I", raw, i + 4 + 4 + 4, 1 << 31)
    with pytest.raises(ValueError, match="stts runs exceed"):
        parse_mp4(bytes(raw))


def test_mp4_giant_stsz_count_rejected():
    raw = bytearray(synth_mp4(3))
    i = raw.index(b"stsz")
    # ver/flags(4) fixed(4) count(4)
    struct.pack_into(">I", raw, i + 4 + 4 + 4, 1 << 30)
    with pytest.raises(ValueError, match="implausible|truncated"):
        parse_mp4(bytes(raw))


def test_mp4_struct_errors_normalized():
    """Any short-buffer unpack inside the box walk must surface as
    ValueError (the poison-row contract), never a bare struct.error."""
    raw = synth_mp4(2)
    for cut in (9, 20, 60, len(raw) // 2, len(raw) - 3):
        with pytest.raises(OK):
            parse_mp4(raw[:cut])


def test_mp4_zero_sample_table_rejected():
    """A consistent-but-empty sample table (stsz count 0, stts 0 runs,
    stsc 0 entries, stco 0 chunks) with mdhd duration > 0 must be a
    ValueError poison row — before the fix it passed every consistency
    check and crashed sample_frames_mp4 with IndexError on samples[0]."""
    from insurance_pdf_extractor_spark.operators.containers import _box, _full

    stsd = bytearray(synth_mp4(1))
    i = stsd.index(b"stsd") - 4
    stsd_box = bytes(stsd[i : i + struct.unpack_from(">I", stsd, i)[0]])
    stts = _full(b"stts", 0, 0, struct.pack(">I", 0))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, 0))
    stsc = _full(b"stsc", 0, 0, struct.pack(">I", 0))
    stco = _full(b"stco", 0, 0, struct.pack(">I", 0))
    stbl = _box(b"stbl", stsd_box + stts + stsc + stsz + stco)
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    minf = _box(b"minf", vmhd + _box(b"dinf", dref) + stbl)
    mdhd = _full(b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, 1000, 5_000, 0x55C4, 0))
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I4s", 0, b"vide") + b"\x00" * 13)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", mdia)
    moov = _box(b"moov", trak)
    payload = _box(b"ftyp", b"isom\x00\x00\x02\x00isom") + moov
    with pytest.raises(ValueError, match="empty stsz"):
        parse_mp4(payload)


def test_mp4_zero_timescale_rejected():
    """mdhd timescale=0 must be ValueError, not ZeroDivisionError."""
    raw = bytearray(synth_mp4(2))
    i = raw.index(b"mdhd")
    # box payload: ver/flags(4) ctime(4) mtime(4) timescale(4) ...
    struct.pack_into(">I", raw, i + 4 + 4 + 4 + 4, 0)
    with pytest.raises(ValueError, match="timescale"):
        parse_mp4(bytes(raw))


def test_mp4_inflated_mdhd_duration_rejected():
    """mdhd duration beyond the stts delta total is hostile — it would
    drive ~duration/every_ms row generation in frame sampling."""
    raw = bytearray(synth_mp4(2))
    i = raw.index(b"mdhd")
    # ver/flags(4) ctime(4) mtime(4) timescale(4) duration(4)
    struct.pack_into(">I", raw, i + 4 + 16, 0xFFFFFFFF)
    with pytest.raises(ValueError, match="duration exceeds"):
        parse_mp4(bytes(raw))


def test_jpeg_short_sof_sos_dri_segments_are_valueerror():
    """Segments whose declared length is internally consistent but
    shorter than the fields read from them must poison as ValueError,
    never leak IndexError/struct.error (the normalization wrapper)."""
    img = encode_jpeg(synth_image(5, 24, 16))

    def seg_off(marker: int) -> int:
        pos = 2
        while True:
            assert img[pos] == 0xFF
            m = img[pos + 1]
            if m == marker:
                return pos
            pos += 2 + struct.unpack_from(">H", img, pos + 2)[0]

    # SOF0 declaring nc=3 but truncated component list: rewrite seglen=8
    sof = seg_off(0xC0)
    b = bytearray(img)
    struct.pack_into(">H", b, sof + 2, 8)
    b[sof + 2 + 2 + 5] = 3  # nc
    # drop the rest of the original segment so lengths stay consistent
    orig_len = struct.unpack_from(">H", img, sof + 2)[0]
    hostile = bytes(b[: sof + 2 + 8]) + img[sof + 2 + orig_len :]
    with pytest.raises(OK):
        decode_jpeg(hostile)

    # DRI with an empty body (seglen=2)
    hostile = img[:2] + b"\xff\xdd\x00\x02" + img[2:]
    with pytest.raises(OK):
        decode_jpeg(hostile)

    # SOS whose body is shorter than 1 + 2*ns
    sos = seg_off(0xDA)
    orig_len = struct.unpack_from(">H", img, sos + 2)[0]
    b = bytearray(img[: sos + 2 + 3])  # keep only seglen + ns byte
    struct.pack_into(">H", b, sos + 2, 3)
    hostile = bytes(b) + img[sos + 2 + orig_len :]
    with pytest.raises(OK):
        decode_jpeg(hostile)


def test_mp3_id3v2_footer_flag_parses():
    """The ID3v2.4 footer flag adds 10 bytes NOT counted in the syncsafe
    size; a spec-legal file with it must parse, not 'lose sync'."""
    base = synth_mp3(1)  # doc_id=1 -> no ID3 tag prepended
    assert base[:3] != b"ID3"
    body = bytes(range(20))
    n = len(body)
    syncsafe = bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F])
    tag = b"ID3\x04\x00\x10" + syncsafe + body + b"3DI\x04\x00\x10" + syncsafe
    meta = parse_mp3(tag + base)
    assert meta["n_frames"] == parse_mp3(base)["n_frames"]


def test_mp3_trailing_id3v1_tag_parses():
    """A trailing 128-byte ID3v1 'TAG' block is ubiquitous on legal
    files and must terminate the frame walk, not raise lost-sync."""
    base = synth_mp3(1)
    id3v1 = b"TAG" + bytes(125)
    meta = parse_mp3(base + id3v1)
    assert meta["n_frames"] == parse_mp3(base)["n_frames"]
    # but a TAG block of the wrong size is still lost sync
    with pytest.raises(ValueError, match="lost MP3 sync"):
        parse_mp3(base + b"TAG" + bytes(40))


def test_mp4_hostile_stsc_first_chunk_rejected_before_allocation():
    """An stsc entry whose first_chunk is absurd (e.g. ~2^32) must be a
    fast ValueError — before the fix, `per_chunk.extend([spc] * run)`
    allocated the full run (~34 GB at 2^32) and the inconsistency check
    only fired afterwards."""
    import time

    raw = bytearray(synth_mp4(7))
    i = raw.index(b"stsc")
    # box payload: ver/flags(4) entry_count(4) entries(12 each)
    (n_sc,) = struct.unpack_from(">I", raw, i + 8)
    assert n_sc >= 1
    for hostile_first in (100_000_000, 0xFFFFFFFE):
        bad = bytearray(raw)
        struct.pack_into(">I", bad, i + 12, hostile_first)
        t0 = time.perf_counter()
        with pytest.raises(ValueError, match="stsc runs inconsistent"):
            parse_mp4(bytes(bad))
        assert time.perf_counter() - t0 < 0.5  # rejected, not allocated


def test_jpeg_coefficient_buffer_cap():
    """The per-byte plausibility bound admits ~4 blocks per payload
    byte, so a large legal-length payload could still declare millions
    of blocks (GBs of int64 coefficient buffers + a multi-minute Python
    entropy loop). The absolute MAX_DECODE_BLOCKS cap must fire first."""
    from insurance_pdf_extractor_spark.operators.jpeg import MAX_DECODE_BLOCKS

    hdr = bytearray(encode_jpeg(synth_image(1, 16, 16)[..., 0]))  # grayscale
    sof = hdr.index(b"\xff\xc0")
    struct.pack_into(">HH", hdr, sof + 5, 8000, 8000)  # 1e6 blocks
    assert 8000 // 8 * (8000 // 8) > MAX_DECODE_BLOCKS
    big = bytes(hdr) + b"\x00" * (1024 * 1024)  # per-byte bound allows 4e6
    with pytest.raises(ValueError, match="coefficient buffer over cap"):
        decode_jpeg(big)
