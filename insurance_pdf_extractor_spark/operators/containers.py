"""Real container/framing parsers for the two formats whose CONTENT
decode stays a codec seam: MPEG audio (MP3) frame streams and ISO BMFF
(MP4) sample tables.

What a 100-TB media pass actually needs from these formats is almost
never the decoded waveform/pixels — it is the container metadata
(duration, bitrate, frame count, codec fourcc) and the byte extents of
individual samples so frame sampling can slice exactly the bytes it
wants. Both are pure struct parsing over public specs (ISO/IEC 11172-3
frame headers; ISO/IEC 14496-12 box structure), implementable with
stdlib `struct` alone — so THIS half is real here, while Huffman/DCT
decode of the sliced payloads remains the explicit
``NotImplementedError`` seam in :mod:`.multimodal`.

Everything below is per-row compute that runs inside the Arrow batch
kernels (mapInPandas) — no JVM round-trips, no per-row Python UDFs.
Corrupt payloads raise ``ValueError`` (poison row); legal-but-
unsupported modes raise ``NotImplementedError`` (loud seam).

Reference anchor: the reference validates uploads by magic prefix and
extracts per-file metadata before processing (app/models/request.py
upload validation, app/services/pdf_processor.py metadata pass); these
parsers are that stage for audio/video members of the interleaved
corpus.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# --- MPEG-1 Layer III (MP3) frame stream -------------------------------
# Public tables from ISO/IEC 11172-3. Only MPEG-1 Layer III mono is
# synthesized/parsed; other versions/layers raise NotImplementedError.

MP3_BITRATE_KBPS = (  # index 1..14 (0 = free, 15 = bad)
    None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, None,
)
MP3_SAMPLE_RATES = (44100, 48000, 32000, None)  # index 0..2 (3 = reserved)
MP3_SAMPLES_PER_FRAME = 1152  # MPEG-1 Layer III


def mp3_frame_len(bitrate_kbps: int, sample_rate: int, padding: int) -> int:
    """Layer III MPEG-1 frame length in bytes (spec formula)."""
    return (144 * bitrate_kbps * 1000) // sample_rate + padding


def encode_mp3_stream(
    frame_specs: list[tuple[int, int]],
    sr_idx: int = 0,
    body_byte=lambda i, j: (i * 29 + j * 101) % 256,
    id3_body: bytes | None = None,
) -> bytes:
    """Build a VALID MPEG-1 Layer III frame stream: correct sync words,
    header fields, and per-frame lengths, with deterministic filler as
    the (Huffman-coded in real files) main data. ``frame_specs`` is a
    list of (bitrate_index 1..14, padding 0|1) per frame. An optional
    ID3v2 tag (syncsafe length) is prepended when ``id3_body`` is given.

    The stream parses with any spec-conforming walker; only the AUDIO
    content is synthetic — which is exactly the honest analog of the
    fixture PDFs: real framing, deterministic payload.
    """
    sr = MP3_SAMPLE_RATES[sr_idx]
    parts = []
    if id3_body is not None:
        n = len(id3_body)
        if n >= 1 << 28:
            raise ValueError("ID3v2 body too large for syncsafe size")
        syncsafe = bytes(
            [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F]
        )
        parts.append(b"ID3\x04\x00\x00" + syncsafe + id3_body)
    for i, (br_idx, padding) in enumerate(frame_specs):
        kbps = MP3_BITRATE_KBPS[br_idx]
        if kbps is None:
            raise ValueError(f"invalid bitrate index {br_idx}")
        flen = mp3_frame_len(kbps, sr, padding)
        # sync(11) | version=11 MPEG1 | layer=01 III | prot=1 no CRC
        hdr = bytes(
            [
                0xFF,
                0xFB,
                (br_idx << 4) | (sr_idx << 2) | (padding << 1),
                0xC4,  # mono | mode_ext 0 | (c)0 orig 1 | emphasis none
            ]
        )
        body = bytes(body_byte(i, j) for j in range(flen - 4))
        parts.append(hdr + body)
    return b"".join(parts)


def parse_mp3(payload: bytes) -> dict:
    """Walk an MP3 frame stream by computed frame lengths (no resync
    heuristics — a malformed header is a loud error, not a skip).

    Returns ``{"sample_rate", "frames": [(idx, offset, length,
    bitrate_kbps, padding)], "n_frames", "duration_ms",
    "mean_kbps"}``. Skips one leading ID3v2 tag (syncsafe size).
    ``ValueError`` on garbage/truncation; ``NotImplementedError`` on
    legal non-MPEG1-Layer-III streams. Skips one leading ID3v2 tag
    (syncsafe size, footer flag honored) and a trailing 128-byte ID3v1
    tag — both ubiquitous on legal files.
    """
    pos = 0
    if payload[:3] == b"ID3":
        if len(payload) < 10:
            raise ValueError("truncated ID3v2 header")
        if any(b & 0x80 for b in payload[6:10]):
            raise ValueError("ID3v2 size bytes not syncsafe")
        size = (
            (payload[6] << 21) | (payload[7] << 14) | (payload[8] << 7) | payload[9]
        )
        pos = 10 + size
        if payload[5] & 0x10:
            # ID3v2.4 footer flag: a 10-byte footer follows the tag and
            # is NOT counted in the syncsafe size (id3v2.4.0-structure
            # §3.1) — without this, spec-legal files "lose sync" on the
            # footer's '3DI' bytes
            pos += 10
        if pos > len(payload):
            raise ValueError("ID3v2 tag overruns payload")
    frames: list[tuple[int, int, int, int, int]] = []
    sample_rate = None
    idx = 0
    while pos < len(payload):
        if len(payload) - pos == 128 and payload[pos : pos + 3] == b"TAG":
            break  # trailing ID3v1 tag — ubiquitous on legal files
        if pos + 4 > len(payload):
            raise ValueError("truncated MP3 frame header")
        b0, b1, b2, _b3 = payload[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise ValueError(f"lost MP3 sync at offset {pos}")
        version = (b1 >> 3) & 0x3
        layer = (b1 >> 1) & 0x3
        if version != 0x3:
            raise NotImplementedError("only MPEG-1 audio supported (not MPEG-2/2.5)")
        if layer != 0x1:
            raise NotImplementedError("only Layer III supported")
        br_idx = (b2 >> 4) & 0xF
        sr_idx = (b2 >> 2) & 0x3
        padding = (b2 >> 1) & 0x1
        kbps = MP3_BITRATE_KBPS[br_idx]
        sr = MP3_SAMPLE_RATES[sr_idx]
        if kbps is None or sr is None:
            raise ValueError(f"invalid bitrate/samplerate index at offset {pos}")
        if sample_rate is None:
            sample_rate = sr
        elif sr != sample_rate:
            raise ValueError("sample rate changes mid-stream")
        flen = mp3_frame_len(kbps, sr, padding)
        if pos + flen > len(payload):
            raise ValueError(f"truncated MP3 frame body at offset {pos}")
        frames.append((idx, pos, flen, kbps, padding))
        pos += flen
        idx += 1
    if not frames:
        raise ValueError("no MP3 frames found")
    duration_ms = len(frames) * MP3_SAMPLES_PER_FRAME * 1000 // sample_rate
    return {
        "sample_rate": sample_rate,
        "frames": frames,
        "n_frames": len(frames),
        "duration_ms": duration_ms,
        "mean_kbps": sum(f[3] for f in frames) / len(frames),
    }


# --- ISO BMFF (MP4) -----------------------------------------------------
# Minimal-but-real box writer and a general sample-table reader:
# stts/stsz/stsc/stco(co64) expansion to per-sample (offset, size,
# decode timestamp), exactly what frame sampling needs. 14496-12 is the
# public spec; the structure below is the standard progressive layout
# (ftyp, mdat, moov).


def _box(tag: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + tag + payload


def _full(tag: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(tag, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + payload)


_MATRIX = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def _chunk_blobs(blobs: list[bytes], first_chunk: int, per_chunk: int) -> list[list[bytes]]:
    chunks: list[list[bytes]] = []
    i = 0
    while i < len(blobs):
        take = first_chunk if not chunks else per_chunk
        chunks.append(blobs[i : i + take])
        i += take
    return chunks


def _stbl(blobs: list[bytes], deltas: list[int], chunks: list[list[bytes]],
          offs: list[int], stsd_entry: bytes) -> bytes:
    """Sample-table box from the chunk layout: stts RLE of ``deltas``,
    per-sample stsz, stsc runs from ACTUAL per-chunk counts (the last
    chunk may be short — 14496-12 has no partial-chunk rule), absolute
    stco offsets, and the given sample-entry box inside stsd."""
    runs: list[tuple[int, int]] = []
    for d in deltas:
        if runs and runs[-1][1] == d:
            runs[-1] = (runs[-1][0] + 1, d)
        else:
            runs.append((1, d))
    stts = _full(
        b"stts", 0, 0,
        struct.pack(">I", len(runs))
        + b"".join(struct.pack(">II", n, d) for n, d in runs),
    )
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, len(blobs))
        + b"".join(struct.pack(">I", len(fb)) for fb in blobs),
    )
    stsc_entries: list[tuple[int, int, int]] = []
    for ci, c in enumerate(chunks, start=1):
        if not stsc_entries or stsc_entries[-1][1] != len(c):
            stsc_entries.append((ci, len(c), 1))
    stsc = _full(
        b"stsc", 0, 0,
        struct.pack(">I", len(stsc_entries))
        + b"".join(struct.pack(">III", *e) for e in stsc_entries),
    )
    stco = _full(
        b"stco", 0, 0,
        struct.pack(">I", len(offs)) + b"".join(struct.pack(">I", o) for o in offs),
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + stsd_entry)
    return _box(b"stbl", stsd + stts + stsc + stsz + stco)


def _vse(width: int, height: int) -> bytes:
    """Minimal VisualSampleEntry body (14496-12 8.5.2): 6 reserved +
    data_ref idx, 16 predefined/reserved, width/height, resolutions,
    frame count, compressorname(32), depth, predefined."""
    return (
        b"\x00" * 6
        + struct.pack(">H", 1)
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x480000, 0x480000)
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)
        + b"\x00" * 32
        + struct.pack(">Hh", 24, -1)
    )


def _ase(channels: int, sample_rate: int) -> bytes:
    """AudioSampleEntry body (14496-12 §12.2.3): 6 reserved +
    data_ref_index, 8 reserved, channelcount, samplesize=16,
    pre_defined, reserved, samplerate as 16.16 fixed."""
    return (
        b"\x00" * 6
        + struct.pack(">H", 1)
        + b"\x00" * 8
        + struct.pack(">HH", channels, 16)
        + struct.pack(">HH", 0, 0)
        + struct.pack(">I", sample_rate << 16)
    )


def _trak(stbl: bytes, timescale: int, duration: int, handler: bytes,
          track_id: int = 1, width: int = 0, height: int = 0) -> bytes:
    """One trak box around a built sample table: media header (vmhd for
    video, smhd + volume for audio), dinf/dref, mdhd/hdlr/tkhd."""
    if handler == b"vide":
        mhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
        volume = 0
    elif handler == b"soun":
        mhd = _full(b"smhd", 0, 0, struct.pack(">Hh", 0, 0))
        volume = 0x0100
    else:
        raise ValueError(f"unsupported handler {handler!r}")
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", mhd + dinf + stbl)
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0),
    )
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I4s", 0, handler) + b"\x00" * 13)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(
        b"tkhd", 0, 7,
        struct.pack(">IIII", 0, 0, track_id, 0)
        + struct.pack(">I", duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, volume, 0, 0)
        + _MATRIX
        + struct.pack(">II", width << 16, height << 16),
    )
    return _box(b"trak", tkhd + mdia)


def _mvhd(timescale: int, duration: int, next_track_id: int = 2) -> bytes:
    return _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IHH", 0x10000, 0x100, 0)
        + b"\x00" * 8
        + _MATRIX
        + b"\x00" * 24
        + struct.pack(">I", next_track_id),
    )


def encode_mp4(
    frames: list[bytes],
    deltas: list[int],
    timescale: int = 1000,
    width: int = 8,
    height: int = 8,
    codec: bytes = b"rawb",
    first_chunk_samples: int = 2,
    chunk_samples: int = 3,
) -> bytes:
    """Encode sample payloads as a one-video-track MP4: ftyp + mdat +
    moov with a real sample table (stts RLE of ``deltas``, per-sample
    stsz, a two-run stsc — first chunk ``first_chunk_samples`` samples,
    later chunks ``chunk_samples`` — and absolute stco chunk offsets).
    Multiple chunks on purpose: a parser that ignores stsc reads wrong
    offsets, so the gate catches it.

    The sample ENTRIES are opaque bytes (tests use real BMP images so a
    sampled frame round-trips through the real image decoder); a real
    deployment stores AVC NALs and fills the codec seam downstream.
    """
    if len(frames) != len(deltas):
        raise ValueError("one delta per frame required")
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
    chunks = _chunk_blobs(frames, first_chunk_samples, chunk_samples)
    mdat_payload = b"".join(b"".join(c) for c in chunks)
    offs, pos = [], len(ftyp) + 8  # file offset of mdat payload start
    for c in chunks:
        offs.append(pos)
        pos += sum(len(fb) for fb in c)
    stbl = _stbl(frames, deltas, chunks, offs, _box(codec, _vse(width, height)))
    duration = sum(deltas)
    trak = _trak(stbl, timescale, duration, b"vide", width=width, height=height)
    moov = _box(b"moov", _mvhd(timescale, duration) + trak)
    return ftyp + _box(b"mdat", mdat_payload) + moov


def encode_mp4_pcm(
    samples,
    sample_rate: int,
    frames_per_sample: int = 256,
    first_chunk_samples: int = 2,
    chunk_samples: int = 3,
    codec: bytes = b"twos",
) -> bytes:
    """Encode 16-bit PCM as a one-AUDIO-track MP4: the sample entry is
    ``twos`` (big-endian signed 16-bit PCM per QTFF/14496-12 §12.2.3)
    or ``sowt`` (its little-endian twin), so the CONTENT is decodable
    from the container alone — no entropy codec. ``samples`` is (n,)
    mono or (n, ch) channel-interleaved int16. Each MP4 sample holds
    ``frames_per_sample`` PCM frames (the last may be short),
    timescale = the PCM rate so stts deltas are frame counts. Chunking
    mirrors :func:`encode_mp4` (first chunk 2 samples, then 3) so
    stsc/stco expansion is exercised. Byte-deterministic: the fixture
    oracle rebuilds files independently and sha1 pins both writers."""
    import numpy as np

    if codec not in (b"twos", b"sowt"):
        raise ValueError(f"PCM sample-entry fourcc must be twos/sowt, got {codec!r}")
    x = np.asarray(samples, dtype=np.int16)
    if x.ndim == 1:
        x = x[:, None]
    if x.ndim != 2 or x.shape[0] == 0 or not (1 <= x.shape[1] < 1 << 16):
        raise ValueError("non-empty (n,) or (n, channels) int16 array required")
    ch = x.shape[1]
    if not (0 < sample_rate < 1 << 16):
        raise ValueError("sample_rate must fit the 16.16 samplerate field")
    pcm = x.astype(">i2" if codec == b"twos" else "<i2").tobytes()
    bps = 2 * ch  # bytes per PCM frame (16-bit x channels, interleaved)
    step = frames_per_sample * bps
    blobs = [pcm[i : i + step] for i in range(0, len(pcm), step)]
    deltas = [len(b) // bps for b in blobs]

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
    chunks = _chunk_blobs(blobs, first_chunk_samples, chunk_samples)
    mdat_payload = b"".join(b"".join(c) for c in chunks)
    offs, pos = [], len(ftyp) + 8
    for c in chunks:
        offs.append(pos)
        pos += sum(len(fb) for fb in c)
    stbl = _stbl(blobs, deltas, chunks, offs, _box(codec, _ase(ch, sample_rate)))
    duration = sum(deltas)
    trak = _trak(stbl, sample_rate, duration, b"soun")
    moov = _box(b"moov", _mvhd(sample_rate, duration) + trak)
    return ftyp + _box(b"mdat", mdat_payload) + moov


def encode_mp4_muxed(
    frames: list[bytes],
    deltas: list[int],
    timescale: int,
    width: int,
    height: int,
    samples,
    sample_rate: int,
    vcodec: bytes = b"rawb",
    acodec: bytes = b"twos",
    frames_per_sample: int = 256,
) -> bytes:
    """Encode a MUXED two-track MP4 — the common real-world shape: a
    video trak (track 1, ``frames``/``deltas`` per :func:`encode_mp4`)
    and a PCM audio trak (track 2, per :func:`encode_mp4_pcm`) sharing
    one mdat (video chunks first, then audio chunks). Exercises the
    handler-targeted track selection in :func:`parse_mp4`: readers must
    pick their trak by hdlr fourcc, not take the first one."""
    import numpy as np

    if len(frames) != len(deltas):
        raise ValueError("one delta per frame required")
    if acodec not in (b"twos", b"sowt"):
        raise ValueError(f"PCM sample-entry fourcc must be twos/sowt, got {acodec!r}")
    x = np.asarray(samples, dtype=np.int16)
    if x.ndim == 1:
        x = x[:, None]
    if x.ndim != 2 or x.shape[0] == 0 or not (1 <= x.shape[1] < 1 << 16):
        raise ValueError("non-empty (n,) or (n, channels) int16 array required")
    ch = x.shape[1]
    if not (0 < sample_rate < 1 << 16):
        raise ValueError("sample_rate must fit the 16.16 samplerate field")
    pcm = x.astype(">i2" if acodec == b"twos" else "<i2").tobytes()
    bps = 2 * ch
    step = frames_per_sample * bps
    a_blobs = [pcm[i : i + step] for i in range(0, len(pcm), step)]
    a_deltas = [len(b) // bps for b in a_blobs]

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
    v_chunks = _chunk_blobs(frames, 2, 3)
    a_chunks = _chunk_blobs(a_blobs, 2, 3)
    mdat_payload = b"".join(
        b"".join(c) for c in v_chunks
    ) + b"".join(b"".join(c) for c in a_chunks)
    pos = len(ftyp) + 8
    v_offs, a_offs = [], []
    for offs, chunks in ((v_offs, v_chunks), (a_offs, a_chunks)):
        for c in chunks:
            offs.append(pos)
            pos += sum(len(fb) for fb in c)

    v_stbl = _stbl(frames, deltas, v_chunks, v_offs, _box(vcodec, _vse(width, height)))
    v_dur = sum(deltas)
    v_trak = _trak(v_stbl, timescale, v_dur, b"vide", track_id=1, width=width, height=height)
    a_stbl = _stbl(a_blobs, a_deltas, a_chunks, a_offs, _box(acodec, _ase(ch, sample_rate)))
    a_dur = sum(a_deltas)
    a_trak = _trak(a_stbl, sample_rate, a_dur, b"soun", track_id=2)
    # movie header in the video timescale; duration covers both tracks
    mv_dur = max(v_dur, a_dur * timescale // sample_rate)
    moov = _box(b"moov", _mvhd(timescale, mv_dur, next_track_id=3) + v_trak + a_trak)
    return ftyp + _box(b"mdat", mdat_payload) + moov


def _walk_boxes(buf: bytes, start: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """Yield (tag, payload_start, payload_end) for each box in
    buf[start:end], handling 64-bit largesize boxes."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", buf, pos)
        tag = buf[pos + 4 : pos + 8]
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated largesize box header")
            (size,) = struct.unpack_from(">Q", buf, pos + 8)
            body = pos + 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
            body = pos + 8
        else:
            body = pos + 8
        if size < body - pos or pos + size > end:
            raise ValueError(f"box {tag!r} overruns its container")
        yield tag, body, pos + size
        pos += size
    if pos != end:
        raise ValueError("trailing bytes after last box")


def _find(buf: bytes, start: int, end: int, tag: bytes) -> tuple[int, int]:
    for t, s, e in _walk_boxes(buf, start, end):
        if t == tag:
            return s, e
    raise ValueError(f"missing {tag!r} box")


def _trak_handler(payload: bytes, trak_s: int, trak_e: int) -> str | None:
    """Peek a trak's hdlr fourcc for track selection: missing hdlr
    defaults to video (the strict parse's rule); a trak too corrupt to
    peek returns None so selection skips it — the chosen trak then
    parses strictly and surfaces its own errors."""
    try:
        mdia_s, mdia_e = _find(payload, trak_s, trak_e, b"mdia")
    except ValueError:
        return None
    try:
        hdlr_s, hdlr_e = _find(payload, mdia_s, mdia_e, b"hdlr")
    except ValueError:
        return "vide"
    if hdlr_e - hdlr_s >= 12:
        return payload[hdlr_s + 8 : hdlr_s + 12].decode("latin-1")
    return "vide"


def parse_mp4(payload: bytes, want_handler: str | None = None) -> dict:
    """Parse one track of an ISO BMFF file into per-sample extents:
    ``{"timescale", "duration_ms", "codec", "n_samples",
    "samples": [(idx, offset, size, ts_units)], "width", "height"}``.

    ``want_handler`` selects the track in a MUXED file: ``"vide"`` /
    ``"soun"`` picks the first trak whose hdlr matches (ValueError when
    none does); None keeps the historical first-trak behavior, which
    reads the file's primary track.

    Real sample-table reconstruction: stsc runs expanded against the
    stco/co64 chunk list, per-sample offsets accumulated within each
    chunk, decode timestamps accumulated from stts runs. This is the
    whole point at scale — sampling N frames from an hour-long file
    reads N byte ranges, not the file.
    """
    if len(payload) < 8:
        raise ValueError("not an MP4 payload")
    try:
        return _parse_mp4_inner(payload, want_handler)
    except struct.error as exc:
        # short buffers under any unpack_from are corrupt input, not a
        # programming error — normalize to the poison-row contract
        raise ValueError(f"truncated MP4 structure: {exc}") from exc


def _parse_mp4_inner(payload: bytes, want_handler: str | None = None) -> dict:
    top = list(_walk_boxes(payload, 0, len(payload)))
    tags = [t for t, _, _ in top]
    if b"moov" not in tags:
        raise ValueError("missing moov box")
    moov_s, moov_e = next((s, e) for t, s, e in top if t == b"moov")
    traks = [(s, e) for t, s, e in _walk_boxes(payload, moov_s, moov_e) if t == b"trak"]
    if not traks:
        raise ValueError("missing b'trak' box")
    if want_handler is None:
        trak_s, trak_e = traks[0]
    else:
        for cand_s, cand_e in traks:
            if _trak_handler(payload, cand_s, cand_e) == want_handler:
                trak_s, trak_e = cand_s, cand_e
                break
        else:
            raise ValueError(f"no {want_handler!r} track in moov")
    mdia_s, mdia_e = _find(payload, trak_s, trak_e, b"mdia")
    mdhd_s, mdhd_e = _find(payload, mdia_s, mdia_e, b"mdhd")
    version = payload[mdhd_s]
    if version == 0:
        _, _, timescale, duration = struct.unpack_from(">IIII", payload, mdhd_s + 4)
    elif version == 1:
        _, _, timescale, duration = struct.unpack_from(">QQIQ", payload, mdhd_s + 4)
    else:
        raise NotImplementedError(f"mdhd version {version}")
    if timescale == 0:
        # hostile header: duration_ms below divides by it
        raise ValueError("mdhd timescale is zero")
    # handler fourcc decides how the stsd entry body is typed below;
    # hdlr is mandatory per 14496-12 but absent in minimal/hostile
    # files — default to video, the pre-r5 behavior
    handler = "vide"
    try:
        hdlr_s, hdlr_e = _find(payload, mdia_s, mdia_e, b"hdlr")
        if hdlr_e - hdlr_s >= 12:
            handler = payload[hdlr_s + 8 : hdlr_s + 12].decode("latin-1")
    except ValueError:
        pass
    minf_s, minf_e = _find(payload, mdia_s, mdia_e, b"minf")
    stbl_s, stbl_e = _find(payload, minf_s, minf_e, b"stbl")
    boxes = {t: (s, e) for t, s, e in _walk_boxes(payload, stbl_s, stbl_e)}
    for req in (b"stsd", b"stts", b"stsz", b"stsc"):
        if req not in boxes:
            raise ValueError(f"missing {req!r} box")
    if b"stco" not in boxes and b"co64" not in boxes:
        raise ValueError("missing stco/co64 box")

    def full_payload(tag: bytes) -> tuple[bytes, int]:
        s, e = boxes[tag]
        return payload[s + 4 : e], payload[s]

    # stsd: codec fourcc of entry 1
    stsd, v = full_payload(b"stsd")
    (n_entries,) = struct.unpack_from(">I", stsd, 0)
    if n_entries < 1 or len(stsd) < 16:
        raise ValueError("empty stsd")
    codec = stsd[8:12].decode("latin-1")
    # entry body offsets are type-dependent: VisualSampleEntry carries
    # width/height, AudioSampleEntry channels/samplesize/samplerate
    width = height = channels = sample_bits = sample_rate_hz = None
    if handler == "soun":
        if len(stsd) >= 4 + 8 + 28:
            channels, sample_bits = struct.unpack_from(">HH", stsd, 4 + 8 + 16)
            (rate_fixed,) = struct.unpack_from(">I", stsd, 4 + 8 + 24)
            sample_rate_hz = rate_fixed >> 16
    elif len(stsd) >= 4 + 8 + 28:
        width, height = struct.unpack_from(">HH", stsd, 4 + 8 + 24)

    stsz, _ = full_payload(b"stsz")
    fixed, n_samples = struct.unpack_from(">II", stsz, 0)
    if n_samples == 0:
        # a video track with no samples is degenerate; rejecting here
        # keeps every downstream consumer's samples[0] access safe
        raise ValueError("empty stsz sample table")
    if n_samples > len(payload):
        # each sample occupies >=1 byte somewhere in the file; a count
        # beyond the payload size is a hostile header — reject before
        # the table expansions below allocate against it
        raise ValueError("stsz sample count implausible for payload size")
    if fixed:
        sizes = [fixed] * n_samples
    else:
        sizes = list(struct.unpack_from(f">{n_samples}I", stsz, 8))

    stts, _ = full_payload(b"stts")
    (n_runs,) = struct.unpack_from(">I", stts, 0)
    deltas: list[int] = []
    for r in range(n_runs):
        cnt, delta = struct.unpack_from(">II", stts, 4 + r * 8)
        if len(deltas) + cnt > n_samples:
            # cap the run-length expansion at the stsz count so a
            # malicious (cnt=2^32) run cannot balloon memory
            raise ValueError("stts runs exceed stsz sample count")
        deltas.extend([delta] * cnt)

    if b"stco" in boxes:
        stco, _ = full_payload(b"stco")
        (n_chunks,) = struct.unpack_from(">I", stco, 0)
        chunk_offs = list(struct.unpack_from(f">{n_chunks}I", stco, 4))
    else:
        co64, _ = full_payload(b"co64")
        (n_chunks,) = struct.unpack_from(">I", co64, 0)
        chunk_offs = list(struct.unpack_from(f">{n_chunks}Q", co64, 4))

    stsc, _ = full_payload(b"stsc")
    (n_sc,) = struct.unpack_from(">I", stsc, 0)
    sc = [struct.unpack_from(">III", stsc, 4 + r * 12) for r in range(n_sc)]
    # expand stsc runs -> samples-per-chunk for every chunk
    per_chunk: list[int] = []
    for r, (first, spc, _desc) in enumerate(sc):
        last = sc[r + 1][0] - 1 if r + 1 < n_sc else n_chunks
        run = last - first + 1
        if run < 0 or len(per_chunk) + run > n_chunks:
            # cap the run-length expansion at the stco chunk count
            # BEFORE allocating — a malicious first_chunk (e.g. 2^32-1)
            # would otherwise balloon this list to ~34 GB (same
            # discipline as the stts cap above)
            raise ValueError("stsc runs inconsistent with chunk count")
        per_chunk.extend([spc] * run)
    if len(per_chunk) != n_chunks:
        raise ValueError("stsc runs inconsistent with chunk count")

    if len(deltas) != n_samples or sum(per_chunk) != n_samples:
        raise ValueError("sample tables disagree on sample count")
    if duration > sum(deltas):
        # mdhd duration is attacker-controlled; beyond the stts total it
        # would drive unbounded timestamp loops in frame sampling (the
        # synth encoder writes duration == sum(deltas) exactly)
        raise ValueError("mdhd duration exceeds stts delta total")
    samples: list[tuple[int, int, int, int]] = []
    ts = 0
    si = 0
    for ci, spc in enumerate(per_chunk):
        off = chunk_offs[ci]
        for _ in range(spc):
            size = sizes[si]
            if off + size > len(payload):
                raise ValueError(f"sample {si} overruns payload")
            samples.append((si, off, size, ts))
            off += size
            ts += deltas[si]
            si += 1
    return {
        "timescale": timescale,
        "duration_ms": duration * 1000 // timescale,
        "codec": codec,
        "n_samples": n_samples,
        "samples": samples,
        "width": width,
        "height": height,
        "handler": handler,
        "channels": channels,
        "sample_bits": sample_bits,
        "sample_rate_hz": sample_rate_hz,
    }


# --- Spark kernels -------------------------------------------------------

CONTAINER_META_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("container", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sha1", T.StringType(), False),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("mean_kbps", T.DoubleType(), True),   # mp3 only
        T.StructField("timescale", T.IntegerType(), True),  # mp4 only
        T.StructField("codec", T.StringType(), True),       # mp4 stsd fourcc
        T.StructField("err", T.StringType(), True),
    ]
)


def extract_container_metadata(assets: DataFrame) -> DataFrame:
    """Arrow-batched container metadata over (media_ref, payload, mime):
    MP3 frame-walk or MP4 sample-table parse per row, poison-row on
    corrupt payloads. The metadata pass a curation plan runs BEFORE
    deciding which media to decode — at 100 TB this is the cheap scan
    (struct parsing at memory bandwidth) and full decode is the
    expensive one gated behind it."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "media_ref", "container", "n_bytes", "sha1", "n_frames",
                "duration_ms", "mean_kbps", "timescale", "codec", "err",
            )}
            for ref, payload, mime in zip(pdf["media_ref"], pdf["payload"], pdf["mime"]):
                b = bytes(payload) if payload is not None else b""
                rows["media_ref"].append(ref)
                rows["n_bytes"].append(len(b))
                rows["sha1"].append(hashlib.sha1(b).hexdigest())
                container = nframes = dur = kbps = tsc = codec = err = None
                try:
                    m = (mime or "").lower()
                    if m in ("audio/mpeg", "audio/mp3"):
                        meta = parse_mp3(b)
                        container = "mp3"
                        nframes = meta["n_frames"]
                        dur = meta["duration_ms"]
                        kbps = meta["mean_kbps"]
                    elif m in ("video/mp4", "audio/mp4", "video/quicktime"):
                        meta = parse_mp4(b)
                        container = "mp4"
                        nframes = meta["n_samples"]
                        dur = meta["duration_ms"]
                        tsc = meta["timescale"]
                        codec = meta["codec"]
                    else:
                        raise NotImplementedError(f"no container parser for mime {mime!r}")
                except Exception as exc:  # poison row, keep the batch
                    err = f"{type(exc).__name__}: {exc}"
                rows["container"].append(container)
                rows["n_frames"].append(nframes)
                rows["duration_ms"].append(dur)
                rows["mean_kbps"].append(kbps)
                rows["timescale"].append(tsc)
                rows["codec"].append(codec)
                rows["err"].append(err)
            yield pd.DataFrame(rows)

    return assets.select("media_ref", "payload", "mime").mapInPandas(
        run, CONTAINER_META_SCHEMA
    )


def sample_frames_mp4(
    assets: DataFrame, every_ms: int = 1000, max_frames: int = 100_000
) -> DataFrame:
    """REAL frame sampling over MP4 payloads: parse the sample table,
    then for each requested timestamp slice exactly the covering
    sample's bytes (the sample whose decode window contains the
    timestamp). Only sampled frames are materialized. Content decode of
    the sliced bytes stays the codec seam — the gate stores BMP frames
    so tests can round-trip them through the real image decoder."""
    from .multimodal import FRAME_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, tss, payloads, errs = [], [], [], []
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                try:
                    meta = parse_mp4(b, "vide")  # the video track of a muxed file
                except Exception as exc:
                    refs.append(ref)
                    tss.append(-1)
                    payloads.append(None)
                    errs.append(f"{type(exc).__name__}: {exc}")
                    continue
                tsc = meta["timescale"]
                samples = meta["samples"]
                total_ms = meta["duration_ms"]
                # parse_mp4 guarantees samples is non-empty and duration
                # <= the stts total, but a legal-looking table can still
                # declare hours-per-sample deltas; cap emitted rows so a
                # hostile timeline poisons its row instead of generating
                # ~total_ms/every_ms rows on the executor
                if total_ms // every_ms + 1 > max_frames or not samples:
                    refs.append(ref)
                    tss.append(-1)
                    payloads.append(None)
                    errs.append(
                        f"ValueError: frame sample count {total_ms // every_ms + 1}"
                        f" exceeds max_frames={max_frames}"
                    )
                    continue
                if total_ms <= 0:
                    # duration 0 with a non-empty sample table: the
                    # timestamp loop below would emit NOTHING, silently
                    # dropping the asset from the output — poison the
                    # row instead (the contract every other failure
                    # path here follows)
                    refs.append(ref)
                    tss.append(-1)
                    payloads.append(None)
                    errs.append("ValueError: non-positive mdhd duration")
                    continue
                t, si = 0, 0
                while t < total_ms:
                    units = t * tsc // 1000
                    # samples are time-ordered; advance to the covering one
                    while si + 1 < len(samples) and samples[si + 1][3] <= units:
                        si += 1
                    _, off, size, _ = samples[si]
                    refs.append(ref)
                    tss.append(t)
                    payloads.append(b[off : off + size])
                    errs.append(None)
                    t += every_ms
            yield pd.DataFrame(
                {"media_ref": refs, "frame_ts": tss, "frame_payload": payloads, "err": errs}
            )

    return assets.select("media_ref", "payload").mapInPandas(run, FRAME_SCHEMA)


# --- MP4 CONTENT decode (round 5, second half) ---------------------------
# When the track's sample entry is a codec this container ships — MJPEG
# ('jpeg': each sample is a complete baseline JPEG, operators/jpeg.py),
# 'png '/'rawb' still-image samples, or 'twos'/'sowt' PCM audio —
# content decode is real, composed from the sample-table walker plus
# the existing image/audio decoders. The remaining seam is exactly the
# codecs whose bitstreams need inter-frame / entropy machinery not in
# this container (avc1/hvc1 video, mp4a AAC, MP3 main data): those
# fourccs raise NotImplementedError, which the kernels turn into
# poison rows.

MP4_FRAME_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("frame_ts", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
        T.StructField("err", T.StringType(), True),
    ]
)

MP4_AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
        T.StructField("err", T.StringType(), True),
    ]
)


def _decode_mp4_frame(codec: str, frame: bytes) -> list[float]:
    """Dispatch one video sample's bytes to the matching REAL image
    decoder; unsupported fourccs are the explicit codec seam."""
    from .multimodal import bmp_features, decode_bmp, decode_png

    if codec == "rawb":
        return bmp_features(decode_bmp(frame))
    if codec == "png ":
        return bmp_features(decode_png(frame))
    if codec == "jpeg":
        from .jpeg import decode_jpeg

        return bmp_features(decode_jpeg(frame))
    raise NotImplementedError(
        f"stsd fourcc {codec!r} needs an inter-frame/entropy codec not in "
        "this container; decodable: rawb, png , jpeg (MJPEG), twos/sowt (PCM)"
    )


def decode_mp4_frames(
    assets: DataFrame, every_ms: int = 1000, max_frames: int = 100_000
) -> DataFrame:
    """REAL MP4 video CONTENT decode: sample the covering sample at
    each ``every_ms`` tick (offsets-only slicing, same walk as
    :func:`sample_frames_mp4`) and decode the sliced bytes through the
    image decoder the stsd fourcc names, emitting pixel features per
    sampled frame. A sample covering several ticks decodes ONCE (the
    per-sample cache); a frame that fails to decode poisons its row,
    not the asset. At 100 TB this is the expensive pass the container-
    metadata scan gates — and it still reads only the sampled byte
    ranges, never the full mdat."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, tss, feats, errs = [], [], [], []

            def poison(ref, msg):
                refs.append(ref)
                tss.append(-1)
                feats.append(None)
                errs.append(msg)

            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                try:
                    meta = parse_mp4(b, "vide")  # the video track of a muxed file
                except Exception as exc:
                    poison(ref, f"{type(exc).__name__}: {exc}")
                    continue
                if meta["handler"] != "vide":  # defense: selection guarantees it
                    poison(ref, f"ValueError: not a video track (handler {meta['handler']!r})")
                    continue
                tsc, samples, total_ms = meta["timescale"], meta["samples"], meta["duration_ms"]
                if total_ms // every_ms + 1 > max_frames or not samples:
                    poison(
                        ref,
                        f"ValueError: frame sample count {total_ms // every_ms + 1}"
                        f" exceeds max_frames={max_frames}",
                    )
                    continue
                if total_ms <= 0:
                    poison(ref, "ValueError: non-positive mdhd duration")
                    continue
                codec = meta["codec"]
                cache: dict[int, list[float] | None] = {}
                cache_err: dict[int, str] = {}
                t, si = 0, 0
                while t < total_ms:
                    units = t * tsc // 1000
                    while si + 1 < len(samples) and samples[si + 1][3] <= units:
                        si += 1
                    if si not in cache:
                        _, off, size, _ = samples[si]
                        try:
                            cache[si] = _decode_mp4_frame(codec, b[off : off + size])
                        except Exception as exc:  # poison the frame, keep the asset
                            cache[si] = None
                            cache_err[si] = f"{type(exc).__name__}: {exc}"
                    refs.append(ref)
                    tss.append(t)
                    feats.append(cache[si])
                    errs.append(cache_err.get(si))
                    t += every_ms
            yield pd.DataFrame(
                {"media_ref": refs, "frame_ts": tss, "features": feats, "err": errs}
            )

    return assets.select("media_ref", "payload").mapInPandas(
        run, MP4_FRAME_FEATURES_SCHEMA
    )


def decode_mp4_audio(assets: DataFrame) -> DataFrame:
    """REAL MP4 audio CONTENT decode for PCM tracks — 'twos'
    (big-endian) and 'sowt' (little-endian), any channel count: gather
    the sample extents, reassemble the interleaved 16-bit stream,
    downmix multi-channel to mono with the WAV decoder's exact rule
    (int64 sum floor-div channels), and run the same waveform feature
    spec. Compressed audio fourccs (mp4a AAC, .mp3) poison their row
    via the NotImplementedError seam."""
    import numpy as np

    from .multimodal import wav_features

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, rates, feats, errs = [], [], [], []
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                refs.append(ref)
                rate = vec = err = None
                try:
                    meta = parse_mp4(b, "soun")  # the audio track of a muxed file
                    if meta["handler"] != "soun":  # defense: selection guarantees it
                        raise ValueError(f"not an audio track (handler {meta['handler']!r})")
                    if meta["codec"] not in ("twos", "sowt"):
                        raise NotImplementedError(
                            f"stsd fourcc {meta['codec']!r} needs an entropy codec; "
                            "decodable audio: twos/sowt (16-bit PCM)"
                        )
                    nch = meta["channels"] or 0
                    if nch < 1 or meta["sample_bits"] != 16:
                        raise NotImplementedError(
                            f"only 16-bit PCM supported "
                            f"(channels={nch}, bits={meta['sample_bits']})"
                        )
                    rate = meta["sample_rate_hz"]
                    if not rate:
                        raise ValueError("AudioSampleEntry samplerate is zero")
                    pcm = b"".join(b[off : off + size] for _, off, size, _ in meta["samples"])
                    if len(pcm) % (2 * nch):
                        raise ValueError("PCM byte count not a whole number of frames")
                    dt = ">i2" if meta["codec"] == "twos" else "<i2"
                    x = np.frombuffer(pcm, dtype=dt).astype(np.int16)
                    if x.size == 0:
                        raise ValueError("empty PCM stream")
                    if nch > 1:  # decode_wav's exact downmix rule
                        x = (
                            x.reshape(-1, nch).astype(np.int64).sum(axis=1) // nch
                        ).astype(np.int16)
                    vec = wav_features(x, rate)
                except Exception as exc:  # poison row, keep the batch
                    err = f"{type(exc).__name__}: {exc}"
                    rate = vec = None
                rates.append(rate)
                feats.append(vec)
                errs.append(err)
            yield pd.DataFrame(
                {"media_ref": refs, "sample_rate": rates, "features": feats, "err": errs}
            )

    return assets.select("media_ref", "payload").mapInPandas(
        run, MP4_AUDIO_FEATURES_SCHEMA
    )


# --- deterministic synthetic assets --------------------------------------
# Same discipline as multimodal.synth_image/synth_audio: payloads derive
# arithmetically from doc_id so the fixture oracle reproduces identical
# bytes from the spec without sharing code.
#   mp3: n_frames = 6 + doc_id%5; frame i bitrate index 1+((doc_id*7+i*3)%14),
#        padding (doc_id+i)%2, body byte j = (doc_id*17 + i*29 + j*101)%256;
#        ID3v2 tag when doc_id%3==0 with 10+doc_id%50 body bytes
#        j -> (doc_id*5 + j*11)%256.
#   mp4: n_samples = 5 + doc_id%4; sample k = BMP of synth_image(doc_id+k, 8, 8);
#        delta k = 50 + (doc_id*13 + k*7)%200 (timescale 1000).


def synth_mp3(doc_id: int) -> bytes:
    n_frames = 6 + doc_id % 5
    specs = [(1 + ((doc_id * 7 + i * 3) % 14), (doc_id + i) % 2) for i in range(n_frames)]
    id3 = None
    if doc_id % 3 == 0:
        n = 10 + doc_id % 50
        id3 = bytes((doc_id * 5 + j * 11) % 256 for j in range(n))
    return encode_mp3_stream(
        specs,
        sr_idx=0,
        body_byte=lambda i, j: (doc_id * 17 + i * 29 + j * 101) % 256,
        id3_body=id3,
    )


def synth_mp4(doc_id: int) -> bytes:
    from .multimodal import encode_bmp, synth_image

    n = 5 + doc_id % 4
    frames = [encode_bmp(synth_image(doc_id + k, 8, 8)) for k in range(n)]
    deltas = [50 + (doc_id * 13 + k * 7) % 200 for k in range(n)]
    return encode_mp4(frames, deltas, timescale=1000)


def synth_mp4_mjpeg(doc_id: int) -> bytes:
    """MJPEG MP4 per the arithmetic spec: n = 3 + doc_id%3 samples,
    sample k = baseline JPEG (quality 90, 4:2:0, DRI 2) of
    synth_image(doc_id*5 + k*11 + 3, 16, 16); delta k =
    100 + (doc_id*11 + k*13)%150 at timescale 1000."""
    from .jpeg import encode_jpeg
    from .multimodal import synth_image

    n = 3 + doc_id % 3
    frames = [
        encode_jpeg(
            synth_image(doc_id * 5 + k * 11 + 3, 16, 16),
            quality=90,
            subsample=True,
            restart_interval=2,
        )
        for k in range(n)
    ]
    deltas = [100 + (doc_id * 11 + k * 13) % 150 for k in range(n)]
    return encode_mp4(frames, deltas, timescale=1000, width=16, height=16, codec=b"jpeg")


def synth_mp4_pcm(doc_id: int) -> bytes:
    """PCM ('twos') MP4 per the arithmetic spec: the SAME 1600-frame
    8 kHz waveform as the WAV branch (multimodal.synth_audio), packed
    200 + (doc_id%3)*100 frames per MP4 sample — 300 leaves a short
    last sample on purpose."""
    from .multimodal import synth_audio

    return encode_mp4_pcm(
        synth_audio(doc_id), 8000, frames_per_sample=200 + (doc_id % 3) * 100
    )


def synth_mp4_pcm_sowt(doc_id: int) -> bytes:
    """Stereo little-endian PCM ('sowt') MP4: left channel is the
    synth_audio(doc_id) waveform, right is synth_audio(doc_id + 7),
    interleaved at 11025 Hz, 220 + (doc_id%3)*110 frames per MP4
    sample — exercises the multi-channel downmix and byte-order half
    of the PCM decode path."""
    import numpy as np

    from .multimodal import synth_audio

    x = np.stack([synth_audio(doc_id), synth_audio(doc_id + 7)], axis=1)
    return encode_mp4_pcm(
        x, 11025, frames_per_sample=220 + (doc_id % 3) * 110, codec=b"sowt"
    )


def synth_mp4_muxed(doc_id: int) -> bytes:
    """Muxed A+V MP4 combining two existing arithmetic specs: the
    synth_mp4 video track (rawb BMP samples, 8x8, same deltas) plus the
    synth_mp4_pcm audio track ('twos' mono synth_audio waveform at
    8 kHz, same frames-per-sample rule) in one file."""
    from .multimodal import encode_bmp, synth_audio, synth_image

    n = 5 + doc_id % 4
    frames = [encode_bmp(synth_image(doc_id + k, 8, 8)) for k in range(n)]
    deltas = [50 + (doc_id * 13 + k * 7) % 200 for k in range(n)]
    return encode_mp4_muxed(
        frames, deltas, 1000, 8, 8,
        synth_audio(doc_id), 8000,
        frames_per_sample=200 + (doc_id % 3) * 100,
    )


def synth_container_assets(docs: DataFrame, kind: str) -> DataFrame:
    """documents(doc_id) → (media_ref, kind, payload, mime) with valid
    MP3 frame streams / MP4 containers synthesized per row inside an
    Arrow batch kernel."""
    if kind not in ("mp3", "mp4", "mjpeg", "pcm_mp4", "pcm_sowt", "muxed"):
        raise ValueError(f"unknown synthetic container kind {kind!r}")
    out_schema = T.StructType(
        [
            T.StructField("media_ref", T.StringType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("payload", T.BinaryType(), False),
            T.StructField("mime", T.StringType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            if kind == "mp3":
                payloads = [synth_mp3(int(d)) for d in ids]
                mime, kname = "audio/mpeg", "audio"
            elif kind == "mjpeg":
                payloads = [synth_mp4_mjpeg(int(d)) for d in ids]
                mime, kname = "video/mp4", "video"
            elif kind == "pcm_mp4":
                payloads = [synth_mp4_pcm(int(d)) for d in ids]
                mime, kname = "audio/mp4", "audio"
            elif kind == "pcm_sowt":
                payloads = [synth_mp4_pcm_sowt(int(d)) for d in ids]
                mime, kname = "audio/mp4", "audio"
            elif kind == "muxed":
                payloads = [synth_mp4_muxed(int(d)) for d in ids]
                mime, kname = "video/mp4", "video"
            else:
                payloads = [synth_mp4(int(d)) for d in ids]
                mime, kname = "video/mp4", "video"
            yield pd.DataFrame(
                {
                    "media_ref": [f"{kind}-{d}" for d in ids],
                    "kind": kname,
                    "payload": payloads,
                    "mime": mime,
                }
            )

    return docs.select("doc_id").mapInPandas(run, out_schema)
