"""PDF stream-filter decode (PDF 32000-1:2008 §7.4) for content
streams: ``FlateDecode``, ``LZWDecode``, ``ASCIIHexDecode``,
``ASCII85Decode``, ``RunLengthDecode``, and filter *chains*
(``/Filter [/ASCII85Decode /FlateDecode]``).

The reference reads real-world PDFs through pypdf, which transparently
decompresses stream filters before text extraction
(app/services/pdf_processor.py:364-375 calls
``page.extract_text()``; virtually every real insurance PDF stores its
content streams FlateDecode-compressed). This module closes that
parity gap for the from-scratch byte-stream scanner: :func:`
decode_content_filters` rewrites a document buffer by replacing each
indirect *stream object* (``N G obj << …/Filter…>> stream … endstream
endobj``) with its decoded bytes, in place.

Splice contract (what makes this testable to the byte): a document
rendered with per-page compressed stream objects decodes back to the
**byte-identical** plain content buffer — the object wrapper is
consumed (including one trailing EOL) and exactly the decoded payload
is spliced in. Span offsets computed on the decoded buffer therefore
equal the plain render's offsets, so the flagship span fixture gates
this path with no fixture regeneration.

Error discipline (mirrors the repo's hostile-media rules and pypdf's
dirty-corpus behavior):

- resource attacks — a stream whose decoded size exceeds the document
  budget (zlib/LZW/RLE bombs) — raise ``ValueError`` *before*
  materializing the payload; the tokenizer turns that into a text-free
  document (the poison-row analog);
- ordinary dirt — a corrupt payload under a supported filter, or a
  legal-but-unsupported filter (``DCTDecode`` image XObjects,
  ``JBIG2Decode``, ``Crypt``) — drops that one stream object
  (contributes no text) and the rest of the document still extracts,
  which is exactly what the reference's pypdf does per stream.

Decode rides the scan: this is pure per-document Python called from
inside the existing Arrow kernels (tokenize / shard), map-side, no
plan change — at 100 TB decompression is embarrassingly parallel and
adds zero shuffle.
"""

from __future__ import annotations

import re
import zlib

# Per-document decoded-output budget. Matches the spirit of the 10 MB
# raw-size cap (constants.MAX_FILE_SIZE_BYTES) with generous headroom
# for legitimate text compression ratios; anything past this is a
# decompression bomb, not a document.
MAX_DECODED_BYTES = 64 << 20

_WS = b" \t\r\n\f\x00"

# run-start lookbehind + possessive runs: a digit sequence is tried
# ONCE from its start (hex-string operands are multi-hundred-digit
# runs; the old backtracking form re-scanned every suffix of every
# run — measured ~1.4 ms/doc on 2-byte-font content, the same ReDoS
# class as _INFO_OBJ)
_OBJ_HDR = re.compile(rb"(?<![0-9])(\d++)[ \t\r\n\f\x00]++(\d++)[ \t\r\n\f\x00]++obj\b")
# (?![0-9]) pins the digit run so backtracking can't split "12 0 R"
# into length "1" + a failed indirect-ref lookahead on "2 0 R"
_LENGTH_DIRECT = re.compile(
    rb"/Length[ \t\r\n\f\x00]+(\d+)(?![0-9])(?![ \t\r\n\f\x00]+\d+[ \t\r\n\f\x00]+R\b)"
)
# the common real-writer shape /Length 7 0 R: the length lives in its
# own integer object (streamed out before the length is known)
_LENGTH_INDIRECT = re.compile(
    rb"/Length[ \t\r\n\f\x00]+(\d+)[ \t\r\n\f\x00]+(\d+)[ \t\r\n\f\x00]+R\b"
)
_FILTER = re.compile(
    rb"/Filter[ \t\r\n\f\x00]*(?:\[(?P<arr>[^\]]*)\]|/(?P<one>[A-Za-z0-9]+))"
)
_NAME = re.compile(rb"/([A-Za-z0-9]+)")


class StreamBombError(ValueError):
    """Decoded output exceeded the per-document budget (resource
    attack). Subclasses ValueError so callers that poison on
    ValueError need no new handling."""


# ---------------------------------------------------------------------------
# individual codecs — decode AND encode (encoders drive the render-side
# test corpus and the filtered render path; both are from scratch)
# ---------------------------------------------------------------------------


def flate_decode(data: bytes, cap: int = MAX_DECODED_BYTES) -> bytes:
    """Bounded zlib inflate: the cap is enforced chunk-by-chunk inside
    decompression, so a bomb raises before its payload materializes."""
    d = zlib.decompressobj()
    out = bytearray()
    try:
        chunk = d.decompress(data, cap + 1)
    except zlib.error as e:
        raise ValueError(f"FlateDecode: {e}") from None
    out += chunk
    while d.unconsumed_tail:
        if len(out) > cap:
            raise StreamBombError("FlateDecode output exceeds document budget")
        try:
            chunk = d.decompress(d.unconsumed_tail, cap + 1)
        except zlib.error as e:
            raise ValueError(f"FlateDecode: {e}") from None
        out += chunk
    if len(out) > cap:
        raise StreamBombError("FlateDecode output exceeds document budget")
    return bytes(out)


def flate_encode(data: bytes) -> bytes:
    return zlib.compress(data, 6)


def ascii_hex_decode(data: bytes, cap: int = MAX_DECODED_BYTES) -> bytes:
    """§7.4.2: hex pairs, whitespace ignored, ``>`` is EOD, an odd
    trailing digit is padded with 0."""
    end = data.find(b">")
    if end != -1:
        data = data[:end]
    hexed = re.sub(rb"[ \t\r\n\f\x00]", b"", data)
    if not re.fullmatch(rb"[0-9a-fA-F]*", hexed):
        raise ValueError("ASCIIHexDecode: non-hex character")
    if len(hexed) % 2:
        hexed += b"0"
    if len(hexed) // 2 > cap:
        raise StreamBombError("ASCIIHexDecode output exceeds document budget")
    return bytes.fromhex(hexed.decode("ascii"))


def ascii_hex_encode(data: bytes) -> bytes:
    return data.hex().encode("ascii") + b">"


def ascii85_decode(data: bytes, cap: int = MAX_DECODED_BYTES) -> bytes:
    """§7.4.3: base-85 groups, ``z`` shorthand for four zero bytes,
    ``~>`` is EOD, whitespace ignored; a partial final group of n
    chars (2–4) is padded with ``u`` and yields n−1 bytes."""
    if data.startswith(b"<~"):
        data = data[2:]
    end = data.find(b"~>")
    if end != -1:
        data = data[:end]
    out = bytearray()
    group: list[int] = []
    for ch in data:
        if ch in b" \t\r\n\f\x00":
            continue
        if ch == 0x7A:  # 'z'
            if group:
                raise ValueError("ASCII85Decode: 'z' inside a group")
            out += b"\x00\x00\x00\x00"
            if len(out) > cap:
                raise StreamBombError("ASCII85Decode output exceeds document budget")
            continue
        if not (0x21 <= ch <= 0x75):  # '!'..'u'
            raise ValueError(f"ASCII85Decode: invalid byte {ch:#x}")
        group.append(ch - 0x21)
        if len(group) == 5:
            acc = 0
            for g in group:
                acc = acc * 85 + g
            if acc > 0xFFFFFFFF:
                raise ValueError("ASCII85Decode: group overflow")
            out += acc.to_bytes(4, "big")
            group.clear()
            if len(out) > cap:
                raise StreamBombError("ASCII85Decode output exceeds document budget")
    if group:
        if len(group) == 1:
            raise ValueError("ASCII85Decode: lone trailing character")
        n = len(group)
        padded = group + [84] * (5 - n)  # 'u' - '!'
        acc = 0
        for g in padded:
            acc = acc * 85 + g
        if acc > 0xFFFFFFFF:
            raise ValueError("ASCII85Decode: group overflow")
        out += acc.to_bytes(4, "big")[: n - 1]
    return bytes(out)


def ascii85_encode(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 4):
        chunk = data[i : i + 4]
        n = len(chunk)
        acc = int.from_bytes(chunk + b"\x00" * (4 - n), "big")
        if acc == 0 and n == 4:
            out += b"z"
            continue
        digits = []
        for _ in range(5):
            digits.append(acc % 85)
            acc //= 85
        out += bytes(33 + d for d in reversed(digits))[: n + 1]
    out += b"~>"
    return bytes(out)


def rle_decode(data: bytes, cap: int = MAX_DECODED_BYTES) -> bytes:
    """§7.4.5 RunLengthDecode: length byte 0–127 → copy next n+1
    literally; 129–255 → repeat next byte 257−n times; 128 is EOD."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        l = data[i]
        if l == 128:
            return bytes(out)
        if l < 128:
            if i + 1 + l + 1 > n:
                raise ValueError("RunLengthDecode: truncated literal run")
            out += data[i + 1 : i + 2 + l]
            i += 2 + l
        else:
            if i + 1 >= n:
                raise ValueError("RunLengthDecode: truncated repeat run")
            out += data[i + 1 : i + 2] * (257 - l)
            i += 2
        if len(out) > cap:
            raise StreamBombError("RunLengthDecode output exceeds document budget")
    raise ValueError("RunLengthDecode: missing EOD")


def rle_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # measure the run at i
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        if j - i >= 2:
            out.append(257 - (j - i))
            out.append(data[i])
            i = j
        else:
            # literal run: until the next >=3 repeat or 128 bytes
            j = i + 1
            while j < n and j - i < 128:
                if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                    break
                j += 1
            out.append(j - i - 1)
            out += data[i:j]
            i = j
    out.append(128)
    return bytes(out)


# --- LZW (§7.4.4): 8-bit codes, MSB-first packing, variable 9→12-bit
# width, Clear=256, EOD=257, first assignable code 258, EarlyChange=1
# (the PDF default: the width grows one code early). Verified against
# the spec's own worked example in tests/test_filters.py.

_LZW_CLEAR, _LZW_EOD, _LZW_FIRST = 256, 257, 258


def lzw_decode(data: bytes, cap: int = MAX_DECODED_BYTES, early: int = 1) -> bytes:
    out = bytearray()
    table: dict[int, bytes] = {i: bytes([i]) for i in range(256)}
    next_code = _LZW_FIRST
    width = 9
    prev: bytes | None = None
    bitbuf = 0
    nbits = 0
    for byte in data:
        bitbuf = (bitbuf << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (bitbuf >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == _LZW_CLEAR:
                table = {i: bytes([i]) for i in range(256)}
                next_code = _LZW_FIRST
                width = 9
                prev = None
                continue
            if code == _LZW_EOD:
                return bytes(out)
            if prev is None:
                entry = table.get(code)
                if entry is None:
                    raise ValueError("LZWDecode: first code not a literal")
            elif code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + prev[:1]
            else:
                raise ValueError("LZWDecode: code out of table range")
            if prev is not None and next_code < 4096:
                table[next_code] = prev + entry[:1]
                next_code += 1
            if next_code + early >= (1 << width) and width < 12:
                width += 1
            out += entry
            if len(out) > cap:
                raise StreamBombError("LZWDecode output exceeds document budget")
            prev = entry
    return bytes(out)  # tolerate a missing EOD (truncation dirt)


def lzw_encode(data: bytes, early: int = 1) -> bytes:
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((bitbuf >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = _LZW_FIRST
    width = 9
    emit(_LZW_CLEAR, width)
    w = b""
    for i in range(len(data)):
        c = data[i : i + 1]
        wc = w + c
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        if next_code < 4096:
            table[wc] = next_code
            next_code += 1
            if next_code + early > (1 << width) and width < 12:
                width += 1
        else:
            emit(_LZW_CLEAR, width)
            table = {bytes([j]): j for j in range(256)}
            next_code = _LZW_FIRST
            width = 9
        w = c
    if w:
        emit(table[w], width)
    emit(_LZW_EOD, width)
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


_DECODERS = {
    b"FlateDecode": flate_decode,
    b"Fl": flate_decode,  # §7.4 abbreviated names (inline-image style)
    b"LZWDecode": lzw_decode,
    b"LZW": lzw_decode,
    b"ASCIIHexDecode": ascii_hex_decode,
    b"AHx": ascii_hex_decode,
    b"ASCII85Decode": ascii85_decode,
    b"A85": ascii85_decode,
    b"RunLengthDecode": rle_decode,
    b"RL": rle_decode,
}

ENCODERS = {
    "FlateDecode": flate_encode,
    "LZWDecode": lzw_encode,
    "ASCIIHexDecode": ascii_hex_encode,
    "ASCII85Decode": ascii85_encode,
    "RunLengthDecode": rle_encode,
}


def _split_predictor(name: str) -> tuple[str, int | None]:
    """``"FlateDecode/P12"`` → (``"FlateDecode"``, 12): the suffix
    convention the render/test side uses to request a §7.4.4.4
    predictor (always Columns=1, which divides any payload length)
    while keeping filter mixes plain name tuples."""
    if "/P" in name:
        base, p = name.split("/P", 1)
        return base, int(p)
    return name, None


def encode_chain(data: bytes, names: tuple[str, ...]) -> bytes:
    """Apply encoders so that decoding with ``/Filter [names…]`` (which
    decodes left-to-right) recovers ``data`` — i.e. encode in reverse
    list order. A predictor suffix applies BEFORE its filter's
    compression (decode undoes it after decompression)."""
    for nm in reversed(names):
        base, pred = _split_predictor(nm)
        if pred is not None:
            data = encode_predictor(data, pred, columns=1)
        data = ENCODERS[base](data)
    return data


def stream_object_bytes(data: bytes, names: tuple[str, ...], obj_num: int = 2) -> bytes:
    """Wrap ``data`` as an indirect stream object with the given filter
    chain — the render-side counterpart of the decoder's splice
    contract (decode(wrap(data)) drops the wrapper exactly)."""
    enc = encode_chain(data, names)
    bases = [_split_predictor(n)[0] for n in names]
    preds = [p for n in names if (p := _split_predictor(n)[1]) is not None]
    f = f"/{bases[0]}" if len(bases) == 1 else "[ " + " ".join("/" + n for n in bases) + " ]"
    parms = f" /DecodeParms << /Predictor {preds[0]} /Columns 1 >>" if preds else ""
    head = f"{obj_num} 0 obj\n<< /Length {len(enc)} /Filter {f}{parms} >>\nstream\n".encode()
    return head + enc + b"\nendstream\nendobj\n"


# ---------------------------------------------------------------------------
# document-buffer rewrite
# ---------------------------------------------------------------------------


def _skip_ws(buf: bytes, i: int) -> int:
    n = len(buf)
    while i < n and buf[i] in _WS:
        i += 1
    return i


def _dict_extent(buf: bytes, start: int) -> int:
    """End index (exclusive) of the ``<<…>>`` dict at ``start``,
    honoring nesting, literal strings, and hex strings."""
    n = len(buf)
    i = start
    depth = 0
    while i < n:
        c = buf[i]
        if c == 0x3C:  # '<'
            if buf[i : i + 2] == b"<<":
                depth += 1
                i += 2
                continue
            # hex string: skip to '>'
            j = buf.find(b">", i + 1)
            if j == -1:
                raise ValueError("unterminated hex string in dict")
            i = j + 1
            continue
        if c == 0x3E:  # '>'
            if buf[i : i + 2] == b">>":
                depth -= 1
                i += 2
                if depth == 0:
                    return i
                continue
            i += 1
            continue
        if c == 0x28:  # '(' literal string with escapes + nesting
            lvl = 0
            while i < n:
                if buf[i] == 0x5C:  # backslash
                    i += 2
                    continue
                if buf[i] == 0x28:
                    lvl += 1
                elif buf[i] == 0x29:
                    lvl -= 1
                    if lvl == 0:
                        i += 1
                        break
                i += 1
            continue
        i += 1
    raise ValueError("unterminated dict")


def _parse_filters(d: bytes) -> tuple[bytes, ...] | None:
    m = _FILTER.search(d)
    if m is None:
        return None
    if m.group("one") is not None:
        return (m.group("one"),)
    return tuple(_NAME.findall(m.group("arr")))


# --- predictors (§7.4.4.4, LZWDecode/FlateDecode parameter): PNG
# predictors 10–15 (per-row filter byte, same five filters as the PNG
# scanline codec in operators/multimodal.py) and TIFF predictor 2
# (horizontal differencing). Writers apply these before compression to
# improve ratios; decode post-processes the inflated bytes.

_DPARMS = re.compile(rb"/DecodeParms[ \t\r\n\f\x00]*<<")
_INT_KEY = {
    b"Predictor": re.compile(rb"/Predictor[ \t\r\n\f\x00]+(\d+)"),
    b"Columns": re.compile(rb"/Columns[ \t\r\n\f\x00]+(\d+)"),
    b"Colors": re.compile(rb"/Colors[ \t\r\n\f\x00]+(\d+)"),
    b"BitsPerComponent": re.compile(rb"/BitsPerComponent[ \t\r\n\f\x00]+(\d+)"),
    b"EarlyChange": re.compile(rb"/EarlyChange[ \t\r\n\f\x00]+(\d+)"),
}


def _parse_decode_parms(d: bytes) -> dict[bytes, int] | None:
    m = _DPARMS.search(d)
    if m is None:
        return None
    try:
        sub_end = _dict_extent(d, m.end() - 2)
    except ValueError:
        return None
    sub = d[m.end() - 2 : sub_end]
    out: dict[bytes, int] = {}
    for key, rx in _INT_KEY.items():
        km = rx.search(sub)
        if km is not None:
            out[key] = int(km.group(1))
    return out or None


def apply_predictor(data: bytes, predictor: int, columns: int = 1, colors: int = 1, bpc: int = 8) -> bytes:
    """Undo a §7.4.4.4 predictor on decompressed bytes. Predictor 1 is
    identity, 2 is TIFF horizontal differencing, ≥10 is PNG (the row's
    leading filter byte selects None/Sub/Up/Average/Paeth per row —
    the tag in the DATA wins, not the dict value, per spec)."""
    if predictor <= 1:
        return data
    if bpc != 8:
        raise ValueError(f"predictor with BitsPerComponent={bpc} not supported")
    stride = colors  # bytes per pixel at 8 bpc
    row_w = columns * colors
    if row_w <= 0:
        raise ValueError("predictor with non-positive Columns")
    if predictor == 2:
        out = bytearray(data)
        n = len(out)
        for r0 in range(0, n, row_w):
            end = min(r0 + row_w, n)
            for i in range(r0 + stride, end):
                out[i] = (out[i] + out[i - stride]) & 0xFF
        return bytes(out)
    if predictor < 10 or predictor > 15:
        raise ValueError(f"unknown predictor {predictor}")
    # PNG: each stored row is 1 filter byte + row_w data bytes
    out = bytearray()
    prev = bytearray(row_w)
    pos = 0
    n = len(data)
    while pos < n:
        if pos + 1 + row_w > n:
            raise ValueError("predictor: truncated row")
        ftype = data[pos]
        row = bytearray(data[pos + 1 : pos + 1 + row_w])
        pos += 1 + row_w
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for i in range(stride, row_w):
                row[i] = (row[i] + row[i - stride]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(row_w):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(row_w):
                left = row[i - stride] if i >= stride else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(row_w):
                a = row[i - stride] if i >= stride else 0
                b = prev[i]
                c = prev[i - stride] if i >= stride else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        else:
            raise ValueError(f"predictor: bad PNG filter byte {ftype}")
        out += row
        prev = row
    return bytes(out)


def encode_predictor(data: bytes, predictor: int, columns: int = 1, colors: int = 1) -> bytes:
    """Forward predictor (test/render side). PNG predictors emit the
    single fixed filter type ``predictor-10`` per row (a legal,
    deterministic choice; decoders must honor the per-row tag)."""
    if predictor <= 1:
        return data
    stride = colors
    row_w = columns * colors
    if predictor == 2:
        out = bytearray(data)
        n = len(out)
        for r0 in range(0, n, row_w):
            end = min(r0 + row_w, n)
            for i in range(end - 1, r0 + stride - 1, -1):
                out[i] = (out[i] - out[i - stride]) & 0xFF
        return bytes(out)
    if predictor < 10 or predictor > 15:
        raise ValueError(f"unsupported predictor {predictor}")
    # 15 = "optimum" (encoder's per-row choice); any legal tag is a
    # correct choice — use Paeth. Decode honors the per-row tag.
    ftype = min(predictor - 10, 4)
    if len(data) % row_w:
        # padding would survive decode and break byte-identity; the
        # writer (tests / render) must pick Columns that divide the
        # payload — Columns=1 always does
        raise ValueError("predictor encode requires row-aligned data")
    out = bytearray()
    prev = bytearray(row_w)
    for r0 in range(0, len(data), row_w):
        row = data[r0 : r0 + row_w]
        enc = bytearray(row)
        if ftype == 0:
            pass
        elif ftype == 1:
            for i in range(row_w - 1, stride - 1, -1):
                enc[i] = (enc[i] - row[i - stride]) & 0xFF
        elif ftype == 2:
            for i in range(row_w):
                enc[i] = (enc[i] - prev[i]) & 0xFF
        elif ftype == 3:
            for i in range(row_w - 1, -1, -1):
                left = row[i - stride] if i >= stride else 0
                enc[i] = (enc[i] - ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:
            for i in range(row_w - 1, -1, -1):
                a = row[i - stride] if i >= stride else 0
                b = prev[i]
                c = prev[i - stride] if i >= stride else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = (enc[i] - pred) & 0xFF
        else:
            raise ValueError(f"unsupported predictor {predictor}")
        out.append(ftype)
        out += enc
        prev = bytearray(row)
    return bytes(out)


def _consume_eol(buf: bytes, i: int) -> int:
    if buf[i : i + 2] == b"\r\n":
        return i + 2
    if buf[i : i + 1] in (b"\n", b"\r"):
        return i + 1
    return i


def _locate_payload(content: bytes, d: bytes, j: int) -> tuple[bytes, int] | None:
    """Payload bytes and end index (past ``endstream``/``endobj`` plus
    one EOL) of the stream whose dict is ``d`` and whose data begins at
    ``j``. ``/Length`` wins when direct (or resolvable as an indirect
    integer object via a linear scan — no xref needed) and truthful;
    otherwise scan for the ``endstream`` keyword (the pypdf fallback).
    Returns ``None`` on hopeless truncation (no ``endstream``)."""
    n = len(content)
    data: bytes | None = None
    end = -1
    length_val: int | None = None
    lm = _LENGTH_DIRECT.search(d)
    if lm is not None:
        length_val = int(lm.group(1))
    else:
        im = _LENGTH_INDIRECT.search(d)
        if im is not None:
            ref = re.search(
                rb"(?<![0-9])%s[ \t\r\n\f\x00]+%s[ \t\r\n\f\x00]+obj[ \t\r\n\f\x00]+(\d+)[ \t\r\n\f\x00]*endobj"
                % (im.group(1), im.group(2)),
                content,
            )
            if ref is not None:
                length_val = int(ref.group(1))
    if length_val is not None:
        k = j + length_val
        if length_val <= n - j:
            k2 = _skip_ws(content, k)
            if content[k2 : k2 + 9] == b"endstream":
                data = content[j:k]
                end = k2 + 9
    if data is None:
        e = content.find(b"endstream", j)
        if e == -1:
            return None
        data = content[j:e]
        if data.endswith(b"\r\n"):
            data = data[:-2]
        elif data.endswith((b"\n", b"\r")):
            data = data[:-1]
        end = e + 9
    k2 = _skip_ws(content, end)
    if content[k2 : k2 + 6] == b"endobj":
        end = k2 + 6
    return data, _consume_eol(content, end)


def _decode_stream_data(data: bytes, d: bytes, budget: int) -> bytes:
    """Run ``data`` through the dict's ``/Filter`` chain, applying a
    ``/DecodeParms`` predictor after the Flate/LZW stage (§7.4.4.4).
    No ``/Filter`` returns the payload unchanged. Raises
    ``_Unsupported`` on a legal-but-undecodable filter (DCTDecode …),
    ``ValueError`` on corrupt payloads, ``StreamBombError`` past the
    budget."""
    filters = _parse_filters(d)
    if filters is None:
        return data
    parms = _parse_decode_parms(d)
    decoded = data
    predictor_pending = parms is not None and parms.get(b"Predictor", 1) > 1
    for nm in filters:
        dec = _DECODERS.get(nm)
        if dec is None:
            raise _Unsupported()
        if nm in (b"LZWDecode", b"LZW") and parms is not None:
            # §7.4.4.2 table 8: /EarlyChange 0 defers the code-width
            # bump by one code (default 1 bumps early)
            decoded = lzw_decode(decoded, budget, early=parms.get(b"EarlyChange", 1))
        else:
            decoded = dec(decoded, budget)
        if predictor_pending and nm in (b"FlateDecode", b"Fl", b"LZWDecode", b"LZW"):
            decoded = apply_predictor(
                decoded,
                parms.get(b"Predictor", 1),
                parms.get(b"Columns", 1),
                parms.get(b"Colors", 1),
                parms.get(b"BitsPerComponent", 8),
            )
            predictor_pending = False
    return decoded


def decode_content_filters(content: bytes, max_decoded: int = MAX_DECODED_BYTES) -> bytes:
    """Rewrite ``content``, replacing every filtered stream object with
    its decoded payload (see module docstring for the splice and error
    contracts). PDF-1.5 compressed-object containers are normalized
    first: ``/Type /ObjStm`` streams expand to classic ``N 0 obj …
    endobj`` objects and ``/Type /XRef`` streams (binary cross-reference
    rows a linear-scan reader never consults) drop whole. Buffers
    without any of the trigger substrings return unchanged — the
    caller's cheap guards keep the plain-corpus fast path at literally
    zero cost."""
    if b"stream" not in content:
        return content
    if b"/ObjStm" in content or b"/XRef" in content:
        content = _expand_object_streams(content, max_decoded)
    if b"/Filter" not in content:
        return content
    out: list[bytes] = []
    pos = 0
    budget = max_decoded
    while True:
        m = _OBJ_HDR.search(content, pos)
        if m is None:
            out.append(content[pos:])
            break
        i = _skip_ws(content, m.end())
        if content[i : i + 2] != b"<<":
            out.append(content[pos : m.end()])
            pos = m.end()
            continue
        try:
            dend = _dict_extent(content, i)
        except ValueError:
            out.append(content[pos : m.end()])
            pos = m.end()
            continue
        d = content[i:dend]
        j = _skip_ws(content, dend)
        if content[j : j + 6] != b"stream":
            # non-stream object (info dict etc.): emit through and
            # continue scanning right after its dict
            out.append(content[pos:dend])
            pos = dend
            continue
        j = _consume_eol(content, j + 6)
        loc = _locate_payload(content, d, j)
        if loc is None:
            # hopeless truncation: emit the rest untouched
            out.append(content[pos:])
            break
        data, end = loc

        if _parse_filters(d) is None:
            # unfiltered stream object: pass through untouched
            out.append(content[pos:end])
            pos = end
            continue
        try:
            decoded = _decode_stream_data(data, d, budget)
        except StreamBombError:
            raise
        except _Unsupported:
            # legal-but-unsupported (DCTDecode image XObjects, JBIG2,
            # Crypt, …): this object yields no text
            decoded = b""
        except ValueError:
            # corrupt payload under a supported filter: per-stream skip
            decoded = b""
        budget -= len(decoded)
        out.append(content[pos : m.start()])
        out.append(decoded)
        pos = end
    return b"".join(out)


class _Unsupported(Exception):
    pass


# ---------------------------------------------------------------------------
# PDF-1.5 compressed objects (§7.5.7 object streams, §7.5.8 xref streams)
# ---------------------------------------------------------------------------
# Real-world writers since PDF 1.5 pack most non-stream objects —
# the /Info dict, page dicts, the indirect /Length integers — inside
# /Type /ObjStm streams, and replace the classic xref table with a
# binary /Type /XRef stream (pypdf reads both transparently; ref
# app/services/pdf_processor.py:364 extract via pypdf). For the
# linear-scan reader the normalization is a pre-pass over the buffer:
# each ObjStm expands to canonical ``N 0 obj\n<body>\nendobj\n``
# objects (exactly the shape the plain renderer writes, so an ObjStm
# render decodes to the byte-identical classic buffer and the flagship
# span fixture pins this path with no regeneration), and each XRef
# stream — pure file-offset bookkeeping a sequential scan never needs —
# drops whole. Corrupt containers follow the per-stream dirt rule:
# that object contributes nothing, the rest of the document extracts.

_TYPE_OBJSTM = re.compile(rb"/Type[ \t\r\n\f\x00]*/ObjStm(?![A-Za-z0-9])")
_TYPE_XREF = re.compile(rb"/Type[ \t\r\n\f\x00]*/XRef(?![A-Za-z0-9])")
_OBJSTM_N = re.compile(rb"/N[ \t\r\n\f\x00]+(\d+)(?![0-9])")
_OBJSTM_FIRST = re.compile(rb"/First[ \t\r\n\f\x00]+(\d+)(?![0-9])")


def _emit_objstm_objects(payload: bytes, d: bytes) -> bytes:
    """Re-serialize an ObjStm's contained objects in canonical classic
    form. §7.5.7: the first ``/First`` bytes are ``/N`` whitespace-
    separated (objnum, offset) integer pairs, offsets relative to
    ``/First`` and strictly increasing; each object's extent runs to
    the next offset (last → end of payload)."""
    nm = _OBJSTM_N.search(d)
    fm = _OBJSTM_FIRST.search(d)
    if nm is None or fm is None:
        raise ValueError("ObjStm: missing /N or /First")
    n_objs = int(nm.group(1))
    first = int(fm.group(1))
    if n_objs <= 0 or first > len(payload):
        raise ValueError("ObjStm: /N or /First out of range")
    header = payload[:first].split()
    if len(header) < 2 * n_objs:
        raise ValueError("ObjStm: short pair table")
    try:
        pairs = [(int(header[2 * k]), int(header[2 * k + 1])) for k in range(n_objs)]
    except ValueError:
        raise ValueError("ObjStm: non-integer pair table") from None
    prev = -1
    for _num, off in pairs:
        if off <= prev:
            raise ValueError("ObjStm: offsets not strictly increasing")
        prev = off
    if first + pairs[-1][1] > len(payload):
        raise ValueError("ObjStm: offset beyond payload")
    out: list[bytes] = []
    for k, (num, off) in enumerate(pairs):
        stop = first + pairs[k + 1][1] if k + 1 < n_objs else len(payload)
        body = payload[first + off : stop].strip(_WS)
        out.append(b"%d 0 obj\n%s\nendobj\n" % (num, body))
    return b"".join(out)


def _expand_object_streams(content: bytes, max_decoded: int = MAX_DECODED_BYTES) -> bytes:
    """Pre-pass: expand ``/Type /ObjStm`` streams in place, drop
    ``/Type /XRef`` streams, pass everything else through untouched
    (ordinary filtered streams are the second pass's job). Runs BEFORE
    the filter pass so indirect ``/Length`` integers stored inside an
    ObjStm resolve against the expanded buffer."""
    out: list[bytes] = []
    pos = 0
    budget = max_decoded
    while True:
        m = _OBJ_HDR.search(content, pos)
        if m is None:
            out.append(content[pos:])
            break
        i = _skip_ws(content, m.end())
        if content[i : i + 2] != b"<<":
            out.append(content[pos : m.end()])
            pos = m.end()
            continue
        try:
            dend = _dict_extent(content, i)
        except ValueError:
            out.append(content[pos : m.end()])
            pos = m.end()
            continue
        d = content[i:dend]
        j = _skip_ws(content, dend)
        if content[j : j + 6] != b"stream":
            out.append(content[pos:dend])
            pos = dend
            continue
        j = _consume_eol(content, j + 6)
        loc = _locate_payload(content, d, j)
        if loc is None:
            out.append(content[pos:])
            break
        data, end = loc
        if _TYPE_XREF.search(d) is not None:
            # xref stream: no content for a sequential reader
            out.append(content[pos : m.start()])
            pos = end
            continue
        if _TYPE_OBJSTM.search(d) is None:
            # ordinary stream object: pass through, payload and all
            # (skipping past the payload keeps binary bytes from
            # aliasing an object header)
            out.append(content[pos:end])
            pos = end
            continue
        try:
            expanded = _emit_objstm_objects(_decode_stream_data(data, d, budget), d)
        except StreamBombError:
            raise
        except (ValueError, _Unsupported):
            expanded = b""
        budget -= len(expanded)
        out.append(content[pos : m.start()])
        out.append(expanded)
        pos = end
    return b"".join(out)


def objstm_object_bytes(
    objects: list[tuple[int, bytes]],
    names: tuple[str, ...] = ("FlateDecode",),
    obj_num: int = 90,
) -> bytes:
    """Pack ``(objnum, serialized body)`` pairs into a ``/Type /ObjStm``
    stream object (render/test side). The expansion contract:
    ``_emit_objstm_objects`` re-serializes each as canonical
    ``N 0 obj\\n<body>\\nendobj\\n`` — so a document that stores, say,
    its Info dict in an ObjStm decodes to the byte-identical classic
    buffer (bodies must carry no leading/trailing whitespace).
    ``names=()`` writes the stream uncompressed (legal per §7.5.7)."""
    bodies = [body for _n, body in objects]
    offs: list[int] = []
    acc = 0
    for b in bodies:
        offs.append(acc)
        acc += len(b) + 1  # one separator newline per body
    header = (" ".join(f"{n} {o}" for (n, _b), o in zip(objects, offs)) + "\n").encode()
    payload = header + b"\n".join(bodies) + b"\n"
    first = len(header)
    enc = encode_chain(payload, names) if names else payload
    fpart = ""
    if names:
        bases = [_split_predictor(n)[0] for n in names]
        preds = [p for n in names if (p := _split_predictor(n)[1]) is not None]
        f = f"/{bases[0]}" if len(bases) == 1 else "[ " + " ".join("/" + n for n in bases) + " ]"
        fpart = f" /Filter {f}"
        if preds:
            fpart += f" /DecodeParms << /Predictor {preds[0]} /Columns 1 >>"
    head = (
        f"{obj_num} 0 obj\n<< /Type /ObjStm /N {len(objects)} /First {first} "
        f"/Length {len(enc)}{fpart} >>\nstream\n"
    ).encode()
    return head + enc + b"\nendstream\nendobj\n"


def xref_stream_bytes(n_entries: int = 4, obj_num: int = 200) -> bytes:
    """A minimal §7.5.8 cross-reference stream: ``W [1 2 1]`` rows,
    FlateDecode with the PNG-Up predictor over ``Columns 4`` — the
    shape every PDF-1.5 writer emits. A linear-scan reader takes no
    content from it; ``decode_content_filters`` drops the whole object
    (so appending one to a render leaves the decoded buffer
    byte-identical)."""
    rows = b"".join(
        b"\x01" + (10 + 50 * k).to_bytes(2, "big") + b"\x00" for k in range(n_entries)
    )
    enc = flate_encode(encode_predictor(rows, 12, columns=4))
    head = (
        f"{obj_num} 0 obj\n<< /Type /XRef /Size {n_entries} /W [ 1 2 1 ] /Root 1 0 R "
        f"/Length {len(enc)} /Filter /FlateDecode "
        f"/DecodeParms << /Predictor 12 /Columns 4 >> >>\nstream\n"
    ).encode()
    return head + enc + b"\nendstream\nendobj\n"
