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

_OBJ_HDR = re.compile(rb"(\d+)[ \t\r\n\f\x00]+(\d+)[ \t\r\n\f\x00]+obj\b")
# (?![0-9]) pins the digit run so backtracking can't split "12 0 R"
# into length "1" + a failed indirect-ref lookahead on "2 0 R"
_LENGTH_DIRECT = re.compile(
    rb"/Length[ \t\r\n\f\x00]+(\d+)(?![0-9])(?![ \t\r\n\f\x00]+\d+[ \t\r\n\f\x00]+R\b)"
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


def encode_chain(data: bytes, names: tuple[str, ...]) -> bytes:
    """Apply encoders so that decoding with ``/Filter [names…]`` (which
    decodes left-to-right) recovers ``data`` — i.e. encode in reverse
    list order."""
    for nm in reversed(names):
        data = ENCODERS[nm](data)
    return data


def stream_object_bytes(data: bytes, names: tuple[str, ...], obj_num: int = 2) -> bytes:
    """Wrap ``data`` as an indirect stream object with the given filter
    chain — the render-side counterpart of the decoder's splice
    contract (decode(wrap(data)) drops the wrapper exactly)."""
    enc = encode_chain(data, names)
    f = f"/{names[0]}" if len(names) == 1 else "[ " + " ".join("/" + n for n in names) + " ]"
    head = f"{obj_num} 0 obj\n<< /Length {len(enc)} /Filter {f} >>\nstream\n".encode()
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


def _consume_eol(buf: bytes, i: int) -> int:
    if buf[i : i + 2] == b"\r\n":
        return i + 2
    if buf[i : i + 1] in (b"\n", b"\r"):
        return i + 1
    return i


def decode_content_filters(content: bytes, max_decoded: int = MAX_DECODED_BYTES) -> bytes:
    """Rewrite ``content``, replacing every filtered stream object with
    its decoded payload (see module docstring for the splice and error
    contracts). Buffers without ``/Filter`` return unchanged — the
    caller's cheap substring guard keeps the plain-corpus fast path at
    literally zero cost."""
    if b"/Filter" not in content or b"stream" not in content:
        return content
    out: list[bytes] = []
    pos = 0
    budget = max_decoded
    n = len(content)
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

        # locate the payload: /Length when direct and truthful, else
        # scan for the endstream keyword (the pypdf fallback)
        data: bytes | None = None
        end = -1
        lm = _LENGTH_DIRECT.search(d)
        if lm is not None:
            length = int(lm.group(1))
            k = j + length
            if length <= n - j:
                k2 = _skip_ws(content, k)
                if content[k2 : k2 + 9] == b"endstream":
                    data = content[j:k]
                    end = k2 + 9
        if data is None:
            e = content.find(b"endstream", j)
            if e == -1:
                # hopeless truncation: emit the rest untouched
                out.append(content[pos:])
                break
            data = content[j:e]
            if data.endswith(b"\r\n"):
                data = data[:-2]
            elif data.endswith((b"\n", b"\r")):
                data = data[:-1]
            end = e + 9
        # optional endobj
        k2 = _skip_ws(content, end)
        if content[k2 : k2 + 6] == b"endobj":
            end = k2 + 6
        end = _consume_eol(content, end)

        filters = _parse_filters(d)
        if filters is None:
            # unfiltered stream object: pass through untouched
            out.append(content[pos:end])
            pos = end
            continue
        try:
            decoded = data
            for nm in filters:
                dec = _DECODERS.get(nm)
                if dec is None:
                    # legal-but-unsupported (DCTDecode image XObjects,
                    # JBIG2, Crypt, …): this object yields no text
                    raise _Unsupported()
                decoded = dec(decoded, budget)
        except StreamBombError:
            raise
        except _Unsupported:
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
