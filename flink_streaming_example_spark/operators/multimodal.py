"""Multimodal columns (SURVEY.md §2.9 L5): opaque binary payloads with
typed metadata, processed by Arrow-batched Python.

Model: a modality row is (payload BINARY, meta STRUCT<mime, n_bytes>) —
no custom Spark type needed.  Feature extraction runs in mapInPandas
(Arrow batches, vectorized pandas ops — never row-at-a-time Python);
the output schema is declared explicitly so the plan is fully typed.

The fixture has no image/audio files, so media payloads are
SYNTHESIZED deterministically from doc_id (closed-form invariants the
DuckDB oracle recomputes) and then decoded by REAL pure-Python
codecs: BMP pixel rows and WAV PCM16 (stdlib struct, r7), PNG (zlib
inflate + scanline unfilter, r8), GIF (our own LZW, r8), and
baseline JPEG (canonical Huffman + IDCT, r8 — lossy, so its oracle
corpus is DC-only where the decode is exactly flat), and uncompressed
AVI video (RIFF demux + DIB frames + idx1 cross-check, r9).  The ONLY
remaining NotImplementedError is COMPRESSED video (inter-frame codecs
need ffmpeg); JPEG re-encode (forward DCT) is also not claimed —
resize_images supports BMP/PNG/GIF.

Scale notes (100 TB): binary payloads ride the same columnar scan as
any column; keep per-batch memory bounded with
spark.sql.execution.arrow.maxRecordsPerBatch when payloads are large
(images), and store huge blobs as paths + ranged reads instead of
inline bytes.  mapInPandas is a narrow transform — no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_example_spark.plans.registry import register
from flink_streaming_example_spark.sources.tables import load_table

_FEATURE_SCHEMA = (
    "doc_id long, mime string, n_bytes long, first_byte long, byte_sum_mod long"
)


def _decode_payload(payload: bytes, mime: str) -> bytes:
    """Decode a payload for feature extraction.

    text/plain passes through; BMP 24-bit pixel rows and WAV PCM16
    decode for real with stdlib struct (round 7); PNG (zlib inflate +
    unfilter), GIF (pure-Python LZW) and baseline JPEG (Huffman +
    IDCT) decode for real in round 8; uncompressed AVI demuxes for
    real in round 9 (concatenated sampled-frame pixel bytes).  Only
    COMPRESSED video remains stubbed.  The surrounding Spark plumbing
    is identical for any modality.
    """
    if mime == "text/plain":
        return payload
    if mime == "image/bmp":
        _w, _h, grid = decode_bmp(payload)
        return bytes(v for row in grid for v in row)
    if mime == "image/png":
        _w, _h, grid = decode_png(payload)
        return bytes(v for row in grid for v in row)
    if mime == "image/gif":
        _w, _h, grid = decode_gif(payload)
        return bytes(v for row in grid for v in row)
    if mime == "image/jpeg":
        _w, _h, grid = decode_jpeg_gray(payload)
        return bytes(v for row in grid for v in row)
    if mime == "audio/wav":
        _sr, _ch, samples = decode_wav(payload)
        import struct

        return struct.pack(f"<{len(samples)}h", *samples)
    if mime == "video/x-msvideo":
        _w, _h, frames = decode_avi(payload)
        return bytes(
            v for g in frames[::_VIDEO_SAMPLE_EVERY] for row in g for v in row
        )
    raise NotImplementedError(
        f"no decoder for mime type {mime!r} (compressed video needs ffmpeg)"
    )


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction over (doc_id, payload, mime)."""
    for pdf in batches:
        decoded = [
            _decode_payload(p, m) for p, m in zip(pdf["payload"], pdf["mime"])
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "mime": pdf["mime"],
                "n_bytes": [len(b) for b in decoded],
                "first_byte": [b[0] if len(b) else -1 for b in decoded],
                "byte_sum_mod": [sum(b) % 997 for b in decoded],
            }
        )


_RESIZE_SCHEMA = "doc_id long, mime string, width int, height int, payload binary"
_FRAMES_SCHEMA = "doc_id long, frame_idx int, frame binary"


# ---- real media codecs (rounds 7-8): BMP pixel rows and WAV PCM
# samples need zero external codecs — stdlib struct only — PNG needs
# only stdlib zlib (IDAT inflate + per-scanline unfilter), and GIF's
# LZW is implemented here in pure Python (round 8).  Decoders fail
# LOUD (ValueError) on anything truncated or off-spec; JPEG decodes
# for real too (round 8), and uncompressed AVI demuxes for real
# (round 9) — only COMPRESSED video remains behind
# NotImplementedError.


def decode_bmp(payload: bytes) -> tuple[int, int, list[list[int]]]:
    """Decode an uncompressed 24-bit grayscale BMP into (width, height,
    top-down pixel grid).  Handles both bottom-up (positive biHeight —
    the common on-disk layout) and top-down (negative) row order and
    the 4-byte row stride padding; a decoder that ignored either would
    produce a wrong position-weighted checksum (q_media_decode's
    oracle).  Pixels must be grayscale (B==G==R) — the synthesized
    corpus is, and a channel-offset bug would surface as a mismatch."""
    import struct

    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP / truncated header")
    (data_off,) = struct.unpack("<I", payload[10:14])
    w, h_raw = struct.unpack("<ii", payload[18:26])
    (planes, bits) = struct.unpack("<HH", payload[26:30])
    (compression,) = struct.unpack("<I", payload[30:34])
    if bits != 24 or compression != 0 or planes != 1 or w <= 0:
        raise ValueError(
            f"unsupported BMP (bits={bits} compression={compression})"
        )
    h = abs(h_raw)
    stride = (w * 3 + 3) // 4 * 4
    if len(payload) < data_off + stride * h:
        raise ValueError("truncated BMP pixel data")
    rows: list[list[int]] = []
    for r in range(h):
        base = data_off + r * stride
        row: list[int] = []
        for x in range(w):
            b, g, rr = payload[base + 3 * x : base + 3 * x + 3]
            if not (b == g == rr):
                raise ValueError("non-grayscale BMP pixel")
            row.append(b)
        rows.append(row)
    if h_raw > 0:
        rows.reverse()  # bottom-up file order -> top-down grid
    return w, h, rows


def encode_bmp(grid: list[list[int]]) -> bytes:
    """Encode a top-down grayscale grid as a canonical bottom-up
    24-bit BMP (the layout decode_bmp round-trips)."""
    import struct

    h = len(grid)
    w = len(grid[0]) if h else 0
    stride = (w * 3 + 3) // 4 * 4
    body = bytearray()
    for row in reversed(grid):  # bottom-up storage
        line = bytearray()
        for v in row:
            line += bytes((v, v, v))
        line += b"\x00" * (stride - len(line))
        body += line
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        + struct.pack("<IiiHH", 40, w, h, 1, 24)
        + struct.pack("<IIiiII", 0, len(body), 2835, 2835, 0, 0)
    )
    return bytes(header + body)


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (left, up, up-left) — the spec's exact
    tie-breaking order (left, then up, then up-left) matters: a wrong
    order decodes to different pixels on real images."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes) -> tuple[int, int, list[list[int]]]:
    """Decode an 8-bit grayscale non-interlaced PNG into (width,
    height, top-down pixel grid) with stdlib zlib only: chunk walk
    with CRC32 verification, multi-IDAT concatenation, full inflate,
    then per-scanline unfilter (None/Sub/Up/Average/Paeth, bpp=1).
    Fails LOUD on interlacing (Adam7), non-grayscale color types,
    bit depths other than 8, a bad CRC, or a scanline stream whose
    inflated size disagrees with IHDR — silent tolerance on any of
    those is how corrupt corpus bytes sneak into training shards."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG signature")
    pos, ihdr, idat, ended = 8, None, bytearray(), False
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) < length or pos + 12 + length > len(payload):
            raise ValueError(f"truncated PNG chunk {ctype!r}")
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            ended = True
            break
        # ancillary chunks (tEXt etc.) are skipped by declared size
        pos += 12 + length
    if ihdr is None or not idat or not ended:
        raise ValueError("PNG missing IHDR/IDAT/IEND")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color != 0 or comp != 0 or filt != 0:
        raise ValueError(
            f"unsupported PNG (depth={depth} color={color})"
        )
    if interlace != 0:
        raise ValueError("interlaced (Adam7) PNG not supported")
    # bounded inflate: a decompress bomb (tiny IDAT, huge IHDR or a
    # stream that inflates past the declared scanline size) must fail
    # loud without ever allocating past expected+1 bytes
    expected = h * (w + 1)
    d = zlib.decompressobj()
    raw = d.decompress(bytes(idat), expected + 1)
    # fail-loud contract covers BOTH directions of slack: unconsumed_tail
    # (stream inflates past expected) and unused_data (trailing garbage
    # bytes inside IDAT after the deflate stream's own EOF).
    if (
        len(raw) != expected
        or not d.eof
        or d.unconsumed_tail
        or d.unused_data
    ):
        raise ValueError(
            f"PNG scanline stream {len(raw)}B != expected {expected}B "
            f"(eof={d.eof}, trailing={len(d.unused_data)}B)"
        )
    rows: list[list[int]] = []
    prior = [0] * w
    for y in range(h):
        line = raw[y * (w + 1) : (y + 1) * (w + 1)]
        ftype, filt_bytes = line[0], line[1:]
        cur: list[int] = []
        for x, fb in enumerate(filt_bytes):
            left = cur[x - 1] if x else 0
            up = prior[x]
            ul = prior[x - 1] if x else 0
            if ftype == 0:
                v = fb
            elif ftype == 1:
                v = fb + left
            elif ftype == 2:
                v = fb + up
            elif ftype == 3:
                v = fb + (left + up) // 2
            elif ftype == 4:
                v = fb + _paeth(left, up, ul)
            else:
                raise ValueError(f"bad PNG filter type {ftype}")
            cur.append(v & 0xFF)
        rows.append(cur)
        prior = cur
    return w, h, rows


def encode_png(
    grid: list[list[int]], filters: list[int] | None = None
) -> bytes:
    """Encode a top-down grayscale grid as an 8-bit non-interlaced
    PNG.  `filters` picks the per-scanline filter type (default all
    None); the synthesized decode corpus cycles through all five so
    every unfilter path in decode_png is exercised.  IDAT is split at
    a deliberately unaligned 37-byte boundary — a decoder that reads
    only the first IDAT chunk cannot round-trip this."""
    import struct
    import zlib

    h = len(grid)
    w = len(grid[0]) if h else 0
    filters = filters or [0] * h
    stream = bytearray()
    prior = [0] * w
    for y in range(h):
        cur = grid[y]
        f = filters[y]
        stream.append(f)
        for x in range(w):
            left = cur[x - 1] if x else 0
            up = prior[x]
            ul = prior[x - 1] if x else 0
            if f == 0:
                fb = cur[x]
            elif f == 1:
                fb = cur[x] - left
            elif f == 2:
                fb = cur[x] - up
            elif f == 3:
                fb = cur[x] - (left + up) // 2
            elif f == 4:
                fb = cur[x] - _paeth(left, up, ul)
            else:
                raise ValueError(f"bad PNG filter type {f}")
            stream.append(fb & 0xFF)
        prior = cur

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    compressed = zlib.compress(bytes(stream))
    out = bytearray(b"\x89PNG\r\n\x1a\n")
    out += chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
    # ancillary chunk BEFORE the image data: a header walk that
    # assumes IHDR-then-IDAT adjacency must skip it by size
    out += chunk(b"tEXt", b"Software\x00fse-spark synth")
    for i in range(0, len(compressed), 37):
        out += chunk(b"IDAT", compressed[i : i + 37])
    out += chunk(b"IEND", b"")
    return bytes(out)


def _lzw_decode(
    data: bytes, min_code_size: int, max_units: int
) -> list[int]:
    """GIF-variant LZW decode (LSB-first variable-width codes, clear /
    end-of-information codes, 12-bit cap).  `max_units` bounds output
    so a corrupt stream cannot balloon memory.  Fails loud on codes
    beyond the table, data before the first clear, or stream
    exhaustion without EOI."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    code_size = min_code_size + 1
    table: list[list[int]] | None = None
    prev: list[int] | None = None
    out: list[int] = []
    acc = bits = pos = 0
    while True:
        while bits < code_size:
            if pos >= len(data):
                raise ValueError("LZW stream exhausted before EOI")
            acc |= data[pos] << bits
            bits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        bits -= code_size
        if code == clear:
            table = [[i] for i in range(clear)] + [[], []]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return out
        if table is None:
            raise ValueError("LZW data before clear code")
        if code < len(table) and code not in (clear, eoi):
            entry = list(table[code])
        elif code == len(table) and prev is not None:
            entry = prev + [prev[0]]  # the KwKwK case
        else:
            raise ValueError(f"bad LZW code {code}")
        out.extend(entry)
        if len(out) > max_units:
            raise ValueError("LZW output exceeds declared pixel count")
        if prev is not None:
            table.append(prev + [entry[0]])
            # width grows when the NEXT add would not fit; 12-bit cap
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    """GIF-variant LZW encode (the real greedy-longest-match
    algorithm, not a literal-only degenerate stream — so decode's
    table growth, width bumps, KwKwK continuations and the 4096-entry
    clear/reset all get exercised by the synthesized corpus)."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    acc = bits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, bits
        acc |= code << bits
        bits += size
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    code_size = min_code_size + 1
    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear, code_size)
    w: tuple[int, ...] = ()
    for k in indices:
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        emit(table[w], code_size)
        table[wk] = next_code
        next_code += 1
        # mirror the decoder: ITS table reaches 2^size one code later,
        # so the encoder widens when next_code passes 2^size
        if next_code == (1 << code_size) + 1 and code_size < 12:
            code_size += 1
        if next_code == 4097:  # 12-bit cap: reset the dictionary
            emit(clear, code_size)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        w = (k,)
    if w:
        emit(table[w], code_size)
    emit(eoi, code_size)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def decode_gif(payload: bytes) -> tuple[int, int, list[list[int]]]:
    """Decode a non-interlaced GIF87a/89a with a grayscale global
    color table into (width, height, top-down pixel grid) — pure
    Python, no codec library: block walk (extensions skipped by
    sub-block size), LZW decompression (_lzw_decode), palette lookup.
    Fails loud on interlacing, local color tables, non-grayscale
    palette entries, or a pixel count that disagrees with the image
    descriptor."""
    import struct

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF signature")
    w, h, packed, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    palette: list[int] | None = None
    if packed & 0x80:
        n = 2 ** ((packed & 0x07) + 1)
        gct = payload[pos : pos + 3 * n]
        if len(gct) < 3 * n:
            raise ValueError("truncated global color table")
        palette = []
        for i in range(n):
            r, g, b = gct[3 * i : 3 * i + 3]
            if not (r == g == b):
                raise ValueError("non-grayscale GIF palette entry")
            palette.append(r)
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        if block == 0x3B:  # trailer
            raise ValueError("GIF trailer before image data")
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            if pos >= len(payload):
                raise ValueError("truncated GIF extension block")
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, iw, ih, ipacked = struct.unpack(
            "<HHHHB", payload[pos + 1 : pos + 10]
        )
        if ipacked & 0x80:
            raise ValueError("local color tables not supported")
        if ipacked & 0x40:
            raise ValueError("interlaced GIF not supported")
        if (left, top, iw, ih) != (0, 0, w, h):
            raise ValueError("sub-rectangle GIF frames not supported")
        if palette is None:
            raise ValueError("GIF image without a color table")
        pos += 10
        if pos >= len(payload):
            raise ValueError("truncated GIF image data")
        min_code_size = payload[pos]
        pos += 1
        lzw = bytearray()
        while pos < len(payload) and payload[pos] != 0:
            size = payload[pos]
            chunk = payload[pos + 1 : pos + 1 + size]
            if len(chunk) < size:
                raise ValueError("truncated GIF data sub-block")
            lzw += chunk
            pos += 1 + size
        if pos >= len(payload):
            raise ValueError("truncated GIF image data")
        pos += 1
        indices = _lzw_decode(bytes(lzw), min_code_size, w * h)
        if len(indices) != w * h:
            raise ValueError(
                f"GIF decodes to {len(indices)} px, expected {w * h}"
            )
        if any(i >= len(palette) for i in indices):
            raise ValueError("GIF index beyond palette")
        grid = [
            [palette[indices[y * w + x]] for x in range(w)]
            for y in range(h)
        ]
        return w, h, grid
    raise ValueError("GIF missing image descriptor")


def encode_gif(grid: list[list[int]]) -> bytes:
    """Encode a top-down grayscale grid as a GIF89a with a 256-entry
    identity grayscale palette and REAL LZW compression, the image
    data split into <=255-byte sub-blocks, plus a graphic-control
    extension before the descriptor (a walker that assumes
    header-then-image adjacency must skip it)."""
    import struct

    h = len(grid)
    w = len(grid[0]) if h else 0
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)  # 256-entry GCT
    for i in range(256):
        out += bytes((i, i, i))
    out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # graphic control ext
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(8)  # LZW min code size
    lzw = _lzw_encode([v for row in grid for v in row], 8)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def decode_wav(payload: bytes) -> tuple[int, int, list[int]]:
    """Decode a PCM16 WAV into (sample_rate, channels, samples) with a
    REAL RIFF chunk walk — unknown chunks (JUNK/LIST/fact) are skipped
    by their declared size with the odd-size pad byte, exactly how a
    production triage decoder survives in-the-wild containers.  Fails
    loud on non-PCM encodings, non-16-bit samples, or a missing
    fmt-before-data ordering."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated WAV chunk {cid!r}")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("short fmt chunk")
            audio_fmt, ch, sr = struct.unpack("<HHI", body[:8])
            (bits,) = struct.unpack("<H", body[14:16])
            if audio_fmt != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV encoding (fmt={audio_fmt} bits={bits})"
                )
            fmt = (sr, ch)
        elif cid == b"data":
            if fmt is None:
                raise ValueError("WAV data chunk before fmt")
            data = body
        pos += 8 + size + (size % 2)  # RIFF pads odd chunks
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if len(data) % 2:
        raise ValueError("odd PCM16 byte count")
    samples = list(struct.unpack(f"<{len(data) // 2}h", data))
    return fmt[0], fmt[1], samples


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize over (doc_id, payload, mime) -> _RESIZE_SCHEMA.

    image/bmp, image/png and image/gif resize FOR REAL: decode ->
    nearest-neighbor sample -> re-encode, pure Python (BMP round 7;
    PNG and GIF round 8).  text passes through; JPEG still raises —
    a real DCT codec this container does not ship."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads: list[bytes] = []
            for p, m in zip(pdf["payload"], pdf["mime"]):
                if m in ("image/bmp", "image/png", "image/gif"):
                    decode = {"image/bmp": decode_bmp,
                              "image/png": decode_png,
                              "image/gif": decode_gif}[m]
                    encode = {"image/bmp": encode_bmp,
                              "image/png": encode_png,
                              "image/gif": encode_gif}[m]
                    w, h, grid = decode(p)
                    resized = [
                        [grid[y * h // height][x * w // width] for x in range(width)]
                        for y in range(height)
                    ]
                    payloads.append(encode(resized))
                elif m.startswith("image/"):
                    raise NotImplementedError(
                        f"compressed image decode ({m}) requires PIL/opencv"
                    )
                else:
                    payloads.append(p)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "width": width,
                    "height": height,
                    "payload": payloads,
                }
            )

    return df.mapInPandas(kernel, schema=_RESIZE_SCHEMA)


def sample_frames(df: DataFrame, every_n: int) -> DataFrame:
    """Video frame sampling -> one row per sampled frame
    (_FRAMES_SCHEMA, frame = row-major grayscale pixel bytes).
    Uncompressed AVI demuxes for REAL (decode_avi, round 9) — the
    1->N row expansion, batching and sampling rule all execute;
    compressed containers (mp4/h264) still need ffmpeg and fail
    loud."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, blobs = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                p = bytes(p)
                if p[:4] != b"RIFF" or p[8:12] != b"AVI ":
                    raise NotImplementedError(
                        "compressed video frame extraction requires "
                        "ffmpeg (absent); only uncompressed AVI demuxes"
                    )
                _w, _h, frames = decode_avi(p)
                for fi in range(0, len(frames), every_n):
                    ids.append(doc_id)
                    idxs.append(fi)
                    blobs.append(
                        bytes(v for row in frames[fi] for v in row)
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": blobs,
                }
            )

    return df.mapInPandas(kernel, schema=_FRAMES_SCHEMA)


# ---- header-level media metadata (round 6): the pure-Python piece of
# the decode story that needs NO codec.  A 100 TB corpus triage pass
# (dimension filters, aspect-ratio buckets, sample-rate splits, corrupt
# -payload quarantine) only needs the container HEADER — parsing it in
# an Arrow-batched kernel avoids ever shipping pixel decoders to the
# cluster.  Formats are parsed from their public container layouts
# (PNG IHDR, JPEG SOFn marker walk, GIF logical screen descriptor, BMP
# BITMAPINFOHEADER, WAV RIFF fmt chunk).


def parse_media_header(payload: bytes) -> dict:
    """Extract (mime, width, height, sample_rate, channels) from a
    media container header — pure Python, no codecs.  Unknown or
    truncated payloads raise ValueError (fail loud: silently emitting
    zeros would let corrupt payloads masquerade as 0x0 images —
    quarantine decisions need the distinction)."""
    import struct

    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        if len(payload) < 24:
            raise ValueError("truncated PNG header")
        w, h = struct.unpack(">II", payload[16:24])
        return {"mime": "image/png", "width": w, "height": h}
    if payload[:3] == b"GIF" and payload[3:6] in (b"87a", b"89a"):
        if len(payload) < 10:
            raise ValueError("truncated GIF header")
        w, h = struct.unpack("<HH", payload[6:10])
        return {"mime": "image/gif", "width": w, "height": h}
    if payload[:2] == b"BM":
        if len(payload) < 26:
            raise ValueError("truncated BMP header")
        w, h = struct.unpack("<ii", payload[18:26])
        return {"mime": "image/bmp", "width": w, "height": abs(h)}
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        if len(payload) < 36 or payload[12:16] != b"fmt ":
            raise ValueError("truncated/noncanonical WAV header")
        ch, sr = struct.unpack("<HI", payload[22:28])
        return {"mime": "audio/wav", "sample_rate": sr, "channels": ch}
    if payload[:2] == b"\xff\xd8":
        # JPEG: walk marker segments to the first SOFn frame header
        pos = 2
        while pos + 4 <= len(payload):
            if payload[pos] != 0xFF:
                break
            # the spec allows any number of 0xFF fill bytes before the
            # marker code; skip them or a fill run would be read as a
            # bogus segment length (round-6 advisor)
            while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
                pos += 1
            if pos + 4 > len(payload):
                break
            marker = payload[pos + 1]
            if (
                marker in (0x01, 0xD8, 0xD9)  # TEM / SOI / EOI
                or 0xD0 <= marker <= 0xD7  # RSTn
            ):
                pos += 2  # standalone markers carry no length
                continue
            (seg_len,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
            is_sof = 0xC0 <= marker <= 0xCF and marker not in (
                0xC4,
                0xC8,
                0xCC,
            )
            if is_sof:
                if pos + 9 > len(payload):
                    raise ValueError("truncated JPEG SOF segment")
                h, w = struct.unpack(">HH", payload[pos + 5 : pos + 9])
                return {"mime": "image/jpeg", "width": w, "height": h}
            pos += 2 + seg_len
        raise ValueError("JPEG without SOF frame header")
    raise ValueError(f"unrecognized media container: {payload[:8]!r}")


def media_metadata(df: DataFrame) -> DataFrame:
    """(doc_id, payload) -> header metadata, Arrow-batched; the
    production shape for corpus triage at scale (narrow transform, no
    shuffle, bytes never decoded past the header)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [parse_media_header(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": [r["mime"] for r in rows],
                    "width": pd.Series(
                        [r.get("width", 0) for r in rows], dtype="int32"
                    ),
                    "height": pd.Series(
                        [r.get("height", 0) for r in rows], dtype="int32"
                    ),
                    "sample_rate": pd.Series(
                        [r.get("sample_rate", 0) for r in rows],
                        dtype="int32",
                    ),
                    "channels": pd.Series(
                        [r.get("channels", 0) for r in rows], dtype="int32"
                    ),
                    "n_bytes": pd.Series(
                        [len(p) for p in pdf["payload"]], dtype="int64"
                    ),
                }
            )

    return df.mapInPandas(
        kernel,
        schema=(
            "doc_id long, mime string, width int, height int, "
            "sample_rate int, channels int, n_bytes long"
        ),
    )


def synth_media_payloads(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic real container headers from doc_id (the fixture
    ships no media bytes): mime cycles by doc_id % 5, dimensions /
    audio params are doc_id arithmetic — which is what lets the DuckDB
    oracle recompute the parsed metadata without parsing bytes."""
    import struct
    import zlib

    def png(w, h):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", len(ihdr))
            + b"IHDR"
            + ihdr
            + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
        )

    def jpeg(w, h):
        app0 = (
            b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
            + struct.pack(">HH", 1, 1) + b"\x00\x00"
        )
        sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + b"\x01\x11\x00"
        return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"

    def gif(w, h):
        return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"

    def bmp(w, h):
        return (
            b"BM" + struct.pack("<IHHI", 54, 0, 0, 54)
            + struct.pack("<IiiHH", 40, w, h, 1, 24)
            + struct.pack("<IIiiII", 0, 0, 2835, 2835, 0, 0)
        )

    def wav(sr, ch):
        return (
            b"RIFF" + struct.pack("<I", 36) + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, 1, ch, sr, sr * ch * 2, ch * 2, 16)
            + b"data" + struct.pack("<I", 0)
        )

    for pdf in batches:
        payloads = []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            w, h = d % 1024 + 16, (d * 7) % 1024 + 16
            kind = d % 5
            if kind == 0:
                payloads.append(png(w, h))
            elif kind == 1:
                payloads.append(jpeg(w, h))
            elif kind == 2:
                payloads.append(gif(w, h))
            elif kind == 3:
                payloads.append(bmp(w, h))
            else:
                payloads.append(wav(8000 * (d % 3 + 1), d % 2 + 1))
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


_MEDIA_META_ORACLE = """
SELECT
  doc_id,
  CASE doc_id % 5 WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg'
       WHEN 2 THEN 'image/gif' WHEN 3 THEN 'image/bmp'
       ELSE 'audio/wav' END AS mime,
  CAST(CASE WHEN doc_id % 5 < 4 THEN doc_id % 1024 + 16 ELSE 0 END
       AS INT) AS width,
  CAST(CASE WHEN doc_id % 5 < 4 THEN (doc_id * 7) % 1024 + 16 ELSE 0 END
       AS INT) AS height,
  CAST(CASE WHEN doc_id % 5 = 4 THEN 8000 * (doc_id % 3 + 1) ELSE 0 END
       AS INT) AS sample_rate,
  CAST(CASE WHEN doc_id % 5 = 4 THEN doc_id % 2 + 1 ELSE 0 END
       AS INT) AS channels,
  CAST(CASE doc_id % 5 WHEN 0 THEN 33 WHEN 1 THEN 35 WHEN 2 THEN 13
       WHEN 3 THEN 54 ELSE 44 END AS BIGINT) AS n_bytes
FROM documents
"""


@register(
    "q_media_metadata",
    oracle=_MEDIA_META_ORACLE,
    tags=("multimodal", "python"),
)
def q_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5b: header-level media metadata extraction — REAL pure-Python
    container parsers (PNG/JPEG/GIF/BMP/WAV), no codecs, over
    deterministic synthesized headers (the fixture ships no media
    bytes).  The oracle recomputes every parsed field from doc_id
    arithmetic, so a parser reading the wrong offset/endianness fails
    the hash.  Two chained mapInPandas stages (synthesize -> parse)
    exercise the binary-column round trip through Arrow both ways."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    media = docs.mapInPandas(
        synth_media_payloads, schema="doc_id long, payload binary"
    )
    return media_metadata(media)


def synth_decodable_payloads(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Deterministic FULL media payloads from doc_id — real pixel rows
    / PCM samples, not just headers.  doc_id % 4 picks the format:
    0 -> bottom-up 24-bit BMP (grayscale v(x,y) = (3x + 7y + d) mod
    256, row padding filled with 0xAB so a stride-ignoring decoder
    reads garbage); 1 -> PCM16 WAV with a JUNK chunk before data (so
    a walker that assumes fmt-then-data adjacency breaks), s(i) =
    ((31d + 17i) mod 65536) - 32768; 2 -> zlib-compressed grayscale
    PNG (v(x,y) = (5x + 11y + d) mod 256) whose scanline filters
    cycle (y + d) mod 5 so None/Sub/Up/Average/Paeth ALL occur, with
    a tEXt chunk before the image data and IDAT split at a 37-byte
    boundary; 3 -> LZW-compressed GIF (v(x,y) = (7x + 13y + d) mod
    256) with a graphic-control extension before the descriptor.
    The DuckDB oracle recomputes all four invariants from the same
    closed forms."""
    import struct

    def bmp(d: int) -> bytes:
        w, h = d % 16 + 4, (d * 7) % 16 + 4
        stride = (w * 3 + 3) // 4 * 4
        body = bytearray()
        for y in range(h - 1, -1, -1):  # bottom-up rows
            line = bytearray()
            for x in range(w):
                v = (3 * x + 7 * y + d) % 256
                line += bytes((v, v, v))
            line += b"\xab" * (stride - len(line))
            body += line
        return (
            b"BM"
            + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
            + struct.pack("<IiiHH", 40, w, h, 1, 24)
            + struct.pack("<IIiiII", 0, len(body), 2835, 2835, 0, 0)
            + body
        )

    def wav(d: int) -> bytes:
        n = d % 50 + 10
        # d % 8 keeps BOTH mono and stereo present now that WAV is the
        # d % 4 == 1 cohort (d alternates 1 and 5 mod 8)
        ch = 1 if d % 8 == 1 else 2
        sr = 8000 * (d % 3 + 1)
        samples = [
            ((31 * d + 17 * i) % 65536) - 32768 for i in range(n * ch)
        ]
        data = struct.pack(f"<{len(samples)}h", *samples)
        return (
            b"RIFF"
            + struct.pack("<I", 4 + 12 + 24 + 8 + len(data))
            + b"WAVE"
            + b"JUNK" + struct.pack("<I", 4) + b"\x00" * 4
            + b"fmt " + struct.pack(
                "<IHHIIHH", 16, 1, ch, sr, sr * ch * 2, ch * 2, 16
            )
            + b"data" + struct.pack("<I", len(data)) + data
        )

    def png(d: int) -> bytes:
        w, h = d % 16 + 4, (d * 5) % 16 + 4
        grid = [
            [(5 * x + 11 * y + d) % 256 for x in range(w)]
            for y in range(h)
        ]
        return encode_png(grid, filters=[(y + d) % 5 for y in range(h)])

    def gif(d: int) -> bytes:
        w, h = d % 16 + 4, (d * 3) % 16 + 4
        grid = [
            [(7 * x + 13 * y + d) % 256 for x in range(w)]
            for y in range(h)
        ]
        return encode_gif(grid)

    makers = {0: bmp, 1: wav, 2: png, 3: gif}
    for pdf in batches:
        payloads = [makers[int(d) % 4](int(d)) for d in pdf["doc_id"]]
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


def media_decode(df: DataFrame) -> DataFrame:
    """(doc_id, payload) -> decoded-content invariants, Arrow-batched:
    n_units (pixels / samples) and an ORDER-SENSITIVE integer checksum
    (position-weighted), so flipped rows, mis-strided pixels, skipped
    chunks, or byte-order bugs all change the value."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mimes, units, sums = [], [], []
            for p in pdf["payload"]:
                head = bytes(p[:8])
                if head[:2] == b"BM":
                    w, h, grid = decode_bmp(p)
                    mimes.append("image/bmp")
                elif head == b"\x89PNG\r\n\x1a\n":
                    w, h, grid = decode_png(p)
                    mimes.append("image/png")
                elif head[:6] in (b"GIF87a", b"GIF89a"):
                    w, h, grid = decode_gif(p)
                    mimes.append("image/gif")
                else:
                    _sr, _ch, samples = decode_wav(p)
                    mimes.append("audio/wav")
                    units.append(len(samples))
                    sums.append(
                        sum(
                            abs(s) * (i + 1)
                            for i, s in enumerate(samples)
                        )
                    )
                    continue
                units.append(w * h)
                sums.append(
                    sum(
                        grid[y][x] * (1 + y * w + x)
                        for y in range(h)
                        for x in range(w)
                    )
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": mimes,
                    "n_units": pd.Series(units, dtype="int64"),
                    "checksum": pd.Series(sums, dtype="int64"),
                }
            )

    return df.mapInPandas(
        kernel,
        schema="doc_id long, mime string, n_units long, checksum long",
    )


_MEDIA_DECODE_ORACLE = """
SELECT
  doc_id,
  CASE doc_id % 4 WHEN 0 THEN 'image/bmp'
                  WHEN 1 THEN 'audio/wav'
                  WHEN 2 THEN 'image/png'
                  ELSE 'image/gif' END AS mime,
  CAST(CASE doc_id % 4
    WHEN 0 THEN (doc_id % 16 + 4) * ((doc_id * 7) % 16 + 4)
    WHEN 1 THEN (doc_id % 50 + 10)
                * (CASE WHEN doc_id % 8 = 1 THEN 1 ELSE 2 END)
    WHEN 2 THEN (doc_id % 16 + 4) * ((doc_id * 5) % 16 + 4)
    ELSE (doc_id % 16 + 4) * ((doc_id * 3) % 16 + 4)
  END AS BIGINT) AS n_units,
  CAST(CASE doc_id % 4
    WHEN 0 THEN list_sum(list_transform(
      range(0, (doc_id % 16 + 4) * ((doc_id * 7) % 16 + 4)),
      i -> ((3 * (i % (doc_id % 16 + 4))
             + 7 * (i // (doc_id % 16 + 4)) + doc_id) % 256) * (i + 1)))
    WHEN 1 THEN list_sum(list_transform(
      range(0, (doc_id % 50 + 10)
               * (CASE WHEN doc_id % 8 = 1 THEN 1 ELSE 2 END)),
      i -> abs(((31 * doc_id + 17 * i) % 65536) - 32768) * (i + 1)))
    WHEN 2 THEN list_sum(list_transform(
      range(0, (doc_id % 16 + 4) * ((doc_id * 5) % 16 + 4)),
      i -> ((5 * (i % (doc_id % 16 + 4))
             + 11 * (i // (doc_id % 16 + 4)) + doc_id) % 256) * (i + 1)))
    ELSE list_sum(list_transform(
      range(0, (doc_id % 16 + 4) * ((doc_id * 3) % 16 + 4)),
      i -> ((7 * (i % (doc_id % 16 + 4))
             + 13 * (i // (doc_id % 16 + 4)) + doc_id) % 256) * (i + 1)))
  END AS BIGINT) AS checksum
FROM documents
"""


@register(
    "q_media_decode",
    oracle=_MEDIA_DECODE_ORACLE,
    tags=("multimodal", "python"),
)
def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5c (rounds 7-8): REAL media decode — BMP pixel rows and WAV
    PCM16 via stdlib struct, and (round 8) COMPRESSED grayscale PNG
    via stdlib zlib (multi-IDAT inflate + None/Sub/Up/Average/Paeth
    scanline unfilter) — all in Arrow-batched kernels, verified by
    position-weighted integer checksums the DuckDB oracle recomputes
    in closed form from doc_id.  The synthesized corpus is
    adversarial on purpose: bottom-up BMP rows with 0xAB stride
    padding (orientation and stride bugs change the weighted
    checksum), a JUNK chunk before WAV data (a naive fmt-then-data
    reader breaks), PNG scanline filters cycling through all five
    types with IDAT split mid-stream at a 37-byte boundary (a
    first-chunk-only or single-filter decoder cannot match), GIF
    carrying real greedy-LZW streams through a pure-Python decoder
    whose table growth and KwKwK continuation paths are fuzz-proven
    (tests/test_multimodal.py).  JPEG decodes for real too, as its
    own key (q_jpeg_decode — lossy, so its oracle corpus is DC-only),
    and uncompressed AVI demuxes as its own key (q_video_decode,
    round 9); the honest stub surface is compressed video only."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    media = docs.mapInPandas(
        synth_decodable_payloads, schema="doc_id long, payload binary"
    )
    return media_decode(media)


_MULTIMODAL_ORACLE = """
SELECT
  doc_id,
  'text/plain' AS mime,
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  CAST(CASE WHEN length(text) > 0 THEN ascii(substring(text, 1, 1))
            ELSE -1 END AS BIGINT) AS first_byte,
  CAST(list_sum(list_transform(range(1, length(text) + 1),
                               i -> ascii(substring(text, i, 1)))) % 997
       AS BIGINT) AS byte_sum_mod
FROM documents
"""


@register(
    "q_multimodal_features",
    oracle=_MULTIMODAL_ORACLE,
    tags=("multimodal", "python"),
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5: binary-payload feature extraction through mapInPandas.

    documents.text -> BINARY payload + meta struct -> Arrow-batched
    pandas features (byte length, first byte, checksum-mod).  The
    oracle recomputes the same byte-level features in SQL, proving the
    Python path end-to-end.  (ASCII fixture text: UTF-8 bytes == char
    codes, which is what lets DuckDB mirror the byte math.)"""
    docs = load_table(spark, sf_dir, "documents")
    modal = docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
    )
    return modal.mapInPandas(_extract_features, schema=_FEATURE_SCHEMA)


# ---- baseline JPEG (round 8): the last image-codec stub, closed with
# a REAL pure-Python baseline sequential decoder — marker walk, DQT /
# DHT (canonical Huffman from BITS/HUFFVAL), SOF0, entropy decode with
# 0xFF00 unstuffing, DC prediction, zigzag, dequantize, IDCT, level
# shift + clamp.  JPEG is lossy, so the oracle strategy differs from
# PNG/GIF: the synthesized corpus is DC-ONLY (every AC coefficient
# zero), where the IDCT of a block is EXACTLY flat — decoded pixel =
# quantized-DC * q0 / 8 + 128, integer-exact when the synthesizer
# picks even block values — so DuckDB can recompute every pixel in
# closed form.  The general path (AC coefficients, the full IDCT) is
# pinned by unit tests: the entropy layer round-trips coefficient
# blocks bit-exactly, and the IDCT is checked on analytic cases.
# Compressed video remains the ONLY stubbed modality (inter-frame
# codecs are out of scope without ffmpeg; the uncompressed-AVI
# container path demuxes for real — decode_avi, round 9).

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]
# JPEG Annex K.3 typical luminance Huffman specs (BITS, HUFFVAL)
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: value -> (code, length), JPEG Annex C order."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value lookup for the decode side."""
    return {
        (length, code): v
        for v, (code, length) in _huff_codes(bits, vals).items()
    }


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def flush(self) -> bytes:
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream exhausted")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise ValueError("unexpected marker in entropy stream")
                self.pos += 1  # skip stuffed 0x00
            self.acc, self.n = b, 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _extend(v: int, size: int) -> int:
    """JPEG EXTEND: map a `size`-bit magnitude to its signed value."""
    return v if size == 0 or v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> int:
    return 0 if v == 0 else abs(v).bit_length()


_COS16 = None  # lazily-built [x][u] -> cos((2x+1) * u * pi / 16)


def _idct_block(coeffs: list[int]) -> list[int]:
    """Direct 2-D IDCT of one dequantized 8x8 block (row-major),
    level-shifted (+128) and clamped.  Deterministic (fixed summation
    order over the nonzero coefficients, cos table built once); the
    sparse prefold makes DC-only blocks — the oracle corpus — cost 64
    adds instead of 64x64 loop iterations (measured 2.7 s -> ~0.3 s
    over the sf0.1 corpus)."""
    global _COS16
    if _COS16 is None:
        import math

        _COS16 = [
            [math.cos((2 * x + 1) * u * math.pi / 16) for u in range(8)]
            for x in range(8)
        ]
    inv_sqrt2 = 0.7071067811865476
    nz = [
        (u, v, (inv_sqrt2 if u == 0 else 1.0)
               * (inv_sqrt2 if v == 0 else 1.0)
               * coeffs[v * 8 + u])
        for v in range(8)
        for u in range(8)
        if coeffs[v * 8 + u] != 0
    ]
    if not nz:
        return [128] * 64
    if len(nz) == 1 and nz[0][0] == 0 and nz[0][1] == 0:
        # DC-only: exactly flat at round(DC/8) + 128
        val = int(round(nz[0][2] / 4.0)) + 128
        val = 0 if val < 0 else 255 if val > 255 else val
        return [val] * 64
    out = []
    cos = _COS16
    for y in range(8):
        cy = cos[y]
        for x in range(8):
            cx = cos[x]
            s = 0.0
            for u, v, c in nz:
                s += c * cx[u] * cy[v]
            val = int(round(s / 4.0)) + 128
            out.append(0 if val < 0 else 255 if val > 255 else val)
    return out


def encode_jpeg_gray(
    qdc_blocks: list[list[int]],
    blocks_w: int,
    blocks_h: int,
    qtable0: int = 16,
    ac_coeffs: dict[tuple[int, int], int] | None = None,
) -> bytes:
    """Encode a baseline sequential grayscale JPEG from QUANTIZED
    coefficient blocks: `qdc_blocks[by][bx]` is the quantized DC of
    each 8x8 block; `ac_coeffs` optionally plants quantized AC values
    {(block_index, zigzag_pos): value} for the general-path unit
    tests.  Real Annex-K Huffman tables, real DC prediction, real
    byte stuffing — the bitstream layer is the full thing; only the
    forward DCT is skipped because the caller supplies coefficients."""
    import struct

    w, h = blocks_w * 8, blocks_h * 8
    qt = bytes([qtable0] + [16] * 63)
    dct = _huff_codes(_DC_BITS, _DC_VALS)
    act = _huff_codes(_AC_BITS, _AC_VALS)
    bw = _BitWriter()
    pred = 0
    bi = 0
    for by in range(blocks_h):
        for bx in range(blocks_w):
            dc = qdc_blocks[by][bx]
            diff = dc - pred
            pred = dc
            size = _category(diff)
            code, length = dct[size]
            bw.write(code, length)
            if size:
                mag = diff if diff >= 0 else diff + (1 << size) - 1
                bw.write(mag & ((1 << size) - 1), size)
            # AC scan: planted coefficients in zigzag order, else EOB
            planted = sorted(
                (z, v)
                for (b, z), v in (ac_coeffs or {}).items()
                if b == bi and v != 0
            )
            run = 0
            last_z = 0
            for z, v in planted:
                run = z - last_z - 1
                while run >= 16:
                    code, length = act[0xF0]  # ZRL
                    bw.write(code, length)
                    run -= 16
                size = _category(v)
                code, length = act[(run << 4) | size]
                bw.write(code, length)
                mag = v if v >= 0 else v + (1 << size) - 1
                bw.write(mag & ((1 << size) - 1), size)
                last_z = z
            if last_z < 63:
                code, length = act[0x00]  # EOB
                bw.write(code, length)
            bi += 1
    ecs = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes((0xFF, marker)) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xDB, b"\x00" + qt)  # DQT, table 0, 8-bit
    out += seg(
        0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes((1, 0x11, 0))
    )  # SOF0: 8-bit, 1 component, 1x1 sampling, qtable 0
    out += seg(
        0xC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS)
    )  # DHT DC 0
    out += seg(0xC4, b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS))  # DHT AC 0
    out += seg(0xDA, bytes((1, 1, 0x00, 0, 63, 0)))  # SOS
    out += ecs
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def decode_jpeg_gray(payload: bytes) -> tuple[int, int, list[list[int]]]:
    """Decode a baseline sequential grayscale JPEG into (width,
    height, top-down pixel grid) — pure Python.  Fails loud on
    progressive (SOF2) / arithmetic / multi-component / 12-bit
    streams, restart markers, missing tables, or a truncated entropy
    stream."""
    import struct

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qtables: dict[int, list[int]] = {}
    dc_dec: dict[int, dict] = {}
    ac_dec: dict[int, dict] = {}
    sof = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker misalignment")
        marker = payload[pos + 1]
        if marker == 0xD9:
            raise ValueError("JPEG EOI before scan data")
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:
            b = 0
            while b < len(body):
                prec, tid = body[b] >> 4, body[b] & 0x0F
                if prec != 0:
                    raise ValueError("16-bit quant tables not supported")
                qtables[tid] = list(body[b + 1 : b + 65])
                b += 65
        elif marker == 0xC4:
            b = 0
            while b < len(body):
                cls, tid = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                vals = list(body[b + 17 : b + 17 + n])
                (dc_dec if cls == 0 else ac_dec)[tid] = _huff_decoder(
                    bits, vals
                )
                b += 17 + n
        elif marker == 0xC0:
            depth, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if depth != 8 or ncomp != 1:
                raise ValueError(
                    f"unsupported SOF0 (depth={depth} components={ncomp})"
                )
            sampling, qtid = body[7], body[8]
            if sampling != 0x11:
                raise ValueError("subsampling not supported for grayscale")
            sof = (w, h, qtid)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC9, 0xCA):
            raise ValueError(
                f"non-baseline JPEG (SOF marker 0xff{marker:02x})"
            )
        elif marker == 0xDD:
            raise ValueError("restart intervals not supported")
        elif marker == 0xDA:
            if sof is None:
                raise ValueError("JPEG SOS before SOF0")
            ncomp = body[0]
            if ncomp != 1:
                raise ValueError("multi-component scan not supported")
            dc_id, ac_id = body[2] >> 4, body[2] & 0x0F
            w, h, qtid = sof
            if qtid not in qtables or dc_id not in dc_dec or ac_id not in ac_dec:
                raise ValueError("JPEG scan references missing tables")
            qt = qtables[qtid]
            ecs_start = pos + 2 + seglen
            ecs_end = payload.rfind(b"\xff\xd9")
            if ecs_end < ecs_start:
                raise ValueError("JPEG missing EOI")
            return _decode_scan(
                payload[ecs_start:ecs_end],
                w,
                h,
                qt,
                dc_dec[dc_id],
                ac_dec[ac_id],
            )
        pos += 2 + seglen
    raise ValueError("JPEG missing SOS")


def _read_huff(r: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | r.bit()
        length += 1
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid JPEG Huffman code")


def _decode_scan(ecs, w, h, qt, dct, act):
    bw_, bh_ = (w + 7) // 8, (h + 7) // 8
    r = _BitReader(ecs)
    pred = 0
    grid = [[0] * w for _ in range(h)]
    for by in range(bh_):
        for bx in range(bw_):
            size = _read_huff(r, dct)
            diff = _extend(r.bits(size), size) if size else 0
            pred += diff
            zz = [0] * 64
            zz[0] = pred * qt[0]
            z = 1
            while z < 64:
                rs = _read_huff(r, act)
                if rs == 0x00:  # EOB
                    break
                if rs == 0xF0:  # ZRL
                    z += 16
                    continue
                run, size = rs >> 4, rs & 0x0F
                z += run
                if z > 63:
                    raise ValueError("JPEG AC run past block end")
                zz[z] = _extend(r.bits(size), size) * qt[z]
                z += 1
            coeffs = [0] * 64
            for i, zi in enumerate(_ZIGZAG):
                coeffs[zi] = zz[i]
            block = _idct_block(coeffs)
            for yy in range(8):
                gy = by * 8 + yy
                if gy >= h:
                    break
                for xx in range(8):
                    gx = bx * 8 + xx
                    if gx < w:
                        grid[gy][gx] = block[yy * 8 + xx]
    return w, h, [row[:] for row in grid]


def synth_jpeg_payloads(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Deterministic DC-only baseline JPEGs from doc_id: blocks_w =
    d%3+1, blocks_h = (d*5)%4+1, quantized DC of block (bx,by) =
    (bx*3 + by*5 + d) % 61 - 30 with qtable[0]=16, so every decoded
    block is EXACTLY flat at 2*qdc + 128 (range [68,188]) and the
    whole image is closed-form-predictable despite the codec being
    lossy in general.  Real Annex-K Huffman, real DC prediction
    across blocks, real byte stuffing."""
    for pdf in batches:
        payloads = []
        for d in pdf["doc_id"]:
            d = int(d)
            bw_, bh_ = d % 3 + 1, (d * 5) % 4 + 1
            qdc = [
                [(bx * 3 + by * 5 + d) % 61 - 30 for bx in range(bw_)]
                for by in range(bh_)
            ]
            payloads.append(encode_jpeg_gray(qdc, bw_, bh_))
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


_JPEG_DECODE_ORACLE = """
SELECT
  doc_id,
  CAST(8 * (doc_id % 3 + 1) * 8 * ((doc_id * 5) % 4 + 1) AS BIGINT)
    AS n_units,
  CAST(list_sum(list_transform(
    range(0, 8 * (doc_id % 3 + 1) * 8 * ((doc_id * 5) % 4 + 1)),
    i -> (2 * ((((i % (8 * (doc_id % 3 + 1))) // 8) * 3
                + ((i // (8 * (doc_id % 3 + 1))) // 8) * 5
                + doc_id) % 61) - 60 + 128) * (i + 1)
  )) AS BIGINT) AS checksum
FROM documents
"""


@register(
    "q_jpeg_decode", oracle=_JPEG_DECODE_ORACLE, tags=("multimodal", "python")
)
def q_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5d (round 8): REAL baseline JPEG decode, pure Python — marker
    walk, DQT/DHT canonical Huffman, entropy decode with byte
    unstuffing and cross-block DC prediction, zigzag, dequantize,
    IDCT, clamp.  The synthesized corpus is DC-only so the lossy
    codec's output is exactly closed-form (synth_jpeg_payloads); the
    general AC path is pinned by entropy-layer round-trip and
    analytic-IDCT unit tests (tests/test_multimodal.py).  With this
    and q_video_decode (round 9), the stub surface of the multimodal
    family is COMPRESSED VIDEO ONLY."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    media = docs.mapInPandas(
        synth_jpeg_payloads, schema="doc_id long, payload binary"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            units, sums = [], []
            for p in pdf["payload"]:
                w, h, grid = decode_jpeg_gray(bytes(p))
                units.append(w * h)
                sums.append(
                    sum(
                        grid[y][x] * (1 + y * w + x)
                        for y in range(h)
                        for x in range(w)
                    )
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_units": pd.Series(units, dtype="int64"),
                    "checksum": pd.Series(sums, dtype="int64"),
                }
            )

    return media.mapInPandas(
        kernel, schema="doc_id long, n_units long, checksum long"
    )


# ---- AVI video codec (round 9: uncompressed DIB frames, stdlib struct)


def encode_avi(frames: list[list[list[int]]], fps: int = 10) -> bytes:
    """Encode grayscale frame grids as an uncompressed AVI: RIFF('AVI ')
    with a real hdrl (avih + strl(strh 'vids'/'DIB ' + strf
    BITMAPINFOHEADER biBitCount=24), a JUNK chunk before movi, '00db'
    DIB frames (bottom-up BGR rows, stride padded to 4 bytes with 0xAB
    so stride-ignoring readers decode garbage), and a trailing idx1
    whose entry offsets are relative to the 'movi' fourcc position —
    the same adversarial construction discipline as encode_bmp/png/gif.
    """
    import struct

    h = len(frames[0])
    w = len(frames[0][0])
    stride = (w * 3 + 3) // 4 * 4
    dibs = []
    for g in frames:
        if len(g) != h or any(len(row) != w for row in g):
            raise ValueError("ragged frame list")
        body = bytearray()
        for y in range(h - 1, -1, -1):  # bottom-up rows
            line = bytearray()
            for x in range(w):
                v = g[y][x]
                line += bytes((v, v, v))  # B == G == R (grayscale)
            line += b"\xab" * (stride - len(line))
            body += line
        dibs.append(bytes(body))

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) % 2 else b""
        )

    def lst(fourcc: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", fourcc + body)

    frame_bytes = stride * h
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,            # dwMicroSecPerFrame
        frame_bytes * fps,           # dwMaxBytesPerSec
        0,                           # dwPaddingGranularity
        0x10,                        # dwFlags: AVIF_HASINDEX
        len(frames),                 # dwTotalFrames
        0,                           # dwInitialFrames
        1,                           # dwStreams
        frame_bytes,                 # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,
    )
    strh = (
        b"vids"
        + b"DIB "
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0,
                      len(frames), frame_bytes, 0, 0)
        + struct.pack("<4h", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes, 2835, 2835, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    junk = chunk(b"JUNK", b"\xab" * 6)
    # movi body with idx1 offsets relative to the 'movi' fourcc start
    movi_body = bytearray()
    offsets = []
    for dib in dibs:
        offsets.append(4 + len(movi_body))  # 4 = the 'movi' fourcc itself
        movi_body += chunk(b"00db", dib)
    movi = lst(b"movi", bytes(movi_body))
    idx1 = chunk(
        b"idx1",
        b"".join(
            b"00db" + struct.pack("<III", 0x10, off, len(dib))
            for off, dib in zip(offsets, dibs)
        ),
    )
    riff_body = b"AVI " + hdrl + junk + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi(payload: bytes) -> tuple[int, int, list[list[list[int]]]]:
    """Decode an uncompressed AVI into (w, h, frames) with a strict
    RIFF walk: verifies the avih dimensions and frame count against
    what the movi list actually holds, requires biCompression=0 /
    biBitCount=24, checks every idx1 entry's offset points at its
    '00db' chunk (an index that lies is corruption, not decoration),
    reads bottom-up BGR rows honoring the 4-byte stride, and fails
    loud on non-grayscale pixels or truncation.  Unknown chunks (JUNK
    etc.) are skipped by declared size with RIFF odd-padding.
    Compressed video codecs (mp4/h264 etc.) remain env-stubbed —
    they need a codec library; the CONTAINER path here is real."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI container")
    (riff_size,) = struct.unpack("<I", payload[4:8])
    if 8 + riff_size > len(payload):
        raise ValueError("truncated RIFF payload")
    avih = None
    strf = None
    movi_at = None
    frames_raw: list[tuple[int, bytes]] = []  # (offset rel. movi fourcc, dib)
    idx1 = None
    pos = 12
    while pos + 8 <= 8 + riff_size:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated AVI chunk {cid!r}")
        if cid == b"LIST":
            fourcc = body[:4]
            if fourcc == b"hdrl":
                # nested walk: avih, then LIST strl -> strh/strf
                ip = 4
                while ip + 8 <= size:
                    icid = body[ip : ip + 4]
                    (isize,) = struct.unpack("<I", body[ip + 4 : ip + 8])
                    ibody = body[ip + 8 : ip + 8 + isize]
                    if len(ibody) < isize:
                        raise ValueError("truncated hdrl chunk")
                    if icid == b"avih":
                        avih = struct.unpack("<IIIIIIIIII4I", ibody[:56])
                    elif icid == b"LIST" and ibody[:4] == b"strl":
                        sp = 4
                        while sp + 8 <= isize:
                            scid = ibody[sp : sp + 4]
                            (ssize,) = struct.unpack(
                                "<I", ibody[sp + 4 : sp + 8]
                            )
                            sbody = ibody[sp + 8 : sp + 8 + ssize]
                            if scid == b"strh" and sbody[:4] == b"vids":
                                pass  # stream header consistency via strf
                            elif scid == b"strf":
                                strf = struct.unpack(
                                    "<IiiHHIIiiII", sbody[:40]
                                )
                            sp += 8 + ssize + (ssize % 2)
                    ip += 8 + isize + (isize % 2)
            elif fourcc == b"movi":
                movi_at = pos + 8  # position of the 'movi' fourcc
                mp = 4
                while mp + 8 <= size:
                    mcid = body[mp : mp + 4]
                    (msize,) = struct.unpack("<I", body[mp + 4 : mp + 8])
                    mbody = body[mp + 8 : mp + 8 + msize]
                    if len(mbody) < msize:
                        raise ValueError("truncated movi chunk")
                    if mcid == b"00db":
                        frames_raw.append((mp, mbody))
                    mp += 8 + msize + (msize % 2)
        elif cid == b"idx1":
            idx1 = body
        pos += 8 + size + (size % 2)
    if avih is None or strf is None or movi_at is None:
        raise ValueError("AVI missing avih/strf/movi")
    w, h, n_frames = avih[8], avih[9], avih[4]
    bi_w, bi_h, bit_count, compression = strf[1], strf[2], strf[4], strf[5]
    if (bi_w, bi_h) != (w, h):
        raise ValueError(
            f"strf dims ({bi_w}x{bi_h}) disagree with avih ({w}x{h})"
        )
    if compression != 0 or bit_count != 24:
        raise NotImplementedError(
            f"compressed AVI stream (biCompression={compression} "
            f"biBitCount={bit_count}) needs a codec library"
        )
    if len(frames_raw) != n_frames:
        raise ValueError(
            f"avih declares {n_frames} frames, movi holds {len(frames_raw)}"
        )
    if idx1 is not None:
        if len(idx1) != 16 * n_frames:
            raise ValueError("idx1 entry count disagrees with frame count")
        for i, (off, dib) in enumerate(frames_raw):
            ckid = idx1[16 * i : 16 * i + 4]
            flags, ioff, isize = struct.unpack(
                "<III", idx1[16 * i + 4 : 16 * i + 16]
            )
            if ckid != b"00db" or ioff != off or isize != len(dib):
                raise ValueError(
                    f"idx1 entry {i} lies: offset {ioff} != {off} "
                    f"or size {isize} != {len(dib)}"
                )
    stride = (w * 3 + 3) // 4 * 4
    frames = []
    for _off, dib in frames_raw:
        if len(dib) != stride * h:
            raise ValueError(
                f"frame size {len(dib)} != stride*h {stride * h}"
            )
        grid = [[0] * w for _ in range(h)]
        for yy in range(h):
            row = dib[yy * stride : yy * stride + w * 3]
            y = h - 1 - yy  # bottom-up
            for x in range(w):
                b, g, r = row[3 * x], row[3 * x + 1], row[3 * x + 2]
                if b != g or g != r:
                    raise ValueError("non-grayscale AVI pixel")
                grid[y][x] = b
        frames.append(grid)
    return w, h, frames


def synth_video_payloads(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Deterministic uncompressed AVI payloads from doc_id: w = d%12+4,
    h = (d*7)%12+4, n_frames = d%6+2, pixel v(x,y,f) = (3x + 5y + 11f
    + d) mod 256 — frame-dependent so frame ORDER and the every-Nth
    sampling rule are both visible in the checksum.  The container is
    adversarial per encode_avi: bottom-up rows, 0xAB stride padding, a
    JUNK chunk before movi, and an idx1 the decoder cross-checks."""
    for pdf in batches:
        payloads = []
        for d in pdf["doc_id"]:
            d = int(d)
            w, h, nf = d % 12 + 4, (d * 7) % 12 + 4, d % 6 + 2
            frames = [
                [
                    [(3 * x + 5 * y + 11 * f + d) % 256 for x in range(w)]
                    for y in range(h)
                ]
                for f in range(nf)
            ]
            payloads.append(encode_avi(frames))
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


_VIDEO_SAMPLE_EVERY = 2


def video_decode(df: DataFrame, every_n: int = _VIDEO_SAMPLE_EVERY) -> DataFrame:
    """(doc_id, payload) -> decoded-video invariants, Arrow-batched:
    full container decode, then EVERY-NTH frame sampling (the
    frame-sample primitive of a video training pipeline) and an
    order-sensitive position-weighted checksum over the sampled
    frames' pixels — flipped rows, mis-strided pixels, wrong frame
    order, or an off-by-one sampling rule all change the value."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            nfs, units, sums = [], [], []
            for p in pdf["payload"]:
                w, h, frames = decode_avi(bytes(p))
                sampled = frames[::every_n]
                nfs.append(len(frames))
                units.append(len(sampled) * w * h)
                acc, i = 0, 0
                for g in sampled:
                    for y in range(h):
                        for x in range(w):
                            i += 1
                            acc += g[y][x] * i
                sums.append(acc)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_frames": pd.Series(nfs, dtype="int32"),
                    "n_units": pd.Series(units, dtype="int64"),
                    "checksum": pd.Series(sums, dtype="int64"),
                }
            )

    return df.mapInPandas(
        kernel,
        schema="doc_id long, n_frames int, n_units long, checksum long",
    )


_VIDEO_DECODE_ORACLE = """
WITH p AS (
  SELECT doc_id,
         doc_id % 12 + 4 AS w,
         (doc_id * 7) % 12 + 4 AS h,
         doc_id % 6 + 2 AS nf,
         (doc_id % 6 + 2 + 1) // 2 AS ns
  FROM documents
)
SELECT doc_id,
  CAST(nf AS INT) AS n_frames,
  CAST(ns * w * h AS BIGINT) AS n_units,
  CAST(list_sum(list_transform(range(0, ns * w * h),
    i -> ((3 * (i % w)
           + 5 * ((i % (w * h)) // w)
           + 11 * ((i // (w * h)) * 2)
           + doc_id) % 256) * (i + 1))) AS BIGINT) AS checksum
FROM p
"""


@register(
    "q_video_decode",
    oracle=_VIDEO_DECODE_ORACLE,
    tags=("multimodal", "python"),
)
def q_video_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5d (round 9): REAL video-container decode + frame sampling —
    uncompressed AVI (RIFF) via stdlib struct: strict hdrl/avih/strf
    walk, '00db' DIB frames read bottom-up honoring the 4-byte row
    stride, idx1 offsets cross-checked against the movi chunks they
    claim to index, then every-2nd-frame sampling and a position-
    weighted checksum the DuckDB oracle recomputes in closed form
    from doc_id.  The synthesized corpus is adversarial per
    encode_avi (JUNK before movi, 0xAB stride padding, frame-varying
    pixels so sampling and order bugs can't cancel).  With this,
    every uncompressed media family (BMP/WAV/PNG/GIF/JPEG-baseline/
    AVI) decodes for real; the honest stub surface is compressed
    video codecs (mp4/h264) only."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    media = docs.mapInPandas(
        synth_video_payloads, schema="doc_id long, payload binary"
    )
    return video_decode(media)


# ---------------------------------------------------------- binaryFile

_binfile_cache: dict[str, str] = {}


def _cleanup_binfile_cache() -> None:
    import shutil

    for path in _binfile_cache.values():
        shutil.rmtree(path, ignore_errors=True)
    _binfile_cache.clear()


def documents_as_media_files(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the synthesized media corpus as ONE FILE PER BLOB
    (`{doc_id}.bin`, once per process per sf_dir) — the layout image
    and audio corpora actually land in before anyone parquet-izes
    them.  Files are written executor-side (foreachPartition over the
    same synth_decodable_payloads kernel the in-memory key uses —
    nothing collects to the driver; local mode shares the target
    directory, a cluster would point at object storage)."""
    import atexit
    import os
    import tempfile

    cached = _binfile_cache.get(sf_dir)
    if cached is not None and os.path.isdir(cached):
        return cached
    if not _binfile_cache:
        atexit.register(_cleanup_binfile_cache)
    out = tempfile.mkdtemp(prefix="docs_media_")

    def write_partition(rows) -> None:
        ids = [r["doc_id"] for r in rows]
        if not ids:
            return
        batches = iter([pd.DataFrame({"doc_id": ids})])
        for pdf in synth_decodable_payloads(batches):
            for d, p in zip(pdf["doc_id"], pdf["payload"]):
                with open(os.path.join(out, f"{int(d)}.bin"), "wb") as fh:
                    fh.write(bytes(p))

    load_table(spark, sf_dir, "documents").select("doc_id").foreachPartition(
        write_partition
    )
    _binfile_cache[sf_dir] = out
    return out


@register(
    "q_binary_file_source",
    oracle=_MEDIA_DECODE_ORACLE,
    tags=("source", "multimodal", "python"),
)
def q_binary_file_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-depth (round 9): the `binaryFile` data source — Spark's
    native reader for blob corpora (one row per file: path, length,
    content) and the honest first hop of every image/audio training
    pipeline.  The synthesized BMP/WAV/PNG/GIF corpus round-trips
    through REAL files on disk; doc_id is recovered from the file
    NAME (regexp on `path` — the join key always lives in the path
    layout at scale) and the content bytes flow through the same
    media_decode kernel as q_media_decode, so the key hash-matches
    that oracle verbatim — proving bytes survive the
    filesystem+reader hop exactly.  Scale notes in the plan: the scan
    is one row per file with readers parallelized per file (fine for
    millions of blobs), listing is the planning cost (object-store
    corpora should shard directories), and files above
    spark.sql.sources.binaryFile.maxLength refuse to read rather
    than truncate."""
    path = documents_as_media_files(spark, sf_dir)
    blobs = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(path)
    )
    media = blobs.select(
        F.regexp_extract(F.col("path"), r"(\d+)\.bin$", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("content").alias("payload"),
    )
    return media_decode(media)


# 8x8 thumbnails: the embedding-input normalization shape every vision
# pipeline runs (SURVEY §2.9 L5 "resize").
_RESIZE_TARGET = 8

_IMAGE_RESIZE_ORACLE = f"""
SELECT doc_id,
  'image/bmp' AS mime,
  CAST({_RESIZE_TARGET * _RESIZE_TARGET} AS BIGINT) AS n_units,
  CAST(list_sum(list_transform(
    range(0, {_RESIZE_TARGET * _RESIZE_TARGET}),
    i -> ((3 * (((i % {_RESIZE_TARGET}) * (doc_id % 16 + 4))
                // {_RESIZE_TARGET})
           + 7 * (((i // {_RESIZE_TARGET}) * ((doc_id * 7) % 16 + 4))
                  // {_RESIZE_TARGET})
           + doc_id) % 256) * (i + 1)
  )) AS BIGINT) AS checksum
FROM documents WHERE doc_id % 4 = 0
"""


@register(
    "q_image_resize",
    oracle=_IMAGE_RESIZE_ORACLE,
    tags=("multimodal", "python"),
)
def q_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5 resize: REAL image thumbnailing over the BMP cohort —
    decode -> nearest-neighbor sample to 8x8 -> re-ENCODE
    (resize_images), then the resized payload is decoded AGAIN by the
    shared media_decode kernel and checksummed, so the driver hash
    proves the full decode->resize->encode->decode chain, not just
    the sampling arithmetic.  The oracle restates nearest-neighbor in
    closed form from the generator's pixel law (src = (dst * dim) //
    8, v = (3x + 7y + d) mod 256 — all integer).  Both stages are
    Arrow-batched mapInPandas kernels (the honest Python boundary,
    tagged in the plan gate); at 100 TB the shape is unchanged —
    per-row work, no shuffle anywhere."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") % 4 == 0)
    )
    media = docs.mapInPandas(
        synth_decodable_payloads, schema="doc_id long, payload binary"
    ).withColumn("mime", F.lit("image/bmp"))
    small = resize_images(media, _RESIZE_TARGET, _RESIZE_TARGET)
    return media_decode(small.select("doc_id", "payload"))
