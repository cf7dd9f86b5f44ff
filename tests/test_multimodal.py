"""Multimodal stub-surface contract: the Spark plumbing (schemas,
lazy plan construction, Arrow batch path) is real; the codec kernels
raise NotImplementedError exactly as documented."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from flink_streaming_example_spark.operators import multimodal
from flink_streaming_example_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _modal(spark, mime: str):
    docs = load_table(spark, SF_DIR, "documents").limit(5)
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit(mime).alias("mime"),
    )


def test_resize_passthrough_schema_for_text(spark):
    out = multimodal.resize_images(_modal(spark, "text/plain"), 64, 64)
    assert out.columns == ["doc_id", "mime", "width", "height", "payload"]
    rows = out.collect()
    assert len(rows) == 5 and rows[0]["width"] == 64


def test_resize_raises_for_image_mime(spark):
    out = multimodal.resize_images(_modal(spark, "image/jpeg"), 64, 64)
    # plan construction is lazy and fine; execution hits the stub
    with pytest.raises(Exception, match="NotImplementedError|PIL|opencv"):
        out.collect()


def test_sample_frames_raises(spark):
    out = multimodal.sample_frames(_modal(spark, "video/mp4"), 10)
    assert out.columns == ["doc_id", "frame_idx", "frame"]
    with pytest.raises(Exception, match="NotImplementedError|ffmpeg"):
        out.collect()


# ---- header parsers (pure Python, no Spark needed) ----

def test_parse_png_header():
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", 640, 480, 8, 2, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR" + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    )
    got = multimodal.parse_media_header(payload)
    assert got == {"mime": "image/png", "width": 640, "height": 480}


def test_parse_jpeg_walks_past_app_segments_to_sof():
    import struct

    # APP0 + a fat APP1 (EXIF-like) BEFORE the SOF0 — the marker walk
    # must skip both by their length fields, not assume SOF position
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    app1 = b"\xff\xe1" + struct.pack(">H", 102) + b"E" * 100
    sof2 = b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, 1080, 1920, 3) + b"\x00" * 3
    got = multimodal.parse_media_header(b"\xff\xd8" + app0 + app1 + sof2)
    assert got == {"mime": "image/jpeg", "width": 1920, "height": 1080}


def test_parse_bmp_negative_height_is_topdown():
    import struct

    # top-down BMPs store height negative; metadata wants magnitude
    payload = (
        b"BM" + struct.pack("<IHHI", 54, 0, 0, 54)
        + struct.pack("<IiiHH", 40, 800, -600, 1, 24) + b"\x00" * 24
    )
    got = multimodal.parse_media_header(payload)
    assert got["width"] == 800 and got["height"] == 600


def test_parse_wav_header():
    import struct

    payload = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 2, 44100, 176400, 4, 16)
        + b"data" + struct.pack("<I", 0)
    )
    got = multimodal.parse_media_header(payload)
    assert got == {"mime": "audio/wav", "sample_rate": 44100, "channels": 2}


def test_parse_rejects_corrupt_payloads():
    with pytest.raises(ValueError, match="unrecognized"):
        multimodal.parse_media_header(b"\x00\x01\x02\x03garbage")
    with pytest.raises(ValueError, match="truncated PNG"):
        multimodal.parse_media_header(b"\x89PNG\r\n\x1a\n\x00\x00")
    with pytest.raises(ValueError, match="without SOF"):
        multimodal.parse_media_header(b"\xff\xd8\xff\xd9")


def test_parse_jpeg_fill_bytes_and_tem_marker():
    import struct

    # legal 0xFF fill padding before a marker + a standalone TEM (0x01)
    # must both be skipped, not read as segment lengths
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 33, 44, 1) + b"\x00" * 3
    payload = b"\xff\xd8" + b"\xff\xff\xff" + b"\xff\x01" + sof0
    got = multimodal.parse_media_header(payload)
    assert got == {"mime": "image/jpeg", "width": 44, "height": 33}


# ---- real uncompressed codecs (round 7) ----


def _grid(w, h, d=0):
    return [[(3 * x + 7 * y + d) % 256 for x in range(w)] for y in range(h)]


def test_bmp_roundtrip_and_bottom_up_orientation():
    g = _grid(5, 3)  # w=5 -> 15-byte rows, stride 16: padding exercised
    w, h, got = multimodal.decode_bmp(multimodal.encode_bmp(g))
    assert (w, h) == (5, 3) and got == g


def test_bmp_decode_topdown_negative_height():
    import struct

    g = _grid(4, 2)
    enc = bytearray(multimodal.encode_bmp(g))
    # flip to top-down: negate height, un-reverse the stored rows
    enc[22:26] = struct.pack("<i", -2)
    stride = 4 * 3  # w=4 -> no padding
    rows = enc[54 : 54 + stride], enc[54 + stride : 54 + 2 * stride]
    enc[54:] = rows[1] + rows[0]
    w, h, got = multimodal.decode_bmp(bytes(enc))
    assert (w, h) == (4, 2) and got == g


def test_bmp_decode_fails_loud():
    with pytest.raises(ValueError, match="not a BMP"):
        multimodal.decode_bmp(b"XX" + b"\x00" * 60)
    g = _grid(4, 2)
    with pytest.raises(ValueError, match="truncated BMP pixel"):
        multimodal.decode_bmp(multimodal.encode_bmp(g)[:-5])


def test_wav_chunk_walk_skips_junk_and_odd_sizes():
    import struct

    samples = [-32768, -1, 0, 1, 32767]
    data = struct.pack("<5h", *samples)
    payload = (
        b"RIFF" + struct.pack("<I", 200) + b"WAVE"
        # odd-sized unknown chunk: walker must apply the RIFF pad byte
        + b"LIST" + struct.pack("<I", 3) + b"abc\x00"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 32000, 2, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    sr, ch, got = multimodal.decode_wav(payload)
    assert (sr, ch) == (16000, 1) and got == samples


def test_wav_decode_fails_loud():
    import struct

    with pytest.raises(ValueError, match="not a RIFF"):
        multimodal.decode_wav(b"OggS" + b"\x00" * 40)
    # non-PCM (IEEE float = format 3) must be rejected, not misread
    payload = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 8000, 32000, 4, 32)
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(ValueError, match="unsupported WAV encoding"):
        multimodal.decode_wav(payload)


def test_resize_bmp_is_real(spark):
    import pandas as pd

    g = _grid(8, 8, d=5)
    pdf = pd.DataFrame(
        {
            "doc_id": [1],
            "payload": [multimodal.encode_bmp(g)],
            "mime": ["image/bmp"],
        }
    )
    out = multimodal.resize_images(
        spark.createDataFrame(pdf), 4, 4
    ).collect()
    w, h, got = multimodal.decode_bmp(bytes(out[0]["payload"]))
    assert (w, h) == (4, 4)
    # nearest-neighbor: out[y][x] == g[y*8//4][x*8//4]
    assert got == [[g[y * 2][x * 2] for x in range(4)] for y in range(4)]


def test_decode_payload_surface():
    # bmp/wav/png decode for real; only codec-library mimes stub
    g = _grid(4, 2)
    assert multimodal._decode_payload(
        multimodal.encode_bmp(g), "image/bmp"
    ) == bytes(v for row in g for v in row)
    assert multimodal._decode_payload(
        multimodal.encode_png(g), "image/png"
    ) == bytes(v for row in g for v in row)
    jp = multimodal.encode_jpeg_gray([[4]], 1, 1)
    assert multimodal._decode_payload(jp, "image/jpeg") == bytes([136] * 64)
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        multimodal._decode_payload(b"\x00\x00\x00\x18ftyp", "video/mp4")


# ---- PNG codec (round 8: stdlib zlib — inflate + unfilter) ----


def test_png_roundtrip_all_filter_types():
    # h=10 cycles filters 0-4 twice; w=5 exercises x=0 edge cases in
    # Sub/Average/Paeth (left/up-left read as zero on the first pixel)
    g = _grid(5, 10, d=9)
    for filters in (None, [1] * 10, [2] * 10, [3] * 10, [4] * 10,
                    [y % 5 for y in range(10)]):
        w, h, got = multimodal.decode_png(
            multimodal.encode_png(g, filters=filters)
        )
        assert (w, h) == (5, 10) and got == g, f"filters={filters}"


def test_png_multi_idat_and_ancillary_chunks():
    # a 24x24 image compresses past 37 bytes -> multiple IDAT chunks,
    # plus the synthesizer's tEXt chunk before the first IDAT
    g = _grid(24, 24, d=3)
    enc = multimodal.encode_png(g, filters=[(y + 3) % 5 for y in range(24)])
    assert enc.count(b"IDAT") > 1 and b"tEXt" in enc
    assert multimodal.decode_png(enc) == (24, 24, g)


def test_png_paeth_predictor_spec_order():
    # PNG spec: ties break left, then up, then up-left
    assert multimodal._paeth(1, 1, 1) == 1
    assert multimodal._paeth(4, 9, 9) == 4    # pa=0 -> left wins
    assert multimodal._paeth(2, 4, 3) == 3    # pa=1=pb, pc=0 -> up-left
    assert multimodal._paeth(5, 2, 4) == 2    # p=3: pb=1=pc, pa=2 -> up
    assert multimodal._paeth(0, 255, 128) == 128  # up-left closest


def test_png_decode_fails_loud():
    import struct
    import zlib

    g = _grid(4, 4)
    enc = multimodal.encode_png(g)
    with pytest.raises(ValueError, match="signature"):
        multimodal.decode_png(b"\x89PNX" + enc[4:])
    # flip one byte inside IHDR body -> CRC must catch it
    bad = bytearray(enc)
    ihdr_at = enc.index(b"IHDR")
    bad[ihdr_at + 8] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        multimodal.decode_png(bytes(bad))
    # interlace flag set (CRC recomputed so only the flag differs)
    ihdr_body = bytearray(enc[ihdr_at + 4 : ihdr_at + 17])
    ihdr_body[-1] = 1
    crc = zlib.crc32(b"IHDR" + ihdr_body) & 0xFFFFFFFF
    inter = (
        enc[: ihdr_at + 4]
        + bytes(ihdr_body)
        + struct.pack(">I", crc)
        + enc[ihdr_at + 21 :]
    )
    with pytest.raises(ValueError, match="interlaced"):
        multimodal.decode_png(inter)
    # truncated scanline stream: drop the IEND and final IDAT chunk
    iend_at = enc.index(b"IEND")
    with pytest.raises(ValueError, match="IHDR/IDAT/IEND|truncated"):
        multimodal.decode_png(enc[: iend_at - 4])


# ---- GIF codec (round 8: pure-Python LZW) ----


def test_lzw_roundtrip_fuzz_and_reset():
    import random

    rng = random.Random(7)
    for trial in range(60):
        alphabet = rng.randint(2, 256)
        mcs = max(2, (alphabet - 1).bit_length())
        if rng.random() < 0.5:
            seq = [rng.randrange(alphabet) for _ in range(rng.randint(1, 400))]
        else:  # repetitive: dictionary-heavy, KwKwK continuations
            unit = [rng.randrange(alphabet) for _ in range(rng.randint(1, 5))]
            seq = (unit * 200)[: rng.randint(1, 400)]
        enc = multimodal._lzw_encode(seq, mcs)
        assert multimodal._lzw_decode(enc, mcs, len(seq)) == seq, trial
    # the 12-bit-cap clear/reset path needs >4096 table entries
    seq = [(i * i) % 251 for i in range(30_000)]
    enc = multimodal._lzw_encode(seq, 8)
    assert multimodal._lzw_decode(enc, 8, len(seq)) == seq
    assert len(enc) < len(seq)  # it actually compresses


def test_gif_roundtrip_with_extension_blocks():
    g = [[(7 * x + 13 * y + 3) % 256 for x in range(19)] for y in range(17)]
    enc = multimodal.encode_gif(g)
    assert enc[:6] == b"GIF89a" and b"\x21\xf9" in enc
    assert multimodal.decode_gif(enc) == (19, 17, g)


def test_gif_decode_fails_loud():
    import struct

    g = _grid(6, 5)
    enc = multimodal.encode_gif(g)
    with pytest.raises(ValueError, match="signature"):
        multimodal.decode_gif(b"GIX89a" + enc[6:])
    # image descriptor offset, computed structurally (searching for
    # 0x2c would land inside the grayscale palette — entry 44 IS
    # b"\\x2c\\x2c\\x2c"): 13B header + 768B GCT + 8B graphic-control
    desc_at = 13 + 768 + 8
    assert enc[desc_at] == 0x2C
    bad = bytearray(enc)
    bad[desc_at + 9] |= 0x40
    with pytest.raises(ValueError, match="interlaced"):
        multimodal.decode_gif(bytes(bad))
    # local color table flag
    bad = bytearray(enc)
    bad[desc_at + 9] |= 0x80
    with pytest.raises(ValueError, match="local color"):
        multimodal.decode_gif(bytes(bad))
    # non-grayscale palette entry
    bad = bytearray(enc)
    bad[13 + 3 * 10 + 1] ^= 0x55  # G channel of entry 10
    with pytest.raises(ValueError, match="grayscale"):
        multimodal.decode_gif(bytes(bad))
    # truncated LZW stream: drop the last sub-block + trailer, claim
    # continuation — decoder must hit stream exhaustion, not return
    with pytest.raises(
        ValueError, match="exhausted|pixel count|truncated|missing"
    ):
        multimodal.decode_gif(enc[:-10])


# ---- baseline JPEG codec (round 8: pure-Python Huffman + IDCT) ----


def test_jpeg_dc_only_blocks_are_exact():
    # DC prediction crosses blocks (DPCM); q0=16 -> pixel = 2*qdc+128
    qdc = [[-30, 0, 30], [7, -7, 13]]
    enc = multimodal.encode_jpeg_gray(qdc, 3, 2)
    w, h, grid = multimodal.decode_jpeg_gray(enc)
    assert (w, h) == (24, 16)
    for by in range(2):
        for bx in range(3):
            vals = {
                grid[by * 8 + y][bx * 8 + x]
                for y in range(8)
                for x in range(8)
            }
            assert vals == {2 * qdc[by][bx] + 128}


def test_jpeg_entropy_layer_roundtrips_ac_coefficients(monkeypatch):
    """The HARD part of JPEG is the entropy layer (canonical Huffman,
    run/size AC coding, ZRL, EOB, byte stuffing, DC prediction) —
    pin it bit-exactly by capturing the DEQUANTIZED coefficient
    blocks the scan decoder hands to the IDCT and comparing with the
    planted values."""
    captured = []

    real_idct = multimodal._idct_block

    def spy(coeffs):
        captured.append(list(coeffs))
        return real_idct(coeffs)

    monkeypatch.setattr(multimodal, "_idct_block", spy)
    # block 0: AC at zigzag 1 and 5 plus a long zero run needing ZRL
    # (zigzag 40); block 1: EOB immediately; block 2: negative ACs
    ac = {(0, 1): 3, (0, 5): -2, (0, 40): 1, (2, 2): -5, (2, 63): 2}
    qdc = [[4, -4, 9]]
    enc = multimodal.encode_jpeg_gray(qdc, 3, 1, ac_coeffs=ac)
    multimodal.decode_jpeg_gray(enc)
    assert len(captured) == 3
    q = 16
    for bi, block in enumerate(captured):
        # rebuild the expected dequantized block in raster order
        zz = [0] * 64
        zz[0] = qdc[0][bi] * q
        for (b, z), v in ac.items():
            if b == bi:
                zz[z] = v * q
        want = [0] * 64
        for i, zi in enumerate(multimodal._ZIGZAG):
            want[zi] = zz[i]
        assert block == want, f"block {bi}"


def test_jpeg_idct_analytic_cases():
    import math

    # single AC basis function: F(u=1,v=0) = c -> f(x,y) =
    # 0.25 * C(0) * c * cos((2x+1)pi/16) with C(0)=1/sqrt(2) for the
    # v=0 axis — constant down columns
    c = 64
    coeffs = [0] * 64
    coeffs[1] = c  # u=1, v=0
    block = multimodal._idct_block(coeffs)
    inv_sqrt2 = 0.7071067811865476
    for y in range(8):
        for x in range(8):
            want = (
                int(round(0.25 * inv_sqrt2 * c
                          * math.cos((2 * x + 1) * math.pi / 16)))
                + 128
            )
            assert block[y * 8 + x] == want
    # clamping: a huge DC must saturate at 255 / 0
    big = [0] * 64
    big[0] = 10_000
    assert set(multimodal._idct_block(big)) == {255}
    big[0] = -10_000
    assert set(multimodal._idct_block(big)) == {0}


def test_jpeg_decode_fails_loud():
    import struct

    enc = multimodal.encode_jpeg_gray([[1]], 1, 1)
    with pytest.raises(ValueError, match="no SOI"):
        multimodal.decode_jpeg_gray(b"\x89PNG" + enc)
    # flip SOF0 -> SOF2 (progressive): marker byte 0xc0 -> 0xc2
    sof_at = enc.index(b"\xff\xc0")
    bad = bytearray(enc)
    bad[sof_at + 1] = 0xC2
    with pytest.raises(ValueError, match="non-baseline"):
        multimodal.decode_jpeg_gray(bytes(bad))
    # truncate the entropy stream: a 4x3-block image has a long
    # entropy segment; cutting 4 bytes before the re-appended EOI
    # leaves the scan starving mid-block
    big = multimodal.encode_jpeg_gray(
        [[(bx * 7 + by * 11) % 61 - 30 for bx in range(4)] for by in range(3)],
        4,
        3,
    )
    eoi_at = big.rfind(b"\xff\xd9")
    with pytest.raises(ValueError, match="exhausted|Huffman|marker"):
        multimodal.decode_jpeg_gray(big[: eoi_at - 4] + b"\xff\xd9")
    # three-component SOF (color) is rejected, not misread
    color_sof = (
        b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, 8, 8, 3)
        + bytes((1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))
    )
    payload = enc[:sof_at] + color_sof + enc[sof_at + 2 + 11 :]
    with pytest.raises(ValueError, match="components=3"):
        multimodal.decode_jpeg_gray(payload)


def test_jpeg_entropy_layer_randomized(monkeypatch):
    """Randomized generalization of the fixed entropy round-trip: many
    (DC, sparse-AC) configurations — including max-category DCs,
    adjacent ACs, zigzag-63 tails and multi-ZRL runs — must reach the
    IDCT as exactly the planted dequantized blocks."""
    import random

    rng = random.Random(23)
    for trial in range(25):
        nb = rng.randint(1, 6)
        qdc = [[rng.randint(-1023, 1023) for _ in range(nb)]]
        ac = {}
        for b in range(nb):
            for z in sorted(rng.sample(range(1, 64), rng.randint(0, 6))):
                ac[(b, z)] = rng.choice(
                    [1, -1, 3, -7, 127, -128, 255, -255]
                )
        captured = []
        real_idct = multimodal._idct_block
        monkeypatch.setattr(
            multimodal,
            "_idct_block",
            lambda c: (captured.append(list(c)), real_idct(c))[1],
        )
        enc = multimodal.encode_jpeg_gray(qdc, nb, 1, ac_coeffs=ac)
        multimodal.decode_jpeg_gray(enc)
        monkeypatch.setattr(multimodal, "_idct_block", real_idct)
        assert len(captured) == nb, trial
        q = 16
        for bi, block in enumerate(captured):
            zz = [0] * 64
            zz[0] = qdc[0][bi] * q
            for (b, z), v in ac.items():
                if b == bi:
                    zz[z] = v * q
            want = [0] * 64
            for i, zi in enumerate(multimodal._ZIGZAG):
                want[zi] = zz[i]
            assert block == want, (trial, bi)


def test_png_trailing_garbage_after_deflate_eof():
    # round-8 advisor: garbage bytes inside IDAT *after* the deflate
    # stream's own EOF were silently tolerated (unused_data unchecked);
    # the fail-loud contract must cover that direction too.  The junk
    # rides in a second, correctly-CRC'd IDAT chunk so only the inflate
    # layer can catch it.
    import struct
    import zlib

    g = _grid(4, 4)
    enc = multimodal.encode_png(g)
    junk = b"\x00garbage-after-eof"
    chunk = struct.pack(">I", len(junk)) + b"IDAT" + junk
    chunk += struct.pack(">I", zlib.crc32(b"IDAT" + junk) & 0xFFFFFFFF)
    iend_at = enc.index(b"IEND")
    bad = enc[: iend_at - 4] + chunk + enc[iend_at - 4 :]
    with pytest.raises(ValueError, match="trailing"):
        multimodal.decode_png(bad)


# ---- AVI codec (round 9: uncompressed RIFF video demux) ----


def _avi_frames(d: int):
    w, h, nf = d % 12 + 4, (d * 7) % 12 + 4, d % 6 + 2
    return [
        [[(3 * x + 5 * y + 11 * f + d) % 256 for x in range(w)] for y in range(h)]
        for f in range(nf)
    ]


def test_avi_roundtrip_shapes():
    for d in (0, 1, 5, 11, 17, 23):
        frames = _avi_frames(d)
        w, h, dec = multimodal.decode_avi(multimodal.encode_avi(frames))
        assert (w, h) == (len(frames[0][0]), len(frames[0]))
        assert dec == frames, f"d={d}"


def test_avi_decode_fails_loud():
    import struct

    enc = multimodal.encode_avi(_avi_frames(9))
    with pytest.raises(ValueError, match="RIFF/AVI"):
        multimodal.decode_avi(b"RIFX" + enc[4:])
    # avih declares one frame more than movi holds
    bad = bytearray(enc)
    (n,) = struct.unpack("<I", enc[48:52])  # dwTotalFrames in avih body
    bad[48:52] = struct.pack("<I", n + 1)
    with pytest.raises(ValueError, match="declares"):
        multimodal.decode_avi(bytes(bad))
    # an idx1 entry whose offset lies
    idx_at = enc.index(b"idx1")
    bad = bytearray(enc)
    (off,) = struct.unpack("<I", enc[idx_at + 16 : idx_at + 20])
    bad[idx_at + 16 : idx_at + 20] = struct.pack("<I", off + 2)
    with pytest.raises(ValueError, match="idx1 entry 0 lies"):
        multimodal.decode_avi(bytes(bad))
    # a non-grayscale pixel (B != G)
    db_at = enc.index(b"00db")
    bad = bytearray(enc)
    bad[db_at + 8] = (bad[db_at + 8] + 1) % 256
    with pytest.raises(ValueError, match="non-grayscale"):
        multimodal.decode_avi(bytes(bad))
    # compressed stream marker -> honest stub, not a wrong decode
    strf_at = enc.index(b"strf")
    bad = bytearray(enc)
    bad[strf_at + 8 + 16 : strf_at + 8 + 20] = struct.pack("<I", 0x34363248)
    with pytest.raises(NotImplementedError, match="codec"):
        multimodal.decode_avi(bytes(bad))
    # truncation
    with pytest.raises(ValueError, match="truncated"):
        multimodal.decode_avi(enc[: len(enc) // 2])


def test_avi_stride_padding_is_honored():
    # w=5 -> stride 16 with 1 pad byte per row of 0xAB; a decoder that
    # reads rows at w*3 would consume the pad bytes as pixels
    frames = [[[(x * 7 + y * 3) % 256 for x in range(5)] for y in range(6)]]
    enc = multimodal.encode_avi(frames)
    assert b"\xab" in enc
    _w, _h, dec = multimodal.decode_avi(enc)
    assert dec == frames


def test_sample_frames_real_for_avi(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(6)
    media = docs.select("doc_id").mapInPandas(
        multimodal.synth_video_payloads, schema="doc_id long, payload binary"
    )
    rows = multimodal.sample_frames(media, 2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    for d, idxs in by_doc.items():
        nf = d % 6 + 2
        assert sorted(idxs) == list(range(0, nf, 2)), (d, idxs)
        w, h = d % 12 + 4, (d * 7) % 12 + 4
    # frame payload bytes are the top-down row-major pixels
    r0 = next(r for r in rows if r["frame_idx"] == 0)
    d = r0["doc_id"]
    w, h = d % 12 + 4, (d * 7) % 12 + 4
    expect = bytes(
        (3 * x + 5 * y + d) % 256 for y in range(h) for x in range(w)
    )
    assert bytes(r0["frame"]) == expect


def test_decode_payload_avi():
    frames = _avi_frames(4)
    got = multimodal._decode_payload(
        multimodal.encode_avi(frames), "video/x-msvideo"
    )
    expect = bytes(v for g in frames[::2] for row in g for v in row)
    assert got == expect
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        multimodal._decode_payload(b"\x00\x00\x00\x18ftyp", "video/mp4")


def test_binary_file_source_bytes_survive_disk(spark):
    """The `{doc_id}.bin` corpus on disk must be byte-identical to the
    in-memory synthesis, and the binaryFile reader must recover every
    blob (no truncation, no missed file)."""
    import glob
    import os

    import pandas as pd

    from flink_streaming_example_spark.operators.multimodal import (
        documents_as_media_files,
        synth_decodable_payloads,
    )
    from flink_streaming_example_spark.sources.tables import load_table

    path = documents_as_media_files(spark, SF_DIR)
    ids = [
        r["doc_id"]
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id")
        .collect()
    ]
    files = glob.glob(os.path.join(path, "*.bin"))
    assert len(files) == len(ids)
    (pdf,) = synth_decodable_payloads(
        iter([pd.DataFrame({"doc_id": sorted(ids)})])
    )
    expect = dict(zip(pdf["doc_id"], pdf["payload"]))
    for f in files:
        d = int(os.path.basename(f)[:-4])
        with open(f, "rb") as fh:
            assert fh.read() == bytes(expect[d]), d
