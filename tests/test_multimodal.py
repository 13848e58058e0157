"""Image header decode: pure-Python parser vs hand-built known-dimension
payloads (no PIL in this container — the parser must be dependency-free)."""

import pytest

from spark_hbase_connector_spark.operators.multimodal import (
    parse_image_dims,
    synth_image_payload,
)


def test_png_dims():
    assert parse_image_dims(synth_image_payload(0)) == ("png", 1, 1)
    assert parse_image_dims(synth_image_payload(40)) == ("png", 41, 121)
    # hand-built, independent of the generator: 640x480
    import zlib

    ihdr = (640).to_bytes(4, "big") + (480).to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    png = (
        b"\x89PNG\r\n\x1a\n"
        + (13).to_bytes(4, "big")
        + b"IHDR"
        + ihdr
        + zlib.crc32(b"IHDR" + ihdr).to_bytes(4, "big")
    )
    assert parse_image_dims(png) == ("png", 640, 480)


def test_gif_dims():
    assert parse_image_dims(synth_image_payload(2)) == ("gif", 3, 7)
    gif = b"GIF87a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little") + b"\x00\x00\x00;"
    assert parse_image_dims(gif) == ("gif", 320, 200)


def test_bmp_dims_including_topdown():
    def bmp(w, h, dib_size=40):
        header = bytearray(26)
        header[0:2] = b"BM"
        header[14:18] = dib_size.to_bytes(4, "little")
        header[18:22] = w.to_bytes(4, "little", signed=True)
        header[22:26] = h.to_bytes(4, "little", signed=True)
        return bytes(header)

    assert parse_image_dims(bmp(800, 600)) == ("bmp", 800, 600)
    # negative height = top-down DIB; magnitude is the pixel height
    assert parse_image_dims(bmp(800, -600)) == ("bmp", 800, 600)
    # V5 header (124) still uses the same 32-bit field offsets
    assert parse_image_dims(bmp(12, 34, dib_size=124)) == ("bmp", 12, 34)
    # OS/2 BITMAPCOREHEADER (size 12) packs 16-bit w/h at 18/20 — parsing
    # it as 32-bit would merge the fields; must fall back to None
    core = bytearray(26)
    core[0:2] = b"BM"
    core[14:18] = (12).to_bytes(4, "little")
    core[18:20] = (800).to_bytes(2, "little")
    core[20:22] = (600).to_bytes(2, "little")
    assert parse_image_dims(bytes(core)) is None
    # a non-positive width is never a valid DIB
    assert parse_image_dims(bmp(0, 600)) is None
    assert parse_image_dims(bmp(-800, 600)) is None


def test_jpeg_sof_scan_skips_leading_segments():
    """SOF at a non-fixed offset (EXIF APP1 + comment before the frame
    header) must still parse — proves the marker scan is real."""
    app1 = b"\xff\xe1" + (102).to_bytes(2, "big") + b"Exif\x00\x00" + b"\x00" * 94
    com = b"\xff\xfe" + (12).to_bytes(2, "big") + b"hello jpeg"
    sof2 = (  # progressive SOF2, 3 components
        b"\xff\xc2"
        + (17).to_bytes(2, "big")
        + bytes([8])
        + (1080).to_bytes(2, "big")
        + (1920).to_bytes(2, "big")
        + bytes([3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
    )
    jpg = b"\xff\xd8" + app1 + com + sof2 + b"\xff\xd9"
    assert parse_image_dims(jpg) == ("jpeg", 1920, 1080)
    # generator's baseline JPEG too
    assert parse_image_dims(synth_image_payload(5)) == ("jpeg", 6, 16)


@pytest.mark.parametrize(
    "junk",
    [
        b"",
        b"RAW0not an image",
        b"\xff\xd8\xff\xd9",  # JPEG with EOI before any SOF
        b"\x89PNG\r\n\x1a\n....",  # truncated PNG, no IHDR
        b"GIF89a\x01",  # truncated GIF
        b"\xff\xd8" + b"\x00" * 40,  # desynced segment stream
    ],
)
def test_non_images_return_none(junk):
    assert parse_image_dims(junk) is None


def test_extract_media_meta_real_decode(spark):
    """End-to-end through the Arrow pass: dimensions come from the BYTES."""
    from spark_hbase_connector_spark.operators.multimodal import extract_media_meta

    rows = [(i, synth_image_payload(i)) for i in range(12)]
    assets = spark.createDataFrame(rows, "id long, payload binary")
    got = {r.id: (r.width, r.height, r.fmt) for r in extract_media_meta(assets).collect()}
    for i in range(12):
        if i % 4 == 3:
            n = 16 + i % 7
            assert got[i] == (n % 640 + 1, (n * 7) % 480 + 1, None)
        else:
            fmt = {0: "png", 1: "jpeg", 2: "gif"}[i % 4]
            assert got[i] == (i % 300 + 1, (i * 3) % 200 + 1, fmt)


# ------------------------------------------------------------- audio ----


def test_parse_wav_basic_and_chunk_walk():
    from spark_hbase_connector_spark.operators.multimodal import (
        parse_wav_meta,
        synth_wav_payload,
    )

    ch, rate, bits, nf = parse_wav_meta(synth_wav_payload(7))  # 7 % 3 == 1 -> wav
    assert (ch, rate, bits, nf) == (7 % 2 + 1, 8000 * (7 % 4 + 1), 16, 7 % 50 + 1)
    # a LIST chunk BEFORE fmt/data must not break the walk (order-independent)
    wav = synth_wav_payload(4)
    chunks = wav[12:]  # fmt + data chunks, after RIFF size + WAVE tag
    lst = b"LIST" + (5).to_bytes(4, "little") + b"INFOX" + b"\x00"  # odd size padded
    rebuilt = b"RIFF" + (4 + len(lst) + len(chunks)).to_bytes(4, "little") \
        + b"WAVE" + lst + chunks
    assert parse_wav_meta(rebuilt) == parse_wav_meta(wav)


def test_parse_wav_rejects_junk():
    from spark_hbase_connector_spark.operators.multimodal import parse_wav_meta

    assert parse_wav_meta(b"") is None
    assert parse_wav_meta(b"RIFF\x00\x00\x00\x00JUNK") is None
    assert parse_wav_meta(b"NOTA wav at all, just text") is None
    # RIFF/WAVE but no data chunk
    fmt_only = b"RIFF" + (30).to_bytes(4, "little") + b"WAVE" \
        + b"fmt " + (16).to_bytes(4, "little") + bytes(16)
    assert parse_wav_meta(fmt_only) is None
    # zero sample rate must be rejected, not divide
    bad = bytearray(b"RIFF" + (100).to_bytes(4, "little") + b"WAVE")
    bad += b"fmt " + (16).to_bytes(4, "little")
    bad += (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
    bad += (0).to_bytes(4, "little") + (0).to_bytes(4, "little")
    bad += (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
    bad += b"data" + (4).to_bytes(4, "little") + bytes(4)
    assert parse_wav_meta(bytes(bad)) is None


def test_extract_audio_meta_real_decode(spark):
    from spark_hbase_connector_spark.operators.multimodal import (
        extract_audio_meta,
        synth_wav_payload,
    )

    rows = [(i, synth_wav_payload(i)) for i in range(9)]
    assets = spark.createDataFrame(rows, "id long, payload binary")
    got = {
        r.id: (r.n_channels, r.sample_rate, r.duration_ms, r.fmt)
        for r in extract_audio_meta(assets).collect()
    }
    for i in range(9):
        if i % 3 == 2:
            n = 16 + i % 7
            assert got[i] == (n % 2 + 1, n * 97 % 48000 + 1, n % 1000, None)
        else:
            rate = 8000 * (i % 4 + 1)
            nf = i % 50 + 1
            assert got[i] == (i % 2 + 1, rate, nf * 1000 // rate, "wav")


# ------------------------------------------------------------- video ----


def test_parse_mp4_box_walk():
    from spark_hbase_connector_spark.operators.multimodal import (
        parse_mp4_meta,
        synth_mp4_payload,
    )

    w, h, dur = parse_mp4_meta(synth_mp4_payload(7))  # 7 % 3 == 1 -> mp4
    assert (w, h, dur) == (16 * (7 % 60 + 1), 16 * (7 % 34 + 1), 500 * (7 % 20 + 1))
    # variable-size free box between ftyp and moov shifts every offset:
    # a fixed-offset peek would break; the walk must not
    for i in (0, 1, 3, 4, 9, 10):
        assert parse_mp4_meta(synth_mp4_payload(i)) is not None


def test_parse_mp4_rejects_junk():
    from spark_hbase_connector_spark.operators.multimodal import (
        parse_mp4_meta,
        synth_mp4_payload,
    )

    assert parse_mp4_meta(b"") is None
    assert parse_mp4_meta(b"RIFF....WAVE") is None
    assert parse_mp4_meta(synth_mp4_payload(2)) is None  # the non-video case
    # ftyp but no moov
    ftyp_only = (16).to_bytes(4, "big") + b"ftypisom" + (512).to_bytes(4, "big")
    assert parse_mp4_meta(ftyp_only) is None
    # truncated moov (declared size past the buffer) stops cleanly
    trunc = ftyp_only + (1000).to_bytes(4, "big") + b"moov" + bytes(8)
    assert parse_mp4_meta(trunc) is None


# ------------------------------------------------- parser robustness ----


def _fuzz(parser, synth):
    """Parsers must never RAISE on arbitrary bytes — at 100 TB of crawled
    payloads a malformed header that throws kills the whole job; the
    contract is parse-or-None. Also: truncations of VALID payloads and
    bit-flips in headers must degrade to None or a parse, never an
    exception."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=200))
    def fuzz_random(b):
        parser(b)  # any return is fine; raising is the failure

    fuzz_random()

    @settings(max_examples=100, deadline=None)
    @given(st.integers(0, 50), st.integers(0, 300))
    def fuzz_truncated(i, cut):
        parser(synth(i)[:cut])

    fuzz_truncated()

    @settings(max_examples=100, deadline=None)
    @given(st.integers(0, 50), st.integers(0, 40), st.integers(0, 255))
    def fuzz_bitflip(i, pos, val):
        b = bytearray(synth(i))
        if pos < len(b):
            b[pos] = val
        parser(bytes(b))

    fuzz_bitflip()


def test_fuzz_image_parser():
    from spark_hbase_connector_spark.operators.multimodal import (
        parse_image_dims,
        synth_image_payload,
    )

    _fuzz(parse_image_dims, synth_image_payload)


def test_fuzz_wav_parser():
    from spark_hbase_connector_spark.operators.multimodal import (
        parse_wav_meta,
        synth_wav_payload,
    )

    _fuzz(parse_wav_meta, synth_wav_payload)


def test_fuzz_mp4_parser():
    from spark_hbase_connector_spark.operators.multimodal import (
        parse_mp4_meta,
        synth_mp4_payload,
    )

    _fuzz(parse_mp4_meta, synth_mp4_payload)


# ------------------------------------------------- perceptual hashing ----


def test_bmp_pixel_roundtrip():
    """decode_bmp_gray must reproduce the generator's pixel formula exactly
    through the REAL byte layout (bottom-up rows, padding, BGR)."""
    from spark_hbase_connector_spark.operators.multimodal import (
        decode_bmp_gray,
        synth_bmp_payload,
    )

    for i in (0, 1, 7, 123):
        g = decode_bmp_gray(synth_bmp_payload(i))
        group, v = i // 4, i % 4
        for y in range(8):
            for x in range(9):
                exp = (group * 37 + x * 11 + y * 5 + x * y * (group + 1)) % 251
                if v > 0 and x == 2 * v and y == v:
                    exp = (exp + 100) % 251
                assert g[y][x] == exp, (i, x, y)


def test_bmp_decode_topdown_and_rejects():
    """Negative height (top-down storage) must yield the same logical grid;
    non-BMP / non-24bpp payloads must return None, not garbage."""
    from spark_hbase_connector_spark.operators.multimodal import (
        decode_bmp_gray,
        synth_bmp_payload,
    )

    b = bytearray(synth_bmp_payload(9))
    grid = decode_bmp_gray(bytes(b))
    # rewrite height as negative (top-down) and reverse the stored rows
    offset = int.from_bytes(b[10:14], "little")
    row_size = (9 * 3 + 3) & ~3
    rows = [bytes(b[offset + r * row_size : offset + (r + 1) * row_size]) for r in range(8)]
    b[22:26] = (-8).to_bytes(4, "little", signed=True)
    b[offset:] = b"".join(reversed(rows))
    assert decode_bmp_gray(bytes(b)) == grid
    assert decode_bmp_gray(b"NOTABMP" * 10) is None
    bad_bpp = bytearray(synth_bmp_payload(0))
    bad_bpp[28:30] = (8).to_bytes(2, "little")
    assert decode_bmp_gray(bytes(bad_bpp)) is None


def test_dhash_scale_invariance_and_bump_locality():
    """Mean-pooling a 2x-upscaled image must give the identical dHash, and
    a single-pixel perturbation flips at most 2 bits."""
    from spark_hbase_connector_spark.operators.multimodal import (
        decode_bmp_gray,
        dhash64_from_gray,
        synth_bmp_payload,
    )

    g = decode_bmp_gray(synth_bmp_payload(20))
    up = [[g[y // 2][x // 2] for x in range(18)] for y in range(16)]
    assert dhash64_from_gray(up) == dhash64_from_gray(g)
    for i in (21, 22, 23):  # same group, bumped variants
        d = dhash64_from_gray(decode_bmp_gray(synth_bmp_payload(i)))
        assert bin((d ^ dhash64_from_gray(g)) & (2**64 - 1)).count("1") <= 2


def test_phash_brightness_invariance():
    """pHash's defining property: a uniform brightness shift lands entirely
    in the DC coefficient, which the hash excludes — identical words."""
    from spark_hbase_connector_spark.operators.multimodal import (
        decode_bmp_gray,
        phash64_from_gray,
        synth_bmp_payload,
    )

    g = decode_bmp_gray(synth_bmp_payload(13))
    shifted = [[v + 37 for v in row] for row in g]
    assert phash64_from_gray(shifted) == phash64_from_gray(g)
    # and it must NOT be degenerate: a different group hashes differently
    other = decode_bmp_gray(synth_bmp_payload(113))
    assert phash64_from_gray(other) != phash64_from_gray(g)


def test_image_dhash_banding_equals_brute_force(spark):
    """The banded Hamming join over image dHash words must find EXACTLY the
    brute-force all-pairs result at the guaranteed bound (ham<=3) — the
    image twin of test_simhash_banding_completeness."""
    import pandas as pd
    from pyspark.sql import functions as F

    from spark_hbase_connector_spark.operators.dedup import hamming_band_pairs
    from spark_hbase_connector_spark.operators.multimodal import (
        image_dhash_words,
        synth_bmp_payload,
    )

    def build(batches):
        for pdf in batches:
            ids = [int(v) for v in pdf["id"]]
            yield pd.DataFrame(
                {"id": ids, "payload": [synth_bmp_payload(i) for i in ids]}
            )

    assets = spark.range(0, 200).mapInPandas(build, schema="id long, payload binary")
    words = image_dhash_words(assets).persist()
    banded = {
        (r.id1, r.id2, r.hamming)
        for r in hamming_band_pairs(words, max_hamming=3).collect()
    }
    a = words.select(F.col("id").alias("id1"), F.col("h").alias("h1"))
    b = words.select(F.col("id").alias("id2"), F.col("h").alias("h2"))
    brute = {
        (r.id1, r.id2, r.hamming)
        for r in a.join(b, F.col("id1") < F.col("id2"))
        .select(
            "id1",
            "id2",
            F.bit_count(F.col("h1").bitwiseXOR(F.col("h2"))).cast("int").alias("hamming"),
        )
        .where(F.col("hamming") <= 3)
        .collect()
    }
    assert banded == brute and len(banded) > 0


def test_wav_pcm_roundtrip_matches_formula():
    """decode_wav_pcm16 must recover EXACTLY the generator's samples from
    the bytes (the audio twin of test_bmp_pixel_roundtrip)."""
    from spark_hbase_connector_spark.operators.multimodal import (
        decode_wav_pcm16,
        synth_wav_fp_payload,
    )

    for i in (0, 1, 7, 42, 399):
        group, v = i // 4, i % 4
        expected = []
        for t in range(260):
            s = ((group * 97 + t * 11 + ((t * t + group * t) % 193)
                  * (group % 7 + 3)) % 4001) - 2000
            if v > 0 and t // 4 == 13 * v:
                s = 3500 - (t % 4) * 700
            expected.append(s)
        assert decode_wav_pcm16(synth_wav_fp_payload(i)) == expected


def test_wav_pcm_decode_rejects():
    """Non-WAV / non-mono / non-16-bit / short payloads must return None
    (or no hash) rather than garbage samples."""
    from spark_hbase_connector_spark.operators.multimodal import (
        audio_energy_hash64,
        decode_wav_pcm16,
        synth_wav_payload,
    )

    assert decode_wav_pcm16(b"NOTAWAVE" * 4) is None
    # synth_wav_payload(1): 2-channel — mono-only decode must refuse
    assert decode_wav_pcm16(synth_wav_payload(1)) is None
    # synth_wav_payload(0): mono 16-bit but only 1-50 frames — decodes,
    # then the fingerprint refuses (< 65 full windows)
    short = decode_wav_pcm16(synth_wav_payload(0))
    assert short is not None and audio_energy_hash64(short) is None


def test_audio_fingerprint_banding_equals_brute_force(spark):
    """Banded Hamming join over audio fingerprints == brute force at the
    guaranteed bound (the audio twin of the image/simhash completeness
    tests), and every emitted pair is within a perturbation group."""
    import pandas as pd
    from pyspark.sql import functions as F

    from spark_hbase_connector_spark.operators.dedup import hamming_band_pairs
    from spark_hbase_connector_spark.operators.multimodal import (
        audio_fingerprint_words,
        synth_wav_fp_payload,
    )

    def build(batches):
        for pdf in batches:
            ids = [int(v) for v in pdf["id"]]
            yield pd.DataFrame(
                {"id": ids, "payload": [synth_wav_fp_payload(i) for i in ids]}
            )

    assets = spark.range(0, 200).mapInPandas(build, schema="id long, payload binary")
    words = audio_fingerprint_words(assets).persist()
    banded = {
        (r.id1, r.id2, r.hamming)
        for r in hamming_band_pairs(words, max_hamming=3).collect()
    }
    a = words.select(F.col("id").alias("id1"), F.col("h").alias("h1"))
    b = words.select(F.col("id").alias("id2"), F.col("h").alias("h2"))
    brute = {
        (r.id1, r.id2, r.hamming)
        for r in a.join(b, F.col("id1") < F.col("id2"))
        .select(
            "id1",
            "id2",
            F.bit_count(F.col("h1").bitwiseXOR(F.col("h2"))).cast("int").alias("hamming"),
        )
        .where(F.col("hamming") <= 3)
        .collect()
    }
    assert banded == brute and len(banded) > 0
    assert all(i1 // 4 == i2 // 4 for i1, i2, _ in banded)
