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
    def bmp(w, h):
        header = bytearray(26)
        header[0:2] = b"BM"
        header[18:22] = w.to_bytes(4, "little", signed=True)
        header[22:26] = h.to_bytes(4, "little", signed=True)
        return bytes(header)

    assert parse_image_dims(bmp(800, 600)) == ("bmp", 800, 600)
    # negative height = top-down DIB; magnitude is the pixel height
    assert parse_image_dims(bmp(800, -600)) == ("bmp", 800, 600)


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
