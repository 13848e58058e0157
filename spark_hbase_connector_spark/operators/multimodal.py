"""Multimodal (binary) columns: decode/feature plumbing (north-star §2.3).

Model: media are opaque ``binary`` payload columns + a typed metadata
struct. Image HEADER decode (PNG / JPEG / GIF / BMP dimensions) is a real,
dependency-free byte parse (`parse_image_dims`) — no PIL required; only
payloads in none of those formats fall back to deterministic
pseudo-metadata (documented fake) so the pipeline stays end-to-end
testable and SQL-replayable on any payload mix. Pixel-level decode /
audio feature extraction would still need a real codec library and is out
of scope by design.

Batch shape: ``mapInPandas`` with Arrow batches — payload bytes never pass
through row-at-a-time Python. At 100 TB the payload column stays columnar
(Parquet binary) and decode parallelism == partition count; set
``spark.sql.files.maxPartitionBytes`` to bound per-task memory (payloads
are large cells).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = (
    "id long, n_bytes int, width int, height int, content_hash string, fmt string"
)


def parse_image_dims(b: bytes) -> tuple[str, int, int] | None:
    """Header-only image dimension decode, pure Python (~40 lines, no
    dependency): returns (format, width, height) for PNG / GIF / BMP /
    JPEG payloads, None for anything else. JPEG is a real marker-segment
    scan (skips APPn/quantization/etc. segments to the first SOF0-3
    frame header), not a fixed-offset peek, so camera files with EXIF
    blocks before the frame header parse correctly."""
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24 and b[12:16] == b"IHDR":
        return (
            "png",
            int.from_bytes(b[16:20], "big"),
            int.from_bytes(b[20:24], "big"),
        )
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        return (
            "gif",
            int.from_bytes(b[6:8], "little"),
            int.from_bytes(b[8:10], "little"),
        )
    if b[:2] == b"BM" and len(b) >= 26:
        # DIB header size at 14 discriminates the family: only the
        # BITMAPINFOHEADER-and-later layouts (size >= 40) carry 32-bit
        # width/height at 18/22. An OS/2 BITMAPCOREHEADER (size 12) packs
        # 16-bit fields there — parsing it as 32-bit merges width+height
        # into one bogus value, so anything < 40 falls back to None.
        if int.from_bytes(b[14:18], "little") < 40:
            return None
        # signed width/height at 18/22; negative height means top-down
        # row order — the magnitude is the pixel height. A non-positive
        # width is never valid.
        w_ = int.from_bytes(b[18:22], "little", signed=True)
        if w_ <= 0:
            return None
        return ("bmp", w_, abs(int.from_bytes(b[22:26], "little", signed=True)))
    if b[:2] == b"\xff\xd8":  # JPEG SOI
        i = 2
        while i + 9 <= len(b):
            if b[i] != 0xFF:
                return None  # desynced — not a well-formed segment stream
            marker = b[i + 1]
            if marker == 0xD9:  # EOI before any frame header
                return None
            if marker == 0x01 or 0xD0 <= marker <= 0xD8:
                i += 2  # standalone markers carry no length field
                continue
            if 0xC0 <= marker <= 0xC3 or 0xC5 <= marker <= 0xC7 \
                    or 0xC9 <= marker <= 0xCB or 0xCD <= marker <= 0xCF:
                # SOFn: len(2) precision(1) height(2) width(2)
                return (
                    "jpeg",
                    int.from_bytes(b[i + 7 : i + 9], "big"),
                    int.from_bytes(b[i + 5 : i + 7], "big"),
                )
            i += 2 + int.from_bytes(b[i + 2 : i + 4], "big")
        return None
    return None


def attach_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Materialize a binary payload column (here: UTF-8 bytes of the text —
    the testdata has no real media; real deployments read binary Parquet)."""
    return df.select(
        F.col(id_col).alias("id"), F.encode(F.col(text_col), "UTF-8").alias("payload")
    )


def extract_media_meta(assets: DataFrame) -> DataFrame:
    """Decode payloads to typed metadata via Arrow-batched mapInPandas.

    PNG / JPEG / GIF / BMP payloads get a REAL header-only dimension
    decode (`parse_image_dims`, dependency-free — no pixel data is ever
    touched) with ``fmt`` naming the detected container; any other
    payload falls back to deterministic pseudo-dimensions derived from
    the byte length (documented fake, ``fmt`` NULL) so non-image payload
    mixes stay SQL-replayable.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, n_bytes, widths, heights, hashes, fmts = [], [], [], [], [], []
            for i, payload in zip(pdf["id"], pdf["payload"]):
                if payload is None:
                    continue
                b = bytes(payload)
                parsed = parse_image_dims(b)
                if parsed is None:
                    # documented fake — NOT a real decode: deterministic
                    # pseudo-dimensions from the byte length
                    fmt, dims = None, (len(b) % 640 + 1, (len(b) * 7) % 480 + 1)
                else:
                    fmt, dims = parsed[0], (parsed[1], parsed[2])
                ids.append(i)
                n_bytes.append(len(b))
                widths.append(dims[0])
                heights.append(dims[1])
                hashes.append(hashlib.md5(b).hexdigest())
                fmts.append(fmt)
            yield pd.DataFrame(
                {
                    "id": ids,
                    "n_bytes": pd.array(n_bytes, dtype="int32"),
                    "width": pd.array(widths, dtype="int32"),
                    "height": pd.array(heights, dtype="int32"),
                    "content_hash": hashes,
                    "fmt": fmts,
                }
            )

    return assets.mapInPandas(decode_batches, schema=META_SCHEMA)


def synth_image_payload(i: int) -> bytes:
    """Deterministic known-dimension media payload for fixtures/tests:
    ``i % 4`` cycles a real PNG header (sig + IHDR + CRC), a real JPEG
    segment stream (SOI + APP0 + SOF0 + EOI), a real GIF89a header, and a
    non-image payload (exercises the documented pseudo-metadata
    fallback). Dimensions are ``(i % 300 + 1, i*3 % 200 + 1)`` — chosen
    arithmetically so a SQL oracle can predict what a correct header
    decode must return without re-parsing bytes."""
    import zlib

    w = i % 300 + 1
    h = (i * 3) % 200 + 1
    m = i % 4
    if m == 0:  # 33 bytes: 8 sig + 4 len + 4 "IHDR" + 13 data + 4 crc
        ihdr = (
            w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
        )
        crc = zlib.crc32(b"IHDR" + ihdr).to_bytes(4, "big")
        return (
            b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR" + ihdr + crc
        )
    if m == 1:  # 35 bytes: SOI + APP0(18) + SOF0(13) + EOI
        app0 = (
            b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00"
            + bytes([1, 1, 0, 0, 1, 0, 1, 0, 0])
        )
        sof0 = (
            b"\xff\xc0" + (11).to_bytes(2, "big") + bytes([8])
            + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([1, 1, 0x11, 0])
        )
        return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"
    if m == 2:  # 14 bytes: GIF89a + w/h (LE) + flags/bg/aspect + trailer
        return (
            b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little")
            + bytes([0, 0, 0]) + b"\x3b"
        )
    # non-image: 16 + i % 7 bytes, no known signature
    return b"RAW0" + bytes((i * 31 + j) % 256 for j in range(12 + i % 7))


AUDIO_META_SCHEMA = (
    "id long, n_bytes int, n_channels int, sample_rate int, bits int, "
    "duration_ms int, fmt string"
)


def parse_wav_meta(b: bytes) -> tuple[int, int, int, int] | None:
    """Header-only WAV decode, pure Python (the audio analogue of
    `parse_image_dims`): RIFF/WAVE chunk walk to the ``fmt `` chunk
    (channels, sample rate, bit depth) and the ``data`` chunk size ->
    frame count. Returns (n_channels, sample_rate, bits, n_frames) or
    None for non-WAV payloads. A real chunk traversal (word-aligned,
    order-independent), not a fixed-offset peek — files with LIST/INFO
    chunks before ``data`` parse correctly."""
    if len(b) < 12 or b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i = 12
    fmt = None
    data_size = None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        size = int.from_bytes(b[i + 4 : i + 8], "little")
        if cid == b"fmt " and i + 24 <= len(b):
            ch = int.from_bytes(b[i + 10 : i + 12], "little")
            rate = int.from_bytes(b[i + 12 : i + 16], "little")
            bits = int.from_bytes(b[i + 22 : i + 24], "little")
            fmt = (ch, rate, bits)
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if fmt is None or data_size is None:
        return None
    ch, rate, bits = fmt
    if ch == 0 or rate == 0 or bits == 0 or bits % 8:
        return None
    return ch, rate, bits, data_size // (ch * bits // 8)


def extract_audio_meta(assets: DataFrame) -> DataFrame:
    """Typed audio metadata via Arrow-batched mapInPandas: WAV payloads
    get the REAL header decode (`parse_wav_meta` — channels / rate /
    bit depth / duration, no sample data touched, ``fmt`` = 'wav');
    other payloads fall back to deterministic pseudo-metadata from the
    byte length (documented fake, ``fmt`` NULL) — same contract as
    `extract_media_meta`."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "id", "n_bytes", "n_channels", "sample_rate", "bits",
                "duration_ms", "fmt",
            )}
            for i, payload in zip(pdf["id"], pdf["payload"]):
                if payload is None:
                    continue
                b = bytes(payload)
                parsed = parse_wav_meta(b)
                if parsed is None:
                    n = len(b)
                    ch, rate, bits = n % 2 + 1, n * 97 % 48000 + 1, 8
                    dur, fmt = n % 1000, None
                else:
                    ch, rate, bits, n_frames = parsed
                    dur, fmt = n_frames * 1000 // rate, "wav"
                rows["id"].append(i)
                rows["n_bytes"].append(len(b))
                rows["n_channels"].append(ch)
                rows["sample_rate"].append(rate)
                rows["bits"].append(bits)
                rows["duration_ms"].append(dur)
                rows["fmt"].append(fmt)
            out = pd.DataFrame(rows)
            for c in ("n_bytes", "n_channels", "sample_rate", "bits", "duration_ms"):
                out[c] = pd.array(out[c], dtype="int32")
            yield out

    return assets.mapInPandas(decode_batches, schema=AUDIO_META_SCHEMA)


def synth_wav_payload(i: int) -> bytes:
    """Deterministic known-parameter audio payload for fixtures: ``i % 3``
    in {0,1} builds a REAL minimal PCM WAV (RIFF + fmt + data chunks;
    channels = i%2+1, rate = 8000*(i%4+1), 16-bit, i%50+1 frames), 2
    builds a non-audio payload (exercises the pseudo-metadata fallback).
    All parameters are arithmetic in ``i`` so a SQL oracle predicts what
    a correct header decode must return without re-parsing bytes."""
    if i % 3 == 2:  # non-audio: 16 + i % 7 bytes, no RIFF signature
        return b"NOTA" + bytes((i * 31 + j) % 256 for j in range(12 + i % 7))
    ch = i % 2 + 1
    rate = 8000 * (i % 4 + 1)
    bits = 16
    n_frames = i % 50 + 1
    data = bytes((i + j) % 256 for j in range(n_frames * ch * (bits // 8)))
    fmt_chunk = (
        b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")  # PCM
        + ch.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * ch * bits // 8).to_bytes(4, "little")
        + (ch * bits // 8).to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    data_chunk = b"data" + len(data).to_bytes(4, "little") + data
    body = b"WAVE" + fmt_chunk + data_chunk
    return b"RIFF" + len(body).to_bytes(4, "little") + body


VIDEO_META_SCHEMA = (
    "id long, n_bytes int, width int, height int, duration_ms int, fmt string"
)


def parse_mp4_meta(b: bytes) -> tuple[int, int, int] | None:
    """Header-only MP4 / ISO-BMFF decode, pure Python (the video analogue
    of `parse_image_dims`): walks top-level boxes to ``moov``, reads
    ``mvhd`` (timescale + duration -> milliseconds) and the first
    ``trak/tkhd`` (16.16 fixed-point width/height). Returns
    (width, height, duration_ms) or None for non-MP4 payloads. Requires
    an ``ftyp`` first box (the BMFF signature); a real nested box walk,
    not fixed offsets — files with free/udta boxes between ftyp and moov
    parse correctly."""

    def boxes(buf: bytes, start: int, end: int):
        i = start
        while i + 8 <= end:
            size = int.from_bytes(buf[i : i + 4], "big")
            btype = buf[i + 4 : i + 8]
            if size == 1 or size < 8 or i + size > end:
                return  # 64-bit/invalid sizes: out of scope, stop cleanly
            yield btype, i + 8, i + size
            i += size

    if len(b) < 12 or b[4:8] != b"ftyp":
        return None
    moov = next(((s, e) for t, s, e in boxes(b, 0, len(b)) if t == b"moov"), None)
    if moov is None:
        return None
    dur_ms = None
    dims = None
    for t, s, e in boxes(b, *moov):
        if t == b"mvhd" and e - s >= 20 and b[s] == 0:  # version 0
            timescale = int.from_bytes(b[s + 12 : s + 16], "big")
            duration = int.from_bytes(b[s + 16 : s + 20], "big")
            if timescale:
                dur_ms = duration * 1000 // timescale
        elif t == b"trak" and dims is None:
            for t2, s2, e2 in boxes(b, s, e):
                if t2 == b"tkhd" and e2 - s2 >= 84:
                    dims = (
                        int.from_bytes(b[e2 - 8 : e2 - 4], "big") >> 16,
                        int.from_bytes(b[e2 - 4 : e2], "big") >> 16,
                    )
                    break
    if dur_ms is None or dims is None:
        return None
    return dims[0], dims[1], dur_ms


def extract_video_meta(assets: DataFrame) -> DataFrame:
    """Typed video metadata via Arrow-batched mapInPandas: MP4 payloads
    get the REAL box-walk decode (`parse_mp4_meta` — display dimensions
    + duration, no sample data touched, ``fmt`` = 'mp4'); other payloads
    fall back to deterministic pseudo-metadata (``fmt`` NULL) — the
    shared contract of the image/audio paths."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "id", "n_bytes", "width", "height", "duration_ms", "fmt",
            )}
            for i, payload in zip(pdf["id"], pdf["payload"]):
                if payload is None:
                    continue
                b = bytes(payload)
                parsed = parse_mp4_meta(b)
                if parsed is None:
                    n = len(b)
                    w, h, dur, fmt = n % 640 + 1, (n * 7) % 480 + 1, n % 1000, None
                else:
                    w, h, dur = parsed
                    fmt = "mp4"
                rows["id"].append(i)
                rows["n_bytes"].append(len(b))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["duration_ms"].append(dur)
                rows["fmt"].append(fmt)
            out = pd.DataFrame(rows)
            for c in ("n_bytes", "width", "height", "duration_ms"):
                out[c] = pd.array(out[c], dtype="int32")
            yield out

    return assets.mapInPandas(decode_batches, schema=VIDEO_META_SCHEMA)


def synth_mp4_payload(i: int) -> bytes:
    """Deterministic known-parameter video payload: ``i % 3`` in {0,1}
    builds a REAL minimal MP4 (ftyp + free + moov[mvhd + trak[tkhd]];
    width = 16*(i%60+1), height = 16*(i%34+1), timescale 1000,
    duration = 500*(i%20+1) ms), 2 builds a non-video payload
    (pseudo-metadata fallback). All parameters arithmetic in ``i`` for
    SQL-oracle prediction."""
    if i % 3 == 2:
        return b"NOTV" + bytes((i * 13 + j) % 256 for j in range(12 + i % 5))
    w = 16 * (i % 60 + 1)
    h = 16 * (i % 34 + 1)
    dur = 500 * (i % 20 + 1)  # timescale 1000 -> duration == ms

    def box(btype: bytes, payload: bytes) -> bytes:
        return (8 + len(payload)).to_bytes(4, "big") + btype + payload

    mvhd = box(
        b"mvhd",
        bytes(12)  # version/flags + ctime + mtime
        + (1000).to_bytes(4, "big")  # timescale
        + dur.to_bytes(4, "big")
        + bytes(80),  # rate/volume/matrix/next_track_id
    )
    tkhd = box(
        b"tkhd",
        bytes(76) + (w << 16).to_bytes(4, "big") + (h << 16).to_bytes(4, "big"),
    )
    moov = box(b"moov", mvhd + box(b"trak", tkhd))
    ftyp = box(b"ftyp", b"isom" + (512).to_bytes(4, "big") + b"isomiso2")
    free = box(b"free", bytes(i % 9))  # variable pre-moov box: walk, not peek
    return ftyp + free + moov


def extract_features(assets: DataFrame, dim: int = 8) -> DataFrame:
    """Binary payload -> dense feature vector (array<double>), the
    feature-extraction stage that bridges multimodal data into the
    similarity/dedup operators (ANN, cosine pairs, IVF). A real deployment
    would run an image/audio encoder here (absent in this container); the
    stub derives a deterministic ``dim``-dimensional vector from the md5
    digest of the payload — stable, SQL-replayable, and shaped exactly
    like a real embedding so the downstream plumbing is fully exercised.
    One Arrow pass; payload bytes never leave the worker."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids: list = []
            vecs: list[list[float]] = []
            for i, payload in zip(pdf["id"], pdf["payload"]):
                if payload is None:
                    continue
                digest = hashlib.md5(bytes(payload)).digest()
                vecs.append(
                    [round(digest[j] / 255.0, 6) for j in range(dim)]
                )
                ids.append(i)
            yield pd.DataFrame({"id": ids, "feature": vecs})

    return assets.mapInPandas(gen, schema="id long, feature array<double>")


def sample_frames(
    assets: DataFrame, frame_size: int = 256, stride: int = 4
) -> DataFrame:
    """Frame-sample a binary payload: split into fixed-size byte frames,
    keep every ``stride``-th full frame, emit its content hash — the video
    keyframe-extraction shape (real decoders would seek keyframes; the
    byte-window slicing, fan-out row multiplication, and Arrow batching are
    the part Spark owns either way). Payload bytes are sliced in-worker;
    only (id, frame_index, frame_hash) rows leave the task, so output size
    is decoupled from payload size — at 100 TB the payload column never
    shuffles.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids: list = []
            idxs: list[int] = []
            hs: list[str] = []
            for i, payload in zip(pdf["id"], pdf["payload"]):
                if payload is None:
                    continue
                b = bytes(payload)
                for k in range(0, len(b) // frame_size, stride):
                    ids.append(i)
                    idxs.append(k)
                    hs.append(
                        hashlib.md5(b[k * frame_size : (k + 1) * frame_size]).hexdigest()
                    )
            yield pd.DataFrame(
                {"id": ids, "frame_index": pd.array(idxs, dtype="int32"), "frame_hash": hs}
            )

    return assets.mapInPandas(gen, schema="id long, frame_index int, frame_hash string")


# --------------------------------------------------- perceptual hashing ----


def synth_bmp_payload(i: int, with_bump: bool = True) -> bytes:
    """Deterministic REAL 9x8 24-bit uncompressed BMP whose gray levels
    are arithmetic in ``i`` — the pixel-bearing sibling of
    `synth_image_payload` (which builds headers only). Images come in
    groups of 4 (``i // 4``): index 0 is the group's base pattern
    ``(group*37 + x*11 + y*5 + x*y*(group+1)) % 251`` — the ``x*y``
    cross-term makes the adjacent-column differences (what dHash
    compares) group- AND row-dependent, so distinct groups get distinct
    bit patterns (a pure gradient hashes every group identically: the
    comparisons only see the +11 step) — and indices 1-3 add +100
    (mod 251) at the single pixel ``(x, y) = (2v, v)``, a perturbation
    that flips at most the two dHash bits adjacent to that pixel, so
    within-group pairs are near-duplicates (Hamming <= 4). All three
    channels carry the same value,
    so a correct BGR decode must reproduce the formula exactly — which is
    what lets a SQL oracle replay the hash without touching bytes."""
    w, h = 9, 8
    row_size = (w * 3 + 3) & ~3  # rows padded to 4-byte boundaries
    group, v = i // 4, i % 4
    rows = []
    for y in range(h - 1, -1, -1):  # positive height => bottom-up storage
        row = bytearray()
        for x in range(w):
            g = (group * 37 + x * 11 + y * 5 + x * y * (group + 1)) % 251
            if with_bump and v > 0 and x == 2 * v and y == v:
                g = (g + 100) % 251
            row += bytes((g, g, g))  # BGR
        row += b"\x00" * (row_size - len(row))
        rows.append(bytes(row))
    pixel_data = b"".join(rows)
    dib = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")  # BI_RGB, uncompressed
        + len(pixel_data).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    header = (
        b"BM"
        + (14 + len(dib) + len(pixel_data)).to_bytes(4, "little")
        + (0).to_bytes(4, "little")
        + (14 + len(dib)).to_bytes(4, "little")
    )
    return header + dib + pixel_data


def decode_bmp_gray(b: bytes) -> list[list[int]] | None:
    """REAL uncompressed-24bpp BMP pixel decode, pure Python: honors the
    pixel-array offset at byte 10, signed width/height (negative height =
    top-down row order), 4-byte row padding, and BGR channel order.
    Returns a top-down grid of integer gray levels ((B+G+R)//3), or None
    for non-BMP / compressed / non-24bpp payloads (those would need a
    real codec — out of scope by design, same contract as
    `parse_image_dims`)."""
    if len(b) < 54 or b[:2] != b"BM":
        return None
    offset = int.from_bytes(b[10:14], "little")
    if int.from_bytes(b[14:18], "little") < 40:
        return None
    w = int.from_bytes(b[18:22], "little", signed=True)
    h_signed = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    compression = int.from_bytes(b[30:34], "little")
    if w <= 0 or h_signed == 0 or bpp != 24 or compression != 0:
        return None
    h = abs(h_signed)
    row_size = (w * 3 + 3) & ~3
    if offset + row_size * h > len(b):
        return None
    grid = []
    for y_out in range(h):
        # positive height: stored bottom-up -> top row is the LAST row
        y_src = (h - 1 - y_out) if h_signed > 0 else y_out
        base = offset + y_src * row_size
        row = []
        for x in range(w):
            p = base + x * 3
            row.append((b[p] + b[p + 1] + b[p + 2]) // 3)
        grid.append(row)
    return grid


def mean_pool_gray(grid: list[list[int]], out_w: int, out_h: int) -> list[list[int]]:
    """Integer mean-pool a gray grid to (out_w, out_h): cell (X, Y)
    averages the source block [floor(X*w/out_w), floor((X+1)*w/out_w)) x
    [floor(Y*h/out_h), floor((Y+1)*h/out_h)) with exact integer
    sum // count — deterministic, no float rounding. Identity when the
    grid is already the target size; blocks are clamped to >= 1 source
    pixel, so upscaling degenerates to nearest-neighbor sampling (the
    pHash 32x32 path on small inputs)."""
    h, w = len(grid), len(grid[0])
    if (w, h) == (out_w, out_h):
        return grid
    out = []
    for yy in range(out_h):
        y0 = min(yy * h // out_h, h - 1)
        y1 = max(y0 + 1, (yy + 1) * h // out_h)
        row = []
        for xx in range(out_w):
            x0 = min(xx * w // out_w, w - 1)
            x1 = max(x0 + 1, (xx + 1) * w // out_w)
            total = sum(grid[y][x] for y in range(y0, y1) for x in range(x0, x1))
            row.append(total // ((y1 - y0) * (x1 - x0)))
        out.append(row)
    return out


def dhash64_from_gray(grid: list[list[int]]) -> int:
    """64-bit difference hash (dHash, public algorithm): mean-pool the
    gray grid to 9x8, set bit (y*8 + x) iff pixel (x+1, y) > pixel (x, y)
    — each row's 8 adjacent-column comparisons. Pure integer compares on
    integer pools, hence exactly replayable in SQL from the pixel
    formula. Returned as a SIGNED 64-bit int (Spark LongType)."""
    g = mean_pool_gray(grid, 9, 8)
    word = 0
    for y in range(8):
        for x in range(8):
            if g[y][x + 1] > g[y][x]:
                word |= 1 << (y * 8 + x)
    return word - (1 << 64) if word >= 1 << 63 else word


def phash64_from_gray(grid: list[list[int]]) -> int:
    """64-bit DCT perceptual hash (pHash, public algorithm): mean-pool to
    32x32, 2-D orthonormal DCT-II (numpy, float64), keep the top-left 8x8
    coefficient block, set bit (y*8 + x) iff the coefficient exceeds the
    MEDIAN of the block excluding the DC term. Robust to uniform
    brightness shifts (DC carries them) — the float DCT makes it a
    unit-test-verified operator rather than a SQL-replayable one (libm
    cos() is not correctly rounded across engines); `dhash64_from_gray`
    is the oracle-checked twin."""
    import numpy as np

    g = np.asarray(mean_pool_gray(grid, 32, 32), dtype=np.float64)
    n = 32
    k = np.arange(n)
    basis = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    scale = np.full(n, np.sqrt(2.0 / n))
    scale[0] = np.sqrt(1.0 / n)
    dct = (scale[:, None] * basis) @ g @ (scale[:, None] * basis).T
    block = dct[:8, :8]
    flat = np.concatenate([block.ravel()[1:]])  # drop DC
    med = float(np.median(flat))
    word = 0
    for y in range(8):
        for x in range(8):
            if not (y == 0 and x == 0) and block[y, x] > med:
                word |= 1 << (y * 8 + x)
    return word - (1 << 64) if word >= 1 << 63 else word


def image_dhash_words(assets: DataFrame, hasher=dhash64_from_gray) -> DataFrame:
    """(id, h): 64-bit perceptual-hash word per decodable BMP payload,
    one Arrow pass (same contract as `operators.dedup.simhash_words` —
    feed the result to `operators.dedup.hamming_band_pairs` for the
    banded near-dup join). Payloads that fail the pixel decode are
    dropped (no hash, same as empty documents in SimHash). Payload bytes
    never leave the worker; only (id, 8-byte word) rows shuffle, so the
    banded join's volume is independent of image size."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list = []
            words: list[int] = []
            for i, payload in zip(pdf["id"], pdf["payload"]):
                if payload is None:
                    continue
                grid = decode_bmp_gray(bytes(payload))
                if grid is None:
                    continue
                ids.append(i)
                words.append(hasher(grid))
            yield pd.DataFrame({"id": ids, "h": pd.array(words, dtype="int64")})

    return assets.mapInPandas(gen, schema="id long, h long")


# --------------------------------------------------- audio fingerprint ----


def synth_wav_fp_payload(i: int) -> bytes:
    """Deterministic REAL mono 16-bit PCM WAV (rate 8000, 260 frames)
    whose samples are arithmetic in ``i`` — the audio sibling of
    `synth_bmp_payload`, built for fingerprint testing. Payloads come in
    groups of 4 (``i // 4``): index 0 is the group's base waveform
    ``((group*97 + t*11 + ((t*t + group*t) % 193) * (group%7 + 3))
    % 4001) - 2000``; indices 1-3 REPLACE the 4 samples of energy window
    ``13*v`` with a loud ramp ``3500 - (t%4)*700`` — a one-window energy
    perturbation that flips at most the two fingerprint bits adjacent to
    that window, so within-group pairs are near-duplicates (measured over
    400 payloads: all 576 Hamming<=3 pairs are within-group, zero
    cross-group collisions; 24 of 600 within-group pairs land at 4 —
    realistic both-sides-perturbed recall). All arithmetic is integer, so
    a SQL oracle replays the fingerprint from this formula without
    touching bytes."""
    ch, rate, bits, n_frames = 1, 8000, 16, 260
    group, v = i // 4, i % 4
    data = bytearray()
    for t in range(n_frames):
        s = ((group * 97 + t * 11 + ((t * t + group * t) % 193)
              * (group % 7 + 3)) % 4001) - 2000
        if v > 0 and t // 4 == 13 * v:
            s = 3500 - (t % 4) * 700
        data += s.to_bytes(2, "little", signed=True)
    fmt_chunk = (
        b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + ch.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * ch * bits // 8).to_bytes(4, "little")
        + (ch * bits // 8).to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    data_chunk = b"data" + len(data).to_bytes(4, "little") + bytes(data)
    body = b"WAVE" + fmt_chunk + data_chunk
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def decode_wav_pcm16(b: bytes) -> list[int] | None:
    """REAL mono-16-bit PCM decode, pure Python: the same word-aligned
    RIFF chunk walk as `parse_wav_meta`, but returning the signed
    little-endian samples of the ``data`` chunk. None for non-WAV,
    non-PCM, non-mono or non-16-bit payloads (a real codec is out of
    scope by design — same contract as `decode_bmp_gray`)."""
    if len(b) < 12 or b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i = 12
    fmt = None
    data = None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        size = int.from_bytes(b[i + 4 : i + 8], "little")
        if cid == b"fmt " and i + 24 <= len(b):
            codec = int.from_bytes(b[i + 8 : i + 10], "little")
            ch = int.from_bytes(b[i + 10 : i + 12], "little")
            bits = int.from_bytes(b[i + 22 : i + 24], "little")
            fmt = (codec, ch, bits)
        elif cid == b"data":
            data = b[i + 8 : i + 8 + size]
        i += 8 + size + (size & 1)
    if fmt != (1, 1, 16) or data is None or len(data) % 2:
        return None
    return [
        int.from_bytes(data[j : j + 2], "little", signed=True)
        for j in range(0, len(data), 2)
    ]


def audio_energy_hash64(samples: list[int], window: int = 4) -> int | None:
    """64-bit energy-envelope difference fingerprint (the FFT-free
    integer-exact member of the energy-difference family — Haitsma &
    Kalker, "A highly robust audio fingerprint system", ISMIR 2002,
    compare energies of adjacent bands/frames; public algorithm): sum
    |sample| over 65 consecutive windows, set bit k iff
    E[k+1] > E[k] — the dHash recipe on the loudness envelope. Pure
    integer compares, hence exactly replayable in SQL from a sample
    formula. None when fewer than 65 full windows exist. Returned as a
    SIGNED 64-bit int (Spark LongType)."""
    need = 65 * window
    if len(samples) < need:
        return None
    e = [
        sum(abs(s) for s in samples[w * window : (w + 1) * window])
        for w in range(65)
    ]
    word = 0
    for k in range(64):
        if e[k + 1] > e[k]:
            word |= 1 << k
    return word - (1 << 64) if word >= 1 << 63 else word


def audio_fingerprint_words(assets: DataFrame) -> DataFrame:
    """(id, h): 64-bit audio fingerprint per decodable mono-PCM16 WAV
    payload, one Arrow pass — the audio twin of `image_dhash_words`
    (same words contract; feed `operators.dedup.hamming_band_pairs`).
    Payloads that fail the PCM decode or are shorter than 65 windows are
    dropped. Payload bytes never leave the worker; only (id, 8-byte
    word) rows shuffle, so the banded near-dup join is independent of
    audio length."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list = []
            words: list[int] = []
            for i, payload in zip(pdf["id"], pdf["payload"]):
                if payload is None:
                    continue
                samples = decode_wav_pcm16(bytes(payload))
                if samples is None:
                    continue
                h = audio_energy_hash64(samples)
                if h is None:
                    continue
                ids.append(i)
                words.append(h)
            yield pd.DataFrame({"id": ids, "h": pd.array(words, dtype="int64")})

    return assets.mapInPandas(gen, schema="id long, h long")
