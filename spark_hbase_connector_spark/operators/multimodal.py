"""Multimodal (binary) columns: decode/feature plumbing (north-star §2.3).

Model: media are opaque ``binary`` payload columns + a typed metadata
struct. The Spark-side plumbing — schema, Arrow batch shape, partitioning —
is real and tested; the actual image/audio decode is STUBBED behind an
import-try (decode libraries are not in this container): when PIL/librosa
are absent, ``extract_media_meta`` computes deterministic pseudo-metadata
from the raw bytes, so the pipeline is end-to-end testable and replayable
by a SQL oracle.

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

try:  # decode libs absent in this container; keep the gate explicit
    import PIL.Image  # type: ignore  # noqa: F401

    _HAS_PIL = True
except Exception:  # pragma: no cover
    _HAS_PIL = False

META_SCHEMA = (
    "id long, n_bytes int, width int, height int, content_hash string"
)


def attach_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Materialize a binary payload column (here: UTF-8 bytes of the text —
    the testdata has no real media; real deployments read binary Parquet)."""
    return df.select(
        F.col(id_col).alias("id"), F.encode(F.col(text_col), "UTF-8").alias("payload")
    )


def extract_media_meta(assets: DataFrame) -> DataFrame:
    """Decode payloads to typed metadata via Arrow-batched mapInPandas.

    With PIL installed, image payloads get a REAL header-only decode
    (width/height via ``Image.open().size`` — no pixel data is loaded);
    payloads PIL can't open (and every payload when PIL is absent, as in
    this container) fall back to deterministic pseudo-dimensions derived
    from the byte length (documented fake — NOT a real decode). The
    fallback keeps schema/batching/partitioning identical in both
    environments, so the SQL oracle replays the container run exactly.
    """

    def _real_dims(b: bytes):  # pragma: no cover - PIL absent in container
        """Header-only decode (PIL never loads pixel data for .size)."""
        import io

        try:
            with PIL.Image.open(io.BytesIO(b)) as im:
                return im.size
        except Exception:
            return None  # not an image payload -> deterministic fallback

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, n_bytes, widths, heights, hashes = [], [], [], [], []
            for i, payload in zip(pdf["id"], pdf["payload"]):
                if payload is None:
                    continue
                b = bytes(payload)
                dims = _real_dims(b) if _HAS_PIL else None
                if dims is None:
                    # documented fake — NOT a real decode: deterministic
                    # pseudo-dimensions from the byte length
                    dims = (len(b) % 640 + 1, (len(b) * 7) % 480 + 1)
                ids.append(i)
                n_bytes.append(len(b))
                widths.append(dims[0])
                heights.append(dims[1])
                hashes.append(hashlib.md5(b).hexdigest())
            yield pd.DataFrame(
                {
                    "id": ids,
                    "n_bytes": pd.array(n_bytes, dtype="int32"),
                    "width": pd.array(widths, dtype="int32"),
                    "height": pd.array(heights, dtype="int32"),
                    "content_hash": hashes,
                }
            )

    return assets.mapInPandas(decode_batches, schema=META_SCHEMA)


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
