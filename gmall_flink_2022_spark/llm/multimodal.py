"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real (schemas, partitioning, Arrow-batched
``mapInPandas`` signatures, deterministic batch shapes); the actual codec
work is STUBBED because image/audio libraries are not in this container —
``decode_fn`` defaults to a clearly-marked deterministic fake and raises
``NotImplementedError`` when a real codec is requested. Swap in a PIL /
torchaudio decoder on a real cluster; nothing else changes.

Scale notes: binary payloads ride in parquet as-is (no base64 inflation);
``mapInPandas`` keeps the per-batch memory bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``; feature extraction is a
narrow map — no shuffle — so it scales linearly with executors.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
        # double precision: the fake encoder divides exact integer
        # accumulators by 997.0 — one float64 op, bit-identical to the
        # SQL oracle's CAST(.. AS DOUBLE)/997.0 (float32 would drift)
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from the `documents` corpus —
    the driver testdata ships no binary table, so payloads are the UTF-8
    bytes of `text` (pure ASCII in the corpus, so byte == char), kind
    cycles image/audio/video by id, and duration/size metadata derive
    from `n_chars`. Every downstream value (digest, n_bytes, features,
    frame offsets) is therefore SQL-expressible for the DuckDB oracle
    while the Spark side exercises the real binary-column plumbing."""
    from pyspark.sql import functions as F

    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    mime = (
        F.when(kind == "image", "image/png")
        .when(kind == "audio", "audio/wav")
        .otherwise("video/mp4")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        mime.alias("mime"),
        F.when(kind == "image", (64 + F.col("n_chars") % 256).cast("int")).alias(
            "width"
        ),
        F.when(kind == "image", (64 + (F.col("n_chars") * 7) % 256).cast("int")).alias(
            "height"
        ),
        F.when(kind != "image", (F.col("n_chars") * 37).cast("long")).alias(
            "duration_ms"
        ),
    )


def _fake_decode(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a codec+encoder: bytes -> pseudo-feature.
    Stable across runs/partitions (pure function of the payload)."""
    if payload is None:
        return [0.0] * dim
    acc = [0] * dim
    for i, byte in enumerate(payload):
        acc[i % dim] = (acc[i % dim] + byte) % 997
    return [float(x) / 997.0 for x in acc]


def extract_features(
    media: DataFrame, decode: str = "fake", dim: int = 8
) -> DataFrame:
    """Decode/feature-extract each media row via Arrow-batched mapInPandas.

    decode='fake' -> deterministic byte-fold feature (tests); any other
    value requires a real codec -> NotImplementedError (container has no
    image/audio libs; see module docstring).
    """
    if decode != "fake":
        raise NotImplementedError(
            f"decoder '{decode}' needs codec libraries not present in this "
            "container; plug a real decoder in here on a cluster"
        )
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: 0 if p is None else len(p)
                    ),
                    "digest": pdf["payload"].map(
                        lambda p: hashlib.md5(p or b"").hexdigest()
                    ),
                    "feature": pdf["payload"].map(
                        lambda p: _fake_decode(p, dim)
                    ),
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    offset (payload decode stubbed — offsets derive from duration_ms).
    Shows the fan-out shape (explode inside mapInPandas) without codecs."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_ms", T.LongType()),
            T.StructField("digest", T.StringType()),
        ]
    )
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                dur = int(r["duration_ms"] or 0)
                d = hashlib.md5(r["payload"] or b"").hexdigest()
                for off in range(0, max(dur, 1), every_ms):
                    rows.append((int(r["media_id"]), off, d))
            yield pd.DataFrame(rows, columns=["media_id", "frame_ms", "digest"])

    return media.filter("kind = 'video'").mapInPandas(batches, out_schema)


def image_resize_meta(media: DataFrame, box: int = 256) -> DataFrame:
    """Image resize plumbing: fit-into-box metadata math (longest side ->
    ``box``, integer arithmetic) computed alongside the stubbed pixel
    work inside mapInPandas. The batch shape is what a real PIL/opencv
    resize would use; only the pixel transform is faked (payload digest
    stands in for the resized bytes)."""
    import hashlib

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("new_w", T.IntegerType()),
            T.StructField("new_h", T.IntegerType()),
            T.StructField("digest", T.StringType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                w, h = int(r["width"]), int(r["height"])
                long_side = max(w, h, 1)
                rows.append(
                    (
                        int(r["media_id"]),
                        w,
                        h,
                        (w * box) // long_side,
                        (h * box) // long_side,
                        hashlib.md5(r["payload"] or b"").hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "new_w", "new_h", "digest"],
            )

    return media.filter("kind = 'image'").mapInPandas(batches, out_schema)


def audio_frame_windows(
    media: DataFrame, window_ms: int = 2000, hop_ms: int = 1000
) -> DataFrame:
    """Audio framing plumbing: overlapping analysis windows (window/hop),
    one row per frame whose full extent fits in the clip — the shape an
    FFT/feature pass consumes. Decode stubbed; offsets derive from
    duration metadata."""
    import hashlib

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_start_ms", T.LongType()),
            T.StructField("frame_end_ms", T.LongType()),
            T.StructField("digest", T.StringType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                dur = int(r["duration_ms"] or 0)
                d = hashlib.md5(r["payload"] or b"").hexdigest()
                for start in range(0, max(dur - window_ms + 1, 0), hop_ms):
                    rows.append((int(r["media_id"]), start, start + window_ms, d))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_start_ms", "frame_end_ms", "digest"],
            )

    return media.filter("kind = 'audio'").mapInPandas(batches, out_schema)
