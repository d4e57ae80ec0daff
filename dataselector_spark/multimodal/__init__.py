"""Multimodal column handling (SURVEY.md §2 B16).

Pattern: media payloads are opaque ``binary`` columns travelling next to a
typed metadata struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so each Python worker touches whole record batches, never
rows. The Spark-side plumbing (schema, batch iteration, partition sizing) is
real and tested; the actual codec step is stubbed deterministically because
image/audio libraries are not in this container — swap `_decode_stub` for a
PIL/ffmpeg call and nothing else changes.

Scale notes: binary payloads dominate row size, so partition sizing must key
off `spark.sql.files.maxPartitionBytes`, not row counts; feature extraction
is map-only (no shuffle) and the output (small numeric features) should be
written columnar so downstream training reads never touch the blobs again.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

HAVE_PIL = False
try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except Exception:
    pass

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("byte_min", T.IntegerType()),
        T.StructField("byte_max", T.IntegerType()),
    ]
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Derive a deterministic binary payload + metadata struct from the
    documents table (the container has no real media files): payload =
    UTF-8 bytes of the text; width/height derived from doc_id. Exercises the
    exact schema a real ingest would produce."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("image/fake").alias("media_type"),
            (F.pmod(F.col("doc_id"), F.lit(64)) + 16).cast("int").alias("width"),
            (F.pmod(F.col("doc_id"), F.lit(48)) + 12).cast("int").alias("height"),
            F.octet_length(payload).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via mapInPandas:
    per-record byte statistics (the stand-in for pixel/frame statistics).
    Map-only — no shuffle; output is small numeric columns.

    The batch closure is deliberately self-contained (captures only plain
    values + pandas): Spark's Python workers cannot import this package when
    the driver runs from outside the repo, so no module-level names may leak
    into the pickled closure."""
    have_pil = HAVE_PIL

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def decode(payload: bytes) -> bytes:
            # Stand-in for a real codec (PIL/ffmpeg) — deterministic identity.
            if have_pil:
                raise NotImplementedError(
                    "real decode path intentionally unimplemented in this container"
                )
            return payload

        for pdf in it:
            decoded = pdf["payload"].map(decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": decoded.map(len).astype("int64"),
                    "byte_mean": decoded.map(
                        lambda b: float(sum(b)) / len(b) if len(b) else 0.0
                    ),
                    "byte_min": decoded.map(lambda b: min(b) if len(b) else 0),
                    "byte_max": decoded.map(lambda b: max(b) if len(b) else 0),
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)
