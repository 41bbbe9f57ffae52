"""Multimodal column plumbing (SURVEY.md §2.11 X5, BASELINE-mandated).

Design: media payloads are opaque ``binary`` columns + a typed metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas transforms over ``mapInPandas`` so each executor
processes whole record batches (the shape a real image/audio codec needs).

The image/audio libs are NOT in this container, so the actual codec call
is stubbed (deterministic byte-level fake) behind ``decode_stub`` — the
Spark-side plumbing (schema, batch iteration, partitioning) is real and
tested. Swap ``decode_stub`` for PIL/librosa/etc. in a real deployment.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: canonical multimodal record schema: payload + typed metadata
MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("kind", T.StringType(), True),      # image|audio|video|text
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),    # image/video
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),  # audio
    ]), True),
])

FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("n_frames", T.LongType(), True),
    T.StructField("feat_mean", T.DoubleType(), True),
])


def decode_stub(payload: bytes) -> dict:
    """Deterministic fake decode. A real build replaces this with the
    codec (PIL.Image.open / soundfile.read / pyav demux).

    Raises NotImplementedError for kinds a codec would reject — the
    pipeline's error handling is real even though the codec is fake."""
    if payload is None:
        raise NotImplementedError("real codec required for empty payload")
    frame_size = 256
    n = len(payload)
    return {
        "n_bytes": n,
        "n_frames": n // frame_size + 1,
        "feat_mean": (sum(payload) / n) if n else 0.0,
    }


def wrap_as_media(df: DataFrame, id_col: str, text_col: str, kind: str = "text") -> DataFrame:
    """Lift any table into the multimodal record shape (payload = utf-8
    bytes here; parquet binary column in a real corpus)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit(kind).alias("kind"),
            F.lit("text/plain").alias("mime"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction over mapInPandas: the executor-side
    loop a real decoder would run. Partitioning is preserved (narrow op,
    no shuffle); at 100 TB the input should be pre-partitioned so batches
    are local."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_stub(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out[["media_id", "n_bytes", "n_frames", "feat_mean"]]

    from minerva_etl_46_spark.operators.dedup import spread

    # decode is the expensive stage: spread small inputs across all cores
    return spread(media).mapInPandas(run, schema=FEATURES_SCHEMA)
