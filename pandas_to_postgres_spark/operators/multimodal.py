"""Multimodal column plumbing (SURVEY.md §2.11 D5).

Images/audio/video are opaque ``binary`` columns plus a typed metadata
struct. The Spark-side machinery — schema, partition sizing, Arrow batch
shape, mapInPandas UDF signatures — is real and tested; the actual
decoders (PIL/ffmpeg/etc.) are NOT in this container, so the decode step is
a deterministic fake behind ``FAKE_DECODE=True`` (clearly marked) with the
same signature a real decoder would have.

Scale notes: binary payloads dominate row size — keep
``spark.sql.files.maxPartitionBytes`` small enough that one Arrow batch of
payloads fits executor memory; never groupBy/shuffle the binary column
itself (shuffle the metadata + an id, join payloads back late).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: flips to a real decoder when media libs exist; this container has none
FAKE_DECODE = True

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "media_meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def attach_fake_media(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build a multimodal frame from the documents table: the UTF-8 bytes of
    the text stand in for an opaque media payload; metadata is derived
    deterministically. Output schema == MEDIA_SCHEMA."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            (F.length(text_col) % 640).cast("int").alias("width"),
            (F.length(text_col) % 480).cast("int").alias("height"),
            (F.length(text_col) % 30 + 1).cast("int").alias("n_frames"),
        ).alias("media_meta"),
    )


def _decode_and_featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-Arrow-batch decode + feature extraction.

    With a real decoder this would open the payload (image decode / audio
    resample / video frame-sample) and emit a feature vector. FAKE_DECODE
    emits a deterministic 8-dim byte-histogram sketch so the plumbing is
    testable end-to-end.
    """
    for pdf in batches:
        if not FAKE_DECODE:
            raise NotImplementedError("real media decoding needs PIL/ffmpeg")
        feats, lens = [], []
        for payload in pdf["payload"]:
            b = bytes(payload)
            lens.append(len(b))
            hist = [0.0] * 8
            for byte in b[:4096]:  # bounded work per row
                hist[byte % 8] += 1.0
            total = max(sum(hist), 1.0)
            feats.append([h / total for h in hist])
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": pd.Series(lens, dtype="int64"),
                "mime": pdf["media_meta"].map(lambda m: m["mime"]),
                "feature": feats,
            }
        )


def extract_features(media_df: DataFrame) -> DataFrame:
    """media frame → (doc_id, byte_len, mime, feature array<float>).

    ``mapInPandas`` streams Arrow batches through the (fake) decoder —
    the exact shape a real image/audio featurizer would use.
    """
    return media_df.mapInPandas(_decode_and_featurize, schema=FEATURE_SCHEMA)
