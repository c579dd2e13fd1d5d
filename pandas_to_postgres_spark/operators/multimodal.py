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


RESIZED_SCHEMA = T.StructType(
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

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)


def resize_media(media_df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize every image payload to (width, height) — mapInPandas over
    Arrow batches, payload-in/payload-out (same MEDIA_SCHEMA shape).

    FAKE_DECODE stands in for PIL: the fake "resize" deterministically
    truncates/tiles the payload to width*height bytes so output size is
    what a real w*h*1 buffer would be. Scale: payload bytes never shuffle —
    the transform is per-partition; size output partitions via
    spark.sql.files.maxPartitionBytes on the upstream scan.
    """

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not FAKE_DECODE:
            raise NotImplementedError("real image resize needs PIL/Pillow")
        target = width * height
        for pdf in batches:
            out_payloads = []
            for payload in pdf["payload"]:
                b = bytes(payload)
                if not b:
                    out_payloads.append(b"\x00" * target)
                    continue
                reps = target // len(b) + 1
                out_payloads.append((b * reps)[:target])
            meta = pd.DataFrame(
                {
                    "mime": pdf["media_meta"].map(lambda m: m["mime"]),
                    "width": width,
                    "height": height,
                    "n_frames": pdf["media_meta"].map(lambda m: m["n_frames"]),
                }
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": out_payloads,
                    "media_meta": meta.to_dict("records"),
                }
            )

    return media_df.mapInPandas(_resize, schema=RESIZED_SCHEMA)


def sample_frames(media_df: DataFrame, every_n: int = 10) -> DataFrame:
    """Sample every ``every_n``-th frame of each video payload → one output
    row per sampled frame (doc_id, frame_idx, frame_payload).

    The row fan-out happens INSIDE mapInPandas (a generator per Arrow
    batch), the shape a real ffmpeg frame extractor would use. RIFF AVI
    payloads take the REAL path regardless of FAKE_DECODE: the container
    is chunk-walked (`media_codecs.decode_avi_frames`) and every
    ``every_n``-th frame's actual JPEG bytes are emitted. Other formats:
    FAKE_DECODE slices the payload into n_frames equal byte ranges and
    keeps indices 0, every_n, 2*every_n, ... Scale: output rows >> input
    rows — follow with a repartition before any wide op, and never
    collect frames.
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pandas_to_postgres_spark.operators.media_codecs import (  # noqa: PLC0415
            decode_avi_frames,
        )

        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_meta"]
            ):
                b = bytes(payload)
                if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
                    frames = decode_avi_frames(b)
                    for i in range(0, len(frames), every_n):
                        ids.append(doc_id)
                        idxs.append(i)
                        payloads.append(frames[i])
                    continue
                if not FAKE_DECODE:
                    raise NotImplementedError(
                        "real frame sampling for non-AVI video needs ffmpeg"
                    )
                n_frames = max(int(meta["n_frames"]), 1)
                frame_len = max(len(b) // n_frames, 1)
                for i in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    idxs.append(i)
                    payloads.append(b[i * frame_len : (i + 1) * frame_len])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_payload": payloads,
                }
            )

    return media_df.mapInPandas(_sample, schema=FRAME_SCHEMA)


def dhash60(gray: "np.ndarray") -> int:
    """60-bit difference hash (dHash) of a grayscale image: block-mean
    resize to 6 rows x 11 columns, one bit per horizontal neighbor
    comparison (6*10 = 60 bits — the repo's signed-long fingerprint
    convention, band-compatible with `dedup.hamming_pairs_from_fp`).
    Perceptual: smooth brightness/contrast shifts preserve gradient
    signs, so near-identical images land within a few bits."""
    import numpy as np  # noqa: PLC0415

    h, w = gray.shape
    rows, cols = 6, 11
    # block-mean resize via exact integer bucket edges
    ry = (np.arange(rows + 1) * h) // rows
    rx = (np.arange(cols + 1) * w) // cols
    small = np.empty((rows, cols), dtype=np.float64)
    for r in range(rows):
        for c in range(cols):
            small[r, c] = gray[ry[r]:ry[r + 1], rx[c]:rx[c + 1]].mean()
    bits = (small[:, :-1] > small[:, 1:]).flatten()
    v = 0
    for i, b in enumerate(bits):
        if b:
            v |= 1 << i
    return v
