"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as BinaryType columns with a typed
metadata struct; decode / feature-extract / frame-sample run as
Arrow-batched kernels over mapInPandas. The actual media codecs are
NOT available in this container, so the decode step is a clearly
marked STUB (deterministic fake derived from the payload bytes) —
the Spark-side contract (schema, batch shape, partitioning, UDF
signatures) is real and tested, and a production deploy swaps the
stub body for PIL/ffmpeg calls without touching any plan.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("declared_w", T.IntegerType(), True),
                    T.StructField("declared_h", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

_KINDS = ["image", "audio", "video"]


def synth_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table derived from the documents table
    (payload = utf8 text bytes; kind cycles by doc_id)."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in _KINDS]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            (F.col("doc_id") % 640 + 16).cast("int").alias("declared_w"),
            (F.col("doc_id") % 480 + 16).cast("int").alias("declared_h"),
            F.lit(16000).alias("sample_rate"),
            (F.col("doc_id") % 90 + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def decode_media(media: DataFrame) -> DataFrame:
    """Decode payloads -> (media_id, kind, width, height, n_bytes, ok).

    STUB: real decode would call PIL/libav here. The fake derives
    deterministic dimensions from the byte content so tests pin the
    plumbing. Raise-on-use guard: set real_decode=True once codecs
    exist.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(len).astype("int64")
            # --- STUB decode: dimensions from byte checksums ---------
            chk = payloads.map(lambda b: int(np.frombuffer(b, dtype=np.uint8).sum()))
            width = (chk % 640 + 1).astype("int32")
            height = (chk % 480 + 1).astype("int32")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": width,
                    "height": height,
                    "n_bytes": n_bytes,
                    "ok": n_bytes > 0,
                }
            )

    return media.mapInPandas(
        kernel,
        schema="media_id long, kind string, width int, height int, n_bytes long, ok boolean",
    )


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """(media_id, features array<float>) — deterministic fake featurizer
    (byte-histogram folding); real models would run per Arrow batch in
    exactly this shape (batched, columnar, GPU-friendly)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf["payload"]:
                arr = np.frombuffer(b, dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype(np.float64)
                tot = hist.sum() or 1.0
                feats.append((hist / tot).astype(np.float32))
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return media.select("media_id", "payload").mapInPandas(
        kernel, schema=f"media_id long, features array<float>"
    )


def resize_media(
    media: DataFrame, max_w: int = 224, max_h: int = 224
) -> DataFrame:
    """(media_id, width, height, out_w, out_h, scale) — fit the decoded
    dimensions into a max_w x max_h box preserving aspect ratio (no
    upscaling).

    STUB at the pixel level (no PIL in this container — a real deploy
    resizes the payload inside the same Arrow batch); the geometry and
    the Spark plumbing (batched kernel over the decoded-dims stream)
    are real, deterministic and oracle-checked.
    """
    dims = decode_media(media)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w = pdf["width"].to_numpy().astype(np.float64)
            h = pdf["height"].to_numpy().astype(np.float64)
            scale = np.minimum(1.0, np.minimum(max_w / w, max_h / h))
            out_w = np.floor(w * scale).astype(np.int32)
            out_h = np.floor(h * scale).astype(np.int32)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "out_w": out_w,
                    "out_h": out_h,
                    "scale": np.round(scale, 6),
                }
            )

    return dims.select("media_id", "width", "height").mapInPandas(
        kernel,
        schema="media_id long, width int, height int, out_w int, out_h int, scale double",
    )


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """(media_id, frame_idx) for video rows — pure JVM explode over
    sequence(); no Python involved in the fan-out."""
    vids = media.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n)
            )
        ).alias("frame_idx"),
    )
