"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (engine extension for training-data pipelines).

The container has no image/audio codecs, so the decode step is STUBBED:
``decode_image``/``decode_audio`` raise ``NotImplementedError`` and the
default feature extractor is a deterministic fake (md5-seeded vector).
Everything Spark-side is real and tested: the schema, the Arrow batch
shape through ``mapInPandas``, the partitioning, and the UDF signature a
real decoder drops into.

Scale notes: payloads ride in the ``binary`` column — at 100 TB keep
them in their own parquet files (or external object store with a
pointer column) partitioned by content hash prefix so feature
extraction parallelizes evenly; ``mapInPandas`` streams Arrow batches,
never materializing a partition in memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16


def decode_image(data: bytes) -> "np.ndarray":
    """Real image decode requires a codec library not present in this
    container. Plug one in by passing ``decoder=`` to
    :func:`extract_features`."""
    raise NotImplementedError("no image codec in this environment; pass decoder=")


def decode_audio(data: bytes) -> "np.ndarray":
    raise NotImplementedError("no audio codec in this environment; pass decoder=")


def fake_decode(data: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in decoder: md5(payload) → dim floats in
    [0,1). Lets the full pipeline (schema, batching, joins downstream)
    run and be asserted on without codecs."""
    h = hashlib.md5(data).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (raw % 1_000_000).astype(np.float64) / 1_000_000.0


def attach_binary_payload(
    df: DataFrame, content_col: str, mime: str = "application/octet-stream"
) -> DataFrame:
    """Wrap a column as an opaque binary payload + typed metadata struct
    (n_bytes, mime, md5). For real media, the payload column comes
    straight from the source; metadata extraction is identical."""
    payload = F.encode(F.col(content_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "payload_meta",
        F.struct(
            F.octet_length(F.col(content_col)).alias("n_bytes"),
            F.lit(mime).alias("mime"),
            F.md5(payload).alias("checksum"),
        ),
    )


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    decoder: Callable[[bytes], np.ndarray] | None = None,
    dim: int = FEATURE_DIM,
) -> DataFrame:
    """Decode + featurize payloads via ``mapInPandas`` (Arrow-batched;
    the sanctioned Python path for media). Output: id, n_bytes,
    features array<double>."""
    decode = decoder or (lambda b: fake_decode(b, dim))
    schema = f"{id_col} long, n_bytes long, features array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(bytes(b)).tolist() for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "n_bytes": [len(bytes(b)) for b in pdf[payload_col]],
                    "features": feats,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every_n_bytes: int = 64,
    frame_bytes: int = 16,
) -> DataFrame:
    """'Frame sampling' over an opaque byte stream: one row per sampled
    slice (for video this is where a real demuxer plugs in; the
    slicing/explode plumbing is the Spark-side contract). Pure
    expressions: sequence + transform + explode — no Python."""
    n = F.octet_length(F.col(payload_col))
    offsets = F.sequence(F.lit(0), F.greatest((n - 1) / every_n_bytes, F.lit(0)).cast("int"))
    frames = F.transform(
        offsets,
        lambda i: F.struct(
            (i * every_n_bytes).alias("offset"),
            F.substring(F.col(payload_col), (i * every_n_bytes + 1).cast("int"), frame_bytes).alias(
                "frame"
            ),
        ),
    )
    return df.select(id_col, F.explode(frames).alias("f")).select(
        id_col, F.col("f.offset").alias("offset"), F.col("f.frame").alias("frame")
    )
