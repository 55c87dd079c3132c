"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (SURVEY §7 Phase 5): image/audio/video ride as ``binary``
columns with a typed metadata struct; decode / feature-extraction /
resize / frame-sampling run as Arrow-batched ``mapInPandas`` stages.

The decode step itself is STUBBED — the real codecs (PIL/ffmpeg/...)
are not in this container — but everything Spark-side is real and
tested: schemas, batch shapes, partition behavior, and a
deterministic fake feature extractor standing in for a model forward
pass. Swapping ``_decode_stub`` for a real decoder changes no plan.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: payload + typed metadata — the multimodal row shape
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("source", StringType()),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(FloatType(), containsNull=False)),
    ]
)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Deterministic fake media corpus: each document's utf-8 bytes act
    as an opaque payload. Real pipelines read payloads from object
    storage; only this synthesis step is fake."""
    payload = F.encode(F.col("text"), "utf-8")
    return documents.select(
        F.col("doc_id").alias("media_id"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.length(payload).cast("bigint").alias("n_bytes"),
        F.col("source"),
    )


def _decode_stub(payload: bytes) -> None:
    """Placeholder for the real decoder (PIL.Image.open / av.open /
    soundfile.read). Not available in this environment."""
    raise NotImplementedError(
        "media decode requires an image/audio codec library; "
        "inject a real decoder in place of _decode_stub"
    )


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for model features: byte-histogram
    moments. Same payload → same vector, any environment."""
    if not payload:
        return [0.0] * dim
    counts = [0] * dim
    for byte in payload:
        counts[byte % dim] += 1
    total = float(len(payload))
    return [c / total for c in counts]


def extract_features(
    media: DataFrame, batch_size_hint: int | None = None
) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    ``mapInPandas`` so a real implementation can batch payloads into a
    model (GPU-friendly: one forward pass per Arrow batch). The fake
    extractor preserves exactly the structure a real one needs: bytes
    in → fixed-dim float vector out, metadata passed through.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "mime": batch["mime"],
                    "n_bytes": batch["n_bytes"],
                    "feature": [
                        _fake_features(p if p is not None else b"")
                        for p in batch["payload"]
                    ],
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)
