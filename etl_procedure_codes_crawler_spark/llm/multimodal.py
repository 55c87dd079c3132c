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


def _decode_stub(payload: bytes) -> tuple[int, int, int, bytes]:
    """Placeholder for the real decoder (PIL.Image.open / av.open /
    soundfile.read). Not available in this environment."""
    raise NotImplementedError(
        "media decode requires an image/audio codec library; "
        "inject a real decoder via decode_media(media, decoder=...)"
    )


def identity_decoder(payload: bytes) -> tuple[int, int, int, bytes]:
    """Deterministic no-codec decoder for gate/correctness runs: the
    payload is a 1×n_bytes×1 'image' whose pixels are the raw bytes.
    Real plumbing (batching, error capture, schema), fake codec — and
    simple enough that a SQL oracle can mirror it exactly. Empty
    payloads are corrupt (exercises the error-row path)."""
    data = bytes(payload)
    if not data:
        raise ValueError("empty payload")
    return 1, len(data), 1, data


DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("channels", LongType()),
        StructField("pixels", BinaryType()),
        StructField("decode_error", StringType()),
    ]
)


def decode_media(media: DataFrame, decoder=_decode_stub) -> DataFrame:
    """The decode stage, with the decoder as an injectable seam.

    ``decoder(payload: bytes) -> (width, height, channels, pixel_bytes)``
    — PIL/ffmpeg/soundfile in production (none are in this container,
    so the default raises NotImplementedError AT PLAN EXECUTION, loudly,
    not silently). Per-payload decode FAILURES (corrupt bytes) become
    ``decode_error`` rows instead of killing the partition — the same
    error-as-data contract as the extraction operator
    (operators/extract.py); a missing decoder library
    (NotImplementedError) still propagates because that is a
    configuration error, not a data error.

    The seam is proven with a fake decoder in
    ``tests/test_multimodal.py::TestDecoderSeam`` — the extraction
    path runs end-to-end, only the codec call is substituted.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = {
                "media_id": [],
                "mime": [],
                "width": [],
                "height": [],
                "channels": [],
                "pixels": [],
                "decode_error": [],
            }
            for media_id, mime, payload in zip(
                batch["media_id"], batch["mime"], batch["payload"]
            ):
                width = height = channels = None
                pixels = None
                error = None
                try:
                    width, height, channels, pixels = decoder(
                        payload if payload is not None else b""
                    )
                except NotImplementedError:
                    raise  # missing codec library: fail the job, loudly
                except Exception as exc:
                    error = repr(exc)
                out["media_id"].append(media_id)
                out["mime"].append(mime)
                out["width"].append(width)
                out["height"].append(height)
                out["channels"].append(channels)
                out["pixels"].append(pixels)
                out["decode_error"].append(error)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


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


FRAME_BYTES = 1024

FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_payload", BinaryType()),
        StructField("frame_bytes", LongType()),
    ]
)

RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
    ]
)


def sample_frames(media: DataFrame, frame_bytes: int = FRAME_BYTES) -> DataFrame:
    """Frame sampling: one media row fans out into N frame rows —
    the UDTF shape (same as the crawl extractor's 1→3-relations fan-out)
    over mapInPandas. A real implementation decodes the container and
    emits every k-th video frame; the deterministic stand-in slices the
    payload into ``frame_bytes`` chunks so the fan-out arithmetic
    (row multiplication, batch shapes, downstream explode-free schema)
    is fully testable: n_frames = ceil(n_bytes / frame_bytes)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, idxs, payloads, sizes = [], [], [], []
            for media_id, payload in zip(batch["media_id"], batch["payload"]):
                data = payload if payload is not None else b""
                for i in range(0, max(len(data), 1), frame_bytes):
                    chunk = data[i : i + frame_bytes]
                    ids.append(media_id)
                    idxs.append(i // frame_bytes)
                    payloads.append(chunk)
                    sizes.append(len(chunk))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "frame_payload": payloads,
                    "frame_bytes": sizes,
                }
            )

    return media.mapInPandas(run, schema=FRAMES_SCHEMA)


def resize_media(
    media: DataFrame, width: int = 64, height: int = 64
) -> DataFrame:
    """Resize stage: decode → scale → re-encode per payload, Arrow
    batched. The real decoder is stubbed (``_decode_stub``); the
    deterministic stand-in caps the payload at width*height bytes so
    output sizing, schema, and batch behavior are real. Swapping in
    PIL changes only the body of ``shrink``."""
    cap = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def shrink(payload):
            data = payload if payload is not None else b""
            return data[:cap]

        for batch in batches:
            resized = [shrink(p) for p in batch["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "mime": batch["mime"],
                    "width": width,
                    "height": height,
                    "payload": resized,
                    "n_bytes": [len(r) for r in resized],
                }
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


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
