"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB:
- payloads are ``binary`` columns with a sibling metadata struct
  (modality, format, size_bytes, checksum) — scans prune the binary column
  unless a stage actually touches bytes
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages: bytes never pass through the JVM row format and
  Python sees whole batches
- the decode kernels themselves are STUBS in this container (no
  image/audio libs): ``decode_image_stub`` raises NotImplementedError, and
  ``fake_decode`` produces a deterministic (md5-derived) stand-in so the
  plumbing — schema, batching, partition behavior — is real and testable.

Repartitioning note: binary batches are memory-heavy; pair mapInPandas
with ``spark.sql.execution.arrow.maxRecordsPerBatch`` sized so
batch_rows × payload ≈ tens of MB, and repartition by size (not count)
before heavy decode stages.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "id long, width int, height int, format string, n_bytes long"
)


def attach_binary_metadata(
    df: DataFrame, payload_col: str, modality: str, fmt: str
) -> DataFrame:
    """Typed metadata struct alongside an opaque binary column."""
    p = F.col(payload_col)
    return df.withColumn(
        f"{payload_col}_meta",
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit(fmt).alias("format"),
            F.octet_length(p).alias("size_bytes"),
            F.md5(p).alias("checksum"),
        ),
    )


def text_as_binary(col: Column) -> Column:
    """UTF-8 payload from a string column (test stand-in for real blobs)."""
    return F.encode(col, "UTF-8")


def decode_image_stub(payload: bytes) -> tuple[int, int, str]:
    """Real decode kernel — NOT AVAILABLE in this container.

    On a cluster image with PIL/ffmpeg installed, replace the body with the
    actual decode; the mapInPandas wiring below is unchanged.
    """
    raise NotImplementedError(
        "image/audio decode libraries are not installed in this environment"
    )


def fake_decode(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in decode: dimensions derived from the payload's
    md5 — stable across runs/partitionings, exercises the full data path."""
    d = hashlib.md5(payload).digest()
    width = 64 + d[0] % 192
    height = 64 + d[1] % 192
    fmt = ("png", "jpeg", "webp")[d[2] % 3]
    return width, height, fmt


def decode_batch(
    df: DataFrame,
    id_col: str = "id",
    payload_col: str = "payload",
    kernel=fake_decode,
) -> DataFrame:
    """Arrow-batched decode stage over (id, payload) → DECODED_SCHEMA.

    mapInPandas so each Python worker receives whole Arrow batches of
    payload bytes; the kernel runs per-row inside the batch (vectorize the
    kernel itself when the real library supports it).
    """
    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                w, h, fmt = kernel(bytes(payload))
                out.append((int(i), w, h, fmt, len(payload)))
            yield pd.DataFrame(
                out, columns=["id", "width", "height", "format", "n_bytes"]
            )

    return df.select(
        F.col(id_col).alias(id_col), F.col(payload_col).alias(payload_col)
    ).mapInPandas(_decode, DECODED_SCHEMA)


def frame_sample_plan(
    df: DataFrame,
    every_n: int,
    id_col: str = "id",
    n_frames_col: str = "n_frames",
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame index.

    The frame indices are computed JVM-side (sequence + explode); only the
    per-frame decode would go through mapInPandas. Works purely on
    metadata — no byte access — so Parquet scans prune the payload column.
    """
    return df.select(
        F.col(id_col),
        F.explode(
            F.sequence(
                F.lit(0), F.col(n_frames_col) - 1, F.lit(every_n)
            )
        ).alias("frame_idx"),
    )
