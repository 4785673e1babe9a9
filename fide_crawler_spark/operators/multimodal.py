"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The reference carries media as refs (profile photo data-URI,
``ui/streamlit_ui.py:14-25``, decoded base64 → PIL; color-icon img srcs,
``data_processing/data_fetching_processing.py:159-162``).  At pipeline
scale, media are opaque ``binary`` columns with a typed metadata struct;
decode/resize/frame-sample run as Arrow-batched pandas stages over
``mapInPandas``.

The actual codec libraries (PIL/ffmpeg) are not in this container, so
the decode kernel is STUBBED: ``decode_media(..., real=True)`` raises
``NotImplementedError``; the default deterministic fake emits features
derived from the payload bytes (so schema, partitioning, UDF signature,
and batch shape — the Spark-side plumbing — are real and tested).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id bigint, payload binary, "
    "meta struct<format:string,width:int,height:int,n_bytes:bigint>"
)

FEATURE_SCHEMA = (
    "doc_id bigint, width int, height int, n_bytes bigint, "
    "checksum bigint, features array<float>"
)


def media_table(docs: DataFrame) -> DataFrame:
    """documents(doc_id, text, source, n_chars) → media rows: payload =
    utf-8 bytes of the text (stand-in for image bytes), metadata struct
    derived deterministically.  All JVM expressions."""
    payload = F.encode("text", "utf-8")
    width = (F.lit(64) + F.pmod(F.col("n_chars"), F.lit(128))).cast("int")
    height = (F.lit(64) + F.pmod(F.col("n_chars") * 3, F.lit(128))).cast("int")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.col("source").alias("format"),
            width.alias("width"),
            height.alias("height"),
            F.octet_length(payload).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake 'decoded image' feature vector (8 floats):
    byte-histogram moments.  Replaced by a real decode when codec libs
    exist."""
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    if arr.size == 0:
        arr = np.zeros(1)
    return np.array(
        [
            arr.mean(),
            arr.std(),
            arr.min(),
            arr.max(),
            float(width),
            float(height),
            float(arr.size),
            float(arr.sum() % 255),
        ],
        dtype=np.float32,
    )


def decode_media(media: DataFrame, real: bool = False) -> DataFrame:
    """Decode / feature-extract stage over mapInPandas (Arrow batches).

    ``real=True`` is the hook for an actual image decode (PIL et al.) —
    not available in this container, so it raises; the deterministic
    fake keeps every piece of Spark plumbing live and testable.
    """
    if real:
        raise NotImplementedError(
            "real media decode requires codec libraries not present in this "
            "container; the Spark plumbing (schema/batching/partitioning) is "
            "exercised via the deterministic fake decode"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            feats = [
                _fake_decode(p, m["width"], m["height"])
                for p, m in zip(pdf["payload"], pdf["meta"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [m["width"] for m in pdf["meta"]],
                    "height": [m["height"] for m in pdf["meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "checksum": [int(np.frombuffer(p, dtype=np.uint8).sum()) for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes payload through, rewrites metadata dims.
    A real kernel would transform payload bytes inside the same
    mapInPandas shape as decode_media."""
    return media.withColumn(
        "meta",
        F.struct(
            F.col("meta.format").alias("format"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.n_bytes").alias("n_bytes"),
        ),
    )


def frame_sample(
    media: DataFrame,
    frame_bytes: int = 64,
    every_k: int = 4,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Sample every ``every_k``-th fixed-size frame from an opaque
    video payload: (id, frame_idx, n_frames, frame binary).

    The deterministic fake codec treats the payload as ``n_frames``
    concatenated ``frame_bytes``-byte frames (a real container needs
    ffmpeg — not in this image; the real kernel would slot into
    ``decode_media``'s mapInPandas shape).  The SAMPLING plumbing is
    fully real and, unlike a codec, needs no Python at all: frame
    index generation is ``sequence`` + ``posexplode`` and the byte
    slice is ``Column.substr`` on the binary column — one codegen'd
    projection, zero shuffle, output co-partitioned with the input.
    Only sampled frames ever materialize as rows (a 2-hour video at
    every_k=120 fans out 1/120th of its frames, not all of them).
    """
    assert frame_bytes > 0 and every_k > 0
    payload = F.col(payload_col)
    n_frames = F.floor(F.length(payload) / F.lit(frame_bytes)).cast("int")
    idxs = F.sequence(
        F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_k)
    )
    return (
        media.select(
            F.col(id_col),
            payload.alias("__payload"),
            n_frames.alias("n_frames"),
            F.posexplode(idxs).alias("__p", "frame_idx"),
        )
        .filter(F.col("frame_idx") < F.col("n_frames"))
        .select(
            id_col,
            F.col("frame_idx").cast("int").alias("frame_idx"),
            "n_frames",
            F.col("__payload")
            .substr(F.col("frame_idx") * frame_bytes + 1, F.lit(frame_bytes))
            .alias("frame"),
        )
    )
