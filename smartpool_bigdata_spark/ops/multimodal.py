"""Multimodal (image/audio/video) column handling for training-data
pipelines.

Design: media payloads are opaque ``binary`` columns travelling next to a
typed metadata struct (mime/width/height/duration_ms). Everything that
inspects raw bytes runs as Arrow-batched ``mapInPandas`` — vectorized
transfer, ~10-100× over row-at-a-time Python UDFs — and every function
declares its output schema explicitly so the plan stays statically typed.

The decode/resize/frame-sample steps require codec libraries (PIL/ffmpeg)
that are NOT in this environment, so those are stubbed: the Spark-side
plumbing (schema, batching, partitioning) is real and tested, and the
pixel work raises ``NotImplementedError`` unless given
``deterministic_fake=True``, which produces schema-correct fake outputs so
pipelines remain end-to-end testable.

Scale: byte-feature extraction is scan-only map work (no shuffle). Media
rows are large — pair these ops with ``spark.sql.files.maxPartitionBytes``
sized so one partition's payloads fit executor memory, and store payloads
in their own column/file group so metadata-only queries never read bytes
(columnar pruning does this for free).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = (
    "mime STRING, width INT, height INT, duration_ms INT"
)


def with_binary_payload(
    df: DataFrame, text_col: str = "text", mime: str = "application/octet-stream"
) -> DataFrame:
    """Synthesize an opaque binary payload + metadata struct from a string
    column — the test stand-in for real media bytes (the driver testdata
    ships no media files). Payload = UTF-8 bytes; metadata is typed."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ),
    )


def extract_byte_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Real (non-stub) byte-level feature extraction via mapInPandas:
    payload size and first-byte signature per row, computed on Arrow
    batches. The pattern to extend with magic-number sniffing, hashing,
    or codec probing."""
    out_schema = f"{id_col} BIGINT, n_bytes BIGINT, first_byte INT"

    def batches(it: Iterator):
        for pdf in it:
            res = pdf[[id_col]].copy()
            res["n_bytes"] = pdf[payload_col].map(
                lambda b: len(b) if b is not None else 0
            )
            res["first_byte"] = pdf[payload_col].map(
                lambda b: int(b[0]) if b else -1
            )
            yield res

    return df.select(id_col, payload_col).mapInPandas(batches, schema=out_schema)


def decode_images(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    deterministic_fake: bool = False,
) -> DataFrame:
    """Decode image payloads to (width, height, n_channels).

    STUB for the pixel work: requires an image codec (PIL), absent here.
    With ``deterministic_fake=True`` emits schema-correct fake dimensions
    derived from byte length, so downstream plumbing is testable. The
    mapInPandas structure (schema declaration, Arrow batching) is exactly
    what a real decoder drops into.
    """
    out_schema = f"{id_col} BIGINT, width INT, height INT, n_channels INT"

    try:  # pragma: no cover - not installed in this environment
        from PIL import Image  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False

    if not have_pil and not deterministic_fake:
        raise NotImplementedError(
            "image decode needs PIL (not installed); pass "
            "deterministic_fake=True for schema-correct fake decode"
        )

    def batches(it: Iterator):
        import io as _io

        for pdf in it:
            res = pdf[[id_col]].copy()
            if have_pil:  # pragma: no cover
                from PIL import Image

                dims = pdf[payload_col].map(
                    lambda b: Image.open(_io.BytesIO(b)).size
                )
                res["width"] = dims.map(lambda wh: wh[0])
                res["height"] = dims.map(lambda wh: wh[1])
                res["n_channels"] = 3
            else:
                n = pdf[payload_col].map(lambda b: len(b) if b is not None else 0)
                res["width"] = (n % 640).astype("int32")
                res["height"] = (n % 480).astype("int32")
                res["n_channels"] = 3
            yield res

    return df.select(id_col, payload_col).mapInPandas(batches, schema=out_schema)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_n_bytes: int = 64,
    deterministic_fake: bool = True,
) -> DataFrame:
    """Frame sampling: one output row per sampled frame (row explosion
    inside mapInPandas — the shape video decode needs: N input rows → M>N
    output rows with per-frame offsets).

    STUB for codec work (ffmpeg absent): the fake samples a 'frame' every
    ``every_n_bytes`` of payload, which exercises the real plumbing —
    variable fan-out, frame_idx ordering, payload slicing.
    """
    if not deterministic_fake:
        raise NotImplementedError("video decode needs ffmpeg (not installed)")
    out_schema = f"{id_col} BIGINT, frame_idx INT, frame_offset BIGINT"

    def batches(it: Iterator):
        import pandas as pd

        for pdf in it:
            ids, idxs, offs = [], [], []
            for _, row in pdf.iterrows():
                payload = row[payload_col] or b""
                for i, off in enumerate(range(0, len(payload), every_n_bytes)):
                    ids.append(row[id_col])
                    idxs.append(i)
                    offs.append(off)
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "frame_offset": offs}
            )

    return df.select(id_col, payload_col).mapInPandas(batches, schema=out_schema)
