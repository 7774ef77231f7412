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


def synthesize_pcm(
    df: DataFrame, id_col: str = "doc_id", out_col: str = "audio"
) -> DataFrame:
    """Deterministic PCM16-LE audio synthesizer (the driver testdata
    ships no media files): per id, ``1536 + id % 1024`` samples with
    ``sample_i = ((id·31 + i·7) mod 65536) − 32768``, packed little-
    endian int16 via numpy ``tobytes`` per Arrow batch. Because the
    waveform is a pure arithmetic function of (id, i), a SQL oracle can
    recompute every downstream feature WITHOUT parsing bytes — the same
    regenerate-don't-parse trick as the sensor_feed connector oracle."""
    schema = f"{id_col} long, {out_col} binary, n_samples int"

    def gen(it: Iterator):
        import numpy as np
        import pandas as pd

        for pdf in it:
            ids = pdf[id_col].to_numpy()
            payloads, ns = [], []
            for d in ids:
                n = 1536 + int(d) % 1024
                i = np.arange(n, dtype=np.int64)
                s = ((int(d) * 31 + i * 7) % 65536 - 32768).astype("<i2")
                payloads.append(s.tobytes())
                ns.append(n)
            yield pd.DataFrame(
                {id_col: ids, out_col: payloads, "n_samples": ns}
            )

    return df.select(id_col).mapInPandas(gen, schema=schema)


def pcm_chunk_features(
    df: DataFrame,
    id_col: str = "doc_id",
    audio_col: str = "audio",
    chunk_samples: int = 1024,
) -> DataFrame:
    """REAL audio feature extraction over opaque binary columns — unlike
    the image/video decodes, raw PCM needs no codec, so this path runs
    end-to-end in any environment: each payload parses as little-endian
    int16 (``np.frombuffer`` per Arrow batch — zero-copy), windows into
    fixed ``chunk_samples`` chunks (tail chunk short), and emits exact
    integer features per chunk: sample count, peak amplitude, and energy
    (sum of squares — fits int64 up to ~2^23 samples/chunk). RMS/dBFS
    derive downstream as plain SQL so every float stays in the engine.

    Scale: row-local map work, no shuffle; rows expand by ~samples/chunk
    — the audio twin of sample_frames' fan-out, with the decode REAL."""
    schema = (
        f"{id_col} long, chunk_idx int, n_samples int, peak int, sum_sq long"
    )

    def gen(it: Iterator):
        import numpy as np
        import pandas as pd

        for pdf in it:
            ids, chunks, ns, peaks, sqs = [], [], [], [], []
            for d, b in zip(pdf[id_col], pdf[audio_col]):
                if b is None:
                    continue
                s = np.frombuffer(b, dtype="<i2").astype(np.int64)
                for c0 in range(0, len(s), chunk_samples):
                    ch = s[c0 : c0 + chunk_samples]
                    ids.append(d)
                    chunks.append(c0 // chunk_samples)
                    ns.append(len(ch))
                    peaks.append(int(np.abs(ch).max()) if len(ch) else 0)
                    sqs.append(int((ch * ch).sum()))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "chunk_idx": chunks,
                    "n_samples": ns,
                    "peak": peaks,
                    "sum_sq": sqs,
                }
            )

    return df.select(id_col, audio_col).mapInPandas(gen, schema=schema)


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


def resize_images(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    target_w: int = 64,
    target_h: int = 64,
    deterministic_fake: bool = False,
) -> DataFrame:
    """Resize image payloads to (target_w, target_h), emitting a NEW
    binary payload — the N-bytes-in/M-bytes-out transform shape every
    media pipeline stage (resize, re-encode, crop) shares.

    STUB for the pixel work (PIL absent): the fake emits a deterministic
    byte payload of exactly ``target_w*target_h*3`` bytes cycled from the
    source payload, so downstream stages see correctly-sized binaries and
    the schema/batching contract is fully exercised.
    """
    out_schema = f"{id_col} BIGINT, payload BINARY, width INT, height INT"

    try:  # pragma: no cover - not installed in this environment
        from PIL import Image  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False

    if not have_pil and not deterministic_fake:
        raise NotImplementedError(
            "image resize needs PIL (not installed); pass "
            "deterministic_fake=True for schema-correct fake resize"
        )

    n_out = target_w * target_h * 3

    def batches(it: Iterator):
        import io as _io

        for pdf in it:
            res = pdf[[id_col]].copy()
            if have_pil:  # pragma: no cover
                from PIL import Image

                def _resize(b):
                    img = Image.open(_io.BytesIO(b)).resize((target_w, target_h))
                    buf = _io.BytesIO()
                    img.save(buf, format="PNG")
                    return buf.getvalue()

                res["payload"] = pdf[payload_col].map(_resize)
            else:
                res["payload"] = pdf[payload_col].map(
                    lambda b: ((b or b"\x00") * (n_out // max(len(b or b"\x00"), 1) + 1))[:n_out]
                )
            res["width"] = target_w
            res["height"] = target_h
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
        import numpy as np
        import pandas as pd

        for pdf in it:
            # Vectorized fan-out: per-row frame counts -> np.repeat for the
            # ids, one concatenated arange for the frame indices. No
            # per-row Python loop over the batch.
            sizes = pdf[payload_col].map(lambda b: len(b) if b is not None else 0)
            n_frames = np.maximum(
                0, -(-sizes.to_numpy() // every_n_bytes)
            ).astype("int64")
            ids = np.repeat(pdf[id_col].to_numpy(), n_frames)
            idxs = np.concatenate(
                [np.arange(n) for n in n_frames]
            ) if len(n_frames) else np.array([], dtype="int64")
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "frame_idx": idxs.astype("int32"),
                    "frame_offset": (idxs * every_n_bytes).astype("int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, schema=out_schema)
