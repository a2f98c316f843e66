"""Multimodal columns (north-star surface): image/audio/video as opaque
``binary`` payloads with typed metadata structs, processed through
Arrow-batched ``mapInPandas`` -- the 100 TB shape for media pipelines.

The actual codecs (PIL/librosa/ffmpeg) are NOT in this container, so the
decode step is STUBBED: ``decode_image`` raises NotImplementedError unless
a codec is importable, and ``fake_decode_image`` provides a deterministic
stand-in (bytes -> pseudo-pixel statistics) so the Spark-side plumbing --
schema, Arrow batch shape, partitioning, UDF signatures -- is real and
tested end-to-end.

Scale notes: mapInPandas streams Arrow record batches (bounded memory per
task regardless of blob sizes); media tables should be written with
``write_parquet(..., partition_by=[...])`` so feature-extraction scans
prune; metadata-only queries (q on width/fps/duration) never touch the
binary column thanks to parquet column pruning.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_SCHEMA = (
    "id long, content binary, meta struct<width: int, height: int, format: string>"
)
AUDIO_SCHEMA = (
    "id long, content binary, "
    "meta struct<sample_rate: int, n_samples: int, channels: int, format: string>"
)
VIDEO_SCHEMA = (
    "id long, content binary, meta struct<fps: double, duration_s: double, format: string>"
)

N_FEATURES = 16


def _codec_available() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def decode_image(content: bytes) -> "np.ndarray":
    """Real decode path -- requires an image codec.

    STUB: this container ships no codec; callers must use
    ``fake_decode_image`` (deterministic) or install PIL.
    """
    if not _codec_available():
        raise NotImplementedError(
            "image codec not available in this environment; "
            "use fake_decode_image for deterministic tests"
        )
    import io

    import PIL.Image

    return np.asarray(PIL.Image.open(io.BytesIO(content)))


def fake_decode_image(content: bytes) -> np.ndarray:
    """Deterministic stand-in decode: md5-seeded pseudo-pixels with the
    byte-histogram of the payload folded in. Stable across runs/engines."""
    h = hashlib.md5(content).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
    base = rng.integers(0, 256, size=(8, 8), dtype=np.uint8).astype(np.float64)
    hist = np.bincount(np.frombuffer(content, dtype=np.uint8), minlength=256)
    return base + hist[:64].reshape(8, 8)


def extract_image_features(df: DataFrame, decode=fake_decode_image) -> DataFrame:
    """binary content -> fixed-dim feature vector via mapInPandas.

    One Arrow batch in, one out; the UDF is pure-per-row so Spark is free
    to pipeline it inside the scan stage (no shuffle).
    """

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for _, row in pdf.iterrows():
                px = decode(row["content"])
                v = np.concatenate(
                    [
                        [px.mean(), px.std(), px.min(), px.max()],
                        np.histogram(px, bins=N_FEATURES - 4, range=(0, 512))[0].astype(
                            np.float64
                        ),
                    ]
                )
                out_rows.append(
                    {
                        "id": row["id"],
                        "features": [round(float(x), 6) for x in v],
                        "width": row["meta"]["width"] if row["meta"] is not None else None,
                    }
                )
            yield pd.DataFrame(out_rows, columns=["id", "features", "width"])

    return df.mapInPandas(feats, schema="id long, features array<double>, width int")


def extract_image_features_arrow(df: DataFrame, decode=fake_decode_image) -> DataFrame:
    """``mapInArrow`` twin of ``extract_image_features``: consumes raw
    ``pyarrow.RecordBatch`` objects -- no Arrow->pandas conversion, no
    per-row ``iterrows`` -- and emits feature batches built columnar-side.

    This is the high-throughput media path at 100 TB: pandas conversion
    copies every binary blob into Python objects per batch, while Arrow
    hands over zero-copy buffers; only the decode itself touches bytes.
    Differentially tested against the pandas twin (identical output)."""
    import pyarrow as pa

    def feats(batches: "Iterator[pa.RecordBatch]") -> "Iterator[pa.RecordBatch]":
        for rb in batches:
            ids = rb.column(rb.schema.get_field_index("id"))
            contents = rb.column(rb.schema.get_field_index("content"))
            metas = rb.column(rb.schema.get_field_index("meta"))
            widths = metas.field("width") if isinstance(metas, pa.StructArray) else None
            out_feats, out_width = [], []
            for i in range(rb.num_rows):
                px = decode(contents[i].as_py())
                v = np.concatenate(
                    [
                        [px.mean(), px.std(), px.min(), px.max()],
                        np.histogram(px, bins=N_FEATURES - 4, range=(0, 512))[0].astype(
                            np.float64
                        ),
                    ]
                )
                out_feats.append([round(float(x), 6) for x in v])
                out_width.append(widths[i].as_py() if widths is not None else None)
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array(out_feats, type=pa.list_(pa.float64())),
                    pa.array(out_width, type=pa.int32()),
                ],
                names=["id", "features", "width"],
            )

    return df.mapInArrow(feats, schema="id long, features array<double>, width int")


def resize_plan(df: DataFrame, max_side: int) -> DataFrame:
    """Metadata-only resize planning: compute target dims WITHOUT touching
    the binary column (pure column pruning -- the scan never reads blobs)."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side)
        / F.greatest(F.col("meta.width").cast("double"), F.col("meta.height").cast("double")),
    )
    return df.select(
        "id",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.round(F.col("meta.width") * scale).cast("int").alias("target_w"),
        F.round(F.col("meta.height") * scale).cast("int").alias("target_h"),
    )


def frame_sample_plan(df: DataFrame, every_s: float) -> DataFrame:
    """Video frame-sampling plan from metadata: frame indices to decode at
    ``every_s``-second intervals (sequence expr, no Python)."""
    n = (F.col("meta.duration_s") / F.lit(every_s)).cast("int")
    return df.select(
        "id",
        F.col("meta.fps").alias("fps"),
        F.transform(
            F.sequence(F.lit(0), n),
            lambda i: (i * F.lit(every_s) * F.col("meta.fps")).cast("long"),
        ).alias("frame_indices"),
    )


def fake_decode_audio(content: bytes, n_samples: int) -> np.ndarray:
    """Deterministic stand-in PCM decode (the audio twin of
    fake_decode_image): md5-seeded noise, amplitude-modulated by the
    payload's mean byte value. Stable across runs/engines."""
    h = hashlib.md5(content).digest()
    rng = np.random.default_rng(int.from_bytes(h[8:16], "big"))
    amp = (np.frombuffer(content, dtype=np.uint8).mean() / 255.0) if content else 0.5
    return amp * rng.uniform(-1.0, 1.0, size=n_samples)


def extract_audio_features(df: DataFrame, decode=fake_decode_audio) -> DataFrame:
    """binary content -> per-clip acoustic features (RMS energy, zero-
    crossing rate, duration) via mapInPandas. Same bounded-memory Arrow
    contract as extract_image_features: one batch in, one out, pure
    per-row -> Spark pipelines it inside the scan stage, no shuffle. The
    clip length comes from metadata so the decode step can size its
    buffer without sniffing the payload."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for _, row in pdf.iterrows():
                meta = row["meta"]
                sr = int(meta["sample_rate"])
                n = int(meta["n_samples"])
                pcm = decode(row["content"], n)
                zc = int(np.sum(np.signbit(pcm[1:]) != np.signbit(pcm[:-1])))
                out_rows.append(
                    {
                        "id": row["id"],
                        "duration_s": round(n / sr, 6),
                        "rms": round(float(np.sqrt(np.mean(pcm**2))), 6),
                        "zcr": round(zc / max(n - 1, 1), 6),
                    }
                )
            yield pd.DataFrame(out_rows, columns=["id", "duration_s", "rms", "zcr"])

    return df.mapInPandas(
        feats, schema="id long, duration_s double, rms double, zcr double"
    )


def synth_audio_table(spark, source_df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic synthetic audio table: utf-8 payloads as PCM blobs +
    metadata (sample rate, clip length) derived from the text column."""
    sr = (F.length(text_col) % 3 * 4000 + 8000).cast("int")
    return source_df.select(
        F.col(id_col).cast("long").alias("id"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.struct(
            sr.alias("sample_rate"),
            (sr * (F.length(text_col) % 5 + 1)).cast("int").alias("n_samples"),
            (F.col(id_col) % 2 + 1).cast("int").alias("channels"),
            F.lit("fake/pcm").alias("format"),
        ).alias("meta"),
    )


def synth_video_table(spark, source_df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic synthetic video table: payload + (fps, duration)
    metadata -- enough for metadata-only frame planning."""
    return source_df.select(
        F.col(id_col).cast("long").alias("id"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.struct(
            (F.length(text_col) % 2 * 6 + 24).cast("double").alias("fps"),
            (F.length(text_col) % 20 + 1).cast("double").alias("duration_s"),
            F.lit("fake/raw").alias("format"),
        ).alias("meta"),
    )


def synth_image_table(spark, source_df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic synthetic media table: utf-8 payloads masquerading as
    image blobs + plausible metadata (for tests/bench without real media)."""
    return source_df.select(
        F.col(id_col).cast("long").alias("id"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.struct(
            (F.length(text_col) % 640 + 32).cast("int").alias("width"),
            (F.length(text_col) % 480 + 32).cast("int").alias("height"),
            F.lit("fake/raw").alias("format"),
        ).alias("meta"),
    )
