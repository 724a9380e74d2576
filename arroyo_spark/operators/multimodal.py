"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: media travels as an opaque
``binary`` column next to typed metadata; decode / feature-extraction are
Arrow-batched ``mapInPandas`` stages so bytes never round-trip through
Python row-by-row. The actual codecs (PIL/ffmpeg/etc.) are NOT in this
container, so the decode step is a clearly-marked stub — the Spark-side
plumbing (schema, batching, UDF signature, deterministic fake features)
is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    import pandas as pd

MEDIA_SCHEMA = "doc_id long, media binary, media_format string, n_bytes int"


def attach_fake_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic stand-in for a real media column: md5-derived bytes.

    Simulates 'documents with an image attached' — 64 bytes of
    deterministic pseudo-content per row (4x md5 of salted text).
    """
    chunks = [F.unhex(F.md5(F.concat_ws("#", F.lit(i), F.col(text_col)))) for i in range(4)]
    media = F.concat(*chunks)
    return df.select(
        F.col(id_col),
        media.alias("media"),
        F.lit("fake/raw64").alias("media_format"),
        F.length(media).cast("int").alias("n_bytes"),
    )


def decode_image(media_bytes: bytes) -> object:
    """STUB — real image decoding needs PIL/libjpeg, not in this image.

    On a real cluster: replace the body with PIL.Image.open(BytesIO(...))
    inside extract_features' batch loop; the Spark-side plumbing is
    unchanged.
    """
    raise NotImplementedError("image decode requires PIL/libjpeg (not in this container)")


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    Deterministic fake features (byte mean / min / max / a 4-bin
    histogram, flattened to hist_0..hist_3 so every output column is a
    scalar) standing in for a real embedding model; the batch shape,
    schema, and partition-parallel execution are the production path.
    """
    out_schema = (
        "doc_id long, n_bytes int, byte_mean double, byte_min int, byte_max int, "
        "hist_0 int, hist_1 int, hist_2 int, hist_3 int"
    )

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in it:
            feats = []
            for doc_id, media in zip(pdf["doc_id"], pdf["media"]):
                arr = np.frombuffer(media, dtype=np.uint8)
                hist = np.histogram(arr, bins=4, range=(0, 256))[0].astype("int32")
                feats.append(
                    {
                        "doc_id": doc_id,
                        "n_bytes": len(arr),
                        "byte_mean": float(arr.mean()),
                        "byte_min": int(arr.min()),
                        "byte_max": int(arr.max()),
                        **{f"hist_{i}": int(hist[i]) for i in range(4)},
                    }
                )
            yield pd.DataFrame(feats)

    return df.mapInPandas(batches, schema=out_schema)


def sample_frames(df: DataFrame, every_n_bytes: int = 16) -> DataFrame:
    """'Frame sampling' over the opaque payload: one row per sampled chunk.

    Stands in for video frame extraction (explode-style row multiplication
    with byte-range metadata — the real op swaps substring for a decoder).
    """
    n_frames = F.floor(F.col("n_bytes") / every_n_bytes).cast("int")
    return df.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
        F.expr(f"substring(media, frame_idx * {every_n_bytes} + 1, {every_n_bytes})").alias(
            "frame_bytes"
        ),
    )
