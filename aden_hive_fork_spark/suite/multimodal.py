"""Multimodal suite entries with REAL pixel decode (SURVEY.md §2.D).

q81 exercises the full image pipeline distributively: synthesize
deterministic PNGs on executors (stdlib encoder), decode them back
(stdlib zlib decoder), extract brightness/palette/grid features, and
group identical feature signatures — the image-dedup pass of a
training-data pipeline. Rows-only by declaration (DuckDB has no PNG
codec), but fully deterministic: the same 64 images decode to the
same 8 signature groups on every run.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import functions as F

from . import query
from ._helpers import T


def _doc_png(doc_id: int) -> bytes:
    """Deterministic 16x16 RGB test image: the pattern depends only on
    doc_id % 8, so 64 docs yield exactly 8 distinct images."""
    import numpy as np

    from ..sources.png_codec import png_encode

    k = doc_id % 8
    y, x = np.mgrid[0:16, 0:16]
    img = np.stack(
        [
            (x * (k + 1) * 4) % 256,
            (y * (k + 2) * 4) % 256,
            ((x + y) * (k + 3) * 2) % 256,
        ],
        axis=-1,
    ).astype("uint8")
    return png_encode(img)


@query("q81_image_dedup_features")
def q81_image_dedup_features(spark, sf_dir):
    """Image near-dup grouping over decoded pixel features.

    64 synthetic PNGs (8 distinct patterns) are generated AND decoded
    on executors; identical decoded signatures (brightness, contrast,
    color count, luminance grid) collapse to 8 groups of 8. At 100 TB
    the binary column comes from binaryFile ingest instead — the
    decode/feature/groupBy plan is identical.
    """
    from ..sources.binary import image_features

    docs = T(spark, sf_dir, "documents").select("doc_id").filter(F.col("doc_id") < 64)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "path": [f"img_{int(d):04d}.png" for d in pdf["doc_id"]],
                    "content": [_doc_png(int(d)) for d in pdf["doc_id"]],
                }
            )

    bin_df = docs.mapInPandas(gen, "path string, content binary")
    feats = image_features(bin_df, grid=4)
    sig = F.sha2(F.concat_ws(",", F.col("features").cast("array<string>")), 256)
    return (
        feats.filter(F.col("decoded"))
        .withColumn("sig", F.substring(sig, 1, 16))
        .groupBy("sig", "width", "height", "channels", "n_colors")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.round(F.min("brightness"), 6).alias("brightness"),
            F.round(F.min("contrast"), 6).alias("contrast"),
            F.min("path").alias("canonical_path"),
        )
        .orderBy("sig")
    )
