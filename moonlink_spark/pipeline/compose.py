"""Composed training-corpus cleaning — the end-to-end pipeline a
pre-training data run actually executes, chained from the audited kernels:

  quality filter  →  exact dedup  →  SimHash near-dup removal  →  tokens

Each stage is one of the independently oracle-checked operators
(pipeline/text.quality_score, pipeline/dedup.exact_dedup / simhash /
banded Hamming pairs); composing them adds NO new shuffle class — the
whole pipeline is: one map-only scoring pass, one hash shuffle for exact
dedup, one explode+groupBy for fingerprints, one bucket join for
candidate pairs. Nothing here is quadratic and nothing collects to the
driver, so the chain holds at 100 TB exactly as its pieces do.

Dedup policies (deterministic so the SQL oracle can replicate them):
exact dedup keeps the LOWEST doc_id of each byte-identical group;
near-dup removal drops the HIGHER id of every verified pair (pairs are
emitted a < b, so doc_b is always the drop side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from moonlink_spark.pipeline.dedup import (
    SIMHASH_BITS,
    _banded_hamming_pairs,
    exact_dedup,
    simhash,
)
from moonlink_spark.pipeline.text import quality_score


def corpus_clean(
    df: DataFrame,
    min_quality: float = 0.75,
    radius: int = 3,
    bands: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Clean a document corpus for training: drop low-quality docs, then
    exact duplicates, then SimHash near-duplicates; return the surviving
    (doc_id, ws_tokens, quality) — the manifest a tokenizer run consumes."""
    scored = quality_score(df, text_col=text_col, id_col=id_col)
    good = df.select(id_col, text_col).join(
        scored.filter(F.col("quality") >= min_quality).select(id_col, "quality"),
        id_col,
    )
    keepers = exact_dedup(good, text_col=text_col, id_col=id_col).select(
        F.col("keeper_id").alias(id_col)
    )
    uniq = good.join(keepers, id_col)

    sh = simhash(uniq, text_col=text_col, id_col=id_col)
    pairs = _banded_hamming_pairs(sh, radius=radius, bands=bands, bits=SIMHASH_BITS)
    drop = pairs.select(F.col("doc_b").alias(id_col)).distinct()
    survivors = uniq.join(drop, id_col, "left_anti")

    ws_tokens = F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long")
    return survivors.select(
        F.col(id_col), ws_tokens.alias("ws_tokens"), F.col("quality")
    )
