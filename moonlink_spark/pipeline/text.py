"""Text analysis operators: tokenization, quality, language-ID, fingerprint.

All pure `pyspark.sql.functions` (JVM-side, whole-stage-codegen'd — zero
Python in the hot path). Each function has an exact SQL twin used as the
DuckDB oracle, so the primitives here are restricted to the cross-engine
-identical subset: length/replace/regexp/split arithmetic and the shared
md5-derived hash (functions/hashing.py).

At 100 TB these are embarrassingly-parallel map-only jobs: no shuffle, full
predicate/column pushdown to the parquet scan (only `text` + id read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from moonlink_spark.functions.hashing import hex_int

# cross-engine token regex: letter runs, digit runs, single other-symbols
TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
PUNCT_REGEX = "[^A-Za-z0-9 ]"

# stopword markers per language. The marker *counting* is replace-based
# ((len - len(replace))/len(token)) — bit-identical in Spark and DuckDB,
# no regex-dialect risk.
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " a ", " of ", " and "],
    "es": [" el ", " la ", " de ", " los "],
    "de": [" der ", " die ", " und ", " das "],
    "fr": [" le ", " les ", " des ", " une "],
    "zh": [" zh ", " de5 "],  # placeholder markers; CJK needs real segmentation
}
LANG_ORDER = ["en", "es", "de", "fr", "zh"]  # deterministic tie-break order

STOPWORDS = [" the ", " a ", " of ", " and ", " to ", " in ", " is "]


def _occurrences(col, token: str):
    """Non-overlapping occurrence count via replace-arithmetic (exact in
    both engines, unlike regex word boundaries)."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(token), F.lit(""))))
        / F.lit(len(token))
    ).cast("long")


def _padded(text_col: str):
    return F.concat(F.lit(" "), F.lower(F.trim(F.col(text_col))), F.lit(" "))


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count + char count."""
    t = F.trim(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.size(F.split(t, r"\s+")).cast("long").alias("ws_tokens"),
        F.regexp_count(t, F.lit(TOKEN_REGEX)).cast("long").alias("re_tokens"),
        F.length(t).cast("long").alias("n_chars"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic document quality: length, punctuation ratio, stopword ratio,
    mean word length — the classic pre-training quality filters (C4-style),
    composed into one [0,1] score. Deterministic, SQL-twinned."""
    t = F.trim(F.col(text_col))
    padded = _padded(text_col)
    n_tokens = F.size(F.split(t, r"\s+")).cast("double")
    n_chars = F.length(t).cast("double")
    punct = F.regexp_count(t, F.lit(PUNCT_REGEX)).cast("double")
    stop_hits = None
    for s in STOPWORDS:
        o = _occurrences(padded, s).cast("double")
        stop_hits = o if stop_hits is None else stop_hits + o
    mean_wl = n_chars / F.greatest(n_tokens, F.lit(1.0))
    punct_ratio = punct / F.greatest(n_chars, F.lit(1.0))
    stop_ratio = stop_hits / F.greatest(n_tokens, F.lit(1.0))
    # score: in-range length + some stopwords + sane word length + low punct
    score = (
        F.when((n_chars >= 100) & (n_chars <= 5000), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(stop_ratio >= 0.01, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when((mean_wl >= 3.0) & (mean_wl <= 12.0), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(punct_ratio <= 0.1, F.lit(0.25)).otherwise(F.lit(0.0))
    )
    return df.select(
        F.col(id_col),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(score, 2).alias("quality"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-token language-ID: score each candidate language by stopword
    marker hits, argmax with a fixed tie-break order. (A real system swaps
    in fastText/CLD3; the Spark plumbing — map-only scoring + argmax — is
    identical.)"""
    padded = _padded(text_col)
    scores = []
    for lang in LANG_ORDER:
        s = None
        for m in LANG_MARKERS[lang]:
            o = _occurrences(padded, m)
            s = o if s is None else s + o
        scores.append(s.alias(f"score_{lang}"))
    scored = df.select(F.col(id_col), *scores)
    # argmax with tie-break = LANG_ORDER position: fold a CASE chain
    best = F.lit(LANG_ORDER[0])
    best_score = F.col(f"score_{LANG_ORDER[0]}")
    for lang in LANG_ORDER[1:]:
        cond = F.col(f"score_{lang}") > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, F.col(f"score_{lang}")).otherwise(best_score)
    return scored.select(
        F.col(id_col),
        best.alias("pred_lang"),
        best_score.cast("long").alias("marker_hits"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprint: shared 60-bit hash of the case/space-normalized
    text (md5-derived; functions/hashing.py) + a coarse 16-bit prefix bucket
    usable as a dedup shard key at scale."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    fp = hex_int(norm)
    return df.select(
        F.col(id_col),
        fp.alias("fingerprint"),
        (fp % F.lit(65536)).cast("int").alias("fp_bucket"),
    )
