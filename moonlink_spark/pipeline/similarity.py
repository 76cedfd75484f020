"""Similarity search over embedding columns: brute-force cosine top-k and
LSH-bucketed ANN.

Scale shape: brute force is O(Q·N) — correct baseline, used when Q is small
(broadcast the queries, map over N). The LSH path buckets vectors by
random-hyperplane sign bits so the candidate set shrinks ~2^planes-fold;
bucket skew (dense regions) is the risk axis — bucket ids feed a hash
shuffle, AQE splits oversized buckets.

All float math is double-precision sequential folds (F.aggregate /
zip_with) so the DuckDB oracle (list_transform + list_sum over the same
order) reproduces results bit-for-bit; outputs round to 6 decimals and
rank with explicit id tie-breaks to stay hash-comparable.

Hyperplane weights are md5-derived (no RNG): w(p,d) =
(shared_hash('plane-p-d') mod 2001 − 1000)/1000 — regenerable by tests,
Spark, and the SQL oracle alike.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window, functions as F

from moonlink_spark.functions.hashing import HEX_CHARS
from moonlink_spark.pipeline.util import fan_out


def plane_weights(n_planes: int, dims: int) -> list[list[float]]:
    """Deterministic hyperplane weights in [-1, 1] (md5-derived)."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dims):
            h = int(
                hashlib.md5(f"plane-{p}-{d}".encode()).hexdigest()[:HEX_CHARS], 16
            )
            row.append((h % 2001 - 1000) / 1000.0)
        planes.append(row)
    return planes


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: (query_id, neighbor_id, cos, rank).

    The query side is broadcast (small); candidates stream map-side; the
    only shuffle is the per-query top-k window. Ranking uses the rounded
    cosine with neighbor-id tie-break — deterministic and oracle-safe."""
    q = F.broadcast(
        df.filter(F.col(id_col).isin(query_ids)).select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
        )
    )
    c = fan_out(df).select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    joined = q.crossJoin(c).filter(F.col("query_id") != F.col("neighbor_id"))
    cos = F.round(_dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))), 6)
    scored = joined.select("query_id", "neighbor_id", cos.alias("cos"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def lsh_buckets(
    df: DataFrame,
    n_planes: int = 12,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH bucket per vector: bit p = [dot(v, plane_p) ≥ 0].

    Each plane is an array *literal*, so the dot is a sequential zip_with
    fold — no shuffle at all for bucketing (map-only), and bit-identical to
    the SQL oracle's list_transform fold."""
    planes = plane_weights(n_planes, dims)
    # the whole bucket id as ONE server-parsed SQL expression: building
    # n_planes × dims literal Columns through py4j cost more driver time
    # than the distributed execution (same build-vs-exec trade as the
    # dedup aggregates); the SQL folds are arithmetic-identical to the
    # Column form (zip_with product, sequential double aggregate)
    def _dot_sql(wts: list[float]) -> str:
        arr = ", ".join(f"{w!r}D" for w in wts)
        return (
            f"aggregate(zip_with({vec_col}, array({arr}), "
            f"(x, y) -> cast(x as double) * cast(y as double)), "
            f"0.0D, (acc, x) -> acc + x)"
        )

    bucket_sql = " + ".join(
        f"(CASE WHEN {_dot_sql(wts)} >= 0 THEN CAST({1 << p} AS BIGINT) "
        f"ELSE CAST(0 AS BIGINT) END)"
        for p, wts in enumerate(planes)
    )
    return fan_out(df).select(
        F.col(id_col), F.col(vec_col), F.expr(bucket_sql).alias("bucket")
    )


def embedding_near_dups(
    df: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Semantic near-duplicate pairs: (a, b, cos) with cosine ≥ threshold.

    The DEFAULT (n_planes=8) is the bucketed scale path: pairs are
    restricted to one shared LSH bucket, so the self-join shuffles on the
    bucket id instead of exploding N² — at the cost of LSH recall
    (near-identical vectors share every hyperplane side, so true duplicates
    are retained with probability → 1 as cos → 1).

    n_planes=0 is the brute-force all-pairs kernel — the small-N
    verification twin / SQL oracle. It is scale-unsafe (O(N²) join) and
    must be OPTED INTO explicitly; never run it on a full corpus."""
    if n_planes > 0:
        base = lsh_buckets(df, n_planes=n_planes, dims=dims, id_col=id_col, vec_col=vec_col)
        join_cond = lambda l, r: (F.col("l.bucket") == F.col("r.bucket")) & (  # noqa: E731
            F.col(f"l.{id_col}") < F.col(f"r.{id_col}")
        )
    else:
        base = df.select(id_col, vec_col)
        join_cond = lambda l, r: F.col(f"l.{id_col}") < F.col(f"r.{id_col}")  # noqa: E731
    l, r = base.alias("l"), base.alias("r")
    joined = l.join(r, join_cond(l, r))
    cos = F.round(
        _dot(F.col(f"l.{vec_col}"), F.col(f"r.{vec_col}"))
        / (_norm(F.col(f"l.{vec_col}")) * _norm(F.col(f"r.{vec_col}"))),
        6,
    )
    return (
        joined.select(
            F.col(f"l.{id_col}").alias("vec_a"),
            F.col(f"r.{id_col}").alias("vec_b"),
            cos.alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .distinct()
    )


def ivf_assign(
    df: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: every vector is assigned to its
    nearest-by-cosine centroid (the inverted-file "list" it lives in).

    The coarse codebook is DETERMINISTIC — the n_centroids lowest-id vectors
    act as centroids (a fixed draw, the sandbox stand-in for a k-means
    codebook; the assignment/probe machinery is identical either way). The
    centroid set is tiny and broadcast, so assignment is one map-side
    cross-join + a per-vector argmax window — a single shuffle on id."""
    cents = F.broadcast(
        df.filter(F.col(id_col) < n_centroids).select(
            F.col(id_col).alias("cid"), F.col(vec_col).alias("cemb")
        )
    )
    scored = fan_out(df).select(F.col(id_col), F.col(vec_col)).crossJoin(cents)
    cos = F.round(
        _dot(F.col(vec_col), F.col("cemb")) / (_norm(F.col(vec_col)) * _norm(F.col("cemb"))),
        6,
    )
    w = Window.partitionBy(id_col).orderBy(F.col("cos").desc(), F.col("cid").asc())
    return (
        scored.select(id_col, vec_col, "cid", cos.alias("cos"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(F.col(id_col), F.col(vec_col), F.col("cid").alias("list_id"))
    )


def ivf_ann_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN top-k: probe the query's *nprobe* nearest inverted lists, then
    exact-cosine rerank only their members.

    The scale path for 10^12-vector corpora: candidates shrink ~N/n_centroids
    ·nprobe-fold; the probe side is broadcast; the only big shuffle is the
    candidate join keyed on list_id (AQE splits hot lists). Same output
    schema as cosine_topk / lsh_ann_topk for A/B comparison."""
    assigned = ivf_assign(df, n_centroids=n_centroids, id_col=id_col, vec_col=vec_col)
    cents = F.broadcast(
        df.filter(F.col(id_col) < n_centroids).select(
            F.col(id_col).alias("cid"), F.col(vec_col).alias("cemb")
        )
    )
    q = df.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    qcos = F.round(
        _dot(F.col("qv"), F.col("cemb")) / (_norm(F.col("qv")) * _norm(F.col("cemb"))),
        6,
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("qcos").desc(), F.col("cid").asc())
    probes = F.broadcast(
        q.crossJoin(cents)
        .select("query_id", "qv", "cid", qcos.alias("qcos"))
        .withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "qv", F.col("cid").alias("list_id"))
    )
    cands = probes.join(assigned, "list_id").filter(
        F.col("query_id") != F.col(id_col)
    )
    cos = F.round(
        _dot(F.col("qv"), F.col(vec_col)) / (_norm(F.col("qv")) * _norm(F.col(vec_col))), 6
    )
    scored = cands.select(
        "query_id", F.col(id_col).alias("neighbor_id"), cos.alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def lsh_ann_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_planes: int = 8,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: exact cosine rerank restricted to the query's LSH bucket.

    The scale path: candidates shrink ~2^planes-fold vs brute force; recall
    is tunable by n_planes (fewer planes → bigger buckets → higher recall).
    Same output schema as cosine_topk, so callers can A/B the two."""
    bucketed = lsh_buckets(df, n_planes=n_planes, dims=dims, id_col=id_col, vec_col=vec_col)
    q = F.broadcast(
        bucketed.filter(F.col(id_col).isin(query_ids)).select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            F.col("bucket").alias("qbucket"),
        )
    )
    c = bucketed.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), F.col("bucket")
    )
    joined = q.join(c, F.col("qbucket") == F.col("bucket")).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    cos = F.round(_dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))), 6)
    scored = joined.select("query_id", "neighbor_id", cos.alias("cos"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )
