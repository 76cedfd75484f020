"""Pipeline-operator tests: planted duplicates must be found, similar docs
must hash close, decode must invert encode (SURVEY.md §5 model: golden
scenario tests per operator)."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from moonlink_spark.pipeline.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    simhash,
)
from moonlink_spark.pipeline.similarity import cosine_topk, lsh_ann_topk, lsh_buckets
from moonlink_spark.pipeline.text import lang_id, quality_score, token_stats


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the old stone bridge"
    near = "the quick brown fox jumps over the lazy cat near the old stone bridge"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, near),  # near dup of 0 (1 word changed)
        (3, "completely different words about spark shuffle partitions and skew"),
        (4, "another unrelated document discussing parquet footers and manifests"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups(spark):
    out = exact_dedup(_docs(spark)).orderBy("keeper_id").collect()
    groups = {r["keeper_id"]: r["dup_count"] for r in out}
    assert groups[0] == 2  # docs 0 and 1 collapse
    assert groups[2] == 1 and groups[3] == 1 and groups[4] == 1


def test_jaccard_finds_near_dup(spark):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
             jaccard_pairs(_docs(spark), k=3, threshold=0.3).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and 0.5 < pairs[(0, 2)] < 1.0
    assert (0, 3) not in pairs


def test_minhash_lsh_finds_planted_dups(spark):
    pairs = {(r["doc_a"], r["doc_b"]) for r in
             minhash_lsh_pairs(_docs(spark), num_perms=16, bands=8,
                               threshold=0.3, k=3).collect()}
    assert (0, 1) in pairs and (1, 2) in pairs and (0, 2) in pairs
    assert not any(3 in p or 4 in p for p in pairs)


def test_minhash_identical_docs_identical_sigs(spark):
    sigs = minhash_signatures(_docs(spark), num_perms=8, k=3).collect()
    by_doc = {}
    for r in sigs:
        by_doc.setdefault(r["id"], {})[r["perm"]] = r["minhash"]
    assert by_doc[0] == by_doc[1]
    assert by_doc[0] != by_doc[3]


def test_simhash_hamming_locality(spark):
    out = {r["id"]: r["simhash"] for r in simhash(_docs(spark)).collect()}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 60) - 1)).count("1")

    assert ham(out[0], out[1]) == 0          # identical docs
    assert ham(out[0], out[2]) < ham(out[0], out[3])  # near-dup closer than unrelated


def _vectors(spark, n=60, dims=16, seed=7):
    rng = np.random.Generator(np.random.PCG64(seed))
    rows = []
    for i in range(n):
        v = rng.normal(size=dims)
        rows.append((i, [float(x) for x in v]))
    # vector n is a tiny perturbation of vector 0 -> must be its top neighbor
    v0 = np.array(rows[0][1])
    rows.append((n, [float(x) for x in (v0 + 0.001 * rng.normal(size=dims))]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_cosine_topk_finds_planted_neighbor(spark):
    df = _vectors(spark)
    top = cosine_topk(df, [0], k=3).orderBy("rank").collect()
    assert top[0]["neighbor_id"] == 60 and top[0]["cos"] > 0.999


def test_lsh_bucket_collision_for_near_identical(spark):
    df = _vectors(spark)
    b = {r["vec_id"]: r["bucket"] for r in
         lsh_buckets(df, n_planes=8, dims=16).collect()}
    assert b[0] == b[60]  # near-identical vectors share every hyperplane side


def test_lsh_ann_recovers_planted_neighbor(spark):
    df = _vectors(spark)
    top = lsh_ann_topk(df, [0], k=3, n_planes=8, dims=16).orderBy("rank").collect()
    assert top and top[0]["neighbor_id"] == 60


def test_text_ops_shapes(spark):
    docs = _docs(spark)
    ts = token_stats(docs).collect()
    assert all(r["ws_tokens"] > 0 and r["re_tokens"] >= r["ws_tokens"] - 1 for r in ts)
    q = quality_score(docs).collect()
    assert all(0.0 <= r["quality"] <= 1.0 for r in q)
    li = lang_id(docs).collect()
    assert all(r["pred_lang"] == "en" for r in li)  # 'the' markers dominate


def test_decode_roundtrip_invariants(spark):
    from moonlink_spark.pipeline.multimodal import decode_stats, resize_images
    from moonlink_spark.sources.fixtures import generate_images_df

    imgs = generate_images_df(spark, 50, seed=42)
    stats = decode_stats(imgs).join(imgs.select("image_id", "w", "h", "phash"), "image_id")
    rows = stats.collect()
    assert len(rows) == 50
    for r in rows:
        assert r["dec_w"] == r["w"] and r["dec_h"] == r["h"]
        # phash from decoded pixels matches stored phash for lossless rows;
        # lossy rows may flip a few of the 64 bits (quantization)
    # fixtures overwrite the TOP 16 phash bits with hot prefixes for ~20% of
    # rows (skew driver) — the low 48 bits always come from the pixels
    mask = (1 << 48) - 1
    lossless = decode_stats(imgs.filter(F.col("fmt") == "png")).join(
        imgs.select("image_id", "phash"), "image_id").collect()
    assert all((r["dec_phash"] & mask) == (r["phash"] & mask) for r in lossless)

    resized = resize_images(imgs, 8, 8).collect()
    assert all(r["w"] == 8 and r["h"] == 8 for r in resized)
    from moonlink_spark.functions.image import decode_image
    px = decode_image(bytes(resized[0]["bytes"]))
    assert px.shape == (8, 8, 3)


def test_multimodal_stubs_raise(spark):
    from moonlink_spark.pipeline.multimodal import (
        extract_audio_features,
        sample_video_frames,
    )

    with pytest.raises(NotImplementedError):
        sample_video_frames(None)
    with pytest.raises(NotImplementedError):
        extract_audio_features(None)


def test_connected_components_chain_and_islands(spark):
    """Chain 1-2-3 collapses to one group labeled by its min id; separate
    pair (7,9) forms its own; docs with no edges don't appear."""
    from moonlink_spark.pipeline.dedup import connected_components

    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (7, 9), (3, 5)], "doc_a long, doc_b long"
    )
    for algo in ("star", "label"):
        got = {
            (r["id"], r["group_id"])
            for r in connected_components(edges, algorithm=algo).collect()
        }
        assert got == {(1, 1), (2, 1), (3, 1), (5, 1), (7, 7), (9, 7)}, algo


def test_connected_components_star_long_chain_and_random(spark):
    """The star algorithm converges in O(log diameter) rounds: a 300-node
    chain (diameter 299) must finish within 12 alternating rounds — label
    propagation would need 299 — and on a seeded random multi-component
    graph both algorithms produce identical labels."""
    import random

    from moonlink_spark.pipeline.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(300)], "doc_a long, doc_b long"
    )
    got = {
        (r["id"], r["group_id"])
        for r in connected_components(chain, max_iterations=12).collect()
    }
    assert got == {(i, 0) for i in range(301)}

    rng = random.Random(7)
    edges = [
        (rng.randrange(base, base + 40), rng.randrange(base, base + 40))
        for base in (0, 1000, 2000)
        for _ in range(25)
    ]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    star = {
        (r["id"], r["group_id"])
        for r in connected_components(df, algorithm="star").collect()
    }
    label = {
        (r["id"], r["group_id"])
        for r in connected_components(df, algorithm="label").collect()
    }
    assert star == label and star


def test_connected_components_property_star_equals_reachability(spark):
    """Property test (hypothesis): on arbitrary small graphs the star
    algorithm's labels equal a brute-force reachability oracle computed in
    plain Python. Shrinking finds minimal counterexamples if the
    join/groupBy formulation ever diverges from the math."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from moonlink_spark.pipeline.dedup import connected_components

    def brute_labels(edges):
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        labels = {}
        for start in adj:
            if start in labels:
                continue
            comp, todo = set(), [start]
            while todo:
                n = todo.pop()
                if n in comp:
                    continue
                comp.add(n)
                todo.extend(adj[n])
            m = min(comp)
            for n in comp:
                labels[n] = m
        return labels

    @settings(max_examples=12, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(st.lists(st.tuples(st.integers(0, 20), st.integers(0, 20)),
                    min_size=1, max_size=30))
    def check(edges):
        df = spark.createDataFrame(edges, "doc_a long, doc_b long")
        got = {
            (r["id"], r["group_id"])
            for r in connected_components(df, algorithm="star").collect()
        }
        want = {
            (n, lbl)
            for n, lbl in brute_labels([e for e in edges if e[0] != e[1]]).items()
        }
        assert got == want

    check()


def test_hamming_near_dup_pairs_phash(spark):
    """Banded Hamming search on a precomputed fingerprint column finds
    exactly the planted 2-bit-flip variants (and a 0-distance exact dup),
    and never pairs distant hashes; radius > bands-1 is rejected."""
    import pytest

    from moonlink_spark.pipeline.dedup import hamming_near_dup_pairs

    base = 0x0F0F0F0F0F0F0F
    rows = [
        ("a", base),
        ("a2", base ^ 0b11),                 # distance 2 -> pair
        ("a3", base),                        # distance 0 -> pair
        ("far", base ^ ((1 << 40) - 1)),     # distance 40 -> no pair
    ]
    df = spark.createDataFrame(rows, "image_id string, phash long")
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in hamming_near_dup_pairs(df, radius=3, bands=4).collect()
    }
    assert got == {("a", "a2", 2), ("a", "a3", 0), ("a2", "a3", 2)}
    with pytest.raises(ValueError):
        hamming_near_dup_pairs(df, radius=4, bands=4)


def test_dedup_groups_planted_cluster(spark):
    """Exact+near dup docs 0/1/2 form ONE group keyed by min id 0."""
    from moonlink_spark.pipeline.dedup import dedup_groups

    groups = {
        r["doc_id"]: r["group_id"]
        for r in dedup_groups(_docs(spark), num_perms=16, bands=8, threshold=0.3, k=3).collect()
    }
    assert groups.get(0) == 0 and groups.get(1) == 0 and groups.get(2) == 0
    assert 3 not in groups and 4 not in groups


def test_deterministic_sample_nested_and_stable(spark):
    """Same seed: rate 0.1 sample ⊂ rate 0.3 sample; repartitioning never
    changes membership (hash-based, not order-based)."""
    from moonlink_spark.pipeline.sampling import deterministic_sample

    df = spark.range(5000).select(F.col("id").alias("doc_id"))
    s1 = {r["doc_id"] for r in deterministic_sample(df, 0.1, seed=3).collect()}
    s3 = {r["doc_id"] for r in deterministic_sample(df, 0.3, seed=3).collect()}
    assert s1 <= s3
    assert 0.05 < len(s1) / 5000 < 0.15 and 0.25 < len(s3) / 5000 < 0.35
    again = {
        r["doc_id"]
        for r in deterministic_sample(df.repartition(17), 0.1, seed=3).collect()
    }
    assert again == s1


def test_stratified_sample_rates(spark):
    from moonlink_spark.pipeline.sampling import stratified_sample

    df = spark.range(9000).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("a"), F.lit("b"), F.lit("c")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("lang"),
    )
    out = stratified_sample(
        df, rates={"a": 0.5, "b": 0.0}, strata_col="lang",
        default_rate=0.1, seed=5,
    )
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert 1200 < counts.get("a", 0) < 1800      # ~50% of 3000
    assert "b" not in counts                     # rate 0 drops the stratum
    assert 150 < counts.get("c", 0) < 450        # ~10% of 3000


def test_simhash_pairs_banded_exact(spark):
    """Exact dup -> hamming 0 pair; near dup within radius found through the
    banded buckets; unrelated docs absent; radius > bands-1 rejected."""
    import pytest as _pytest

    from moonlink_spark.pipeline.dedup import simhash_pairs

    out = simhash_pairs(_docs(spark), radius=3, bands=4)
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in out.collect()}
    assert got.get((0, 1)) == 0  # exact duplicate
    assert all(a in (0, 1, 2) and b in (0, 1, 2) for a, b in got)
    with _pytest.raises(ValueError):
        simhash_pairs(_docs(spark), radius=5, bands=4)


def test_pack_shards_prefix_sum_and_partition_invariance(spark):
    """Shard assignment equals the sequential definition and is identical
    at any parallelism (the two-phase distributed prefix-sum)."""
    from moonlink_spark.pipeline.packing import pack_shards

    rows = [(i, " ".join(["w"] * (3 + i % 7))) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def seq_oracle(budget):
        cum, out = 0, {}
        for i, txt in rows:
            nt = len(txt.split())
            out[i] = (nt, cum // budget)
            cum += nt
        return out

    for parts in (1, 5):
        got = {
            r["doc_id"]: (r["n_tokens"], r["shard_id"])
            for r in pack_shards(df, budget_tokens=50, num_partitions=parts).collect()
        }
        assert got == seq_oracle(50), f"parts={parts}"
