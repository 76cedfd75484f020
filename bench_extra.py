"""Auxiliary benchmark for optimization work (bench.py is FROZEN for the
driver's measurement; this file exists so optimization rounds can isolate
pieces of it without touching the measured script — guide §1.4).

Runs the same ops as bench.py with the same seeds/sizes, but lets you pick a
subset and repeat it, so A/B comparisons of library changes are cheap:

  python bench_extra.py maint      # merge + fused + incremental + compact + zorder
  python bench_extra.py pipeline   # the dedup/embed/text ops only (no table build)
  python bench_extra.py all

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, BENCH_N_IMAGES as in bench.py;
BENCHX_REPS (default 1) repeats the chosen part in-process and reports every
sample plus the min (steady-state) — cold (first) vs min separates one-time
JIT/codegen cost from the recurring cost.

Prints ONE JSON line: {"part": ..., "samples": [{name: sec, ...}, ...],
"min": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import time


sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run_maint(spark, sf_dir: str, cpus: int, n_images: int, tag: str) -> dict:
    from pyspark.sql import functions as F

    from moonlink_spark.operators.clustering import cluster
    from moonlink_spark.operators.compaction import CompactionConfig, compact
    from moonlink_spark.operators.merge import merge_into
    from moonlink_spark.operators.optimize import optimize
    from moonlink_spark.sources.fixtures import (
        create_images_table,
        generate_changes_df,
        generate_images_df,
    )

    timings: dict[str, float] = {}

    def timed(name, fn):
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        spark.sparkContext.setJobDescription(None)
        return out

    root = f"/tmp/moonlink_benchx_{tag}"
    shutil.rmtree(root, ignore_errors=True)
    table = create_images_table(spark, root, n_images, seed=42)
    live_bytes = sum(f.file_size_bytes for f in table.data_files())
    target_bytes = max(4 * 1024 * 1024, live_bytes // 128)

    changes_dir = f"/tmp/moonlink_benchx_changes"
    if not os.path.isdir(changes_dir):
        generate_changes_df(spark, n_images, n_images // 5, seed=42).write.parquet(
            changes_dir
        )
    changes = spark.read.parquet(changes_dir)

    timed("merge_cdc", lambda: merge_into(table, changes, run_id=f"bm-{tag}"))
    timed(
        "compact_cluster_fused",
        lambda: optimize(
            table,
            mode="full",
            cluster_by=["phash", "w", "h"],
            run_id=f"bf-{tag}",
            target_bytes=target_bytes,
        ),
    )
    fresh = generate_images_df(spark, max(1000, n_images // 10), seed=77).withColumn(
        "image_id", F.concat(F.lit("fresh-"), F.col("image_id"))
    )
    table.append(fresh, run_id=f"ba-{tag}")
    timed(
        "cluster_incremental",
        lambda: cluster(
            table,
            by=["phash", "w", "h"],
            run_id=f"bi-{tag}",
            scope="incremental",
            target_bytes=target_bytes,
        ),
    )

    root2 = f"/tmp/moonlink_benchx_split_{tag}"
    shutil.rmtree(root2, ignore_errors=True)
    table2 = create_images_table(spark, root2, n_images, seed=42)
    merge_into(table2, changes, run_id=f"bm2-{tag}")
    timed(
        "compact",
        lambda: compact(
            table2,
            CompactionConfig(mode="force_full", target_bytes=target_bytes),
            run_id=f"bc-{tag}",
            max_concurrent_groups=max(4, cpus // 2),
        ),
    )
    timed(
        "cluster_zorder",
        lambda: cluster(
            table2,
            by=["phash", "w", "h"],
            curve="zorder",
            run_id=f"bz-{tag}",
            target_bytes=target_bytes,
        ),
    )
    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(root2, ignore_errors=True)
    return timings


def run_pipeline(spark, sf_dir: str) -> dict:
    from moonlink_spark.pipeline.dedup import exact_dedup, minhash_lsh_pairs, simhash
    from moonlink_spark.pipeline.similarity import cosine_topk, lsh_ann_topk
    from moonlink_spark.pipeline.text import quality_score

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    timings: dict[str, float] = {}

    def timed(name, fn):
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 3)
        spark.sparkContext.setJobDescription(None)

    timed("dedup_exact", lambda: exact_dedup(docs).count())
    timed(
        "dedup_minhash_lsh",
        lambda: minhash_lsh_pairs(
            docs, num_perms=32, bands=8, threshold=0.4, k=3
        ).count(),
    )
    timed("dedup_simhash", lambda: simhash(docs).count())
    timed(
        "embed_cosine_topk", lambda: cosine_topk(emb, list(range(8)), k=5).count()
    )
    timed(
        "embed_lsh_ann",
        lambda: lsh_ann_topk(emb, list(range(8)), k=5, n_planes=8).count(),
    )
    timed("text_quality", lambda: quality_score(docs).count())
    return timings


def main() -> None:
    part = sys.argv[1] if len(sys.argv) > 1 else "all"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("BENCHX_REPS", "1"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1
    n_images = int(os.environ.get("BENCH_N_IMAGES", str(max(2000, int(400_000 * sf)))))

    from moonlink_spark.session import get_spark

    spark = get_spark("bench_extra", cores=cpus)
    samples: list[dict] = []
    for rep in range(reps):
        t: dict[str, float] = {}
        if part in ("maint", "all"):
            t.update(run_maint(spark, sf_dir, cpus, n_images, tag=f"r{rep}"))
        if part in ("pipeline", "all"):
            t.update(run_pipeline(spark, sf_dir))
        samples.append(t)
    mins = {
        k: min(s[k] for s in samples if k in s) for k in samples[0]
    } if samples else {}
    print(
        json.dumps(
            {
                "part": part,
                "sf": sf,
                "reps": reps,
                "loadavg_1m": round(os.getloadavg()[0], 2),
                "samples": samples,
                "min": mins,
                "total_min": round(sum(mins.values()), 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
