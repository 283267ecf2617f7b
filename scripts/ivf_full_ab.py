"""r10: full-query A/B of the IVF narrow literal-argmin (df994b9) vs the
r9 window shape. The isolated-stage A/B (ivf_argmin_ab.json) showed the
narrow shape wins on exec (~0.18 vs ~0.7 s) but pays ~0.7 s of Catalyst
planning per construction; profile_after still read fullprobe warm
2.34 -> 8.43 s, so the cost must multiply in the full ivf_knn /
ivf_sampled_knn composition (AQE re-optimizes the logical plan per query
stage, and each re-optimization re-processes every embedded literal
mega-expression). This script imports BOTH module versions (HEAD and the
pre-df994b9 file from git, materialized to /tmp) and times the two
declared queries end-to-end, interleaved, three repeats.

Usage: git show df994b9^:rust_diskann_spark/operators/ivf.py > /tmp/ivf_old.py
       python scripts/ivf_full_ab.py [out.json]
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from rust_diskann_spark.operators import ivf as IVF_NEW  # noqa: E402

spec = importlib.util.spec_from_file_location("ivf_old", "/tmp/ivf_old.py")
IVF_OLD = importlib.util.module_from_spec(spec)
spec.loader.exec_module(IVF_OLD)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
K = 10
RND = 4


def main() -> None:
    out_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(REPO, "scale_runs_r10", "ivf_full_ab.json")
    )
    pre = bench.host_calibration()
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("rds-ivf-full-ab")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "90g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(64).repartition(32).mapInPandas(
        lambda it: (pdf for pdf in it), "id LONG"
    ).count()

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))

    def qset():
        return emb.select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
        )

    def corpus():
        return emb.select(
            F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
        )

    def fullprobe(mod):
        res = mod.ivf_knn(
            qset(), corpus(), k=K, metric="l2", n_cells=8, n_probe=8,
            iters=2, seed=42,
        )
        return res.select(
            "query_id", "rank", "id",
            (F.round("dist", RND) + F.lit(0.0)).alias("dist"),
        )

    def probe2(mod):
        res = mod.ivf_sampled_knn(
            qset(), corpus(), k=K, n_cells=8, n_probe=2, metric="l2"
        )
        return res.select(
            "query_id", "rank", "id",
            (F.round("dist", RND) + F.lit(0.0)).alias("dist"),
        )

    arms = {
        "fullprobe_new": lambda: fullprobe(IVF_NEW),
        "fullprobe_old": lambda: fullprobe(IVF_OLD),
        "probe2_new": lambda: probe2(IVF_NEW),
        "probe2_old": lambda: probe2(IVF_OLD),
    }
    results: dict[str, list] = {}
    for rep in range(3):
        for name, fn in arms.items():
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.perf_counter()
            fn().count()  # bench methodology: construction + count
            dt = time.perf_counter() - t0
            results.setdefault(name, []).append(round(dt, 3))
            print(f"[ab] rep{rep} {name:16s} {dt:7.3f}s", file=sys.stderr)
    spark.stop()
    post = bench.host_calibration()
    doc = {
        "sf_dir": SF_DIR,
        "results": results,
        "probe_pre": {
            "compute_ratio": round(bench.compute_ratio(pre), 3),
            "bw_ratio": round(bench.bw_ratio(pre), 3),
        },
        "probe_post": {
            "compute_ratio": round(bench.compute_ratio(post), 3),
            "bw_ratio": round(bench.bw_ratio(post), 3),
        },
        "valid": bench.probes_quiet(pre, 1.25) and bench.probes_quiet(post, 1.25),
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
