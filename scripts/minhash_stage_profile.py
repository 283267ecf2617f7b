"""r10: stage-level decomposition of minhash_lsh_pairs' cold cost.

The r10 before-profile read 13.8 s cold / 0.74 s warm for
minhash_lsh_pairs at sf0.1 while the r9 gated bench measured 2.97 s —
before touching the bucket stage (ObjectHashAggregate collect_list x2)
this script answers WHERE the cold seconds live: signature mapInPandas,
band explode, bucket grouping, blocked pair expansion, or final
distinct. Each stage is timed with the noop sink (guide §1.4), cold
then warm in one bench-config session, with host probes before/after so
a storm-contaminated reading is self-labelling.

Usage: python scripts/minhash_stage_profile.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from rust_diskann_spark import functions as _  # noqa: E402,F401
from rust_diskann_spark.functions import text as TX  # noqa: E402
from rust_diskann_spark.operators import dedup as DD  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    out_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(REPO, "scale_runs_r10", "minhash_stages.json")
    )
    pre = bench.host_calibration()
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("rds-minhash-stages")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "90g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # untimed python-worker prewarm, mirroring bench.py
    spark.range(64).repartition(32).mapInPandas(
        lambda it: (pdf for pdf in it), "id LONG"
    ).count()

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    dups = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    corpus = docs.unionAll(dups)

    def stage_dfs() -> dict:
        sigs = DD.minhash_signatures(corpus)
        bands = sigs.select(
            "doc_id",
            F.posexplode(TX.lsh_band_packed_expr(F.col("signature"))).alias(
                "band", "band_key"
            ),
        )
        buckets = (
            bands.groupBy("band", "band_key")
            .agg(F.collect_list("doc_id").alias("ids"))
            .filter(F.size("ids") >= 2)
        )
        pairs = DD._blocked_bucket_pairs(buckets, with_simhash=False)
        return {
            "sigs": sigs,
            "bands": bands,
            "buckets": buckets,
            "pairs": pairs,
        }

    results: dict[str, dict] = {}
    probes_mid: list[dict] = []
    for run in ("cold", "warm"):
        dfs = stage_dfs()  # rebuilt lineage each run (codegen cache differs)
        for name, df in dfs.items():
            spark.sparkContext.setJobDescription(f"{name} {run}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            results.setdefault(name, {})[f"{run}_noop_sec"] = round(dt, 3)
            print(f"[stages] {name:8s} {run} {dt:7.3f}s", file=sys.stderr)
        probes_mid.append(bench.host_calibration())
    spark.stop()
    post = probes_mid.pop()  # last per-pass probe doubles as the endpoint
    doc = {
        "sf_dir": SF_DIR,
        "stages": results,
        "probe_pre": {
            "compute_ratio": round(bench.compute_ratio(pre), 3),
            "bw_ratio": round(bench.bw_ratio(pre), 3),
        },
        "probes_mid": [
            {
                "compute_ratio": round(bench.compute_ratio(c), 3),
                "bw_ratio": round(bench.bw_ratio(c), 3),
            }
            for c in probes_mid
        ],
        "probe_post": {
            "compute_ratio": round(bench.compute_ratio(post), 3),
            "bw_ratio": round(bench.bw_ratio(post), 3),
        },
        # r11 (VERDICT r10 item #7): AND over every probe incl. mid-run
        "valid": all(
            bench.probes_quiet(c, 1.25) for c in [pre, *probes_mid, post]
        ),
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
