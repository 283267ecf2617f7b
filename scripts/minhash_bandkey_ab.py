"""r10: A/B of the minhash LSH band-key representation.

Old: '|'-joined string of the band's LSH_ROWS signature values
(lsh_band_keys_expr). New: pairwise-packed longs in a struct
(lsh_band_packed_expr). The packing is a bijection of the string key
(signature entries are non-null longs < 2^31 - 1), so the bucket
partition — and the candidate pair set — must be IDENTICAL; this script
first PROVES that on the bench corpus (exact sorted-pair-set compare at
the given SF), then times buckets+pairs both ways (noop sink, cold and
warm, interleaved A/B/A/B so host weather hits both arms) with host
probes bracketing the run.

Usage: python scripts/minhash_bandkey_ab.py [out.json]
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
        else os.path.join(REPO, "scale_runs_r10", "minhash_bandkey_ab.json")
    )
    pre = bench.host_calibration()
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("rds-minhash-bandkey-ab")
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

    docs = spark.read.parquet(
        os.path.join(SF_DIR, "documents.parquet")
    ).select("doc_id", "text")
    dups = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    corpus = docs.unionAll(dups)

    def stages(key_expr_fn) -> dict:
        sigs = DD.minhash_signatures(corpus)
        bands = sigs.select(
            "doc_id",
            F.posexplode(key_expr_fn(F.col("signature"))).alias(
                "band", "band_key"
            ),
        )
        buckets = (
            bands.groupBy("band", "band_key")
            .agg(F.collect_list("doc_id").alias("ids"))
            .filter(F.size("ids") >= 2)
        )
        pairs = DD._blocked_bucket_pairs(buckets, with_simhash=False)
        return {"buckets": buckets, "pairs": pairs}

    arms = {
        "string": TX.lsh_band_keys_expr,
        "packed": TX.lsh_band_packed_expr,
    }

    # --- equivalence proof: exact pair-set equality -----------------------
    spark.sparkContext.setJobDescription("bandkey equivalence")
    sets = {}
    for name, fn in arms.items():
        sets[name] = {
            (r["doc_a"], r["doc_b"])
            for r in stages(fn)["pairs"].distinct().collect()
        }
    identical = sets["string"] == sets["packed"]
    print(
        f"[ab] pair sets identical={identical} "
        f"(string={len(sets['string'])}, packed={len(sets['packed'])})",
        file=sys.stderr,
    )
    if not identical:
        diff = sets["string"] ^ sets["packed"]
        print(f"[ab] DIFF (up to 20): {sorted(diff)[:20]}", file=sys.stderr)

    # --- timing: interleaved cold/warm ------------------------------------
    results: dict[str, dict] = {}
    for run in ("cold", "warm"):
        for name, fn in arms.items():
            dfs = stages(fn)  # rebuilt lineage each run
            for st, df in dfs.items():
                spark.sparkContext.setJobDescription(f"{name} {st} {run}")
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                results.setdefault(name, {})[f"{st}_{run}_sec"] = round(dt, 3)
                print(
                    f"[ab] {name:6s} {st:8s} {run} {dt:7.3f}s",
                    file=sys.stderr,
                )
    spark.stop()
    post = bench.host_calibration()
    doc = {
        "sf_dir": SF_DIR,
        "identical_pairs": identical,
        "n_pairs": len(sets["packed"]),
        "timing": results,
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
