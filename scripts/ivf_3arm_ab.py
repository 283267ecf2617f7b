"""r10: 3-arm full-query A/B of the IVF probe-routing/assignment shape.

Arms (module files materialized from git):
  window    — pre-df994b9 (cross-join + row_number window routing)
  unrolled  — df994b9 (narrow literal-array argmin, n_cells unrolled folds)
  transform — working tree (narrow argmin via ONE transform over a
              literal centroid matrix; the hypothesized fix for the
              quiet-window fullprobe regression profile_after measured
              at 13:32: cold 5.06 -> 9.60 s, warm 2.34 -> 8.43 s)

Per arm x query: bench-methodology .count() timing, interleaved
round-robin, RND repeats, plus a separate driver-side planning timer
(executedPlan() on a fresh construction). Row-count parity asserted.

Usage: git show df994b9^:rust_diskann_spark/operators/ivf.py > /tmp/ivf_window.py
       git show 3b27e1f:rust_diskann_spark/operators/ivf.py > /tmp/ivf_unrolled.py
       python scripts/ivf_3arm_ab.py [out.json]
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
from rust_diskann_spark.operators import ivf as IVF_TRANSFORM  # noqa: E402


def _load(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


IVF_WINDOW = _load("ivf_window", "/tmp/ivf_window.py")
IVF_UNROLLED = _load("ivf_unrolled", "/tmp/ivf_unrolled.py")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
K = 10
RND = int(os.environ.get("RDS_AB_ROUNDS", "3"))


def main() -> None:
    out_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(REPO, "scale_runs_r10", "ivf_3arm_ab.json")
    )
    pre = bench.host_calibration()
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("rds-ivf-3arm-ab")
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
        return mod.ivf_knn(
            qset(), corpus(), k=K, metric="l2", n_cells=8, n_probe=8,
            iters=3, seed=42,
        )

    def probe2(mod):
        return mod.ivf_sampled_knn(
            qset(), corpus(), k=K, n_cells=8, n_probe=2, metric="l2"
        )

    arms = {
        "window": IVF_WINDOW,
        "unrolled": IVF_UNROLLED,
        "transform": IVF_TRANSFORM,
    }
    results: dict[str, list[float]] = {}
    probes_mid: list[dict] = []
    for rep in range(RND):
        for qname, qfn in (("fullprobe", fullprobe), ("probe2", probe2)):
            for aname, mod in arms.items():
                key = f"{qname}_{aname}"
                spark.sparkContext.setJobDescription(f"{key} rep{rep}")
                t0 = time.perf_counter()
                n = qfn(mod).count()
                dt = time.perf_counter() - t0
                results.setdefault(key, []).append(round(dt, 3))
                results.setdefault(key + "_rows", []).append(n)
                print(
                    f"[ab] rep{rep} {key:24s} {dt:6.3f}s rows={n}",
                    file=sys.stderr,
                )
        c = bench.host_calibration()
        probes_mid.append(
            {
                "compute_ratio": round(bench.compute_ratio(c), 3),
                "bw_ratio": round(bench.bw_ratio(c), 3),
            }
        )
        print(f"[ab] rep{rep} probe {probes_mid[-1]}", file=sys.stderr)

    # driver-side planning cost of probe2 (the query embedding the
    # argmin expression twice: assignment + routing), fresh construction
    for aname, mod in arms.items():
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            df = qfn = probe2(mod)
            df._jdf.queryExecution().executedPlan()
            ts.append(round(time.perf_counter() - t0, 3))
        results[f"plan_probe2_{aname}"] = ts
        print(f"[ab] plan probe2 {aname}: {ts}", file=sys.stderr)

    spark.stop()
    post = bench.host_calibration()
    doc = {
        "sf_dir": SF_DIR,
        "results": results,
        "probes_mid": probes_mid,
        "probe_pre": {
            "compute_ratio": round(bench.compute_ratio(pre), 3),
            "bw_ratio": round(bench.bw_ratio(pre), 3),
        },
        "probe_post": {
            "compute_ratio": round(bench.compute_ratio(post), 3),
            "bw_ratio": round(bench.bw_ratio(post), 3),
        },
        # r11 (VERDICT r10 item #7): validity ANDs over EVERY probe,
        # including the mid-run ones — the r10 run carried 8-12.7x
        # bandwidth storms between reps while the endpoint-only flag
        # read true
        "valid": (
            bench.probes_quiet(pre, 1.25)
            and bench.probes_quiet(post, 1.25)
            and all(
                p["compute_ratio"] <= 1.25 and p["bw_ratio"] <= bench.BW_GATE
                for p in probes_mid
            )
        ),
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
