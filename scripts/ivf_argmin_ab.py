"""r10: locate the IVF regression introduced by the narrow literal-array
argmin (df994b9). profile_after read fullprobe warm 2.34 -> 8.43 s and
probe2 cold 2.44 -> 8.66 s in a quiet window — this script A/Bs the
routing/assignment stage in isolation, three repeats per arm, and
separately times plan compilation (analysis+optimization+codegen prep)
vs execution so "driver-side mega-expression planning" and "interpreted
per-row eval on too few tasks" are distinguishable.

Arms:
  narrow      — _probes_narrow as shipped (literal array argmin)
  narrow_par  — same, after repartition(32) of the query side
  window      — the r9 cross-join + row_number window shape
  assign_*    — same three arms for the ivf_sampled_knn assignment

Usage: python scripts/ivf_argmin_ab.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from rust_diskann_spark.functions.distance import distance_expr  # noqa: E402
from rust_diskann_spark.operators import ivf as IVF  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_CELLS = 8


def main() -> None:
    out_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(REPO, "scale_runs_r10", "ivf_argmin_ab.json")
    )
    pre = bench.host_calibration()
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("rds-ivf-argmin-ab")
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
    vectors = emb.select(
        F.col("vec_id").alias("id"),
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "vec"
        ),
    )
    q = emb.select(
        F.col("vec_id").cast("long").alias("query_id"),
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "qv"
        ),
    )
    cent_rows = [
        (int(r["cell"]), [float(x) for x in r["centroid"]])
        for r in IVF.sampled_centroids_df(vectors, N_CELLS).collect()
    ]
    cdf_rows = [(i, v) for i, v in cent_rows]

    def probes_narrow(src):
        return IVF._probes_narrow(src, cent_rows, "l2", N_CELLS)

    def probes_narrow_par(src):
        return IVF._probes_narrow(src.repartition(32), cent_rows, "l2", N_CELLS)

    def probes_window(src):
        cdf = spark.createDataFrame(
            cdf_rows, "cell INT, centroid ARRAY<DOUBLE>"
        )
        dprobe = distance_expr("l2", F.col("qv"), F.col("centroid"))
        wprobe = Window.partitionBy("query_id").orderBy("cd", "cell")
        return (
            src.crossJoin(F.broadcast(cdf))
            .withColumn("cd", dprobe)
            .withColumn("crank", F.row_number().over(wprobe))
            .filter(F.col("crank") <= N_CELLS)
            .select("query_id", "qv", "cell")
        )

    def assign_narrow(src):
        # as shipped (module): single-transform candidates
        a_cand = IVF._cell_cand_expr(F.col("vec"), cent_rows, "l2")
        return src.select(
            F.array_min(a_cand)["cell"].alias("cell"), "id", "vec"
        )

    def assign_narrow8(src):
        # the df994b9 shape: n_cells independent literal folds
        a_cand = F.array(
            *[
                F.struct(
                    distance_expr("l2", F.col("vec"), F.lit(vec)).alias("ad"),
                    F.lit(int(cell)).cast("int").alias("cell"),
                )
                for cell, vec in cent_rows
            ]
        )
        return src.select(
            F.array_min(a_cand)["cell"].alias("cell"), "id", "vec"
        )

    def probes_narrow8(src):
        cand = F.array(
            *[
                F.struct(
                    distance_expr("l2", F.col("qv"), F.lit(vec)).alias("cd"),
                    F.lit(int(cell)).cast("int").alias("cell"),
                )
                for cell, vec in cent_rows
            ]
        )
        return src.withColumn(
            "_p", F.explode(F.slice(F.array_sort(cand), 1, N_CELLS))
        ).select("query_id", "qv", F.col("_p.cell").alias("cell"))

    def assign_narrow_par(src):
        return assign_narrow(src.repartition(32))

    def assign_window(src):
        cdf = spark.createDataFrame(
            cdf_rows, "cell INT, centroid ARRAY<DOUBLE>"
        )
        d = distance_expr("l2", F.col("vec"), F.col("centroid"))
        w = Window.partitionBy("id").orderBy("ad", "cell")
        return (
            src.crossJoin(F.broadcast(cdf))
            .withColumn("ad", d)
            .withColumn("arank", F.row_number().over(w))
            .filter(F.col("arank") == 1)
            .select("cell", "id", "vec")
        )

    arms = {
        "probes_narrow": (probes_narrow, q),
        "probes_narrow8": (probes_narrow8, q),
        "probes_narrow_par": (probes_narrow_par, q),
        "probes_window": (probes_window, q),
        "assign_narrow": (assign_narrow, vectors),
        "assign_narrow8": (assign_narrow8, vectors),
        "assign_narrow_par": (assign_narrow_par, vectors),
        "assign_window": (assign_window, vectors),
    }
    results: dict[str, dict] = {}
    for rep in range(3):
        for name, (fn, src) in arms.items():
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.perf_counter()
            df = fn(src)
            # force analysis + optimization + physical planning only
            df._jdf.queryExecution().executedPlan()
            t_plan = time.perf_counter() - t0
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t_exec = time.perf_counter() - t0
            r = results.setdefault(name, {"plan_sec": [], "exec_sec": []})
            r["plan_sec"].append(round(t_plan, 3))
            r["exec_sec"].append(round(t_exec, 3))
            print(
                f"[ab] rep{rep} {name:20s} plan={t_plan:6.3f}s "
                f"exec={t_exec:6.3f}s",
                file=sys.stderr,
            )
    # row-count sanity: arms must agree
    counts = {
        name: fn(src).count() for name, (fn, src) in arms.items()
    }
    print(f"[ab] counts: {counts}", file=sys.stderr)
    spark.stop()
    post = bench.host_calibration()
    doc = {
        "sf_dir": SF_DIR,
        "n_cells": N_CELLS,
        "results": results,
        "counts": counts,
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
