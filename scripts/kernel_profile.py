"""Single-process profile of the native beam-search kernel on a real
on-disk index — no Spark, so kernel-level changes can be measured in
isolation from scheduling/Arrow/host-weather effects.

Loads <index_dir> with pyarrow exactly the way materialize_shards
decodes a shard (id-sorted rows, padded adjacency, int8 traversal view),
then times beam_search_batch per beam width and reports single-proc QPS
plus recall@10 against a brute-force GT over a query sample.

Usage: python scripts/kernel_profile.py [index_dir] [n_queries] [beams]
       (defaults: /tmp/rds_scale_idx_1000000_merged 512 "128,512")
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow.dataset as ds

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rust_diskann_spark.core import vamana  # noqa: E402

IDX = sys.argv[1] if len(sys.argv) > 1 else "/tmp/rds_scale_idx_1000000_merged"
NQ = int(sys.argv[2]) if len(sys.argv) > 2 else 512
BEAMS = [int(x) for x in (sys.argv[3] if len(sys.argv) > 3 else "128,512").split(",")]
K = 10
REPS = int(os.environ.get("RDS_PROF_REPS", "3"))
# RDS_PROF_PROCS=32: AFTER the single-proc rows, spawn that many workers
# — each loading its OWN index copy exactly like a Spark python worker
# unpickling the broadcast — and measure kernel-only AGGREGATE
# throughput under real fan-out. This separates DRAM-bandwidth
# contention (which the fan-out measurement shares with the Spark path)
# from Spark/Arrow per-batch overhead (which it excludes).
# NOTE a fork/copy-on-write variant was tried first and measured 2.6x
# SLOWER than independent copies at beam 128 (10.3k vs the r3
# process-based 26k aggregate) — CoW-shared pages are not how the real
# workers hold the index and their TLB behavior is different; don't
# re-introduce fork here.
PROCS = int(os.environ.get("RDS_PROF_PROCS", "0"))

_FAN = {}  # populated per-process by the pool initializer


def _fan_init(idx_dir: str, nq: int) -> None:
    gids, mat, graph, med, ent = load_shard(idx_dir)
    rng = np.random.default_rng(42)
    qidx = rng.choice(len(gids), size=nq, replace=False)
    _FAN.update(
        mat=mat, graph=graph, med=med, qs=mat[qidx],
        sqn=vamana.sq_norms(mat), ent=ent,
        quant=vamana.quantize_corpus(mat),
    )


def _fan_worker(beam: int) -> float:
    mat, graph, med, qs, sqn, ent, quant = (
        _FAN["mat"], _FAN["graph"], _FAN["med"], _FAN["qs"], _FAN["sqn"],
        _FAN["ent"], _FAN["quant"],
    )
    vamana.beam_search_batch(mat, graph, "l2", med, qs[:32], K, beam,
                             sqnorms=sqn, entries=ent, quant=quant)
    t = time.perf_counter()
    for _ in range(REPS):
        vamana.beam_search_batch(mat, graph, "l2", med, qs, K, beam,
                                 sqnorms=sqn, entries=ent, quant=quant)
    return time.perf_counter() - t


def load_shard(idx_dir: str):
    vt = ds.dataset(os.path.join(idx_dir, "vectors.parquet")).to_table(
        columns=["id", "vec"]
    )
    gt = ds.dataset(os.path.join(idx_dir, "graph.parquet")).to_table(
        columns=["id", "neighbors", "medoid", "entries"]
    )
    ids = vt.column("id").combine_chunks().to_numpy().astype(np.int64)
    order = np.argsort(ids, kind="stable")
    gids = ids[order]
    flat = vt.column("vec").combine_chunks().flatten().to_numpy(
        zero_copy_only=False
    )
    n = len(ids)
    mat = flat.reshape(n, flat.size // n).astype(np.float32, copy=False)[order]
    g_ids = gt.column("id").combine_chunks().to_numpy().astype(np.int64)
    og = np.argsort(g_ids, kind="stable")
    nb = gt.column("neighbors").combine_chunks()
    lens = nb.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
    flat_nb = nb.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    # global->local: gids is sorted
    loc = np.searchsorted(gids, flat_nb)
    starts = np.zeros(n + 1, dtype=np.int64)
    starts[1:] = np.cumsum(lens)
    cap = int(lens.max())
    adj = np.full((n, cap), -1, dtype=np.int32)
    deg = np.zeros(n, dtype=np.int32)
    for i_sorted, row in enumerate(og):
        s, e = starts[row], starts[row + 1]
        d = e - s
        adj[i_sorted, :d] = loc[s:e]
        deg[i_sorted] = d
    graph = vamana.Graph(adj=adj, deg=deg)
    med = int(np.searchsorted(gids, int(gt.column("medoid")[0].as_py())))
    ent = np.searchsorted(
        gids, np.asarray(gt.column("entries")[0].as_py(), dtype=np.int64)
    ).astype(np.int64)
    return gids, mat, graph, med, ent


def main() -> None:
    t0 = time.perf_counter()
    gids, mat, graph, med, ent = load_shard(IDX)
    n = len(gids)
    print(f"# loaded n={n} dim={mat.shape[1]} cap={graph.adj.shape[1]} "
          f"in {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    sqn = vamana.sq_norms(mat)
    quant = vamana.quantize_corpus(mat)
    rng = np.random.default_rng(42)
    qidx = rng.choice(n, size=NQ, replace=False)
    qs = mat[qidx]
    # exact GT (blocked matmul, f64)
    gt_ids = np.empty((NQ, K), dtype=np.int64)
    m64 = mat.astype(np.float64)
    q64 = qs.astype(np.float64)
    for i in range(NQ):
        d = np.einsum("ij,ij->i", m64, m64) - 2 * (m64 @ q64[i]) + q64[i] @ q64[i]
        gt_ids[i] = np.lexsort((np.arange(n), d))[:K]
    rows = []
    for beam in BEAMS:
        # warm once, then best-of-REPS
        vamana.beam_search_batch(mat, graph, "l2", med, qs[:32], K, beam,
                                 sqnorms=sqn, entries=ent, quant=quant)
        best = None
        for _ in range(REPS):
            t = time.perf_counter()
            res = vamana.beam_search_batch(
                mat, graph, "l2", med, qs, K, beam,
                sqnorms=sqn, entries=ent, quant=quant,
            )
            dt = time.perf_counter() - t
            best = dt if best is None or dt < best else best
        rec = float(np.mean([
            len(set(r[0].tolist()) & set(g.tolist())) / K
            for r, g in zip(res, gt_ids)
        ]))
        rows.append({
            "beam": beam,
            "single_proc_qps": round(NQ / best, 1),
            "recall_at_10": round(rec, 5),
            "sec_per_rep": round(best, 3),
        })
        print(json.dumps(rows[-1]), file=sys.stderr)
    fan_rows = []
    if PROCS > 1:
        import multiprocessing as mp

        # free the parent's copy before 32 children load theirs
        del mat, graph, sqn, quant, m64, q64
        ctx = mp.get_context("spawn")
        t_pool = time.perf_counter()
        with ctx.Pool(PROCS, initializer=_fan_init, initargs=(IDX, NQ)) as pool:
            # one trivial map forces every initializer to finish loading
            pool.map(_fan_worker, [8] * PROCS)
            print(f"# {PROCS} workers loaded in "
                  f"{time.perf_counter() - t_pool:.0f}s", file=sys.stderr)
            for beam in BEAMS:
                times = pool.map(_fan_worker, [beam] * PROCS)
                work = REPS * NQ
                fan_rows.append(_fan_row(beam, times, work))
                print(json.dumps(fan_rows[-1]), file=sys.stderr)
    calib = None
    try:
        a = np.random.rand(1536, 1536).astype(np.float32)
        t = time.perf_counter()
        for _ in range(10):
            a @ a
        calib = round((time.perf_counter() - t) / 10, 4)
    except Exception:
        pass
    print(json.dumps({"index": IDX, "n": n, "nq": NQ, "rows": rows,
                      "fanout": fan_rows or None,
                      "matmul_1536_f32_sec": calib}))


def _fan_row(beam, times, work):
    return {
        "beam": beam,
        "procs": PROCS,
        # pessimistic: all procs' work / slowest proc (what a
        # barrier-synchronized batch would see)
        "aggregate_qps_by_max": round(PROCS * work / max(times), 1),
        # optimistic: sum of independent per-proc rates (what a
        # saturated independent-stream serving loop would see)
        "aggregate_qps_by_sum": round(sum(work / t for t in times), 1),
        "sec_per_proc_min": round(min(times), 3),
        "sec_per_proc_max": round(max(times), 3),
    }


if __name__ == "__main__":
    main()
