"""Lazy-compiled native beam-search kernel (csrc/beam_search.c).

The search hot loop is per-candidate scalar work (gather 128 floats,
fused diff-square reduction, sorted insert) that numpy can only express
as whole-block vectorized rounds with real dispatch overhead; the
reference engine is native code (src/lib.rs) and its single-node QPS
reflects that. This module compiles the ~150-line C kernel ONCE per
host with the system C compiler (no third-party headers, C99 + libc),
caches the .so under the user cache dir keyed by source hash, and binds
it with ctypes. Everything degrades gracefully: no compiler, a failed
compile, or RDS_NO_NATIVE=1 -> callers fall back to the numpy kernel,
which remains the reference implementation for results (the native
path's output is f64-re-scored against the full-precision vectors, so
final rankings match the numpy kernel's finalization).

Executor-side story: the first task on a host pays the one-time compile
(~1 s); every later task dlopens the cached .so. A race between two
first tasks is harmless (both write the same content-addressed file;
rename is atomic).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "csrc",
                    "beam_search.c")

_lib = None
_tried = False


def _compile() -> str | None:
    try:
        with open(_SRC, "rb") as f:
            src = f.read()
    except OSError:
        return None
    tag = hashlib.sha256(src).hexdigest()[:16]
    # per-user cache dir (mode 0700), NOT bare /tmp: the source hash is
    # public, so a world-writable shared path would let another local user
    # pre-plant a .so that every executor then dlopens (r3 ADVICE). The
    # ownership/permission check below rejects a pre-existing file we
    # didn't create with safe modes.
    uid = os.getuid() if hasattr(os, "getuid") else "u"
    cache_dir = os.path.join(tempfile.gettempdir(), f"rds-{uid}")
    try:
        os.makedirs(cache_dir, mode=0o700, exist_ok=True)
        st_dir = os.stat(cache_dir)
        if hasattr(os, "getuid") and (
            st_dir.st_uid != os.getuid() or st_dir.st_mode & 0o022
        ):
            return None  # squatted or group/other-writable — refuse
    except OSError:
        return None
    so_path = os.path.join(cache_dir, f"rds_beam_{tag}.so")
    if os.path.exists(so_path):
        st = os.stat(so_path)
        if not hasattr(os, "getuid") or (
            st.st_uid == os.getuid() and not st.st_mode & 0o022
        ):
            return so_path
        return None  # not ours / loosely writable — refuse to load
    tmp = so_path + f".tmp{os.getpid()}"
    # -ffast-math: the traversal distance is order-only (squared, f32,
    # re-scored in f64 by the wrapper), so reassociating the reduction
    # for SIMD is safe here.
    # -mprefer-vector-width=512 (first attempt only): GCC's -march=native
    # keeps 256-bit vectors on many AVX-512 parts; full-width lifted the
    # autovectorized f32/convert distance loops 1.15-1.7x on the 1M
    # gather stream (r9 microbench). x86-only flag — non-x86 compilers
    # reject it and fall through to the plain flag set.
    base = ["-O3", "-march=native", "-ffast-math", "-shared", "-fPIC"]
    flag_sets = (["-mprefer-vector-width=512"] + base, base)
    for cc in ("cc", "gcc", "clang"):
        for flags in flag_sets:
            try:
                r = subprocess.run(
                    [cc, *flags, "-o", tmp, _SRC],
                    capture_output=True, timeout=120,
                )
                if r.returncode == 0:
                    os.replace(tmp, so_path)
                    return so_path
            except (OSError, subprocess.TimeoutExpired):
                continue
            finally:
                if os.path.exists(tmp):
                    try:
                        os.remove(tmp)
                    except OSError:
                        pass
    return None


def get_lib():
    """The loaded native library, or None if unavailable/disabled."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("RDS_NO_NATIVE") == "1":
        return None
    so = _compile()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    g = lib.build_collect_batch_c
    g.restype = ctypes.c_longlong
    g.argtypes = [
        ctypes.c_void_p,  # vectors f32
        ctypes.c_int64, ctypes.c_int64,  # n, d
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,  # adj, deg, cap
        ctypes.c_void_p, ctypes.c_int64,  # seeds (nq,S), S
        ctypes.c_void_p, ctypes.c_int64,  # queries, nq
        ctypes.c_int64, ctypes.c_int64,  # beam, pool_cap
        ctypes.c_void_p, ctypes.c_void_p,  # out_ids, out_dist
        ctypes.c_void_p, ctypes.c_int32,  # visit, epoch_base
        ctypes.c_void_p, ctypes.c_void_p,  # ws scratch, pool scratch
    ]
    f = lib.beam_search_batch_c
    f.restype = ctypes.c_longlong
    f.argtypes = [
        ctypes.c_void_p,  # vectors f32 (or NULL)
        ctypes.c_void_p,  # codes i8 (or NULL)
        ctypes.c_int64, ctypes.c_int64,  # n, d
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,  # adj, deg, cap
        ctypes.c_void_p, ctypes.c_int64,  # seeds, n_seeds
        ctypes.c_void_p, ctypes.c_int64,  # queries, nq
        ctypes.c_int64, ctypes.c_int64,  # k, beam
        ctypes.c_void_p, ctypes.c_void_p,  # out_ids, out_dist
        ctypes.c_void_p, ctypes.c_int32,  # visit, epoch_base
        ctypes.c_void_p,  # ws scratch
        ctypes.c_int32,  # mode: 0=l2, 1=hamming, 2=dot
    ]
    _lib = lib
    return _lib


def _ptr(a: np.ndarray | None):
    return a.ctypes.data_as(ctypes.c_void_p) if a is not None else None


MODE_L2 = 0
MODE_HAMMING = 1
MODE_DOT = 2  # traversal distance 1 - a.b (negated inner product)
MODE_COS = 3  # raw cosine: queries pre-normalized, dist 1 - a.q_hat/|a|


def native_beam_batch(
    vectors_f32: np.ndarray | None,
    codes_i8: np.ndarray | None,
    adj: np.ndarray,
    deg: np.ndarray,
    seeds: np.ndarray,
    queries_f32: np.ndarray,
    beam: int,
    mode: int = MODE_L2,
) -> tuple[np.ndarray, np.ndarray] | None:
    """Run the native kernel over a query batch; returns (ids, dists)
    of shape (nq, beam) — the FULL working set per query, -1-padded,
    ordered by traversal (f32) distance. The caller finalizes in f64
    exactly like the numpy kernel (hamming distances are exact integers
    already). With ``mode=MODE_HAMMING``, vectors/queries are int64
    word-packed rows; ``MODE_DOT`` traverses by 1 - a.b over f32 rows;
    ``MODE_COS`` traverses raw f32 rows against UNIT-NORM queries
    (true cosine distance, corpus norms computed in-kernel).
    None if the lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    corpus = codes_i8 if codes_i8 is not None else vectors_f32
    n, d = corpus.shape
    nq = len(queries_f32)
    adj = np.ascontiguousarray(adj, dtype=np.int32)
    deg = np.ascontiguousarray(deg, dtype=np.int32)
    seeds = np.ascontiguousarray(seeds, dtype=np.int64)
    q = np.ascontiguousarray(
        queries_f32, dtype=np.int64 if mode == MODE_HAMMING else np.float32
    )
    out_ids = np.empty((nq, beam), dtype=np.int64)
    out_dist = np.empty((nq, beam), dtype=np.float32)
    # visited BITSET scratch: the kernel memsets ceil(n/64) int64 words
    # per query, so size the allocation in words (an int32[n] array is
    # 4 B short for n == 1)
    visit = np.zeros(max((n + 63) // 64, 1), dtype=np.int64)
    ws = np.zeros((beam + 2) * 32, dtype=np.uint8)  # Cand is 16 B; 2x slack
    done = 0
    while done < nq:
        chunk = min(nq - done, (1 << 31) - 8)
        lib.beam_search_batch_c(
            _ptr(vectors_f32 if codes_i8 is None else None),
            _ptr(codes_i8),
            n, d,
            _ptr(adj), _ptr(deg), adj.shape[1],
            _ptr(seeds), len(seeds),
            _ptr(q[done:done + chunk]), chunk,
            beam, beam,
            _ptr(out_ids[done:done + chunk]),
            _ptr(out_dist[done:done + chunk]),
            _ptr(visit), 0,
            _ptr(ws), mode,
        )
        done += chunk
    return out_ids, out_dist


def native_build_collect(
    vectors_f32: np.ndarray,
    adj: np.ndarray,
    deg: np.ndarray,
    seeds_2d: np.ndarray,
    queries_f32: np.ndarray,
    beam: int,
    pool_cap: int,
) -> tuple[np.ndarray, np.ndarray] | None:
    """Build-path greedy collect (l2): per query returns the pool_cap
    nearest visited candidates as (ids, SQUARED f32 dists), -1 padded,
    heap-ordered (order is irrelevant downstream — robust_prune sorts).
    None if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n, d = vectors_f32.shape
    nq, S = seeds_2d.shape
    adj = np.ascontiguousarray(adj, dtype=np.int32)
    deg = np.ascontiguousarray(deg, dtype=np.int32)
    seeds = np.ascontiguousarray(seeds_2d, dtype=np.int64)
    q = np.ascontiguousarray(queries_f32, dtype=np.float32)
    v = np.ascontiguousarray(vectors_f32, dtype=np.float32)
    out_ids = np.empty((nq, pool_cap), dtype=np.int64)
    out_dist = np.empty((nq, pool_cap), dtype=np.float32)
    # bitset scratch sized in int64 words (see native_beam_batch)
    visit = np.zeros(max((n + 63) // 64, 1), dtype=np.int64)
    ws = np.zeros((beam + 2) * 32, dtype=np.uint8)
    pool = np.zeros((pool_cap + 2) * 32, dtype=np.uint8)
    done = 0
    while done < nq:
        chunk = min(nq - done, (1 << 31) - 8)
        lib.build_collect_batch_c(
            _ptr(v), n, d,
            _ptr(adj), _ptr(deg), adj.shape[1],
            _ptr(seeds[done:done + chunk]), S,
            _ptr(q[done:done + chunk]), chunk,
            beam, pool_cap,
            _ptr(out_ids[done:done + chunk]),
            _ptr(out_dist[done:done + chunk]),
            _ptr(visit), 0,
            _ptr(ws), _ptr(pool),
        )
        done += chunk
    return out_ids, out_dist
