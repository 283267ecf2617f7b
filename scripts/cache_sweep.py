"""Sweep the node-local mmap shard cache for stale tokens.

``DiskANNIndex.close()`` fans cache drops across executors, but the fan
is best-effort (plans/index.py: the scheduler may not visit every node,
and exceptions are swallowed by design). On a long-lived cluster that
leaves dead token directories under ``RDS_SCAN_CACHE_DIR`` — entries
whose source index was rebuilt in place (token changed) or deleted.
This sweeper is the out-of-band janitor the README documents: run it
per node (cron / bootstrap) to list every token with its size, source
index, and liveness, and ``--prune`` the dead ones.

Classification per token directory:

- ``live``     source.json present, index dir exists, recomputed
               :func:`index_token` == token (this cache is servable).
- ``stale``    index dir exists but the recomputed token differs —
               the index was rebuilt in place; this token can never be
               referenced again (tokens are content-derived).
- ``orphan``   recorded source index dir no longer exists.
- ``unknown``  no source.json (pre-sidecar entry or sidecar write
               failed). Never auto-pruned: without provenance the
               sweeper cannot prove deadness (``--prune-unknown``
               opts in, e.g. after a cluster-wide index migration).

``--prune`` removes stale+orphan; exit code is 0 unless pruning failed.
Output: one human line per token on stderr, ONE summary JSON line on
stdout (scriptable, same convention as bench.py).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rust_diskann_spark.operators.shard_cache import (  # noqa: E402
    cache_root,
    index_token,
)


def _dir_bytes(path: str) -> int:
    total = 0
    for dirpath, _dirnames, filenames in os.walk(path):
        for fn in filenames:
            try:
                total += os.path.getsize(os.path.join(dirpath, fn))
            except OSError:
                pass
    return total


def classify(root: str) -> list[dict]:
    """One record per token directory under ``root`` (see module doc)."""
    records = []
    try:
        entries = sorted(os.listdir(root))
    except FileNotFoundError:
        return records
    for name in entries:
        tdir = os.path.join(root, name)
        if not os.path.isdir(tdir):
            continue
        rec = {
            "token": name,
            "bytes": _dir_bytes(tdir),
            "shards": sum(
                1 for d in os.listdir(tdir) if d.startswith("shard_")
            ),
            "source": None,
            "status": "unknown",
        }
        src_path = os.path.join(tdir, "source.json")
        try:
            with open(src_path) as fh:
                src = json.load(fh)["index_path"]
            rec["source"] = src
            if not os.path.isdir(src):
                rec["status"] = "orphan"
            elif index_token(src) == name:
                rec["status"] = "live"
            else:
                rec["status"] = "stale"
        except (OSError, KeyError, ValueError):
            pass  # stays "unknown"
        records.append(rec)
    return records


def sweep(root: str, prune: bool = False,
          prune_unknown: bool = False) -> dict:
    """Classify and optionally prune; returns the summary record."""
    records = classify(root)
    prunable = {"stale", "orphan"} | ({"unknown"} if prune_unknown else set())
    pruned = failed = 0
    for rec in records:
        rec["pruned"] = False
        if prune and rec["status"] in prunable:
            try:
                shutil.rmtree(os.path.join(root, rec["token"]))
                rec["pruned"] = True
                pruned += 1
            except OSError:
                failed += 1
    return {
        "root": root,
        "tokens": records,
        "counts": {
            s: sum(1 for r in records if r["status"] == s)
            for s in ("live", "stale", "orphan", "unknown")
        },
        "bytes_total": sum(r["bytes"] for r in records),
        "bytes_dead": sum(
            r["bytes"] for r in records if r["status"] in ("stale", "orphan")
        ),
        "pruned": pruned,
        "prune_failed": failed,
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--root", default=None,
                    help="cache dir (default: RDS_SCAN_CACHE_DIR or the "
                         "tempdir default, same resolution as the cache)")
    ap.add_argument("--prune", action="store_true",
                    help="remove stale + orphan tokens")
    ap.add_argument("--prune-unknown", action="store_true",
                    help="also remove tokens without provenance")
    args = ap.parse_args()
    root = args.root or cache_root()
    summary = sweep(root, prune=args.prune, prune_unknown=args.prune_unknown)
    for rec in summary["tokens"]:
        print(
            f"[cache_sweep] {rec['token']}  {rec['status']:<7} "
            f"{rec['bytes'] / 1e6:10.1f} MB  {rec['shards']:4d} shards  "
            f"{rec['source'] or '?'}"
            f"{'  PRUNED' if rec['pruned'] else ''}",
            file=sys.stderr,
        )
    print(json.dumps(summary))
    return 1 if summary["prune_failed"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
