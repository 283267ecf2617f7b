"""Out-of-band cache sweeper (scripts/cache_sweep.py): classify token
directories under the scan cache as live/stale/orphan/unknown from the
``source.json`` provenance sidecar, and --prune only provably-dead ones.
No Spark needed — the sweeper works from fabricated on-disk state, which
is exactly the state it meets on a node where close() never ran."""

import importlib.util
import json
import os
import sys

from rust_diskann_spark.operators.shard_cache import (
    index_token,
    record_source,
)

_spec = importlib.util.spec_from_file_location(
    "cache_sweep",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "cache_sweep.py"),
)
cache_sweep = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_spec and cache_sweep)


def _fake_index(base, name, payload=b"x" * 64):
    """A directory shaped like an index as far as index_token cares:
    metadata.json plus the two parquet subtrees (stat-digested)."""
    idx = base / name
    for sub in ("vectors.parquet", "graph.parquet"):
        (idx / sub).mkdir(parents=True)
        (idx / sub / "part-0.parquet").write_bytes(payload)
    (idx / "metadata.json").write_text(json.dumps({"dim": 4, "seed": 1}))
    return str(idx)


def _populate(root, token, index_path, shards=2):
    for sid in range(shards):
        d = os.path.join(root, token, f"shard_{sid}")
        os.makedirs(d)
        with open(os.path.join(d, "meta.json"), "w") as fh:
            fh.write('{"n": 0}')
    record_source(root, token, index_path)


def test_sweep_classifies_and_prunes_only_dead(tmp_path):
    root = str(tmp_path / "cache")

    live_idx = _fake_index(tmp_path, "idx_live")
    live_tok = index_token(live_idx)
    _populate(root, live_tok, live_idx)

    # stale: populate under the CURRENT token, then rebuild in place
    # (rewrite metadata -> token changes; the old token dir is dead)
    stale_idx = _fake_index(tmp_path, "idx_stale")
    stale_tok = index_token(stale_idx)
    _populate(root, stale_tok, stale_idx)
    os.utime(
        os.path.join(stale_idx, "metadata.json"), ns=(1, 1)
    )  # mtime is folded into the token
    assert index_token(stale_idx) != stale_tok

    # orphan: source index deleted after populate
    orphan_idx = _fake_index(tmp_path, "idx_orphan")
    orphan_tok = index_token(orphan_idx)
    _populate(root, orphan_tok, orphan_idx)
    import shutil

    shutil.rmtree(orphan_idx)

    # unknown: token dir without provenance (pre-sidecar entry)
    os.makedirs(os.path.join(root, "feedfeedfeedfeed", "shard_0"))

    summary = cache_sweep.sweep(root, prune=False)
    by_tok = {r["token"]: r["status"] for r in summary["tokens"]}
    assert by_tok[live_tok] == "live"
    assert by_tok[stale_tok] == "stale"
    assert by_tok[orphan_tok] == "orphan"
    assert by_tok["feedfeedfeedfeed"] == "unknown"
    assert summary["counts"] == {
        "live": 1, "stale": 1, "orphan": 1, "unknown": 1
    }
    assert summary["bytes_dead"] > 0
    # dry run prunes nothing
    assert sorted(os.listdir(root)) == sorted(
        [live_tok, stale_tok, orphan_tok, "feedfeedfeedfeed"]
    )

    summary = cache_sweep.sweep(root, prune=True)
    assert summary["pruned"] == 2 and summary["prune_failed"] == 0
    # live + unknown survive; stale + orphan are gone
    assert sorted(os.listdir(root)) == sorted([live_tok, "feedfeedfeedfeed"])

    summary = cache_sweep.sweep(root, prune=True, prune_unknown=True)
    assert summary["pruned"] == 1
    assert os.listdir(root) == [live_tok]


def test_sweep_missing_root_is_empty(tmp_path):
    summary = cache_sweep.sweep(str(tmp_path / "nope"))
    assert summary["tokens"] == [] and summary["pruned"] == 0


def test_record_source_idempotent_and_crash_safe(tmp_path):
    root = str(tmp_path / "cache")
    idx = _fake_index(tmp_path, "idx")
    tok = index_token(idx)
    record_source(root, tok, idx)
    first = os.path.join(root, tok, "source.json")
    with open(first) as fh:
        assert json.load(fh)["index_path"] == os.path.abspath(idx)
    # second call with a DIFFERENT path must not overwrite (first-touch
    # provenance wins; concurrent decoders race benignly)
    record_source(root, tok, str(tmp_path))
    with open(first) as fh:
        assert json.load(fh)["index_path"] == os.path.abspath(idx)
    # no temp litter
    assert all(
        not f.startswith("source.json.tmp") for f in os.listdir(os.path.join(root, tok))
    )


def test_cli_json_line(tmp_path, capsys, monkeypatch):
    root = str(tmp_path / "cache")
    idx = _fake_index(tmp_path, "idx")
    _populate(root, index_token(idx), idx)
    monkeypatch.setattr(sys, "argv", ["cache_sweep.py", "--root", root])
    assert cache_sweep.main() == 0
    out = capsys.readouterr().out.strip().splitlines()
    rec = json.loads(out[-1])
    assert rec["counts"]["live"] == 1 and rec["root"] == root
