#!/bin/bash
# Round-9 clean-window measurement pipeline (fresh-boot host, load < 1).
# Strictly sequential: the first attempt ran the 1M and 5M rebuilds
# concurrently and the two 90g JVMs OOMed the 125 GB host
# (5m_build_oom.log, RpcEndpointNotFoundException after the context died
# mid-generation). Both rebuilds pin the r8/r9 headline config explicitly
# (RDS_MAX_DEGREE=64; 384 requested kmeans shards at 5M -> 408 stored
# after cap-split): the first 1M attempt here silently built the M=32
# ablation config because the knob wasn't set (1m_build_m32_default.log).
set -u
cd "$(dirname "$0")/.."
OUT=scale_runs_r9b

# 0) 1M rebuild at the headline config. NOTE: RDS_REUSE_IDX=1 with a
# MISMATCHED index on disk is a SystemExit telling the operator to
# rebuild, not an automatic rebuild — the first pipeline launch left the
# M=32 index in place, step 0 aborted, and step 1 started measuring the
# wrong graph before it was caught. The stale dir is removed up front
# and each build is now followed by a config assertion.
rm -rf /tmp/rds_scale_idx_1000000_merged
RDS_MAX_DEGREE=64 RDS_BUILD_ONLY=1 \
  python scripts/scale_demo.py 1000000 2000 clustered merged \
  > $OUT/1m_build_m64.log 2>&1
# exact-equality check via json (r9 ADVICE: the old unanchored grep for
# '"shard_max_degree": 64' also matched 640/641 etc.)
python -c 'import json,sys; m=json.load(open(sys.argv[1])); sys.exit(0 if m.get("shard_max_degree")==64 else 1)' \
    /tmp/rds_scale_idx_1000000_merged/metadata.json \
  || { echo "1M build missing or wrong config" >> $OUT/pipeline.log; exit 1; }

# 1) 1M broadcast-residency beam curve, gated. r9's session measured
# 12,435 @ 128 / 8,574 @ 512 between storms; this re-pins the curve —
# including the 192/256/384 frontier never measured on the real-broadcast
# path — in a known-quiet window with 4 slices per point.
RDS_PROBE_MODE=broadcast RDS_BCAST_BUDGET=16g \
RDS_BEAM_LIST=128,192,256,384,512 RDS_STEADY_WINDOWS=4 \
  python scripts/quiet_run.py --sleep 30 --max-wait 1200 \
    --attempts-log $OUT/quiet_attempts.jsonl -- \
    python scripts/probe5m.py /tmp/rds_scale_idx_1000000_merged 10000 \
    > $OUT/1m_bcast_beams.json 2> $OUT/1m_bcast_beams.err

# 2) 5M rebuild (same seed/config as r8/r9: 384 requested kmeans shards).
RDS_MAX_DEGREE=64 RDS_NUM_SHARDS=384 RDS_BUILD_ONLY=1 \
  python scripts/scale_demo.py 5000000 2000 clustered sharded \
  > $OUT/5m_build2.log 2>&1
python -c 'import json,sys; m=json.load(open(sys.argv[1])); sys.exit(0 if m.get("max_degree")==64 else 1)' \
    /tmp/rds_scale_idx_5000000_sharded/metadata.json \
  || { echo "5M build missing or wrong config" >> $OUT/pipeline.log; exit 1; }

# 3) 5M per-shard beam sweep at 50k batches — the untried lever for the
# >=4k q/s bar. The serving beam (512) was inherited from the 1M/
# reference config; each probed task beam-searches a 10-30k-row shard
# graph, where the knee should sit far below 512 (100k corpus needed 48
# for 0.995), and the 0.9922 recall plateau is routing-limited (tau
# sweep: recall identical at every probe threshold).
RDS_BEAM_LIST=96,128,192,256,384,512 RDS_STEADY_WINDOWS=2 \
  python scripts/quiet_run.py --sleep 30 --max-wait 1200 \
    --attempts-log $OUT/quiet_attempts.jsonl -- \
    python scripts/probe5m.py /tmp/rds_scale_idx_5000000_sharded 50000 \
    > $OUT/5m_beam_sweep.json 2> $OUT/5m_beam_sweep.err

touch $OUT/pipeline.done
