#!/bin/bash
# Round-11 scale measurement pipeline (VERDICT r10 items #3 and #4).
# Strictly sequential (r9b: two concurrent 90g build JVMs OOMed the
# 125 GB host). Builds are ungated (not throughput artifacts); every
# serving measurement goes through quiet_run's two-axis gate.
#
#  0) 1M merged M=64/L=128 rebuild (headline config, seed 42)
#  1) gated 1M beam-512 real-broadcast point  -> 1m_beam512.json
#     (item #4: re-pin the matched-recall headline on the r11 code;
#      the broadcast path serves the int8 traversal view + f64 rescore)
#  2) 5M sharded M=64 rebuild (384 requested kmeans shards -> ~408)
#  3) gated 5M scan-mode A/B at 50k queries, beam 512, auto probes:
#     singleton pieces  -> 5m_singleton.json
#     group_pieces=True -> 5m_grouped.json
#     (item #3: piece-group serving measured or cut)
set -u
cd "$(dirname "$0")/.."
OUT=scale_runs_r11

rm -rf /tmp/rds_scale_idx_1000000_merged
RDS_MAX_DEGREE=64 RDS_BUILD_ONLY=1 \
  python scripts/scale_demo.py 1000000 2000 clustered merged \
  > $OUT/1m_build.log 2>&1
python -c 'import json,sys; m=json.load(open(sys.argv[1])); sys.exit(0 if m.get("shard_max_degree")==64 else 1)' \
    /tmp/rds_scale_idx_1000000_merged/metadata.json \
  || { echo "1M build missing or wrong config" >> $OUT/pipeline.log; exit 1; }

RDS_PROBE_MODE=broadcast RDS_BCAST_BUDGET=16g \
RDS_BEAM_LIST=512 RDS_STEADY_WINDOWS=4 \
  python scripts/quiet_run.py --sleep 30 --max-wait 2400 \
    --attempts-log $OUT/quiet_attempts.jsonl -- \
    python scripts/probe5m.py /tmp/rds_scale_idx_1000000_merged 10000 \
    > $OUT/1m_beam512.json 2> $OUT/1m_beam512.err

rm -rf /tmp/rds_scale_idx_5000000_sharded
RDS_MAX_DEGREE=64 RDS_NUM_SHARDS=384 RDS_BUILD_ONLY=1 \
  python scripts/scale_demo.py 5000000 2000 clustered sharded \
  > $OUT/5m_build.log 2>&1
python -c 'import json,sys; m=json.load(open(sys.argv[1])); sys.exit(0 if m.get("max_degree")==64 else 1)' \
    /tmp/rds_scale_idx_5000000_sharded/metadata.json \
  || { echo "5M build missing or wrong config" >> $OUT/pipeline.log; exit 1; }

RDS_PROBE_MODE=scan RDS_SHARD_PROBES=auto \
RDS_BEAM_LIST=512 RDS_STEADY_WINDOWS=2 \
  python scripts/quiet_run.py --sleep 30 --max-wait 2400 \
    --attempts-log $OUT/quiet_attempts.jsonl -- \
    python scripts/probe5m.py /tmp/rds_scale_idx_5000000_sharded 50000 \
    > $OUT/5m_singleton.json 2> $OUT/5m_singleton.err

RDS_PROBE_MODE=scan RDS_SHARD_PROBES=auto RDS_GROUP_PIECES=1 \
RDS_BEAM_LIST=512 RDS_STEADY_WINDOWS=2 \
  python scripts/quiet_run.py --sleep 30 --max-wait 2400 \
    --attempts-log $OUT/quiet_attempts.jsonl -- \
    python scripts/probe5m.py /tmp/rds_scale_idx_5000000_sharded 50000 \
    > $OUT/5m_grouped.json 2> $OUT/5m_grouped.err

touch $OUT/pipeline.done
