#!/bin/bash
# Retry of the gated 1M beam-512 broadcast point (pipeline step 1 hit
# "no quiet window within --max-wait" during a sustained bw 13-71x
# storm phase; the built index at /tmp/rds_scale_idx_1000000_merged is
# intact, so only the gated serving measurement needs re-running).
set -u
cd "$(dirname "$0")/.."
OUT=scale_runs_r11

RDS_PROBE_MODE=broadcast RDS_BCAST_BUDGET=16g \
RDS_BEAM_LIST=512 RDS_STEADY_WINDOWS=4 \
  python scripts/quiet_run.py --sleep 30 --max-wait 2400 \
    --attempts-log $OUT/quiet_attempts.jsonl -- \
    python scripts/probe5m.py /tmp/rds_scale_idx_1000000_merged 10000 \
    > $OUT/1m_beam512.json 2> $OUT/1m_beam512.err
echo "retry_1m exit=$?"
