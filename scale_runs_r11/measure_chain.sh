#!/bin/bash
# r11 second-resume measurement chain. Serving points are quiet-gated
# with a bounded wait; on "no quiet window" (exit 75) the measurement
# runs anyway UNGATED — probe5m/profile tag every slice/query with its
# own two-axis validity, so a storm-tagged artifact beats no artifact.
set -u
cd "$(dirname "$0")/.."
OUT=scale_runs_r11

gated() { # gated <outfile> <errfile> -- cmd...
  local out=$1 err=$2; shift 3
  python scripts/quiet_run.py --sleep 30 --max-wait 1200 \
      --attempts-log $OUT/quiet_attempts.jsonl -- "$@" > "$out" 2> "$err"
  if [ $? -eq 75 ]; then
    echo "[chain] no quiet window; running ungated: $out" >> $OUT/chain.log
    "$@" > "$out" 2>> "$err"
  fi
}

RDS_PROBE_MODE=scan RDS_SHARD_PROBES=auto RDS_GROUP_PIECES=1 \
RDS_BEAM_LIST=512 RDS_STEADY_WINDOWS=2 \
  gated $OUT/5m_grouped.json $OUT/5m_grouped.err -- \
  python scripts/probe5m.py /tmp/rds_scale_idx_5000000_sharded 50000

RDS_PROBE_MODE=scan RDS_SHARD_PROBES=auto \
RDS_BEAM_LIST=512 RDS_STEADY_WINDOWS=2 \
  gated $OUT/5m_singleton2.json $OUT/5m_singleton2.err -- \
  python scripts/probe5m.py /tmp/rds_scale_idx_5000000_sharded 50000

RDS_PROBE_MODE=broadcast RDS_BCAST_BUDGET=16g \
RDS_BEAM_LIST=512 RDS_STEADY_WINDOWS=4 \
  gated $OUT/1m_beam512.json $OUT/1m_beam512.err -- \
  python scripts/probe5m.py /tmp/rds_scale_idx_1000000_merged 10000

gated $OUT/profile_after.out $OUT/profile_after.err -- \
  python scripts/profile_r11.py after

python bench.py > $OUT/bench_after.json 2> $OUT/bench_after.err

touch $OUT/chain.done
