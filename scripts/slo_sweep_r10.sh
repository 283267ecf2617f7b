#!/bin/bash
# Streaming SLO table, round-10 attempt (carried from r8 verdict #6; the
# r9 sweeps all landed storm-flagged — latencies were upper bounds only,
# offered rates WERE sustained). Same operating points; artifacts under
# $OUT (default scale_runs_r10).
#   1M merged index: offered {1k, 4k, 8k, 12k} q/s, beam 128, scan-all
#   5M disk index: offered {600, 1200, 2000} q/s, beam 512, probes auto
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-scale_runs_r10}
SECONDS_PER=${RDS_SLO_SECONDS:-75}

for r in 1000 4000 8000 12000; do
  RDS_STREAM_RATE=$r RDS_BEAM=128 \
    python scripts/quiet_run.py --sleep 30 --max-wait 1800 \
      --attempts-log $OUT/quiet_attempts.jsonl -- \
      python scripts/stream_serve_demo.py /tmp/rds_scale_idx_1000000_merged $SECONDS_PER \
      > $OUT/slo_1m_r${r}.json 2> $OUT/slo_1m_r${r}.err
done

for r in 600 1200 2000; do
  RDS_STREAM_RATE=$r RDS_BEAM=512 RDS_STREAM_PROBES=auto \
    python scripts/quiet_run.py --sleep 30 --max-wait 1800 \
      --attempts-log $OUT/quiet_attempts.jsonl -- \
      python scripts/stream_serve_demo.py /tmp/rds_scale_idx_5000000_sharded $SECONDS_PER \
      > $OUT/slo_5m_r${r}.json 2> $OUT/slo_5m_r${r}.err
done

touch $OUT/slo_sweep.done
