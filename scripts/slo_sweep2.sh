#!/bin/bash
# Streaming SLO table, second attempt (r8 verdict item #6): the first
# sweep (slo_1m_r*/slo_5m_r*) ran into an hours-long storm — every
# artifact's calibration flag is False, so those latencies are upper
# bounds, not the table. This re-run targets a quiet window on freshly
# rebuilt same-seed indexes; artifacts are slo2_* so the storm-flagged
# attempt stays recorded.
#   1M merged index: offered {1k, 4k, 8k, 12k} q/s, beam 128, scan-all
#   5M disk index (mmap shard map): offered {600, 1200, 2000}, beam 512,
#   probes auto
set -u
cd "$(dirname "$0")/.."
OUT=scale_runs_r9
SECONDS_PER=${RDS_SLO_SECONDS:-75}

for r in 1000 4000 8000 12000; do
  RDS_STREAM_RATE=$r RDS_BEAM=128 \
    python scripts/quiet_run.py --sleep 30 --max-wait 2400 \
      --attempts-log $OUT/quiet_attempts.jsonl -- \
      python scripts/stream_serve_demo.py /tmp/rds_scale_idx_1000000_merged $SECONDS_PER \
      > $OUT/slo2_1m_r${r}.json 2> $OUT/slo2_1m_r${r}.err
done

for r in 600 1200 2000; do
  RDS_STREAM_RATE=$r RDS_BEAM=512 RDS_STREAM_PROBES=auto \
    python scripts/quiet_run.py --sleep 30 --max-wait 2400 \
      --attempts-log $OUT/quiet_attempts.jsonl -- \
      python scripts/stream_serve_demo.py /tmp/rds_scale_idx_5000000_sharded $SECONDS_PER \
      > $OUT/slo2_5m_r${r}.json 2> $OUT/slo2_5m_r${r}.err
done

touch $OUT/slo_sweep2.done
