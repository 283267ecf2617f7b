#!/bin/bash
# Round-10 measurement pipeline. Strictly sequential (one JVM at a time;
# the r9b concurrent-rebuild OOM is the standing reason). Both scale
# indexes survived on /tmp from r9b at the headline configs (verified
# via metadata.json at session start: 1M merged shard_max_degree=64,
# 5M sharded 408 shards max_degree=64, both seed 42), so no rebuilds.
#
# Stage order follows the r9 verdict:
#   1) 5M grouped-pieces A/B (verdict #2): recall columns are
#      timing-independent, so this runs first even in mixed weather;
#      QPS slices carry their own two-axis validity flags.
#   2) 1M real-broadcast re-pin incl. the 192-384 frontier (#1c/#4)
#      and the beam-512 matched-recall point (#3).
#   3) Streaming SLO table (#1b, carried from r8).
#   4) A calibration-valid sf0.1 bench of record via bench.py's own
#      retry-until-valid orchestrator (#1a) — backup anchor for the
#      driver's end-of-round run.
set -u
cd "$(dirname "$0")/.."
OUT=scale_runs_r10

# 1a) 5M grouped-pieces probe, beam swept, launched DIRECTLY (no
# quiet_run): the union beam-recall curve + group count are
# timing-independent and must land even if the session never gets a
# window; QPS slices carry their own validity flags. The merged
# sub-graphs change the beam-recall curve (one shared beam across ~6
# pieces vs 6 private beams), so the 0.99 knee is re-found here.
RDS_GROUP_PIECES=1 RDS_BEAM_LIST=256,384,512,768 RDS_STEADY_WINDOWS=2 \
  python scripts/probe5m.py /tmp/rds_scale_idx_5000000_sharded 50000 \
    > $OUT/5m_probe_grouped.json 2> $OUT/5m_probe_grouped.err

# 1b) grouped OFF baseline QPS re-pin (recall already pinned at 0.9922
# in r9 — this one is throughput-only, so it waits for a window)
RDS_BEAM_LIST=512 RDS_STEADY_WINDOWS=3 \
  python scripts/quiet_run.py --sleep 30 --max-wait 2400 \
    --attempts-log $OUT/quiet_attempts.jsonl -- \
    python scripts/probe5m.py /tmp/rds_scale_idx_5000000_sharded 50000 \
    > $OUT/5m_probe_base.json 2> $OUT/5m_probe_base.err

# 2) 1M real-broadcast beam curve incl. the never-measured 192-384
# frontier; 512 is the matched-recall point (verdict #3)
RDS_PROBE_MODE=broadcast RDS_BCAST_BUDGET=16g \
RDS_BEAM_LIST=128,192,256,384,512 RDS_STEADY_WINDOWS=4 \
  python scripts/quiet_run.py --sleep 30 --max-wait 2400 \
    --attempts-log $OUT/quiet_attempts.jsonl -- \
    python scripts/probe5m.py /tmp/rds_scale_idx_1000000_merged 10000 \
    > $OUT/1m_bcast_beams.json 2> $OUT/1m_bcast_beams.err

# 3) streaming SLO table (r8 #6, r9 #1b)
OUT=$OUT RDS_SLO_SECONDS=75 bash scripts/slo_sweep_r10.sh

# 4) calibration-valid sf0.1 bench of record (bench.py waits for quiet
# and retries internally; see its main() docstring)
RDS_BENCH_ATTEMPTS=4 RDS_BENCH_QUIET_WAIT=600 RDS_BENCH_MAX_WALL=3600 \
  python bench.py > $OUT/bench_sf01_pinned.json 2> $OUT/bench_sf01_pinned.err

touch $OUT/pipeline.done
