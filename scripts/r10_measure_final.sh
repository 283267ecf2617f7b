#!/bin/bash
# r10 END-OF-ROUND quiet-window chain (post band-key packing): waits for
# a two-axis-quiet window, then (1) full after-profile — regenerates
# every plans/r10/*_after.txt against the FINAL round code and
# profile_after.json, (2) the gated driver bench (5 attempts), (3) the
# minhash stage decomposition on the shipped packed-key shape.
# Pre-band-key artifacts are preserved as *_prebandkey.json.
set -u
cd "$(dirname "$0")/.."
export SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}"
LOG=scale_runs_r10/measure_final.log
mkdir -p scale_runs_r10

probe() {
  python - <<'PYEOF'
import bench, json
c = bench.host_calibration()
print(json.dumps({"compute_ratio": round(bench.compute_ratio(c),3),
                  "bw_ratio": round(bench.bw_ratio(c),3),
                  "quiet": bench.probes_quiet(c, 1.25)}))
PYEOF
}

echo "[chain] start $(date -u +%FT%T)" >> "$LOG"
DEADLINE=$(( $(date +%s) + ${RDS_CHAIN_WAIT:-10800} ))
while true; do
  P=$(probe)
  echo "[chain] probe $(date -u +%T) $P" >> "$LOG"
  case "$P" in *'"quiet": true'*) break;; esac
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "[chain] wait deadline hit — proceeding anyway (artifacts self-label validity)" >> "$LOG"
    break
  fi
  sleep 60
done

echo "[chain] profile_after start $(date -u +%T)" >> "$LOG"
python scripts/profile_r10.py after >> "$LOG" 2>&1
echo "[chain] profile_after done $(date -u +%T) $(probe)" >> "$LOG"

echo "[chain] bench start $(date -u +%T)" >> "$LOG"
RDS_BENCH_ATTEMPTS=5 RDS_BENCH_MAX_WALL=5400 \
  python bench.py > scale_runs_r10/bench_after_final.json 2>> "$LOG"
echo "[chain] bench done $(date -u +%T) $(probe)" >> "$LOG"

echo "[chain] minhash stages start $(date -u +%T)" >> "$LOG"
python scripts/minhash_stage_profile.py >> "$LOG" 2>&1
echo "[chain] all done $(date -u +%T) $(probe)" >> "$LOG"
touch scale_runs_r10/measure_final.done
