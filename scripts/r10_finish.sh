#!/bin/bash
# r10 FINISH chain (post _cell_cand_expr transform fold): the previous
# end-of-round chain died mid-bench, so this one (1) re-runs the 3-arm
# IVF A/B until a self-labeled-valid run or 3 tries (settles the
# fullprobe routing-shape question with the interleaved instrument),
# (2) regenerates profile_after + plans/r10/*_after.txt against FINAL
# code (preserving the 13:32 pre-transform profile), (3) runs the gated
# driver bench (5 attempts) into bench_after_final.json, (4) re-runs the
# minhash stage decomposition on the shipped packed-key shape.
# Every step is preceded by a two-axis quiet gate; artifacts self-label
# validity with their own pre/post probes.
set -u
cd "$(dirname "$0")/.."
export SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}"
LOG=scale_runs_r10/finish.log
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

wait_quiet() {  # $1 = max seconds
  local deadline=$(( $(date +%s) + $1 ))
  while true; do
    P=$(probe)
    echo "[finish] probe $(date -u +%T) $P" >> "$LOG"
    case "$P" in *'"quiet": true'*) return 0;; esac
    if [ "$(date +%s)" -ge "$deadline" ]; then
      echo "[finish] quiet-wait deadline — proceeding (artifact self-labels)" >> "$LOG"
      return 1
    fi
    sleep 45
  done
}

echo "[finish] start $(date -u +%FT%T)" >> "$LOG"

# arms materialized fresh from git (window = pre-df994b9, unrolled = 3b27e1f)
git show df994b9^:rust_diskann_spark/operators/ivf.py > /tmp/ivf_window.py
git show 3b27e1f:rust_diskann_spark/operators/ivf.py > /tmp/ivf_unrolled.py

for try in 1 2 3; do
  wait_quiet 2400
  echo "[finish] 3arm try $try start $(date -u +%T)" >> "$LOG"
  python scripts/ivf_3arm_ab.py scale_runs_r10/ivf_3arm_ab.json >> "$LOG" 2>&1
  if python -c "import json,sys; sys.exit(0 if json.load(open('scale_runs_r10/ivf_3arm_ab.json'))['valid'] else 1)"; then
    echo "[finish] 3arm VALID on try $try" >> "$LOG"
    break
  fi
  echo "[finish] 3arm try $try invalid (storm)" >> "$LOG"
done

cp -n scale_runs_r10/profile_after.json scale_runs_r10/profile_after_pretransform.json
wait_quiet 2400
echo "[finish] profile_after start $(date -u +%T)" >> "$LOG"
python scripts/profile_r10.py after >> "$LOG" 2>&1
echo "[finish] profile_after done $(date -u +%T) $(probe)" >> "$LOG"

wait_quiet 2400
echo "[finish] bench start $(date -u +%T)" >> "$LOG"
RDS_BENCH_ATTEMPTS=5 RDS_BENCH_MAX_WALL=5400 \
  python bench.py > scale_runs_r10/bench_after_final.json 2>> "$LOG"
echo "[finish] bench done $(date -u +%T) $(probe)" >> "$LOG"

wait_quiet 1200
echo "[finish] minhash stages start $(date -u +%T)" >> "$LOG"
python scripts/minhash_stage_profile.py >> "$LOG" 2>&1
echo "[finish] all done $(date -u +%FT%T) $(probe)" >> "$LOG"
touch scale_runs_r10/finish.done
