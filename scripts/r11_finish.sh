#!/bin/bash
# Round-11 end-of-round measurement chain (run AFTER code is final and
# the scale pipeline has released the host):
#  1) quiet-gated per-query profile on the final code -> profile_after
#     (+ plans/r11/<q>_after.txt for every bench query)
#  2) the bench orchestrator (its own retry-until-valid gating + the new
#     per-query probe normalization) -> bench_after.json
set -u
cd "$(dirname "$0")/.."
OUT=scale_runs_r11

python scripts/quiet_run.py --sleep 30 --max-wait 2400 \
    --attempts-log $OUT/quiet_attempts.jsonl -- \
    python scripts/profile_r11.py after \
    > $OUT/profile_after.out 2> $OUT/profile_after.err

python bench.py > $OUT/bench_after.json 2> $OUT/bench_after.err

touch $OUT/finish.done
