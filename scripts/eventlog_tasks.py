"""Summarize per-stage task durations from a Spark event log.

Usage: python scripts/eventlog_tasks.py /tmp/rds_eventlog/local-<appid>

Prints, per stage, the task count and min/median/max task wall time, plus
the single worst task across the app. scale_demo.py embeds the worst build
task in its JSON (``build_max_task_sec``); this standalone reader lets the
same number be recovered post-hoc from any run's event log, which is how
straggler claims (e.g. "no multi-hour build tasks") stay independently
checkable.
"""

import json
import sys
from collections import defaultdict


def summarize(path):
    stages = defaultdict(list)  # stage_id -> [duration_sec]
    names = {}
    with open(path, "r", encoding="utf-8", errors="replace") as fh:
        for line in fh:
            try:
                if '"SparkListenerTaskEnd"' in line:
                    ev = json.loads(line)
                    info = ev.get("Task Info", {})
                    dur = (
                        info.get("Finish Time", 0) - info.get("Launch Time", 0)
                    ) / 1000.0
                    stages[ev.get("Stage ID")].append(dur)
                elif '"SparkListenerStageSubmitted"' in line:
                    ev = json.loads(line)
                    si = ev.get("Stage Info", {})
                    names[si.get("Stage ID")] = si.get("Stage Name", "")[:60]
            except json.JSONDecodeError:
                # .inprogress logs end in a partially-written line
                continue
    return stages, names


def main():
    path = sys.argv[1]
    stages, names = summarize(path)
    worst = (0.0, None)
    print(f"{'stage':>5} {'tasks':>6} {'min_s':>8} {'med_s':>8} {'max_s':>9}  name")
    for sid in sorted(stages):
        ds = sorted(stages[sid])
        mx = ds[-1]
        if mx > worst[0]:
            worst = (mx, sid)
        print(
            f"{sid:>5} {len(ds):>6} {ds[0]:>8.1f} {ds[len(ds) // 2]:>8.1f} "
            f"{mx:>9.1f}  {names.get(sid, '')}"
        )
    print(
        json.dumps(
            {"max_task_sec": round(worst[0], 1), "max_task_stage": worst[1]}
        )
    )


if __name__ == "__main__":
    main()
