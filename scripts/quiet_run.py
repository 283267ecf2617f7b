"""Weather-gated measurement runner (shared-host protocol).

The host this engine is measured on swings up to ~6.7x between identical
runs (see memory/BENCH notes; r6 verdict items #1/#8). Steady-throughput
claims are only comparable when taken in a quiet window, so this runner
probes the same two calibration micro-benchmarks bench.py embeds and
launches the wrapped command ONLY when the geometric-mean ratio vs the
pinned r4 anchor is within the gate; otherwise it sleeps and re-probes.
Every probe attempt is appended to a JSONL next to the target so the
artifact trail shows how the window was obtained, not just the winner.

Usage:
    python scripts/quiet_run.py [--gate 1.25] [--max-wait 7200] \
        [--attempts-log PATH] -- CMD [ARGS...]

Exit status: the wrapped command's, or 75 (EX_TEMPFAIL) if no quiet
window appeared within --max-wait.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BW_GATE, bw_ratio, compute_ratio, host_calibration  # noqa: E402


def probe_ratio() -> tuple[float, float, dict]:
    calib = host_calibration()
    return compute_ratio(calib), bw_ratio(calib), calib


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gate", type=float, default=1.25)
    # bandwidth axis (r9): compute-only gating provably fires during
    # bandwidth-degraded phases that halve gather-bound throughput
    # (scale_runs_r8/5m_mmap_cache_summary.md "calibration blind spot")
    ap.add_argument("--bw-gate", type=float, default=BW_GATE)
    ap.add_argument("--max-wait", type=float, default=7200.0)
    ap.add_argument("--sleep", type=float, default=90.0)
    ap.add_argument("--attempts-log", default="quiet_run_attempts.jsonl")
    ap.add_argument("cmd", nargs=argparse.REMAINDER)
    args = ap.parse_args()
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        ap.error("no command given (put it after --)")

    t0 = time.time()
    while True:
        ratio, bwr, calib = probe_ratio()
        rec = {
            "t": round(time.time() - t0, 1),
            "ratio_vs_r4": round(ratio, 4),
            "bw_ratio": round(bwr, 4),
            "calib": calib,
            "gate": args.gate,
            "bw_gate": args.bw_gate,
            "fired": ratio <= args.gate and bwr <= args.bw_gate,
        }
        with open(args.attempts_log, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        print(f"[quiet_run] ratio={ratio:.3f} gate={args.gate} "
              f"bw={bwr:.3f} bw_gate={args.bw_gate} "
              f"{'FIRING' if rec['fired'] else 'waiting'}", file=sys.stderr)
        if rec["fired"]:
            return subprocess.call(cmd)
        if time.time() - t0 + args.sleep > args.max_wait:
            print("[quiet_run] no quiet window within --max-wait",
                  file=sys.stderr)
            return 75
        time.sleep(args.sleep)


if __name__ == "__main__":
    raise SystemExit(main())
