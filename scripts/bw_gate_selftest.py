"""Bandwidth-gate self-test (r8 verdict item #1 "done" criterion).

r8 proved the compute-only calibration gate passes during bandwidth-
degraded host phases that halve gather-bound throughput (same index +
code: 15.1k -> 8.3k q/s while both matmul probes sat inside the 1.25
gate — scale_runs_r8/5m_mmap_cache_summary.md). bench.probes_quiet now
gates on the 256 MB stream-copy probe too. This script demonstrates the
new gate actually rejecting a dirty slice: it spawns deliberate
memory-bandwidth hogs (processes looping large-buffer copies — the same
access pattern as the degraded phase), probes under that contention,
and asserts the slice is flagged INVALID on the bandwidth axis.

The quiet-side assertion is best-effort (this host has real co-tenant
weather; if the pre-phase is already dirty we only record it), but the
contended phase MUST be rejected — contention can only slow the probe.

Usage: python scripts/bw_gate_selftest.py [out.json]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BW_GATE, bw_ratio, compute_ratio, host_calibration, probes_quiet


def _hog(stop_t: float) -> None:
    import numpy as np

    buf = np.empty(64 << 20, dtype=np.float32)
    buf[:] = 1.0
    while time.time() < stop_t:
        _ = buf.copy()


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "bw_gate_selftest.json"
    gate = float(os.environ.get("RDS_SLICE_GATE", "1.25"))

    quiet = host_calibration()
    quiet_ok = probes_quiet(quiet, gate)

    # 8 hogs x ~3.7 GB/s apiece saturates the memory controller the way
    # the r8 khugepaged/kcompactd phases did; 20 s comfortably covers the
    # ~1 s calibration run started after a 2 s ramp
    n_hogs = int(os.environ.get("RDS_SELFTEST_HOGS", "8"))
    stop_t = time.time() + 20.0
    procs = [mp.Process(target=_hog, args=(stop_t,)) for _ in range(n_hogs)]
    for p in procs:
        p.start()
    try:
        time.sleep(2.0)  # let the hogs ramp
        dirty = host_calibration()
    finally:
        for p in procs:
            p.terminate()
        for p in procs:
            p.join()

    dirty_ok = probes_quiet(dirty, gate)
    rec = {
        "metric": "bw_gate_selftest",
        "gate": gate,
        "bw_gate": BW_GATE,
        "n_hogs": n_hogs,
        "quiet_calib": quiet,
        "quiet_compute_ratio": round(compute_ratio(quiet), 4),
        "quiet_bw_ratio": round(bw_ratio(quiet), 4),
        "quiet_passes_gate": quiet_ok,
        "dirty_calib": dirty,
        "dirty_compute_ratio": round(compute_ratio(dirty), 4),
        "dirty_bw_ratio": round(bw_ratio(dirty), 4),
        "dirty_passes_gate": dirty_ok,
    }
    print(json.dumps(rec))
    with open(out_path, "w") as fh:
        json.dump(rec, fh, indent=1)

    if dirty_ok:
        print("FAIL: gate accepted a deliberately-contended slice",
              file=sys.stderr)
        return 1
    if bw_ratio(dirty) <= BW_GATE:
        # rejected, but by the compute axis only — the bandwidth axis is
        # the one under test, so call that out explicitly
        print("FAIL: contended slice rejected by compute axis, not the "
              "bandwidth probe", file=sys.stderr)
        return 1
    print(f"OK: bandwidth gate rejected the contended slice "
          f"(bw_ratio {bw_ratio(dirty):.2f} > {BW_GATE})", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
