#!/usr/bin/env python3
"""5-second host-health probe: can this VM actually deliver N concurrent
cores right now?

Spins N pinned single-core busy loops for 5 s and reports aggregate
throughput plus hypervisor steal measured DURING the demand
(Δsteal / (Δtotal − Δidle−iowait) from /proc/stat). Round-5 finding that
motivates it: idle-box steal readings are meaningless (90% of a
tiny demand), single-core demand was served at ~1% steal the same minute
that 8-core demand was taxed ~15% — the noisy neighbor shows up only when
you ask for width, which is exactly what a scaling leg does. Use this
before `python bench.py --scaling` (whose calibrate-first gate costs ~60 s
per check; this costs 5 s):

    python BENCH/core_probe.py 8      # healthy: per-core ~= 1-core rate,
                                      # steal ~0%; degraded: steal >5-10%

Pure stdlib, pins to the TOP n cores like every timed leg.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SPIN_S = 5.0


def _counters():
    v = [int(x) for x in open("/proc/stat").readline().split()[1:]]
    return v[7], v[3] + v[4], sum(v)


def main():
    if "--spin" in sys.argv:
        t0 = time.time()
        n = 0
        while time.time() - t0 < SPIN_S:
            for _ in range(100000):
                n += 1
        print(n)
        return
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    total = os.cpu_count() or 32
    c0 = _counters()
    procs = []
    for i in range(width):
        cmd = [sys.executable, __file__, "--spin"]
        if shutil.which("taskset"):
            cmd = ["taskset", "-c", str(total - width + i)] + cmd
        procs.append(subprocess.Popen(cmd, stdout=subprocess.PIPE))
    agg = sum(int(p.communicate()[0]) for p in procs)
    c1 = _counters()
    ds, didle, dt = (c1[i] - c0[i] for i in range(3))
    dem = dt - didle
    print(json.dumps({
        "width": width,
        "agg_miters_per_sec": round(agg / SPIN_S / 1e6, 1),
        "per_core_miters_per_sec": round(agg / SPIN_S / 1e6 / width, 2),
        "steal_of_demanded_pct": round(100.0 * ds / dem, 1) if dem > 0 else None,
    }))


if __name__ == "__main__":
    main()
