#!/usr/bin/env python3
"""Wait for a clean host window, then fire one gated ABBA scaling block.

Round-5 finding this automates: the host flaps on sub-minute timescales —
a width-8 probe read 0.2% demanded steal and five minutes later the same
probe read 26–44%, with the calibrate-first gate refusing in between
(codegen ceiling 0.609, BENCH/scaling_round5_final_block.json). Manually
catching a clean window wastes a session; this watcher polls the 5-second
concurrent-core probe and only spends the ~60 s calibration gate (and then
the ~25 min ABBA block) when BOTH widths look healthy at the same moment.

The gate inside `bench.py --scaling` remains the authoritative check — the
watcher is a cheap prefilter, so a flap between probe and gate still costs
only the two calibration legs, exactly like the recorded refusals.

Usage:  python BENCH/wait_clean_window.py [deadline_minutes] [out.json]
Exits 0 with a non-skipped artifact, 3 on deadline, 4 if the gate refused
on every clean-probe window seen.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
PROBE = os.path.join(HERE, "core_probe.py")
REPO = os.path.dirname(HERE)

MAX_STEAL_PCT = 2.0     # demanded-steal threshold per probe width
MIN_WIDTH_RATIO = 0.9   # per-core rate at 8-wide / per-core rate at 2-wide
POLL_S = 120.0


def probe(width: int) -> dict:
    r = subprocess.run([sys.executable, PROBE, str(width)],
                       capture_output=True, text=True, check=True)
    return json.loads(r.stdout.strip().splitlines()[-1])


def main() -> int:
    deadline_min = float(sys.argv[1]) if len(sys.argv) > 1 else 90.0
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        HERE, "scaling_clean_window.json")
    t0 = time.time()
    attempts = 0
    while (time.time() - t0) / 60.0 < deadline_min:
        p8 = probe(8)
        if p8["steal_of_demanded_pct"] > MAX_STEAL_PCT:
            time.sleep(POLL_S)
            continue
        p2 = probe(2)
        ratio = p8["per_core_miters_per_sec"] / max(
            p2["per_core_miters_per_sec"], 1e-9)
        if p2["steal_of_demanded_pct"] > MAX_STEAL_PCT or ratio < MIN_WIDTH_RATIO:
            time.sleep(POLL_S)
            continue
        attempts += 1
        print(json.dumps({"event": "clean_window", "at_min": round(
            (time.time() - t0) / 60.0, 1), "probe2": p2, "probe8": p8,
            "width_ratio": round(ratio, 3)}), flush=True)
        env = dict(os.environ,
                   SPARK_GRAFT_SCALING_BLOCKS=os.environ.get(
                       "SPARK_GRAFT_SCALING_BLOCKS", "1"),
                   SPARK_GRAFT_SCALING_WIDE=os.environ.get(
                       "SPARK_GRAFT_SCALING_WIDE", ""))
        r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py"),
                            "--scaling"], capture_output=True, text=True,
                           env=env, cwd=REPO)
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else "{}"
        rec = json.loads(line)
        # an aborted block's COMPLETED pairs are clean-stamped evidence —
        # keep each aborted artifact in a side file instead of letting the
        # next attempt overwrite it
        path = (f"{out_path}.aborted{attempts}" if "aborted" in rec
                else out_path)
        with open(path, "w") as f:
            f.write(line + "\n")
        print(json.dumps({"event": "gate_result",
                          "skipped": rec.get("skipped"),
                          "aborted": rec.get("aborted"),
                          "value": rec.get("value")}), flush=True)
        # A refused gate costs two calibration legs; an aborted block (a leg
        # steal stamp tripped bench.py's abort-on-pollution) costs the legs
        # run so far. Both mean the window went dirty — keep waiting.
        if "skipped" not in rec and "aborted" not in rec:
            return 0
        time.sleep(POLL_S)
    return 3 if attempts == 0 else 4


if __name__ == "__main__":
    sys.exit(main())
