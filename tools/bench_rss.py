"""Run bench.py with a memory/spill tracker (the sf1 evidence harness).

Launches `python bench.py` as a child (GRAFT_SF_DIR and RAY_GRAFT_CPUS
pass through), samples /proc/meminfo twice a second for the SYSTEM-WIDE
memory high-water mark (driver + every Ray worker + object store — the
number that proves streaming-bounded execution), collects the driver's
own peak RSS from getrusage(RUSAGE_CHILDREN), and reports the Ray
object-spill volume found in the session directory afterwards.

Usage: GRAFT_SF_DIR=/tmp/sf1 python tools/bench_rss.py [out.json]
Prints the bench's own JSON line augmented with:
  peak_system_used_gb, baseline_system_used_gb, driver_peak_rss_gb,
  ray_spill_gb
"""
from __future__ import annotations

import glob
import json
import os
import resource
import subprocess
import sys
import threading
import time


def _used_kb() -> int:
    total = avail = 0
    with open("/proc/meminfo") as f:
        for line in f:
            if line.startswith("MemTotal:"):
                total = int(line.split()[1])
            elif line.startswith("MemAvailable:"):
                avail = int(line.split()[1])
    return total - avail


def _spill_bytes() -> int:
    n = 0
    for d in glob.glob("/tmp/ray/session_*/ray_spilled_objects*"):
        for root, _dirs, files in os.walk(d):
            for f in files:
                try:
                    n += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
    return n


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    baseline = _used_kb()
    spill_before = _spill_bytes()
    peak = [baseline]
    stop = threading.Event()

    def sampler():
        while not stop.is_set():
            peak[0] = max(peak[0], _used_kb())
            time.sleep(0.5)

    t = threading.Thread(target=sampler, daemon=True)
    t.start()
    p = subprocess.Popen(
        [sys.executable, "bench.py"], cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
        stdout=subprocess.PIPE, text=True)
    out_s, _ = p.communicate()
    stop.set()
    t.join(timeout=2)
    if p.returncode != 0:
        sys.exit(p.returncode)
    row = json.loads(out_s.strip().splitlines()[-1])
    rss_kb = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss
    row["baseline_system_used_gb"] = round(baseline / 1048576, 2)
    row["peak_system_used_gb"] = round(peak[0] / 1048576, 2)
    row["driver_peak_rss_gb"] = round(rss_kb / 1048576, 2)
    row["ray_spill_gb"] = round(
        max(_spill_bytes() - spill_before, 0) / 2**30, 2)
    line = json.dumps(row)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
