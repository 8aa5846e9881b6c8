#!/usr/bin/env python
"""Re-measure the f16-wire A/B with the SHIPPED upcaster and reconcile the
committed record (VERDICT r4 #2).

Runs bench.out_of_core on the real TPU (the interleaved f32/f16 rounds are
inside it, plus the new device-compute-only line), replaces
BENCH_DETAILS.json's ``out_of_core.live_sample``, and prints the f16 section
so ROADMAP.md / docs/PERF.md can be updated to whatever it shows.

Usage: python tools/reconcile_f16.py [n_snap]   (default 320)
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 320
    bench._init_devices(float(os.environ.get("BENCH_DEVICE_TIMEOUT", "240")))
    live = bench._retry("out_of_core", lambda: bench.out_of_core(n_snap=n))
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_DETAILS.json")
    try:
        with open(path) as f:
            details = json.load(f)
    except (OSError, ValueError):
        details = {}
    ooc = details.get("out_of_core") or {}
    ooc["live_sample"] = live
    details["out_of_core"] = ooc
    with open(path, "w") as f:
        json.dump(details, f, indent=1)
    print(json.dumps({"sps": live["sps"],
                      "device_compute_sps": live["device_compute_sps"],
                      "f16_transfer": live["f16_transfer"]}, indent=1))


if __name__ == "__main__":
    main()
