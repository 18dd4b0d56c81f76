#!/usr/bin/env python3
"""Loaded steal probe — qualify a bench window BEFORE launching.

Hypervisor steal on this host is DEMAND-proportional (r16 finding,
SCALE.md): an idle /proc/stat sample reads ~0.5-3.6% while a full CPU
burn at the same moment can measure 20-50% steal/(busy+steal). Steal
only accrues while the guest asks for CPU, so the ONLY way to see the
contention a bench run will experience is to demand CPU and measure.

Usage: python3 dev/steal_probe.py [seconds]   (default 5)

Prints one JSON line {"steal_pct": ..., "busy": ..., "idle": ...} and
exits 0 if steal < 5% (window looks clean), 1 otherwise. Remember the
r16 caveat: observed clean windows closed within minutes — probe
immediately before launch, and prefer family-sized (1-5 min) runs for
clean-window evidence.
"""
import json
import multiprocessing as mp
import sys
import time


def _burn(seconds: float) -> None:
    t = time.time()
    x = 0
    while time.time() - t < seconds:
        x += 1


def jiffies():
    parts = open("/proc/stat").readline().split()
    v = list(map(int, parts[1:]))
    busy = v[0] + v[1] + v[2] + v[5] + v[6]
    return busy, v[7] if len(v) > 7 else 0, v[3]


def main() -> int:
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 5.0
    b0, s0, i0 = jiffies()
    procs = [mp.Process(target=_burn, args=(seconds,))
             for _ in range(mp.cpu_count())]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    b1, s1, i1 = jiffies()
    busy, steal, idle = b1 - b0, s1 - s0, i1 - i0
    pct = 100.0 * steal / (busy + steal) if busy + steal > 0 else -1.0
    print(json.dumps({"steal_pct": round(pct, 2), "busy": busy,
                      "steal": steal, "idle": idle,
                      "burn_sec": seconds}))
    return 0 if 0 <= pct < 5.0 else 1


if __name__ == "__main__":
    sys.exit(main())
