#!/usr/bin/env python3
"""Deliberate CPU hog for sweep-adjudication experiments (r13's
sensitivity hog, extended with a duty cycle for the r15 splice
experiment).

Usage: python3 tools/hog.py THREADS [ON_SEC OFF_SEC] [TOTAL_SEC]

With ON/OFF set, the hog toggles — burning THREADS cpus for ON_SEC,
sleeping OFF_SEC — which is exactly the co-tenant pattern that gives
adjacent sweep legs UNEQUAL contention (the r14 q285 false-flag mode
the tail-remeasure + splice rule exists for). Without ON/OFF it burns
continuously (the r13 sensitivity mode). Runs until TOTAL_SEC
(default 3600) or SIGTERM. Dev/evidence tooling only.
"""
import multiprocessing
import sys
import time


def burn(stop_at):
    x = 1234567891011
    while time.time() < stop_at:
        for _ in range(100000):
            x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
    return x


def main():
    # len==3 is ambiguous (THREADS ON_SEC with OFF_SEC forgotten would
    # silently reinterpret ON_SEC as TOTAL_SEC and run CONTINUOUS mode
    # — the opposite contention pattern of the intended duty cycle).
    # Reject it rather than guess (r15 ADVICE).
    if len(sys.argv) == 3:
        sys.exit("usage: hog.py THREADS [ON_SEC OFF_SEC [TOTAL_SEC]]\n"
                 "  continuous mode: THREADS alone (3600s) or "
                 "THREADS 0 0 TOTAL_SEC\n"
                 "  duty-cycle mode: THREADS ON_SEC OFF_SEC [TOTAL_SEC]")
    threads = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    on = float(sys.argv[2]) if len(sys.argv) > 3 else 0.0
    off = float(sys.argv[3]) if len(sys.argv) > 3 else 0.0
    total = float(sys.argv[4]) if len(sys.argv) > 4 else 3600.0
    deadline = time.time() + total
    cycle = 0
    while time.time() < deadline:
        if on > 0:
            stop = min(time.time() + on, deadline)
            print(f"[hog] cycle {cycle}: ON {threads} threads "
                  f"for {on:.0f}s", flush=True)
            ps = [multiprocessing.Process(target=burn, args=(stop,))
                  for _ in range(threads)]
            [p.start() for p in ps]
            [p.join() for p in ps]
            if time.time() >= deadline:
                break
            print(f"[hog] cycle {cycle}: OFF for {off:.0f}s", flush=True)
            time.sleep(min(off, max(0.0, deadline - time.time())))
            cycle += 1
        else:
            print(f"[hog] continuous: {threads} threads until deadline",
                  flush=True)
            ps = [multiprocessing.Process(target=burn, args=(deadline,))
                  for _ in range(threads)]
            [p.start() for p in ps]
            [p.join() for p in ps]
    print("[hog] done", flush=True)


if __name__ == "__main__":
    main()
