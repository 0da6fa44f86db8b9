#!/usr/bin/env python3
"""Host CPU-steal burst probe — the Spark-free adjudicator.

Runs a FIXED amount of single-threaded arithmetic ten times and prints
each trial's wall time next to the host-wide steal jiffies (/proc/stat
field 8) accumulated during it. On a healthy host every trial takes the
same wall time and steal stays ~0; on a host with noisy-neighbor CPU
steal, wall time inflates in the exact trials whose steal counter
spikes — pure-compute proof that a timing anomaly is the HOST, not the
engine (no JVM, no Spark, no disk in the loop).

Recorded r14 adjudication (2026-08-16 ~03:00Z, this host): trials 0-5
6.0-6.3 s / steal 1-12 jiffies, then trial 8 20.3 s / steal 7,442 —
a 3.4x inflation on constant work, matching the 2-5x burst outliers
the bench audit flagged across three sf1 runs. The A/B bisect the same
session (HEAD vs pre-r14 worktree, interleaved n1/n5/n6 at sf1) flipped
winners run to run, clearing the r14 commits; with this probe's steal
correlation the flagged runs are environmental, case closed.

The 32 threads share the GIL (the work is one core's worth); the steal
column still reads host-wide across all 32 cores, which is the point —
it observes the neighbors, not us.
"""
import time, threading

def burn(n):
    x = 0
    for i in range(n):
        x += i * i
    return x

def steal_jiffies():
    return int(open('/proc/stat').read().split('\n')[0].split()[8])

if __name__ == '__main__':
    for trial in range(10):
        s1 = steal_jiffies()
        t0 = time.time()
        ts = [threading.Thread(target=burn, args=(3_000_000,)) for _ in range(32)]
        for t in ts: t.start()
        for t in ts: t.join()
        s2 = steal_jiffies()
        print(f'trial {trial}: {time.time()-t0:.2f}s steal_jiffies {s2-s1}')
        time.sleep(2)
