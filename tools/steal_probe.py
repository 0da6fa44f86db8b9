#!/usr/bin/env python3
"""Host CPU-contention burst probe — the Spark-free adjudicator.

Runs a FIXED amount of single-threaded arithmetic ten times and prints
each trial's wall time next to the host-wide contention counters
accumulated during it: steal jiffies (/proc/stat field 8 — hypervisor
served other tenants) and busy-foreign jiffies (host non-idle minus
this process's own cputime — same-guest co-tenant processes, which
never show up as steal; the r14 driver run had 39x rows with ~0
steal for exactly this reason). On a healthy host every trial takes
the same wall time and both counters stay ~0; on a contended host,
wall time inflates in the exact trials whose counters spike — pure-
compute proof that a timing anomaly is the HOST, not the engine (no
JVM, no Spark, no disk in the loop).

Recorded r14 adjudication (2026-08-16 ~03:00Z, this host): trials 0-5
6.0-6.3 s / steal 1-12 jiffies, then trial 8 20.3 s / steal 7,442 —
a 3.4x inflation on constant work, matching the 2-5x burst outliers
the bench audit flagged across three sf1 runs. The A/B bisect the same
session (HEAD vs pre-r14 worktree, interleaved n1/n5/n6 at sf1) flipped
winners run to run, clearing the r14 commits; with this probe's steal
correlation the flagged runs are environmental, case closed.

The 32 threads share the GIL (the work is one core's worth); the
counters still read host-wide across all 32 cores, which is the
point — they observe the neighbors, not us.

Parsing mirrors graft.Bench.parseCpuLine's None-not-crash contract:
a kernel whose aggregate cpu line is short yields n/a columns, never
an IndexError.
"""
import os, time, threading

HZ = os.sysconf(os.sysconf_names['SC_CLK_TCK'])

def burn(n):
    x = 0
    for i in range(n):
        x += i * i
    return x

def cpu_sample():
    """(busy, steal, self) jiffies, or None on a short/alien cpu line.
    busy = user+nice+system+irq+softirq (idle/iowait out, steal its own
    column, guest excluded — the kernel folds it into user)."""
    with open('/proc/stat') as f:
        parts = f.readline().split()
    if len(parts) < 9 or parts[0] != 'cpu':
        return None
    try:
        v = [int(x) for x in parts[1:9]]
    except ValueError:
        return None
    t = os.times()
    return (v[0] + v[1] + v[2] + v[5] + v[6], v[7],
            int((t[0] + t[1]) * HZ))

if __name__ == '__main__':
    for trial in range(10):
        s1 = cpu_sample()
        t0 = time.time()
        ts = [threading.Thread(target=burn, args=(3_000_000,)) for _ in range(32)]
        for t in ts: t.start()
        for t in ts: t.join()
        s2 = cpu_sample()
        if s1 is None or s2 is None:
            steal, foreign = 'n/a', 'n/a'
        else:
            steal = s2[1] - s1[1]
            foreign = max(0, (s2[0] - s1[0]) - (s2[2] - s1[2]))
        print(f'trial {trial}: {time.time()-t0:.2f}s steal_jiffies {steal} busy_foreign {foreign}')
        time.sleep(2)
