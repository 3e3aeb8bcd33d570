#!/usr/bin/env python3
"""Host-health probe — annotates benchmark runs with the VM's current
condition so a reader can tell a clean measurement window from a noisy
one (see BENCH/BASELINE.md "host-noise dossier": this sandbox's
effective memory bandwidth swings ~60× minute-to-minute and hypervisor
steal reaches 33% under load).

Measures, in ~8 s:
- steal/user/sys/idle shares under a brief full-width spin load;
- aggregate copy bandwidth (np.copyto, read+write GB/s) at 8 procs.

Usage: python bench/host_probe.py  → one JSON line.
Importable: probe() -> dict (used by run_scaling to tag each repeat).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time


def _cpu_snap() -> list[int]:
    with open("/proc/stat") as f:
        return list(map(int, f.readline().split()[1:]))


def _spin(stop_t: float) -> None:
    x = 0
    while time.time() < stop_t:
        x += 1


def _bw_worker(q, dur: float) -> None:
    import numpy as np

    # COLD-page fill, timed: first touch of a fresh buffer page-faults,
    # and when the hypervisor is short on backing pages that provisioning
    # stalls (measured r4: 1.28 GB single-thread fill took 54 s — 0.02
    # GB/s — in the same minute the warm copy read 120+ GB/s). The
    # replay workload writes GBs of FRESH tmpfs pages every run, so cold
    # fill is the half of host health the warm copy can't see. Separate
    # fields so the gate can use both.
    a = np.empty(20_000_000)
    t0 = time.time()
    a[:] = 1.0
    cold_gbs = a.nbytes / max(time.time() - t0, 1e-9) / 1e9
    rng = np.random.default_rng(0)
    a[:] = rng.random(a.shape)
    b = np.empty_like(a)
    # Warm-up copy OUTSIDE the timed window: measured r4, back-to-back
    # probes alternated 2.6 / 57 GB/s purely on allocation luck, with
    # slow readings collapsing to the 1-copy quantum (8 × 0.32 GB /
    # 1.5 s = exactly "1.7"). Copy bandwidth over warm pages is the
    # steady-state signal (a long bench run's working set is warm);
    # timing over measured elapsed, not the nominal window, removes the
    # quantization.
    np.copyto(b, a)
    n = 0
    t0 = time.time()
    t_end = t0 + dur
    while time.time() < t_end:
        np.copyto(b, a)
        n += 1
    elapsed = max(time.time() - t0, 1e-9)
    q.put((max(n, 1) * a.nbytes * 2 / elapsed / 1e9, cold_gbs))


def probe(spin_s: float = 3.0, bw_s: float = 3.0, bw_procs: int = 8) -> dict:
    ncpu = os.cpu_count() or 8
    stop = time.time() + spin_s
    procs = [mp.Process(target=_spin, args=(stop,)) for _ in range(ncpu)]
    [p.start() for p in procs]
    a = _cpu_snap()
    time.sleep(max(0.5, spin_s - 0.5))
    b = _cpu_snap()
    [p.join() for p in procs]
    d = [y - x for x, y in zip(a, b)]
    tot = sum(d) or 1
    names = ["user", "nice", "system", "idle", "iowait", "irq", "softirq", "steal"]
    cpu = {k: round(100 * v / tot, 1) for k, v in zip(names, d)}

    q = mp.Queue()
    ps = [mp.Process(target=_bw_worker, args=(q, bw_s)) for _ in range(bw_procs)]
    [p.start() for p in ps]
    pairs = [q.get() for _ in ps]
    [p.join() for p in ps]
    bw = sum(p[0] for p in pairs)
    colds = [p[1] for p in pairs]

    return {
        "steal_pct": cpu.get("steal"),
        "user_pct": cpu.get("user"),
        "sys_pct": cpu.get("system"),
        "copy_bw_gbs": round(bw, 1),
        # aggregate fresh-page fill rate, plus the WORST worker — one
        # stalled worker means provisioning pauses exist, and a replay
        # task hitting one stalls a whole stage
        "cold_fill_gbs": round(sum(colds), 1),
        "cold_min_gbs": round(min(colds), 2),
        "bw_procs": bw_procs,
    }


def healthy(p: dict,
            bw_floor: float = 10.0,
            steal_max: float = 10.0,
            cold_floor: float = 2.0) -> bool:
    """One shared gate for bench/scaling reps: warm streaming capacity,
    hypervisor steal, and fresh-page provisioning must ALL clear.
    ``cold_floor`` gates the worst single worker (GB/s): r4 measured
    healthy windows at ≥5 GB/s/worker and sick ones at 0.02–0.5.

    A ``None`` reading on ANY gated field fails the gate (ADVICE r4
    #4): a failed /proc parse previously coerced steal to 0 and passed
    the steal gate in exactly the degraded environments where the probe
    itself broke, while a None bandwidth conservatively failed — the
    three sides are now symmetric-conservative."""

    def _gate(value, limit, is_floor):
        if limit <= 0:  # gate disabled explicitly
            return True
        if value is None:  # probe degraded → conservative fail
            return False
        return value >= limit if is_floor else value <= limit

    return (
        _gate(p.get("copy_bw_gbs"), bw_floor, True)
        and _gate(p.get("steal_pct"), steal_max, False)
        and _gate(p.get("cold_min_gbs"), cold_floor, True)
    )


if __name__ == "__main__":
    print(json.dumps(probe()))
