"""Spark-independent machine-capacity probe: strong-scaling a fixed
amount of pure-CPU work (numpy matmul + SHA256, no I/O, no shuffle)
across N processes. If THIS doesn't scale 8->32, no Spark job on the
box can — separating engine scaling quality from host oversubscription
/ co-tenant contention (the sandbox VM is known-noisy)."""
from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import sys
import time

TOTAL_UNITS = 512  # fixed total work, split across N workers


def unit(_):
    import numpy as np

    a = np.random.default_rng(1).normal(size=(96, 96))
    h = b"x"
    for _ in range(600):
        a = a @ a.T / 96.0
        h = hashlib.sha256(h + a.tobytes()).digest()
    return h[0]


def run(n_procs: int) -> float:
    t0 = time.time()
    with mp.Pool(n_procs) as p:
        p.map(unit, range(TOTAL_UNITS), chunksize=max(1, TOTAL_UNITS // (4 * n_procs)))
    return time.time() - t0


if __name__ == "__main__":
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    import os
    lo = int(os.environ.get("PROBE_LOW", "8")); hi = int(os.environ.get("PROBE_HIGH", "32"))
    out = {lo: [], hi: []}
    for i in range(reps):
        for n in (lo, hi) if i % 2 == 0 else (hi, lo):
            out[n].append(round(run(n), 2))
    t8, t32 = min(out[lo]), min(out[hi])
    print(json.dumps({
        "low": lo, "high": hi, "t_low": out[lo], "t_high": out[hi],
        "best_speedup": round(t8 / t32, 3),
        "best_efficiency": round((t8 / t32) / (hi / lo), 3),
    }))
