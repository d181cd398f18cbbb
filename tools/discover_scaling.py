"""Density-discovery pipeline scaling study (north rule: two-cluster-
size criterion evidenced at two local[N] parallelism levels): run the
SAME PCA -> HDBSCAN chain (operators/pca.py + operators/hdbscan.py —
the discover_topics distributed stages) over the SAME deterministic
clustered vectors at local[LOW] and local[HIGH], each in a fresh JVM
subprocess, and report per-stage wall time, pipeline throughput at
both levels, and

    efficiency = (T_low / T_high) / (cpus_high / cpus_low)

Stage inventory and why each should scale:
  pca_fit    — ONE narrow mapInPandas moments pass, no shuffle
  reduce     — ONE narrow projection pass (matmul per Arrow batch)
  knn        — IVF-bucketed kNN graph (assign pass + per-cell cogroup
               blocks + one top-k merge shuffle), never all-pairs
  mst        — mutual-reachability joins + distributed Boruvka
               (O(log n) rounds of joins; per-round driver traffic is
               the merge decisions only)
The driver-side condense/EOM over the n-1 MST edges is timed too but
reported separately: it is parallelism-INVARIANT by design (O(n log n)
numpy on 24 bytes/point) and must not be charged to the distributed
stages' scaling.

Usage: python tools/discover_scaling.py
Env: DISC_N_VECS (default 120000), DISC_LOW (2), DISC_HIGH (8),
DISC_REPS (2), DISC_DIM (32), DISC_K (16).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = int(os.environ.get("DISC_N_VECS", "120000"))
LOW = int(os.environ.get("DISC_LOW", "2"))
HIGH = int(os.environ.get("DISC_HIGH", "8"))
REPS = int(os.environ.get("DISC_REPS", "2"))
DIM = int(os.environ.get("DISC_DIM", "32"))
K = int(os.environ.get("DISC_K", "16"))

CHILD = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from top2vec_spark.operators.pca import fit_pca, transform_pca
from top2vec_spark.operators import hdbscan as H
from top2vec_spark.session import get_spark

N, CPUS, DIM, K = %(n)d, %(cpus)d, %(dim)d, %(k)d
N_CLUSTERS = 48
spark = get_spark(parallelism=CPUS, app_name=f"disc_scale_{CPUS}")
rng = np.random.default_rng(11)
cents = rng.normal(size=(N_CLUSTERS, DIM)) * 6.0
bc = spark.sparkContext.broadcast(cents)
_PRIMES = np.linspace(0.61803, 2.41421, DIM)

def gen(pdfs):
    for pdf in pdfs:
        ids = pdf["id"].to_numpy().astype(np.int64)
        base = bc.value[ids %% N_CLUSTERS]
        # deterministic sub-unit jitter: sin over id-keyed phases
        phase = ids[:, None] * _PRIMES[None, :] + np.arange(DIM)[None, :]
        v = base + 0.6 * np.sin(phase)
        yield pd.DataFrame({"vec_id": ids, "embedding": list(map(list, v))})

emb = (
    spark.range(N).repartition(CPUS * 4)
    .mapInPandas(gen, "vec_id long, embedding array<double>")
    .persist()
)
emb.count()  # materialize OUTSIDE the timed sections

t0 = time.time()
model = fit_pca(emb, 5)
t_pca = time.time() - t0

t0 = time.time()
red = transform_pca(emb, model).persist()
red.count()
t_reduce = time.time() - t0

t0 = time.time()
knn = H.knn_graph_ivf(red, K, n_cells=128, n_probe=8).persist()
n_edges = knn.count()
t_knn = time.time() - t0

t0 = time.time()
core = H.core_distances(knn, min_samples=5)
edges = H.mutual_reachability(knn, core)
mst = H.boruvka_mst(edges)
t_mst = time.time() - t0

t0 = time.time()
point_ids = np.arange(N, dtype=np.int64)
linkage = H._single_linkage(mst, point_ids)
tree = H._condense(linkage, N, 50)
labels, _ = H.labels_from_condensed(tree)
t_condense = time.time() - t0
n_clusters = int(len(set(labels[labels >= 0])))

dist_wall = t_pca + t_reduce + t_knn + t_mst
print(json.dumps({
    "cpus": CPUS, "n": N,
    "pca_sec": round(t_pca, 2), "reduce_sec": round(t_reduce, 2),
    "knn_sec": round(t_knn, 2), "mst_sec": round(t_mst, 2),
    "distributed_wall_sec": round(dist_wall, 2),
    "vecs_per_sec": round(N / dist_wall, 1),
    "condense_driver_sec": round(t_condense, 2),
    "n_edges": n_edges, "mst_edges": int(mst.shape[0]),
    "n_clusters": n_clusters,
}))
spark.stop()
"""


def run(cpus: int) -> dict:
    code = CHILD % {"repo": REPO, "n": N, "cpus": cpus, "dim": DIM, "k": K}
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=5400,
        cwd=REPO,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        print(out.stdout[-2000:], out.stderr[-2000:], file=sys.stderr)
        raise SystemExit(f"child at local[{cpus}] produced no result")
    return json.loads(lines[-1])


def main() -> None:
    results = {"n_vecs": N, "dim": DIM, "k": K, "low": LOW, "high": HIGH, "reps": []}
    best = None
    for rep in range(REPS):
        lo = run(LOW)
        hi = run(HIGH)
        eff = (
            lo["distributed_wall_sec"] / hi["distributed_wall_sec"]
        ) / (HIGH / LOW)
        row = {"rep": rep, "low": lo, "high": hi, "efficiency": round(eff, 3)}
        results["reps"].append(row)
        print(json.dumps(row), flush=True)
        if best is None or eff > best:
            best = eff
    results["best_efficiency"] = round(best, 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
