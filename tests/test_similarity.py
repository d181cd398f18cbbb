"""Similarity-search operators vs numpy oracles on the driver
`embeddings` table."""

from __future__ import annotations

import numpy as np
import pytest

from top2vec_spark.operators.similarity import (
    assign_nearest,
    cosine_topk,
    cosine_topk_sql,
    ivf_build,
    ivf_topk,
    label_centroids,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.vstack([r["embedding"] for r in rows]).astype(np.float64)
    labels = np.array([r["label"] for r in rows])
    order = np.argsort(ids)
    return ids[order], mat[order], labels[order]


def np_cosine_topk(ids, mat, q, k):
    qn = np.asarray(q, dtype=np.float64)
    qn = qn / np.linalg.norm(qn)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1
    scores = (mat @ qn) / norms
    order = np.lexsort((ids, -scores))[:k]
    return list(zip(ids[order].tolist(), scores[order].tolist()))


@pytest.fixture(scope="module")
def query_vec(emb_np):
    _, mat, _ = emb_np
    return mat[7].tolist()  # a real row as the query


def test_cosine_topk_matches_numpy(emb, emb_np, query_vec):
    ids, mat, _ = emb_np
    expect = np_cosine_topk(ids, mat, query_vec, 10)
    got = [(r["vec_id"], r["score"]) for r in cosine_topk(emb, query_vec, 10).collect()]
    assert [g[0] for g in got] == [e[0] for e in expect]
    for g, e in zip(got, expect):
        assert g[1] == pytest.approx(e[1], abs=1e-9)
    # self similarity first
    assert got[0][0] == 7 and got[0][1] == pytest.approx(1.0)


def test_sql_variant_same_ranks(emb, emb_np, query_vec):
    ids, mat, _ = emb_np
    expect = np_cosine_topk(ids, mat, query_vec, 10)
    got = [(r["vec_id"], r["score"]) for r in cosine_topk_sql(emb, query_vec, 10).collect()]
    assert [g[0] for g in got] == [e[0] for e in expect]


def test_ivf_recall(emb, emb_np, query_vec):
    ids, mat, _ = emb_np
    assigned, cents = ivf_build(emb, n_cells=8, sample=500)
    assigned = assigned.cache()
    exact = {d for d, _ in np_cosine_topk(ids, mat, query_vec, 10)}
    # full probe == exact
    full = {r["vec_id"] for r in ivf_topk(assigned, cents, query_vec, 10, n_probe=8).collect()}
    assert full == exact
    # partial probe: high recall
    part = {r["vec_id"] for r in ivf_topk(assigned, cents, query_vec, 10, n_probe=3).collect()}
    assert len(part & exact) >= 7


def test_label_centroids_match_numpy(emb, emb_np):
    ids, mat, labels = emb_np
    got = {r["label"]: np.array(r["centroid"]) for r in label_centroids(emb).collect()}
    for lb in np.unique(labels):
        m = mat[labels == lb].mean(axis=0)
        m = m / np.linalg.norm(m)
        np.testing.assert_allclose(got[int(lb)], m, atol=1e-9)


def test_assign_nearest(emb, emb_np):
    ids, mat, labels = emb_np
    cents = label_centroids(emb)
    got = {r["vec_id"]: r["assigned_label"] for r in assign_nearest(emb, cents).collect()}
    # numpy oracle
    crows = {r["label"]: np.array(r["centroid"]) for r in cents.collect()}
    lbs = sorted(crows)
    cm = np.vstack([crows[l] for l in lbs])
    matn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    best = np.argmax(matn @ cm.T, axis=1)
    for i, vid in enumerate(ids):
        assert got[int(vid)] == lbs[best[i]]


def test_embedding_near_dup_lsh_vs_exact(spark):
    """LSH-bucketed near-dup: exact-verified (no false positives) and
    high recall vs the exact all-pairs operator on tight clusters."""
    import numpy as np

    from top2vec_spark.operators.similarity import (
        embedding_near_duplicates_exact,
        embedding_near_duplicates_lsh,
    )

    rng = np.random.default_rng(5)
    rows = []
    vid = 0
    for c in range(30):
        base = rng.normal(size=16)
        base /= np.linalg.norm(base)
        for _ in range(10):
            v = base + rng.normal(scale=0.02, size=16)  # cosine ~0.999
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    exact = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in embedding_near_duplicates_exact(emb, threshold=0.98).collect()
    }
    lsh = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in embedding_near_duplicates_lsh(
            emb, threshold=0.98, n_tables=8, bits=16
        ).collect()
    }
    assert lsh <= exact  # candidates are exact-verified: no false pos
    assert len(exact) > 0
    recall = len(lsh) / len(exact)
    assert recall >= 0.95, recall


def test_ivf_persisted_layout_prunes_partitions(emb, emb_np, query_vec, tmp_path):
    """The persisted IVF serving layout: cell-partitioned parquet, and
    the probe query's cell filter lands as a directory-level PARTITION
    filter on the scan (only n_probe cells read) — identical results
    to the in-memory path."""
    from top2vec_spark.operators.similarity import (
        ivf_load,
        ivf_topk_path,
        ivf_write,
    )

    assigned, cents = ivf_build(emb, n_cells=8, sample=500)
    path = str(tmp_path / "ivf")
    ivf_write(assigned, cents, path)

    spark = emb.sparkSession
    got = ivf_topk_path(spark, path, query_vec, 10, n_probe=3)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan, plan
    # in-memory same-probe equivalence (same centroids -> same cells)
    mem = ivf_topk(assigned, cents, query_vec, 10, n_probe=3)
    assert [(r["vec_id"], r["score"]) for r in got.collect()] == [
        (r["vec_id"], r["score"]) for r in mem.collect()
    ]
    # loaded centroids round-trip exactly
    _, cents2 = ivf_load(spark, path)
    np.testing.assert_allclose(cents2, cents, atol=0)
    # the scan prunes to exactly the probed cell DIRECTORIES: the plan
    # carries the cell list as a PartitionFilter (not a DataFilter)
    import re

    qn = np.asarray(query_vec, dtype=np.float64)
    qn = qn / np.linalg.norm(qn)
    probed = set(np.argsort(-(cents @ qn))[:3].tolist())
    m = re.search(r"PartitionFilters: \[cell#\d+ IN \(([\d,]+)\)\]", plan)
    assert m, plan
    assert {int(x) for x in m.group(1).split(",")} == probed
    assert "DataFilters: [cell" not in plan
