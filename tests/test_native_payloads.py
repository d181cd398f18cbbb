"""Driver-tail createDataFrame payloads must hold NATIVE python types.

Three rounds running, a locally-green row died in the driver on an
env/serialization skew (r3 type coercion, r4 sort_values, r5 numpy
scalars: umap_cluster_recovery red — ``DoubleType() can not accept
object ... numpy.float64`` from the NON-arrow createDataFrame fallback
on older pyspark). These tests pin the fix class: every driver-tail
local payload that feeds spark.createDataFrame is free of np.generic
values, so the strict row-verifier path accepts it on any pyspark.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _assert_native(obj, path="payload"):
    """Recursively assert no numpy scalar hides in a payload value."""
    assert not isinstance(obj, np.generic), f"np.generic at {path}: {obj!r}"
    if isinstance(obj, (list, tuple)):
        for i, v in enumerate(obj):
            _assert_native(v, f"{path}[{i}]")
    elif isinstance(obj, dict):
        for k, v in obj.items():
            _assert_native(k, f"{path}.key({k!r})")
            _assert_native(v, f"{path}[{k!r}]")


def _assert_pdf_native(pdf: pd.DataFrame):
    """Object-dtype columns (the arrow-fallback risk) must contain only
    native values; numeric columns must not be required (schema given)."""
    for col in pdf.columns:
        if pdf[col].dtype == object:
            for v in pdf[col]:
                _assert_native(v, f"col {col}")


def _capture_payloads(monkeypatch, spark):
    """Record every local payload handed to spark.createDataFrame."""
    captured = []
    orig = spark.createDataFrame

    def wrapper(data, *a, **kw):
        captured.append(data)
        return orig(data, *a, **kw)

    monkeypatch.setattr(spark, "createDataFrame", wrapper)
    return captured


def test_umap_driver_tail_payload_is_native(spark, monkeypatch):
    from top2vec_spark.operators.umap import embed_graph

    rng = np.random.default_rng(7)
    pts = [(int(i), [float(x) for x in rng.normal(size=3)]) for i in range(12)]
    init = spark.createDataFrame(pts, "doc_id long, embedding array<double>")
    edges = spark.createDataFrame(
        [(int(i), int((i + 1) % 12), 0.8) for i in range(12)],
        "src long, dst long, w double",
    )
    captured = _capture_payloads(monkeypatch, spark)
    out = embed_graph(
        edges, init, n_epochs=2, a=1.576, b=0.895, optimize="driver",
        seed=3, id_col="doc_id", vec_col="embedding",
    )
    rows = out.collect()
    assert len(rows) == 12
    # exactly the driver-tail payload: a pandas frame whose object
    # columns must hold native floats (r05's red row had np.float64)
    tail_pdfs = [c for c in captured if isinstance(c, pd.DataFrame)]
    assert tail_pdfs, "driver tail did not go through createDataFrame(pdf)"
    for pdf in tail_pdfs:
        # numeric-dtype columns convert natively in pyspark's pandas
        # row path (np.record.tolist()); only OBJECT columns leak
        # np.generic values — which is how r05's red row failed
        _assert_pdf_native(pdf)


def test_hdbscan_labels_payload_is_native(spark, monkeypatch):
    from top2vec_spark.operators.hdbscan import hdbscan_labels

    rng = np.random.default_rng(11)
    pts = []
    for c, center in enumerate([(0.0, 0.0), (10.0, 10.0)]):
        for i in range(10):
            v = rng.normal(size=2) * 0.1 + np.asarray(center)
            pts.append((c * 10 + i, [float(x) for x in v]))
    emb = spark.createDataFrame(pts, "doc_id long, embedding array<double>")
    captured = _capture_payloads(monkeypatch, spark)
    out = hdbscan_labels(emb, min_cluster_size=3, k=5, id_col="doc_id")
    assert out.count() == 20
    for c in captured:
        if isinstance(c, pd.DataFrame):
            _assert_pdf_native(c)
        elif isinstance(c, list) and c:
            _assert_native(c[0])


def test_connected_components_driver_tail_payload_is_native(spark, monkeypatch):
    from top2vec_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    captured = _capture_payloads(monkeypatch, spark)
    out = {
        (r["node"], r["component"])
        for r in connected_components(edges).collect()
    }
    assert out == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}
    for c in captured:
        if isinstance(c, list) and c:
            _assert_native(c[0])
            _assert_native(c[-1])


def test_strict_verifier_accepts_umap_payload(spark):
    """End-to-end through the strict (arrow-disabled) local-relation
    path — the exact path that rejected r05's payload on the driver."""
    from top2vec_spark.operators.umap import embed_graph

    rng = np.random.default_rng(5)
    pts = [(int(i), [float(x) for x in rng.normal(size=2)]) for i in range(8)]
    init = spark.createDataFrame(pts, "doc_id long, embedding array<double>")
    edges = spark.createDataFrame(
        [(int(i), int((i + 1) % 8), 1.0) for i in range(8)],
        "src long, dst long, w double",
    )
    prev = spark.conf.get("spark.sql.execution.arrow.pyspark.enabled")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "false")
    try:
        out = embed_graph(
            edges, init, n_epochs=2, a=1.576, b=0.895, optimize="driver",
            seed=1, id_col="doc_id", vec_col="embedding",
        )
        rows = out.collect()
        assert len(rows) == 8
        assert all(isinstance(x, float) for x in rows[0]["embedding"])
    finally:
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", prev)
