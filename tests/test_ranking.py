"""Exact two-phase top-N-per-group (operators/ranking.py): equality
with the naive single window, skew fixture, and the domain quota."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from top2vec_spark.operators.ranking import domain_quota, top_n_per_group


@pytest.fixture(scope="module")
def skewed_rows(spark):
    """600 rows, one mega-group holding half of them."""
    rng = np.random.default_rng(3)
    rows = [
        (
            int(i),
            "mega" if i % 2 == 0 else f"g{int(rng.integers(0, 20))}",
            float(rng.integers(0, 50)),  # coarse scores -> many ties
        )
        for i in range(600)
    ]
    return spark.createDataFrame(rows, "id long, grp string, score double")


def _naive(df, n):
    w = Window.partitionBy("grp").orderBy(
        F.col("score").desc(), F.col("id").asc()
    )
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
    )


@pytest.mark.parametrize("n", [1, 3, 25])
@pytest.mark.parametrize("buckets", [4, 16])
def test_two_phase_equals_naive(spark, skewed_rows, n, buckets):
    got = top_n_per_group(
        skewed_rows,
        ["grp"],
        [F.col("score").desc(), F.col("id").asc()],
        n,
        id_col="id",
        salt_buckets=buckets,
    )
    key = lambda rows: sorted(
        (r["grp"], r["rank"], r["id"], r["score"]) for r in rows
    )
    assert key(got.collect()) == key(_naive(skewed_rows, n).collect())


def test_partition_invariant(spark, skewed_rows):
    a = top_n_per_group(
        skewed_rows, ["grp"], [F.col("score").desc(), F.col("id").asc()],
        5, id_col="id",
    )
    b = top_n_per_group(
        skewed_rows.repartition(13),
        ["grp"], [F.col("score").desc(), F.col("id").asc()],
        5, id_col="id",
    )
    key = lambda rows: sorted(map(tuple, rows))
    assert key(a.collect()) == key(b.collect())


def test_domain_quota_contract(spark):
    from top2vec_spark.operators.tokens import assign_doc_ids
    from top2vec_spark.sources.pages import generate_pages

    pages = assign_doc_ids(generate_pages(spark, 400))
    kept = domain_quota(pages, per_host=3).cache()
    per_host = kept.groupBy("host").count().collect()
    assert per_host and all(r["count"] <= 3 for r in per_host)
    assert kept.filter(F.col("rank") > 3).count() == 0
    # the kept set per host is exactly the top-quality pages: no
    # dropped page may beat a kept page's (quality desc, id asc) key
    from top2vec_spark.operators.textquality import quality_score
    from top2vec_spark.operators.webtext import with_url_parts

    allrows = (
        with_url_parts(quality_score(pages))
        .select(
            "doc_id", "host", F.round("quality", 6).alias("quality")
        )
        .collect()
    )
    keptset = {r["doc_id"] for r in kept.collect()}
    byhost: dict[str, list] = {}
    for r in allrows:
        byhost.setdefault(r["host"], []).append(r)
    for host, rows in byhost.items():
        rows.sort(key=lambda r: (-r["quality"], r["doc_id"]))
        want = {r["doc_id"] for r in rows[:3]}
        assert want == {r["doc_id"] for r in rows if r["doc_id"] in keptset}
    kept.unpersist()
