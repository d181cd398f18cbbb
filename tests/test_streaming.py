"""Streaming ingest: micro-batches fold into the index via the same
incremental append as the batch API; queries stay correct mid-stream."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from top2vec_spark.operators.bm25 import (
    bm25_topk_bruteforce,
    resolve_query_terms,
    term_weights,
)
from top2vec_spark.operators.corpus_stats import (
    build_doc_stats,
    build_vocab,
    compute_globals,
)
from top2vec_spark.operators.tokens import assign_doc_ids, tokenize_docs
from top2vec_spark.operators.wand import wand_topk
from top2vec_spark.plans.build import IndexBuilder
from top2vec_spark.sources.pages import generate_pages_pdf
from top2vec_spark.streaming.ingest import StreamingIndexer


def test_stream_appends_match_batch(spark, tmp_path):
    base_pdf = generate_pages_pdf(200, seed=41)
    stream_pdf = generate_pages_pdf(120, seed=43, start=50_000)

    base = assign_doc_ids(spark.createDataFrame(base_pdf[["url", "text"]])).select(
        "doc_id", "url", "text"
    )
    idx = IndexBuilder(
        spark, str(tmp_path / "sidx"), docs_per_shard=64, n_buckets=8
    ).build_from_docs(base, resume=False)

    # stream source: parquet dir read as a stream
    src_dir = str(tmp_path / "stream_src")
    sdf_static = spark.createDataFrame(stream_pdf[["url", "text"]])
    sdf_static.write.mode("overwrite").parquet(src_dir)
    stream = (
        spark.readStream.schema(sdf_static.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src_dir)
    )

    indexer = StreamingIndexer(idx)
    q = indexer.start(stream, str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()

    assert indexer.batches_applied >= 1
    final = indexer.index
    assert final.globs.n_docs == 320
    assert final.stats_fresh is False

    # oracle: brute force over the union corpus as the indexer saw it
    appended = final.doc_stats.filter(F.col("doc_id") >= 64 * ((200 + 63) // 64))
    assert appended.count() == 120

    # query correctness vs brute force over reconstructed union:
    # rebuild doc set = base + streamed rows with the indexer's ids
    # (ids are order-dependent per batch; reconstruct from doc_stats
    # by re-deriving text via url ordering is not possible here, so
    # assert invariant properties + a full-rebuild score comparison
    # on term stats instead)
    vmap = {r["term"]: (r["term_id"], r["df"]) for r in final.vocab.collect()}
    qterms = resolve_query_terms(vmap, ["wa", "wb"], [])
    res = wand_topk(spark, final, qterms, final.globs, 10).collect()
    assert len(res) == 10
    scores = [r["score"] for r in res]
    assert scores == sorted(scores, reverse=True)

    # df conservation: vocab df equals docs-per-term over the union
    from top2vec_spark.operators.tokens import explode_packed_tf

    total_tf = explode_packed_tf(final.packed_tf)
    df_check = {
        r["term"]: r["cnt"]
        for r in total_tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    for r in final.vocab.collect():
        assert df_check[r["term"]] == r["df"]


def test_quality_monitor_windows_match_batch(spark, tmp_path):
    """Watermarked event-time windowed quality stats over a stream
    equal the same aggregation computed in batch (update mode emits
    every window; append-mode late-drop semantics are Spark's own)."""
    import datetime as dt

    from top2vec_spark.streaming.monitor import (
        quality_window_stats,
        start_quality_monitor,
    )

    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = []
    for i in range(60):
        rows.append(
            (
                f"https://x/{i:04d}",
                base + dt.timedelta(seconds=37 * i),
                ("short text" if i % 7 == 0 else "a reasonably long page body " * 12),
                "en" if i % 3 else "de",
            )
        )
    pdf = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string, lang string"
    )
    src = str(tmp_path / "mon_src")
    pdf.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(pdf.schema).parquet(src)
    q = start_quality_monitor(
        stream,
        str(tmp_path / "mon_ckpt"),
        sink_table="qmon_test",
        output_mode="update",  # availableNow + update: all windows emit
        window="2 minutes",
        watermark="1 minute",
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r["win"]["start"], r["lang"]): (
            r["n_pages"],
            round(r["avg_chars"], 6),
            r["n_short"],
        )
        for r in spark.table("qmon_test").collect()
    }
    expect = {
        (r["win"]["start"], r["lang"]): (
            r["n_pages"],
            round(r["avg_chars"], 6),
            r["n_short"],
        )
        for r in quality_window_stats(pdf, window="2 minutes").collect()
    }
    assert got == expect
    assert len(expect) > 10  # several windows x langs actually exist


def test_stateful_sessionization_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionizer: closed sessions across
    micro-batches equal the batch twin over the same concatenated
    events (open sessions stay in state, so compare only sessions the
    batch twin also considers closed before the final event wave)."""
    import datetime as dt

    from top2vec_spark.operators.sessions import sessionize_batch
    from top2vec_spark.streaming.sessions import sessionize_stream

    base = dt.datetime(2026, 2, 1, 8, 0, 0)
    rows = []
    eid = 0
    # 3 users x 3 sessions of 4 events (gap 5 min inside, 2 h between)
    for u in range(3):
        for s in range(3):
            t0 = base + dt.timedelta(hours=2 * s, minutes=7 * u)
            for e in range(4):
                rows.append(
                    (eid, t0 + dt.timedelta(minutes=5 * e), u, "click",
                     float(u + s + e))
                )
                eid += 1
    # final sentinel wave far in the future: closes every open session
    for u in range(3):
        rows.append((eid, base + dt.timedelta(days=30), u, "end", 0.0))
        eid += 1

    pdf = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    src = str(tmp_path / "sess_src")
    # two files -> at least two micro-batches with maxFilesPerTrigger=1
    pdf.filter(F.col("event_id") < 20).coalesce(1).write.mode("overwrite").parquet(src)
    pdf.filter(F.col("event_id") >= 20).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(pdf.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sessionize_stream(stream, gap_seconds=1800)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions_test")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"],
         round(r["total_value"], 6))
        for r in spark.table("sessions_test").collect()
    }
    # batch twin over the SAME events; drop each user's final
    # (sentinel) session — it is still open in the stream's state
    batch = sessionize_batch(pdf, gap_seconds=1800)
    last_id = {
        r["user_id"]: r["mx"]
        for r in batch.groupBy("user_id").agg(F.max("session_id").alias("mx")).collect()
    }
    expect = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"],
         round(r["total_value"], 6))
        for r in batch.collect()
        if r["session_id"] != last_id[r["user_id"]]
    }
    assert got == expect
    assert len(expect) == 9  # 3 users x 3 closed sessions


def _skewed_session_events(spark):
    """Events where user 0 owns ~30% of all rows (the hyperactive-user
    skew case): one 180-event run at 1000 s intervals (a single session
    chain-merging across ~25 two-hour chunks), one 80-event run at
    1700 s intervals after a >gap break, 40 isolated 3600 s-spaced
    singleton sessions; users 1..9 get 15 ordinary 5-event sessions."""
    import datetime as dt

    base = dt.datetime(2026, 3, 1, 0, 0, 0)
    rows, eid = [], 0

    def add(u, t, v):
        nonlocal eid
        rows.append((eid, t, u, "click", float(v)))
        eid += 1

    t = base
    for i in range(180):  # run A: one giant session, gap 1000 < 1800
        add(0, t, i % 7)
        t += dt.timedelta(seconds=1000)
    t += dt.timedelta(seconds=4000)  # session break (> gap)
    for i in range(80):  # run B: gap 1700 < 1800, still chains chunks
        add(0, t, i % 5)
        t += dt.timedelta(seconds=1700)
    t += dt.timedelta(seconds=5000)
    for i in range(40):  # singletons: every gap 3600 > 1800
        add(0, t, i % 3)
        t += dt.timedelta(seconds=3600)
    for u in range(1, 10):
        for s in range(15):
            t0 = base + dt.timedelta(hours=3 * s, minutes=7 * u)
            for e in range(5):
                add(u, t0 + dt.timedelta(minutes=5 * e), u + s + e)
    # duplicate-timestamp tie-break: two extra events at an existing ts
    add(0, base + dt.timedelta(seconds=500_000), 1)
    add(0, base + dt.timedelta(seconds=500_000), 2)
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


def test_sessionizer_equivalence_property(spark):
    """Property: salted ≡ plain sessionization for ANY event stream —
    offsets quantized to 600 s multiples so exact-gap boundaries
    (ts diff == gap_seconds, the > vs >= edge) and duplicate
    timestamps occur constantly, with chunk widths deliberately
    unaligned to the gap."""
    import datetime as dt

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from top2vec_spark.operators.sessions import (
        sessionize_batch,
        sessionize_batch_salted,
    )

    base = dt.datetime(2026, 1, 1)

    def canon(df):
        return sorted(
            (r["user_id"], r["session_id"], r["session_start"],
             r["session_end"], r["n_events"], round(r["total_value"], 6))
            for r in df.collect()
        )

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=3),   # user
                st.integers(min_value=0, max_value=33),  # offset * 600 s
            ),
            min_size=1,
            max_size=40,
        ),
        st.sampled_from([600, 1800]),        # gap == a possible diff
        st.sampled_from([1901, 3701]),       # chunk > gap, unaligned
    )
    def check(evts, gap, chunk):
        rows = [
            (i, base + dt.timedelta(seconds=off * 600), u, "e", float(i % 7))
            for i, (u, off) in enumerate(evts)
        ]
        ev = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double",
        )
        assert canon(
            sessionize_batch_salted(ev, gap_seconds=gap, chunk_seconds=chunk)
        ) == canon(sessionize_batch(ev, gap_seconds=gap))

    check()


def test_salted_sessionization_matches_unsalted_on_skew(spark):
    """sessionize_batch_salted ≡ sessionize_batch on the skewed fixture
    (one user ~30% of events), including session_id numbering — and the
    per-event phase-1 window is partitioned by (user, _chunk), so the
    hyperactive user's log splits across many groups instead of one
    straggler partition (round-4 verdict item 5)."""
    from top2vec_spark.operators.sessions import (
        sessionize_batch,
        sessionize_batch_salted,
    )

    ev = _skewed_session_events(spark)
    n_total = ev.count()
    n_hyper = ev.filter(F.col("user_id") == 0).count()
    assert 0.25 < n_hyper / n_total < 0.40  # the fixture really is skewed

    def rows(df):
        return sorted(
            (r["user_id"], r["session_id"], r["session_start"],
             r["session_end"], r["n_events"], round(r["total_value"], 6))
            for r in df.collect()
        )

    expect = rows(sessionize_batch(ev, gap_seconds=1800))
    salted = sessionize_batch_salted(ev, gap_seconds=1800)
    assert rows(salted) == expect
    # chunk width NOT aligned to the fixture's rhythm: same result
    assert rows(
        sessionize_batch_salted(ev, gap_seconds=1800, chunk_seconds=3701)
    ) == expect

    # skew evidence: the hyperactive user's per-event work spans many
    # (user, chunk) groups — no single task owns their whole log
    n_chunks = (
        ev.filter(F.col("user_id") == 0)
        .select(
            F.floor(
                F.col("ts").cast("timestamp").cast("double") / 7200
            ).alias("c")
        )
        .distinct()
        .count()
    )
    assert n_chunks >= 20
    # and the executed plan's first window really partitions by _chunk
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "_chunk" in plan


def test_streaming_sessionization_matches_salted_on_skew(spark, tmp_path):
    """Streaming ≡ batch on the SKEWED fixture, with the batch side
    computed by the salted path — closed sessions from the stateful
    stream equal the salted twin minus each user's still-open final
    session."""
    from top2vec_spark.operators.sessions import sessionize_batch_salted
    from top2vec_spark.streaming.sessions import sessionize_stream

    import datetime as dt

    ev = _skewed_session_events(spark)
    # sentinel wave closes every open session
    mx = ev.agg(F.max("event_id")).collect()[0][0]
    sent = spark.createDataFrame(
        [(mx + 1 + u, dt.datetime(2027, 1, 1), u, "end", 0.0) for u in range(10)],
        ev.schema,
    )
    all_ev = ev.unionByName(sent)
    src = str(tmp_path / "skew_src")
    # micro-batches must respect per-user event-time order (streams
    # arrive in time order; the stateful fold assumes it): event_ids
    # are assigned in time order per user in the fixture, so range
    # splits give three time-ordered waves
    cut1, cut2 = mx // 3, 2 * mx // 3
    all_ev.filter(F.col("event_id") < cut1).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    all_ev.filter(
        (F.col("event_id") >= cut1) & (F.col("event_id") < cut2)
    ).coalesce(1).write.mode("append").parquet(src)
    all_ev.filter(F.col("event_id") >= cut2).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(all_ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sessionize_stream(stream, gap_seconds=1800)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("skew_sessions_test")
        .option("checkpointLocation", str(tmp_path / "skew_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"],
         round(r["total_value"], 6))
        for r in spark.table("skew_sessions_test").collect()
    }
    batch = sessionize_batch_salted(all_ev, gap_seconds=1800)
    last_id = {
        r["user_id"]: r["mx"]
        for r in batch.groupBy("user_id").agg(F.max("session_id").alias("mx")).collect()
    }
    expect = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"],
         round(r["total_value"], 6))
        for r in batch.collect()
        if r["session_id"] != last_id[r["user_id"]]
    }
    assert got == expect
    assert len(expect) > 100  # singletons + runs + 9 users x 15 sessions


def test_streaming_dedup_matches_batch(spark, tmp_path):
    """Streaming exact dedup (dropDuplicatesWithinWatermark over the
    dual content key): first arrival per content survives across
    micro-batches; output pinned against the batch twin."""
    import datetime

    from top2vec_spark.streaming.dedup import dedup_stream, start_dedup_stream

    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    rows = []
    # 30 pages, 10 unique contents, duplicates spread across files
    for i in range(30):
        rows.append(
            (
                f"https://ex{i}.test/p",
                t0 + datetime.timedelta(seconds=i),
                f"shared content payload number {i % 10} words words",
            )
        )
    pdf = spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")
    src = str(tmp_path / "dd_src")
    pdf.repartition(6).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(pdf.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    q = start_dedup_stream(stream, str(tmp_path / "dd_ckpt"), sink_table="dd_out")
    q.processAllAvailable()
    q.stop()

    got = spark.table("dd_out").collect()
    texts = [r["text"] for r in got]
    assert len(texts) == len(set(texts)) == 10  # one survivor per content
    # batch twin: same unique content set
    batch = dedup_stream(pdf)
    assert {r["text"] for r in batch.collect()} == set(texts)
    # key columns dropped from the output schema
    assert set(spark.table("dd_out").columns) == {"url", "warc_ts", "text"}
