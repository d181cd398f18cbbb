"""Sequence packing (operators/packing.py): concat-and-chunk layout
pinned against a plain-Python replay of the published recipe —
documents in doc_id order, one EOS slot after each document, stream
sliced every seq_len slots."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from top2vec_spark.operators.packing import (
    document_offsets,
    pack_sequences,
    packed_sequence_arrays,
)


def _tokens_df(spark, docs):
    rows = [
        (doc_id, pos, term)
        for doc_id, terms in docs
        for pos, term in enumerate(terms)
    ]
    return spark.createDataFrame(rows, "doc_id long, pos int, term string")


def _replay(docs, seq_len, sep="<eos>", drop_last=False):
    stream = []
    for doc_id, terms in sorted(docs):
        for t in terms:
            stream.append((doc_id, t))
        if sep is not None:
            stream.append((doc_id, sep))
    out = {
        (g // seq_len, g % seq_len): (doc_id, t)
        for g, (doc_id, t) in enumerate(stream)
    }
    if drop_last and len(stream) % seq_len:
        full = len(stream) // seq_len
        out = {k: v for k, v in out.items() if k[0] < full}
    return out


DOCS = [
    (0, ["a", "b", "c"]),
    (1, ["d"]),
    (3, ["e", "f", "g", "h", "i"]),
    (7, ["j", "k"]),
]


def _collect(df):
    return {
        (r["seq_id"], r["pos"]): (r["doc_id"], r["term"])
        for r in df.collect()
    }


def test_matches_replay(spark):
    got = _collect(pack_sequences(_tokens_df(spark, DOCS), seq_len=4))
    assert got == _replay(DOCS, 4)


def test_drop_last(spark):
    got = _collect(
        pack_sequences(_tokens_df(spark, DOCS), seq_len=4, drop_last=True)
    )
    exp = _replay(DOCS, 4, drop_last=True)
    assert got == exp
    # 14 slots -> 3 full sequences of 4
    assert len(got) == 12 and max(s for s, _ in got) == 2


def test_no_separator(spark):
    got = _collect(
        pack_sequences(_tokens_df(spark, DOCS), seq_len=5, sep_token=None)
    )
    assert got == _replay(DOCS, 5, sep=None)
    assert all(t != "<eos>" for _, t in got.values())


def test_partition_invariance(spark):
    toks = _tokens_df(spark, DOCS)
    a = _collect(pack_sequences(toks.repartition(7), seq_len=3))
    b = _collect(pack_sequences(toks.coalesce(1), seq_len=3))
    assert a == b == _replay(DOCS, 3)


def test_offsets_and_total(spark):
    off, total = document_offsets(_tokens_df(spark, DOCS))
    rows = {r["doc_id"]: (r["n"], r["doc_off"]) for r in off.collect()}
    assert rows == {0: (3, 0), 1: (1, 4), 3: (5, 6), 7: (2, 12)}
    assert total == 15  # 11 tokens + 4 separators


def test_sequence_arrays(spark):
    packed = pack_sequences(_tokens_df(spark, DOCS), seq_len=4)
    arrs = {
        r["seq_id"]: (r["tokens"], r["n_docs"])
        for r in packed_sequence_arrays(packed).collect()
    }
    assert arrs[0] == (["a", "b", "c", "<eos>"], 1)
    assert arrs[1] == (["d", "<eos>", "e", "f"], 2)  # spans doc 1 -> 3
    assert arrs[2] == (["g", "h", "i", "<eos>"], 1)
    assert arrs[3] == (["j", "k", "<eos>"], 1)  # trailing partial kept


def test_bad_seq_len(spark):
    with pytest.raises(ValueError, match="seq_len must be positive"):
        pack_sequences(_tokens_df(spark, DOCS), seq_len=0)


def test_engine_tokens_end_to_end(spark, tiny_docs):
    """Full path over the engine tokenizer: every slot accounted for,
    separators exactly one per doc, stream order == doc_id order."""
    from top2vec_spark.api import Top2VecSpark

    eng = Top2VecSpark(spark, tiny_docs, min_count=0)
    packed = pack_sequences(eng.tokens, seq_len=8)
    rows = sorted(
        ((r["seq_id"], r["pos"]), r["doc_id"], r["term"])
        for r in packed.collect()
    )
    # global slots are dense 0..total-1
    globs = [s * 8 + p for (s, p), _, _ in rows]
    assert globs == list(range(len(rows)))
    # doc ids are non-decreasing along the stream
    dids = [d for _, d, _ in rows]
    assert dids == sorted(dids)
    n_docs = tiny_docs.count()
    assert sum(1 for _, _, t in rows if t == "<eos>") == n_docs
    assert len(rows) == eng.tokens.count() + n_docs


def test_write_roundtrip(spark, tmp_path):
    packed = pack_sequences(_tokens_df(spark, DOCS), seq_len=4)
    seqs = packed_sequence_arrays(packed)
    from top2vec_spark.operators.packing import write_packed_sequences

    out = str(tmp_path / "seqs")
    write_packed_sequences(seqs, out, shards=2)
    back = spark.read.parquet(out)
    got = {r["seq_id"]: (r["tokens"], r["n_docs"]) for r in back.collect()}
    exp = {r["seq_id"]: (r["tokens"], r["n_docs"]) for r in seqs.collect()}
    assert got == exp
    # range sharding: each file holds a contiguous seq_id block
    import collections

    by_file = collections.defaultdict(list)
    for r in back.select("seq_id", F.input_file_name().alias("f")).collect():
        by_file[r["f"]].append(r["seq_id"])
    spans = sorted((min(v), max(v)) for v in by_file.values())
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi < lo


def test_export_training_data_facade(spark, tmp_path):
    """One-call export: splits are disjoint, each split's parquet
    rebuilds exactly from packing that split's tokens, manifest
    counts match, train drops its trailing partial."""
    from top2vec_spark.api import Top2VecSpark
    from top2vec_spark.operators.sampling import split_corpus

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta " * (2 + i % 3)) for i in range(60)],
        "doc_id long, text string",
    )
    eng = Top2VecSpark(spark, docs, min_count=0)
    out = str(tmp_path / "export")
    man = eng.export_training_data(
        out, seq_len=16, weights={"train": 0.7, "val": 0.3}, seed=3
    )
    assign = {
        r["doc_id"]: r["split"]
        for r in split_corpus(
            docs.select("doc_id"), {"train": 0.7, "val": 0.3}, seed=3
        ).collect()
    }
    assert set(man) == {"train", "val"}
    for name, info in man.items():
        members = {d for d, s in assign.items() if s == name}
        assert info["n_docs"] == len(members)
        back = spark.read.parquet(info["path"])
        assert back.count() == info["n_sequences"]
        # split isolation is implied by the exact-rebuild check below:
        # the expected packing uses ONLY this split's tokens
        toks = eng.tokens.filter(F.col("doc_id").isin(list(members)))
        expected = packed_sequence_arrays(
            pack_sequences(toks, seq_len=16, drop_last=(name == "train"))
        )
        got = {r["seq_id"]: r["tokens"] for r in back.collect()}
        exp = {r["seq_id"]: r["tokens"] for r in expected.collect()}
        assert got == exp
        if name == "train":
            assert all(len(t) == 16 for t in got.values())


def test_integer_token_ids(spark):
    """Packing integer token IDs with sep_token=-1 — the real trainer
    export shape."""
    rows = [(d, p, (d * 100 + p)) for d, terms in DOCS for p, _ in enumerate(terms)]
    toks = spark.createDataFrame(rows, "doc_id long, pos int, term long")
    got = {
        (r["seq_id"], r["pos"]): (r["doc_id"], r["term"])
        for r in pack_sequences(toks, seq_len=4, sep_token=-1).collect()
    }
    int_docs = [
        (d, [d * 100 + p for p in range(len(terms))]) for d, terms in DOCS
    ]
    assert got == _replay(int_docs, 4, sep=-1)


def test_doc_starts_boundaries(spark):
    """doc_starts: slot 0 always, plus every doc transition; the
    boundary after a separator lands on the NEXT doc's first slot."""
    packed = pack_sequences(_tokens_df(spark, DOCS), seq_len=4)
    out = {
        r["seq_id"]: (r["tokens"], r["doc_starts"])
        for r in packed_sequence_arrays(packed).collect()
    }
    # seq 0: a b c <eos>            -> all doc 0            -> [0]
    # seq 1: d <eos> e f            -> doc 1,1,3,3          -> [0, 2]
    # seq 2: g h i <eos>            -> all doc 3            -> [0]
    # seq 3: j k <eos>              -> all doc 7            -> [0]
    assert out[0][1] == [0]
    assert out[1][1] == [0, 2]
    assert out[2][1] == [0]
    assert out[3][1] == [0]


def test_string_sep_on_int_column_raises(spark):
    toks = spark.createDataFrame(
        [(0, 0, 5), (0, 1, 6)], "doc_id long, pos int, term long"
    )
    with pytest.raises(TypeError, match="cannot be cast"):
        pack_sequences(toks, seq_len=4, sep_token="<eos>")


def test_non_dense_positions_raise(spark):
    """Phrase-augmented tables (duplicate pos) and holes must fail
    loudly instead of corrupting the stream."""
    dup = spark.createDataFrame(
        [(0, 0, "a"), (0, 0, "a b"), (0, 1, "b")],
        "doc_id long, pos int, term string",
    )
    with pytest.raises(ValueError, match="not dense"):
        pack_sequences(dup, seq_len=4)
    hole = spark.createDataFrame(
        [(0, 0, "a"), (0, 2, "b")], "doc_id long, pos int, term string"
    )
    with pytest.raises(ValueError, match="not dense"):
        pack_sequences(hole, seq_len=4)
