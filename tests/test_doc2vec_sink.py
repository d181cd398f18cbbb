"""Doc2Vec corpus_file sink (S2): byte parity with the reference's
temp-file write (top2vec.py:604-609), global line order, manifest
line-number -> doc_id mapping, empty-document alignment."""

from __future__ import annotations

import pytest

from top2vec_spark.api import Top2VecSpark
from top2vec_spark.functions.tokenizer import reference_tokenize
from top2vec_spark.sources.doc2vec_corpus import (
    corpus_part_files,
    export_doc2vec_corpus,
    write_local_corpus_file,
)


@pytest.fixture(scope="module")
def sink_corpus():
    # doc 3 tokenizes to nothing (every token < MIN_TOKEN_LEN or
    # numeric) -> must become an EMPTY line, keeping line numbering
    # aligned with document order like the reference's ''.
    return [
        (0, "the cat sat on the mat"),
        (1, "the dog sat on the log"),
        (2, "cats and dogs and cats"),
        (3, "a 1 2 3 b"),
        (4, "the quick brown fox jumps over the lazy dog"),
        (5, "spark builds inverted indexes fast"),
    ]


@pytest.fixture(scope="module")
def sink_model(spark, sink_corpus):
    docs = spark.createDataFrame(sink_corpus, "doc_id long, text string")
    return Top2VecSpark(spark, docs, min_count=1)


def reference_lines(corpus):
    """The reference expression: ' '.join(tokenizer(doc)) per doc in
    document order (top2vec.py:605)."""
    return [
        " ".join(reference_tokenize(text))
        for _, text in sorted(corpus, key=lambda r: r[0])
    ]


def read_corpus_lines(path):
    out = []
    for part in corpus_part_files(path):
        with open(part, encoding="utf8") as f:
            out.extend(f.read().split("\n")[:-1])  # writer ends file with \n
    return out


def test_corpus_bytes_match_reference(sink_model, sink_corpus, tmp_path):
    path = str(tmp_path / "d2v")
    sink_model.export_doc2vec_corpus(path, n_files=3)
    assert read_corpus_lines(path) == reference_lines(sink_corpus)


def test_empty_document_keeps_its_line(sink_model, sink_corpus, tmp_path):
    path = str(tmp_path / "d2v_empty")
    sink_model.export_doc2vec_corpus(path, n_files=2)
    lines = read_corpus_lines(path)
    assert lines[3] == ""  # doc 3 fully filtered
    assert len(lines) == len(sink_corpus)


def test_manifest_maps_lines_to_doc_ids(sink_model, sink_corpus, tmp_path):
    path = str(tmp_path / "d2v_manifest")
    manifest = sink_model.export_doc2vec_corpus(path, n_files=3)
    rows = sorted(manifest.collect(), key=lambda r: r["split_id"])
    # splits: contiguous ascending, line offsets cumulative
    assert sum(r["n_lines"] for r in rows) == len(sink_corpus)
    offset = 0
    prev_last = -1
    for r in rows:
        assert r["first_line"] == offset
        assert r["first_doc_id"] > prev_last
        assert r["first_doc_id"] <= r["last_doc_id"]
        offset += r["n_lines"]
        prev_last = r["last_doc_id"]
    # the mapping contract: line (first_line + i) of the concatenated
    # corpus is the i-th ascending doc_id in the split's range
    lines = read_corpus_lines(path)
    expected = reference_lines(sink_corpus)
    doc_ids = sorted(d for d, _ in sink_corpus)
    for r in rows:
        split_ids = [
            d for d in doc_ids if r["first_doc_id"] <= d <= r["last_doc_id"]
        ]
        assert len(split_ids) == r["n_lines"]
        for i, d in enumerate(split_ids):
            assert lines[r["first_line"] + i] == expected[d]


def test_part_file_order_is_doc_id_order(sink_model, tmp_path):
    path = str(tmp_path / "d2v_order")
    manifest = sink_model.export_doc2vec_corpus(path, n_files=3)
    rows = sorted(manifest.collect(), key=lambda r: r["split_id"])
    parts = corpus_part_files(path)
    # every non-empty split has a part file; filename order == split order
    assert len(parts) >= len([r for r in rows if r["n_lines"] > 0])


def test_local_single_file_matches_reference(
    sink_model, sink_corpus, tmp_path
):
    f = tmp_path / "corpus.txt"
    n = write_local_corpus_file(sink_model.get_document_tokens(), str(f))
    assert n == len(sink_corpus)
    content = f.read_text(encoding="utf8")
    # reference: lines = "\n".join(processed); line-oriented writer
    # appends the final newline — strip it for the byte comparison
    assert content == "\n".join(reference_lines(sink_corpus)) + "\n"


def test_local_writer_max_docs_guard(sink_model):
    with pytest.raises(ValueError, match="max_docs"):
        write_local_corpus_file(
            sink_model.get_document_tokens(), "/tmp/never.txt", max_docs=2
        )


def test_global_order_at_20k_docs(spark, tmp_path):
    """The range-partitioning contract at a size where boundary
    placement actually matters: 20k synthetic pages across 16 part
    files — filename-ordered concatenation must equal the doc_id-
    ordered reference expression line for line, and the manifest's
    line offsets must map every split correctly."""
    from pyspark.sql import functions as F

    from top2vec_spark.operators.tokens import assign_doc_ids
    from top2vec_spark.sources.pages import generate_pages

    docs = (
        assign_doc_ids(generate_pages(spark, 20_000))
        .withColumn("text", F.decode("html", "utf-8"))
        .select("doc_id", "text")
    )
    eng = Top2VecSpark(spark, docs, min_count=0, ascii_fast_path=True)
    path = str(tmp_path / "d2v_20k")
    manifest = eng.export_doc2vec_corpus(path, n_files=16)
    lines = read_corpus_lines(path)
    assert len(lines) == 20_000
    expected = {
        r["doc_id"]: r["joined"]
        for r in eng.get_document_tokens()
        .select("doc_id", F.array_join("tokens", " ").alias("joined"))
        .collect()
    }
    ordered = [expected[d] for d in sorted(expected)]
    assert lines == ordered
    rows = sorted(manifest.collect(), key=lambda r: r["split_id"])
    assert sum(r["n_lines"] for r in rows) == 20_000
    # every split's first line is the line at its first_line offset
    for r in rows:
        assert lines[r["first_line"]] == expected[r["first_doc_id"]]


def test_standalone_sink_on_tokens_df(spark, tmp_path):
    """The sink is usable without the full engine: any (doc_id,
    tokens) frame works, e.g. a custom tokenizer's output."""
    df = spark.createDataFrame(
        [(10, ["alpha", "beta"]), (11, []), (12, ["gamma"])],
        "doc_id long, tokens array<string>",
    )
    path = str(tmp_path / "standalone")
    manifest = export_doc2vec_corpus(df, path, n_files=2)
    assert read_corpus_lines(path) == ["alpha beta", "", "gamma"]
    assert sum(r["n_lines"] for r in manifest.collect()) == 3
