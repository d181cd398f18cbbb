"""Sources: synthetic `pages` generator + loaders.

`pages` is the north-rule input shape (BASELINE.json input_hint):
(url string, warc_ts timestamp, html binary, text string, lang string).
The generator is deterministic (seed fixed), Zipfian vocabulary to
exercise head-term skew, with adversarial tokens (accents, unicode,
'_'-prefix, 1-char, 16+-char) per FIXTURES.md §1. No external data.

``documents_to_pages`` maps the driver-provided read-only
/root/testdata/sf*/documents.parquet into the pages shape
(FIXTURES.md §2).
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# Adversarial tokens exercising the tokenizer contract edges.
_ADVERSARIAL = [
    "café",
    "naïve",
    "über",
    "résumé",
    "_private",
    "a",
    "x",
    "supercalifragilisticexpialidocious",  # >15 chars -> dropped
    "ação",
    "straße",
]
_BASE_EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


def _b26(i: int) -> str:
    s = ""
    while True:
        s = chr(ord("a") + i % 26) + s
        i //= 26
        if i == 0:
            return s


def _vocab(n_terms: int = 5000) -> np.ndarray:
    # Letter-only terms (digits TERMINATE tokens per the tokenizer
    # contract — PAT_ALPHABETIC repeats (?!\d)\w — so digit-bearing
    # synthetic terms would all collapse to one token).
    return np.array([f"w{_b26(i)}" for i in range(n_terms)], dtype=object)


def generate_pages_pdf(
    n_docs: int, seed: int = 42, n_terms: int = 5000, start: int = 0
) -> pd.DataFrame:
    """Deterministic pandas frame of synthetic pages for global doc
    indices [start, start+n_docs). The RNG seed is derived from
    (seed, start) — counter-based, so distributed slices are
    independent and reproducible at O(slice) cost."""
    rng = np.random.default_rng([seed, start])
    vocab = _vocab(n_terms)
    lengths = np.clip(
        rng.lognormal(mean=4.0, sigma=0.7, size=n_docs).astype(int), 5, 500
    )
    rows = []
    for j in range(n_docs):
        i = start + j
        ranks = rng.zipf(1.1, size=lengths[j])
        terms = vocab[(ranks - 1) % n_terms].tolist()
        if i % 7 == 0:
            terms.insert(0, _ADVERSARIAL[i % len(_ADVERSARIAL)])
        text = " ".join(terms)
        mid = len(text) // 2
        html = (
            f"<html><body><b>{text[:mid]}</b><a href='/x'>{text[mid:]}</a>"
            f"</body></html>"
        ).encode("utf-8")
        rows.append(
            {
                "url": f"https://ex{i % 97}.test/p/{i}",
                "warc_ts": _BASE_EPOCH + dt.timedelta(seconds=i * 17),
                "html": html,
                "text": text,
                "lang": "de" if i % 53 == 0 else ("fr" if i % 67 == 0 else "en"),
            }
        )
    return pd.DataFrame(rows)


# Slice size: one generator task unit. Deterministic function of
# n_docs so content never depends on cluster parallelism.
_SLICE = 2000


def generate_pages(
    spark: SparkSession, n_docs: int, seed: int = 42
) -> DataFrame:
    """Distributed deterministic generation: fixed-size slices, each
    generated independently from a (seed, start) counter-derived RNG —
    identical content at any parallelism, O(n/slices) per task."""
    starts = list(range(0, n_docs, _SLICE))
    slices = spark.createDataFrame(
        [(s, min(s + _SLICE, n_docs)) for s in starts], "lo long, hi long"
    ).repartition(max(1, len(starts)))

    def gen(iterator):
        for pdf in iterator:
            for lo, hi in zip(pdf["lo"], pdf["hi"]):
                yield generate_pages_pdf(int(hi - lo), seed=seed, start=int(lo))

    return slices.mapInPandas(gen, PAGES_SCHEMA)


def documents_to_pages(docs: DataFrame) -> DataFrame:
    """Map the driver `documents` table into the pages shape
    (FIXTURES.md §2: url := source || '/' || doc_id)."""
    return docs.select(
        F.concat_ws("/", "source", F.col("doc_id").cast("string")).alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        "text",
        "lang",
    )


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")
