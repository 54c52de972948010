"""Token-window chunking: coverage, overlap, and tail properties."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_database_spark.operators.text import chunk_documents
from graph_database_spark.sources.testdata import load_table

SF_DIR = "/root/testdata/sf0.001"
W, O = 64, 16
STRIDE = W - O


@pytest.fixture(scope="module")
def chunks(spark):
    docs = load_table(spark, SF_DIR, "documents")
    rows = chunk_documents(docs, window=W, overlap=O).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    return rows, texts


def test_chunks_cover_every_token_with_correct_overlap(chunks):
    rows, texts = chunks
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_id"]] = r
    assert set(by_doc) == set(texts)  # no doc disappears
    for doc_id, cs in by_doc.items():
        toks = [t for t in texts[doc_id].strip().split() if t]
        assert sorted(cs) == list(range(len(cs)))  # dense chunk ids
        for i, r in sorted(cs.items()):
            want = toks[i * STRIDE: i * STRIDE + W]
            got = r["chunk_text"].split() if r["chunk_text"] else []
            assert got == want, (doc_id, i)
            assert r["n_tokens"] == len(want)
        # stitching the chunks' stride-prefixes + the last chunk's tail
        # reproduces the full token stream
        stitched = []
        for i, r in sorted(cs.items()):
            ts = r["chunk_text"].split() if r["chunk_text"] else []
            stitched.extend(ts if i == max(cs) else ts[:STRIDE])
        assert stitched == toks


def test_tiny_and_empty_docs_yield_one_chunk(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, ""), (3, "   "), (4, " ".join(["w"] * O))],
        "doc_id long, text string")
    rows = chunk_documents(df, window=W, overlap=O).collect()
    got = {r["doc_id"]: r for r in rows}
    assert len(rows) == 4 and set(got) == {1, 2, 3, 4}
    assert got[1]["chunk_text"] == "a b c" and got[1]["n_tokens"] == 3
    assert got[2]["chunk_text"] == "" and got[2]["n_tokens"] == 0
    assert got[3]["n_tokens"] == 0
    assert got[4]["n_tokens"] == O


def test_overlap_must_be_smaller_than_window(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, window=8, overlap=8)
