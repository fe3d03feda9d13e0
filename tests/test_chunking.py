"""The Python UDTF chunker must emit exactly the native plan's rows —
the extensibility surface and the production path cannot drift."""

from __future__ import annotations

import pytest

from polla_spark.functions import chunking
from polla_spark.plans.llmdata import q89_token_chunks
from polla_spark.session import read_table

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.skipif(chunking.ChunkDocUDTF is None, reason="no UDTF support")
def test_udtf_chunker_equals_native_plan(spark):
    spark.udtf.register("chunk_doc", chunking.ChunkDocUDTF)
    docs = read_table(spark, SF_DIR, "documents")
    docs.createOrReplaceTempView("_chunk_docs")
    got = spark.sql(
        "SELECT d.doc_id, c.chunk_idx, c.token_start, c.n_tokens, c.chunk_md5 "
        "FROM _chunk_docs d, LATERAL chunk_doc(d.text) c"
    )
    want = q89_token_chunks(spark, SF_DIR)
    assert _rows(got) == _rows(want)
    assert got.count() > 0


def test_iter_chunks_windows_and_overlap():
    # 90 tokens -> starts 0, 40, 80; the last window is short
    text = " ".join(f"t{i}" for i in range(90))
    rows = list(chunking.iter_chunks(text))
    assert [(r[0], r[1], r[2]) for r in rows] == [(0, 0, 50), (1, 40, 50), (2, 80, 10)]
    # overlap: window 1 starts inside window 0
    assert rows[1][1] < rows[0][1] + chunking.CHUNK


def test_iter_chunks_single_token():
    rows = list(chunking.iter_chunks("hello"))
    assert [(r[0], r[1], r[2]) for r in rows] == [(0, 0, 1)]


def test_closed_form_chunk_math_matches_enumeration():
    """q94's closed-form chunk count / token budget must agree with the
    real chunker for every document length (the property the composed
    funnel relies on to avoid the explode)."""
    from hypothesis import given, strategies as st

    @given(st.integers(min_value=1, max_value=400))
    def check(n):
        text = " ".join(f"t{i}" for i in range(n))
        rows = list(chunking.iter_chunks(text))
        n_chunks_closed = (max(n - 1, 0) // chunking.STRIDE) + 1
        tokens_closed = sum(
            min(chunking.CHUNK, n - s)
            for s in range(0, max(n - 1, 0) + 1, chunking.STRIDE)
        )
        assert len(rows) == n_chunks_closed
        assert sum(r[2] for r in rows) == tokens_closed

    check()
