"""Passage chunking — semantics beyond the driver's hash gate:
window/stride arithmetic on handcrafted token counts."""

from __future__ import annotations

from paper2llm_spark.operators.webchunk import (
    STRIDE, WINDOW, passage_chunks_frame,
)

SF = "/root/testdata/sf0.001"


def _chunks(spark, texts: list[str]):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = {}
    for r in passage_chunks_frame(df).collect():
        out.setdefault(r.doc_id, []).append(r)
    for v in out.values():
        v.sort(key=lambda r: r.chunk_idx)
    return out


def test_short_doc_single_chunk(spark):
    text = " ".join(f"w{i}" for i in range(WINDOW))  # exactly W tokens
    rows = _chunks(spark, [text])
    assert len(rows[0]) == 1
    r = rows[0][0]
    assert (r.tok_start, r.n_tokens) == (0, WINDOW)
    assert r.chunk_text == text


def test_overlap_and_tail(spark):
    # W + 1 tokens -> exactly 2 chunks; the second starts at STRIDE and
    # holds the remaining W + 1 - STRIDE tokens (overlap = W - STRIDE).
    n = WINDOW + 1
    toks = [f"w{i}" for i in range(n)]
    rows = _chunks(spark, [" ".join(toks)])[0]
    assert [r.chunk_idx for r in rows] == [0, 1]
    assert rows[0].chunk_text == " ".join(toks[:WINDOW])
    assert rows[1].tok_start == STRIDE
    assert rows[1].n_tokens == n - STRIDE
    assert rows[1].chunk_text == " ".join(toks[STRIDE:])


def test_every_token_covered_and_empty_dropped(spark):
    n = 3 * WINDOW + 7
    toks = [f"w{i}" for i in range(n)]
    rows = _chunks(spark, [" ".join(toks), "", "   "])
    assert set(rows) == {0}  # empty / whitespace-only docs yield no rows
    covered = set()
    for r in rows[0]:
        covered.update(range(r.tok_start, r.tok_start + r.n_tokens))
        assert r.n_tokens >= 1
    assert covered == set(range(n))


def test_stride_spacing(spark):
    n = 5 * STRIDE + WINDOW  # several full windows
    rows = _chunks(spark, [" ".join(f"w{i}" for i in range(n))])[0]
    starts = [r.tok_start for r in rows]
    assert starts == [i * STRIDE for i in range(len(starts))]
    # last chunk must reach the final token
    last = rows[-1]
    assert last.tok_start + last.n_tokens == n
