"""Content-defined chunking — semantics beyond the driver's hash
gate: boundary locality (the CDC property), chunk reassembly, replay."""

from __future__ import annotations

import hashlib

SF = "/root/testdata/sf0.001"


def _py_cdc(text: str, w: int, m: int):
    from paper2llm_spark.operators.webcdc import GEAR, SHIFT_CDC

    n = len(text)
    if n == 0:
        return []

    def gear_hash(i):  # 1-based end position of the window
        return sum(
            GEAR[ord(text[i - 1 - k]) % 256] * (1 << k) for k in range(w)
        )

    cuts = [
        i for i in range(w, n + 1)
        if (gear_hash(i) >> SHIFT_CDC) % m == 0
    ]
    if not (cuts and cuts[-1] == n):
        cuts.append(n)
    out, prev = [], 0
    for j, c in enumerate(cuts, start=1):
        chunk = text[prev:c]
        out.append((j, prev + 1, len(chunk),
                    hashlib.md5(chunk.encode()).hexdigest()))
        prev = c
    return out


def _spark_cdc(spark, docs):
    from paper2llm_spark.operators.webcdc import cdc_chunks_frame

    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {}
    for r in cdc_chunks_frame(df).collect():
        out.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_start"], r["chunk_len"],
             r["chunk_md5"])
        )
    return {d: sorted(v) for d, v in out.items()}


def test_matches_python_replay(spark):
    from paper2llm_spark.operators.webcdc import M_CDC, W_CDC

    texts = [
        "The quick brown fox jumps over the lazy dog. " * 20,
        "short",                      # n < W: single chunk
        "x" * 16,                     # n == W boundary case
        "different content here with assorted words and phrases " * 10,
    ]
    docs = [(i, t) for i, t in enumerate(texts)]
    got = _spark_cdc(spark, docs)
    for d, t in docs:
        assert got[d] == _py_cdc(t, W_CDC, M_CDC), d


def test_chunks_tile_the_document(spark):
    """Chunks are contiguous, non-overlapping, and cover [1, len]."""
    from paper2llm_spark.operators.webcdc import cdc_chunks

    out = {}
    for r in cdc_chunks(spark, SF).collect():
        out.setdefault(r["doc_id"], []).append(r)
    assert len(out) == 500
    import duckdb
    lens = dict(duckdb.sql(
        f"SELECT doc_id, length(text) FROM '{SF}/documents.parquet'"
    ).fetchall())
    for d, rs in out.items():
        rs = sorted(rs, key=lambda r: r["chunk_idx"])
        pos = 1
        for j, r in enumerate(rs, start=1):
            assert r["chunk_idx"] == j and r["chunk_start"] == pos
            assert r["chunk_len"] >= 1
            pos += r["chunk_len"]
        assert pos - 1 == lens[d], d


def test_boundary_locality_insert_preserves_downstream_chunks(spark):
    """THE content-defined property: prepending a paragraph leaves the
    digests of all chunks after the first resync point unchanged
    (fixed-size chunking would shift every boundary)."""
    base = "assorted web page content with many distinct words " * 30
    edited = "NEW INSERTED LEAD PARAGRAPH. " + base
    got = _spark_cdc(spark, [(0, base), (1, edited)])
    d0 = {md5 for _, _, _, md5 in got[0]}
    d1 = {md5 for _, _, _, md5 in got[1]}
    shared = d0 & d1
    # all chunks strictly after the edit's resync point are shared
    assert len(shared) >= len(d0) - 2, (len(shared), len(d0))
    assert d1 - d0, "edit produced no new chunk"


def test_corpus_chunk_dedup_is_nonvacuous(spark):
    """Planted near-dup docs must share chunk digests corpus-wide —
    the storage-dedup payoff the operator exists for."""
    from pyspark.sql import functions as F

    from paper2llm_spark.operators.webcdc import cdc_chunks

    out = cdc_chunks(spark, SF)
    dup = out.groupBy("chunk_md5").count().filter(F.col("count") > 1)
    assert dup.count() > 50
