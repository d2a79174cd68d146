"""ExactSubstr duplicated spans — semantics beyond the driver's hash
gate: planted-span recovery, maximal-merge boundary, within-doc
duplication, island breaks."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _spans(spark, docs: list[tuple[int, str]]):
    from paper2llm_spark.operators.websubstr import substring_spans_frame

    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {}
    for r in substring_spans_frame(df).collect():
        out.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"], r["span_toks"])
        )
    return {d: sorted(v) for d, v in out.items()}


def test_planted_cross_doc_span_is_maximal(spark):
    """A 6-token phrase shared by two docs at different offsets: every
    overlapping 4-gram matches, and the islands merge them into ONE
    maximal span covering exactly the 6 shared tokens."""
    shared = "alpha bravo charlie delta echo foxtrot"
    docs = [
        (0, f"u00 u01 {shared} u02 u03 u04"),                  # pos 3..8
        (1, f"v00 v01 v02 v03 v04 {shared} v05"),              # pos 6..11
        (2, "w00 w01 w02 w03 w04 w05 w06 w07"),                # clean
    ]
    got = _spans(spark, docs)
    assert got == {0: [(3, 8, 6)], 1: [(6, 11, 6)]}


def test_two_islands_and_gap_boundary(spark):
    """Two shared phrases in one doc separated by > k unique tokens
    stay two spans; separated by exactly k they merge (contiguous
    duplicated region rule: break iff gap > k)."""
    a, b = "p1 p2 p3 p4", "q1 q2 q3 q4"
    donor = (90, f"{a} zz1 zz2 zz3 zz4 zz5 {b}")
    # far: 5 unique tokens between the phrases -> gaps of 9 > k=4
    far = (0, f"{a} x1 x2 x3 x4 x5 {b}")
    # touching: phrases adjacent -> matched positions 1 and 5, gap 4 == k
    touching = (1, f"{a} {b} y1 y2 y3")
    got = _spans(spark, [donor, far, touching])
    assert got[0] == [(1, 4, 4), (10, 13, 4)]
    assert got[1] == [(1, 8, 8)]
    # donor's own spans: a at 1..4, b at 10..13 (gap 9 > 4)
    assert got[90] == [(1, 4, 4), (10, 13, 4)]


def test_within_doc_repetition_counts(spark):
    """A phrase repeated INSIDE one doc is duplicated corpus-wide even
    with no second document."""
    docs = [(0, "r1 r2 r3 r4 mid1 mid2 mid3 mid4 mid5 r1 r2 r3 r4")]
    got = _spans(spark, docs)
    assert got == {0: [(1, 4, 4), (10, 13, 4)]}


def test_short_docs_and_unique_docs_emit_nothing(spark):
    from paper2llm_spark.operators.websubstr import substring_spans_frame

    docs = [(0, "a b c"), (1, "a b c"),     # 3 toks < k: no grams at all
            (2, "one two three four five")]  # unique
    assert substring_spans_frame(
        spark.createDataFrame(docs, "doc_id long, text string")
    ).count() == 0


def test_corpus_spans_are_well_formed(spark):
    from paper2llm_spark.operators.websubstr import (
        MIN_MATCH_TOK, substring_spans,
    )

    out = substring_spans(spark, SF).cache()
    try:
        assert out.count() > 0, "vacuous: no duplicated spans at sf0.001"
        bad = out.filter(
            (F.col("span_toks") < MIN_MATCH_TOK)
            | (F.col("span_toks") != F.col("span_end") - F.col("span_start") + 1)
            | (F.col("span_start") < 1)
        ).count()
        assert bad == 0
        # spans within a doc never overlap (maximality)
        from pyspark.sql import Window
        w = Window.partitionBy("doc_id").orderBy("span_start")
        overlap = out.withColumn(
            "prev_end", F.lag("span_end").over(w)
        ).filter(F.col("span_start") <= F.col("prev_end")).count()
        assert overlap == 0
    finally:
        out.unpersist()
