"""Web-1T n-gram count table — exact occurrence counting (not doc
frequency), per-n boundaries, and the prune threshold."""

from __future__ import annotations

from paper2llm_spark.operators.webngramtab import MIN_COUNT, ngram_counts_frame


def _counts(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {(r.n, r.gram): r.cnt for r in ngram_counts_frame(df).collect()}


def test_total_occurrences_not_doc_frequency(spark):
    # "x y z" once per doc across MIN_COUNT docs, plus one doc where the
    # whole phrase repeats twice -> occurrence count MIN_COUNT + 1
    texts = ["x y z"] * (MIN_COUNT - 1) + ["x y z x y z"]
    out = _counts(spark, texts)
    assert out[(3, "x y z")] == MIN_COUNT + 1
    assert out[(2, "x y")] == MIN_COUNT + 1
    assert out[(1, "x")] == MIN_COUNT + 1
    # the repeat doc also creates the wrap bigram "z x" once: pruned
    assert (2, "z x") not in out


def test_prune_threshold_exact_boundary(spark):
    texts = ["keep me"] * MIN_COUNT + ["drop me"] * (MIN_COUNT - 1)
    out = _counts(spark, texts)
    assert out[(2, "keep me")] == MIN_COUNT
    assert (2, "drop me") not in out
    assert out[(1, "me")] == 2 * MIN_COUNT - 1


def test_short_docs_skip_higher_n(spark):
    texts = ["solo"] * MIN_COUNT
    out = _counts(spark, texts)
    assert out == {(1, "solo"): MIN_COUNT}
