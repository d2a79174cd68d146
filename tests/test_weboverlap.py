"""Cross-source overlap audit — semantics beyond the driver's hash
gate: identical/disjoint extremes, union property, estimator band."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _overlap(spark, rows):
    from paper2llm_spark.operators.weboverlap import source_overlap_frame

    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    return {
        (r["source_a"], r["source_b"]): (r["n_match"], r["est_jaccard_micro"])
        for r in source_overlap_frame(df).collect()
    }


def test_identical_and_disjoint_extremes(spark):
    from paper2llm_spark.operators.weboverlap import N_OV

    same = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, "a", same), (1, "a", "lambda mu nu xi omicron pi"),
        (2, "b", same), (3, "b", "lambda mu nu xi omicron pi"),
        (4, "c", "one two three four five six seven eight nine ten"),
    ]
    got = _overlap(spark, rows)
    # a and b hold identical corpora -> every slot matches
    assert got[("a", "b")] == (N_OV, 1_000_000)
    # c shares no shingle with either -> zero matches (w.h.p. exact:
    # different shingle sets can only collide per-slot by hash collision)
    assert got[("a", "c")][0] <= 2 and got[("b", "c")][0] <= 2


def test_union_property_doc_split_invariant(spark):
    """Splitting a source's text across more docs must not change its
    sketch: min over the union is min of mins."""
    text = ("w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 "
            "w13 w14 w15 w16 w17 w18 w19 w20")
    toks = text.split()
    half1, half2 = " ".join(toks[:12]), " ".join(toks[10:])  # overlap keeps
    # the trigram set identical to the unsplit doc
    rows = [
        (0, "whole", text),
        (1, "split", half1), (2, "split", half2),
        (3, "other", "q1 q2 q3 q4 q5 q6"),
    ]
    got = _overlap(spark, rows)
    from paper2llm_spark.operators.weboverlap import N_OV
    assert got[("split", "whole")] == (N_OV, 1_000_000)


def test_estimator_tracks_known_jaccard(spark):
    """Two sources built to share half their shingle universe: the
    64-slot estimate must land in a generous binomial band around 0.5
    (3 sigma ~ 0.19)."""
    shared = " ".join(f"s{i}" for i in range(40))
    only_a = " ".join(f"a{i}" for i in range(40))
    only_b = " ".join(f"b{i}" for i in range(40))
    rows = [
        (0, "sa", shared), (1, "sa", only_a),
        (2, "sb", shared), (3, "sb", only_b),
    ]
    (n_match, est) = _overlap(spark, rows)[("sa", "sb")]
    # true J ~ 38 shared trigrams of ~114 total-ish: ~ 1/3; accept wide
    assert 0.10 * 1e6 < est < 0.60 * 1e6, est


def test_corpus_pairs_complete_and_bounded(spark):
    from paper2llm_spark.operators.weboverlap import N_OV, source_overlap

    rows = source_overlap(spark, SF).collect()
    n_src = len({r["source_a"] for r in rows} | {r["source_b"] for r in rows})
    assert len(rows) == n_src * (n_src - 1) // 2
    assert all(0 <= r["n_match"] <= N_OV for r in rows)
    assert any(r["n_match"] > 0 for r in rows), "vacuous: no overlap at all"
