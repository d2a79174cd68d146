"""Kneser-Ney bigram LM (webkn.py) — hand-computed semantics.

Expected micro log-probs derived by hand from the frozen formula
(D=0.75, uniform +1/V_right continuation floor; see module
docstring): train = doc 0 "a b a b a c" (even id), scored corpus
includes held-out doc 1 "a b x" with an unseen right type.
"""

from __future__ import annotations

from paper2llm_spark.operators.webkn import kn_frame

# train bigrams: (a,b)x2 (b,a)x2 (a,c)x1
#   ctx: a -> c1=3, N1+(a,.)=2 ; b -> c1=2, N1+(b,.)=1
#   cont: N1+(.,b)=1  N1+(.,a)=1  N1+(.,c)=1 ; nbi=3, vr=3
# P(b|a) = 1.25/3 + (0.75*2/3)*(2/7)            -> lp -580669
# P(a|b) = 1.25/2 + (0.75*1/2)*(2/7)            -> lp -311780
# P(c|a) = 0.25/3 + (0.75*2/3)*(2/7)            -> lp -1486378
# P(x|b) = 0      + (0.75*1/2)*(1/7)  (x unseen) -> lp -2926739
LP_AB, LP_BA, LP_AC, LP_BX = -580669, -311780, -1486378, -2926739


def test_kn_hand_computed(spark):
    rows = [(0, "a b a b a c"), (1, "a b x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_bigrams, r.lp_sum_micro)
           for r in kn_frame(df).collect()}
    assert got[0] == (5, 2 * LP_AB + 2 * LP_BA + LP_AC)
    assert got[1] == (2, LP_AB + LP_BX)


def test_kn_unseen_context_backs_off_to_continuation(spark):
    # doc 1's "q" never appears as a LEFT context in training:
    # P(a|q) = Pcont(a) = (1+1)/(3+3+1); "a" IS a frequent right word
    # in training but has only ONE distinct left context — KN's point.
    import math

    rows = [(0, "a b a b a c"), (1, "q a")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.lp_sum_micro for r in kn_frame(df).collect()}
    assert got[1] == math.floor(math.log(2 / 7) * 1e6 + 0.5)


def test_kn_train_split_is_even_ids_only(spark):
    # identical text under an odd id contributes nothing to training:
    # with NO even docs the train table is empty -> every bigram hits
    # the unseen-context branch with nbi=0, vr=0 -> P = 1/1 -> lp 0
    rows = [(1, "a b"), (3, "a b")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for r in kn_frame(df).collect():
        assert (r.n_bigrams, r.lp_sum_micro) == (1, 0)
