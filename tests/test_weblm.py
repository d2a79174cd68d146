"""Bigram Stupid-Backoff LM perplexity (CCNet-style quality signal) —
semantics beyond the driver's hash gate: exact Python replay with a
forced backoff, OOV floor, train/score split, plan shape."""

from __future__ import annotations

import math

SF = "/root/testdata/sf0.001"


def _py_lm(docs: dict[int, str]):
    """Reference replay of the operator's arithmetic."""
    toks = {d: t.lower().split() for d, t in docs.items() if t.split()}
    pairs = {
        d: [("<s>" if i == 0 else tk[i - 1], tk[i]) for i in range(len(tk))]
        for d, tk in toks.items()
    }
    b: dict = {}
    for d, ps in pairs.items():
        if d % 2 == 0:
            for p in ps:
                b[p] = b.get(p, 0) + 1
    c1: dict = {}
    cu: dict = {}
    for (w1, w2), c in b.items():
        c1[w1] = c1.get(w1, 0) + c
        cu[w2] = cu.get(w2, 0) + c
    n_total = sum(cu.values())
    out = {}
    for d, ps in pairs.items():
        lps = []
        for w1, w2 in ps:
            if (w1, w2) in b:
                lps.append(
                    math.floor(math.log(b[(w1, w2)] / c1[w1]) * 1e6 + 0.5)
                )
            else:
                lps.append(
                    math.floor(
                        math.log((2 * cu.get(w2, 1)) / (5 * n_total)) * 1e6
                        + 0.5
                    )
                )
        nll = -sum(lps)
        # Spark div / DuckDB // truncate toward zero; nll >= 0 here
        out[d] = (len(ps), nll, nll // len(ps) if nll >= 0 else -((-nll) // len(ps)))
    return out


def _run(spark, docs: dict[int, str]):
    from paper2llm_spark.operators.weblm import lm_perplexity_frame

    df = spark.createDataFrame(
        [(d, t) for d, t in docs.items()], "doc_id long, text string"
    )
    return {
        r["doc_id"]: (r["n_tokens"], r["nll_micro"], r["avg_nll_micro"])
        for r in lm_perplexity_frame(df).collect()
    }


def test_matches_python_replay_with_backoff(spark):
    """doc 1 (held out) contains a bigram and a unigram the train split
    (docs 0, 2) never saw — both backoff branches must fire and match
    the replay exactly."""
    docs = {
        0: "the cat sat on the mat",
        1: "the dog sat on a zebra",  # 'the dog', 'a zebra' unseen; 'zebra' OOV
        2: "the cat ran on the mat",
    }
    assert _run(spark, docs) == _py_lm(docs)


def test_train_docs_have_no_oov(spark):
    """Every bigram of a train-split doc is in the model by construction:
    its score is the pure seen-branch sum (replay cross-check)."""
    docs = {0: "a b a b", 2: "b a b a", 4: "a a b b"}
    got, want = _run(spark, docs), _py_lm(docs)
    assert got == want
    assert all(v[1] > 0 for v in got.values())  # nll positive, never NULL


def test_empty_and_whitespace_docs_dropped(spark):
    docs = {0: "x y", 1: "   ", 2: ""}
    got = _run(spark, docs)
    assert set(got) == {0}


def test_lower_perplexity_for_in_distribution_text(spark):
    """The signal must discriminate: a held-out doc repeating the train
    distribution scores a lower avg NLL than one made of unseen
    bigrams — the property CCNet's filter relies on."""
    docs = {
        0: "the cat sat on the mat " * 3,
        2: "the cat sat on the mat " * 3,
        1: "the cat sat on the mat",            # in-distribution held-out
        3: "zebra quark flux omega nebula",      # all-backoff held-out
    }
    got = _run(spark, docs)
    assert got[1][2] < got[3][2]


def test_plan_single_corpus_exchange_and_broadcast_lm(spark):
    """Scale contract: the bigram count is the ONE corpus-sized shuffle;
    c1/cu/N derive from it (no second corpus agg); every scoring join is
    broadcast (never sort-merge) and N re-enters as a 1-row broadcast."""
    from paper2llm_spark.operators.weblm import lm_perplexity

    df = lm_perplexity(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 3  # big, ctx, uni lookups
    assert "BroadcastNestedLoopJoin" in plan     # 1-row N re-entry
