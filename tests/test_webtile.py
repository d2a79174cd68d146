"""TextTiling — hand-computed block cosines, depth scores, and
boundary placement (W=10, K=3)."""

from __future__ import annotations

from paper2llm_spark.operators.webtile import TILE_K, TILE_W, tile_frame


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.doc_id: r for r in tile_frame(df).collect()}


def test_topic_shift_detected_at_the_seam(spark):
    assert (TILE_W, TILE_K) == (10, 3)
    # 20 'a' then 20 'b' -> 4 sequences, 3 gaps.  Hand cosines:
    # gap1 left {a:10} right {a:10,b:20}: 1e8/sqrt(100*500) -> 447214
    # gap2 left {a:20} right {b:20}: dot 0 -> 0
    # gap3 mirror of gap1 -> 447214
    # depths [0, 894428, 0]; thr < 894428 -> ONE boundary at gap 2.
    text = " ".join(["a"] * 20 + ["b"] * 20)
    got = _run(spark, [(0, text)])[0]
    assert (got.n_seqs, got.n_gaps) == (4, 3)
    assert (got.n_boundaries, got.top_gap) == (1, 2)
    assert got.max_depth_micro == 2 * 447_214


def test_uniform_doc_has_no_boundary(spark):
    # one topic: every block cosine is exactly 1e6, depths all 0,
    # threshold = mean - 0 = 1e6 -> nothing exceeds it
    got = _run(spark, [(0, " ".join(["c"] * 40))])[0]
    assert (got.n_boundaries, got.max_depth_micro) == (0, 0)
    assert got.top_gap == 1        # all-tie argmax -> lowest gap


def test_single_sequence_docs_emit_no_row(spark):
    got = _run(spark, [(0, "x y z."), (1, " ".join(["d"] * 25))])
    assert 0 not in got            # 3 tokens -> 1 seq -> nothing to cut
    assert got[1].n_seqs == 3      # 25 tokens -> 3 seqs -> present
