"""Keep-best canonical selection: longest-wins policy, tiebreak,
singleton passthrough, exactly one keeper per cluster."""

from __future__ import annotations

from pyspark.sql import functions as F

from paper2llm_spark.operators.webkeep import keep_best, keep_best_frame


def _rows(spark, members, chars):
    clusters = spark.createDataFrame(
        members, "doc_id long, cluster long")
    docs = spark.createDataFrame(
        chars, "doc_id long, n_chars long")
    return {r.doc_id: r for r in keep_best_frame(clusters, docs).collect()}


def test_longest_wins_and_tiebreak(spark):
    """Cluster 1: doc 3 is longest -> kept.  Cluster 10: equal lengths
    -> lowest doc_id kept."""
    rows = _rows(
        spark,
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
        [(1, 100), (2, 50), (3, 900), (10, 70), (11, 70)],
    )
    assert [rows[i].keep for i in (1, 2, 3)] == [False, False, True]
    assert rows[10].keep and not rows[11].keep
    assert rows[1].cluster_size == 3 and rows[10].cluster_size == 2


def test_singletons_always_kept(spark):
    rows = _rows(spark, [(7, 7)], [(7, 1)])
    assert rows[7].keep and rows[7].cluster_size == 1


def test_corpus_one_keeper_per_cluster(spark):
    df = keep_best(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert len(rows) == 500
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r.cluster, []).append(r)
    for members in by_cluster.values():
        keepers = [m for m in members if m.keep]
        assert len(keepers) == 1
        assert all(
            (keepers[0].n_chars, -keepers[0].doc_id)
            >= (m.n_chars, -m.doc_id) for m in members
        )
        assert all(m.cluster_size == len(members) for m in members)
    # the corpus has real dup clusters (planted near-dups) — the
    # policy must actually drop something
    assert any(len(v) > 1 for v in by_cluster.values())
