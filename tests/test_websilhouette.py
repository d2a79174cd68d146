"""Simplified silhouette — exact-centroid vector scores 1.0; corpus
aggregates stay in range."""

from __future__ import annotations

import math

from paper2llm_spark.operators.websilhouette import (
    CENTROIDS, ann_silhouette, silhouette_frame,
)


def test_vector_on_its_centroid_scores_one(spark):
    # the max-norm centroid's own argmax-dot cell is itself
    # (|c|^2 >= |c||c_j| for every j), so a == 0 and s == 1e6
    norms = [math.sqrt(sum(x * x for x in c)) for c in CENTROIDS]
    k = norms.index(max(norms))
    df = spark.createDataFrame(
        [(0, CENTROIDS[k])], "vec_id long, v array<double>"
    )
    rows = silhouette_frame(df).collect()
    assert len(rows) == 1
    assert rows[0].cell == k + 1
    assert (rows[0].n_vecs, rows[0].mean_s_micro) == (1, 1_000_000)


def test_corpus_aggregates_bounded_and_complete(spark):
    rows = ann_silhouette(spark, "/root/testdata/sf0.001").collect()
    assert sum(r.n_vecs for r in rows) == 500
    for r in rows:
        assert -1_000_000 <= r.min_s_micro <= r.mean_s_micro <= 1_000_000
