"""Hard-negative mining — hand cosine replay, label-constraint and
rank-structure invariants on the fixture."""

from __future__ import annotations

import math

import pandas as pd

from paper2llm_spark.operators.webhardneg import (
    ANCHOR_EVERY, TOPK, hard_negatives, hard_negatives_frame,
)

SF = "/root/testdata/sf0.001"


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    return dot / (math.sqrt(sum(x * x for x in a))
                  * math.sqrt(sum(x * x for x in b)))


def test_hand_corpus_replay(spark):
    # anchor 0 (label 1): negatives among labels != 1 ranked by cos,
    # hardest positive = least-similar label-1 vector
    vecs = {
        0: ([1.0, 0.0], 1),
        1: ([0.9, 0.1], 1),   # close positive
        2: ([0.0, 1.0], 1),   # far positive -> the hardest one
        3: ([1.0, 0.1], 2),   # closest negative
        4: ([0.5, 1.0], 2),
        5: ([-1.0, 0.2], 3),
    }
    emb = spark.createDataFrame(
        [(k, v, l) for k, (v, l) in vecs.items()],
        "vec_id long, embedding array<float>, label int",
    )
    rows = [r for r in hard_negatives_frame(emb).collect()
            if r.anchor_id == 0]
    negs = sorted((r for r in rows if r.kind == "neg"),
                  key=lambda r: r.rank)
    want = sorted((k for k, (_, l) in vecs.items() if l != 1),
                  key=lambda k: (-_cos(vecs[0][0], vecs[k][0]), k))
    assert [r.neighbor_id for r in negs] == want
    for r in negs:
        assert abs(r.cos4 - round(_cos(vecs[0][0],
                                       vecs[r.neighbor_id][0]), 4)) < 1e-9
    pos = [r for r in rows if r.kind == "pos"]
    assert len(pos) == 1 and pos[0].neighbor_id == 2  # the far positive


def test_fixture_label_constraints_and_structure(spark):
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    labels = dict(zip(emb["vec_id"], emb["label"]))
    rows = hard_negatives(spark, SF).collect()
    anchors = {v for v in labels if v % ANCHOR_EVERY == 0}
    got_anchors = {r.anchor_id for r in rows}
    assert got_anchors == anchors
    by_anchor: dict[int, list] = {}
    for r in rows:
        by_anchor.setdefault(r.anchor_id, []).append(r)
        assert r.neighbor_id != r.anchor_id
        if r.kind == "neg":
            assert labels[r.neighbor_id] != labels[r.anchor_id]
        else:
            assert labels[r.neighbor_id] == labels[r.anchor_id]
    for a, rs in by_anchor.items():
        negs = sorted(r.rank for r in rs if r.kind == "neg")
        assert negs == list(range(1, min(TOPK, len(negs)) + 1))
        assert sum(r.kind == "pos" for r in rs) <= 1
        # negatives ranked by descending similarity
        ordered = sorted((r for r in rs if r.kind == "neg"),
                         key=lambda r: r.rank)
        cos_list = [r.cos4 for r in ordered]
        assert cos_list == sorted(cos_list, reverse=True)
