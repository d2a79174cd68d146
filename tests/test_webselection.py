"""Batch: Luhn scan, sparse projection, KMV overlap, k-center —
hand-computed semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from paper2llm_spark.operators.webkcenter import kcenter_seeds
from paper2llm_spark.operators.webluhn import luhn_frame
from paper2llm_spark.operators.webrp import SIGNS, projection_frame
from paper2llm_spark.operators.websketchkmv import kmv_frame


def test_luhn_validates_and_rejects(spark):
    rows = [
        (0, "pay 4111111111111111 now"),          # valid Visa test PAN
        (1, "ref 4111111111111112 id"),           # fails checksum
        (2, "order 411111111111 x"),              # 12 digits: no candidate
        (3, "a 79927398713 b"),                   # 11 digits: no candidate
        (4, "iban 4111111111111111 and 5500005555555559"),  # two valid
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_candidates, r.n_luhn_valid, r.pan_flag)
           for r in luhn_frame(df).collect()}
    assert got[0] == (1, 1, True)
    assert got[1] == (1, 0, False)
    assert got[2] == (0, 0, False)
    assert got[3] == (0, 0, False)
    assert got[4] == (2, 2, True)


def test_luhn_runs_are_maximal(spark):
    # 17 valid digits embedded in a 20-digit run: the run is 20 long,
    # too long to be a candidate — never matched as a substring
    df = spark.createDataFrame(
        [(0, "x 41111111111111110000 y")], "doc_id long, text string"
    )
    got = luhn_frame(df).collect()[0]
    assert (got.n_candidates, got.pan_flag) == (0, False)


def test_projection_matches_hand_dot(spark):
    # unit vector e_i projects to exactly SIGNS[i]
    i = 7
    vec = [0.0] * 64
    vec[i] = 1.0
    df = spark.createDataFrame([(0, vec)], "vec_id long, embedding array<float>")
    row = projection_frame(df).collect()[0]
    for j in range(16):
        assert row[f"p{j}"] == float(SIGNS[i][j])


def test_projection_matrix_is_achlioptas_sparse(spark):
    flat = [s for col in SIGNS for s in col]
    n = len(flat)
    zeros = flat.count(0)
    # 2/3 zeros within a loose band; +1/-1 both present
    assert 0.55 * n < zeros < 0.78 * n
    assert 1 in flat and -1 in flat


def test_kmv_identical_and_disjoint_sources(spark):
    same = [(i, "alpha beta gamma delta", "sA") for i in range(3)]
    same += [(10 + i, "alpha beta gamma delta", "sB") for i in range(3)]
    disjoint = [(20, "one two three four", "sC")]
    df = spark.createDataFrame(
        same + disjoint, "doc_id long, text string, source string"
    )
    got = {(r.src_a, r.src_b): (r.n_union, r.n_inter, r.jaccard_micro)
           for r in kmv_frame(df).collect()}
    # identical vocabularies: union == inter, jaccard == 1
    u, i, j = got[("sA", "sB")]
    assert u == i and j == 1_000_000
    # disjoint: inter == 0
    assert got[("sA", "sC")][1] == 0 and got[("sA", "sC")][2] == 0


def test_kcenter_picks_extremes_first(spark, tmp_path):
    # 1-d line embedded in 64-d: points at 0, 1, 10 (plus seed 0).
    # Seed = vec 0 (min id); farthest = 10; then the middle point.
    def v(x):
        out = [0.0] * 64
        out[0] = float(x)
        return out
    rows = [(0, v(0.0), 0), (1, v(1.0), 0), (2, v(10.0), 0)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{tmp_path}/embeddings.parquet")
    got = [(r.rank, r.vec_id, r.mindist4)
           for r in kcenter_seeds(spark, str(tmp_path)).collect()]
    assert got[0] == (1, 0, 0.0)
    assert got[1] == (2, 2, 100.0)   # farthest from seed
    assert got[2] == (3, 1, 1.0)     # min-dist to {0, 10} is 1
