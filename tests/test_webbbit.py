"""b-bit minwise hashing — estimator endpoints (identical docs -> 1.0,
clamp at 0) and the Li-König correction arithmetic."""

from __future__ import annotations

from paper2llm_spark.operators.webbbit import B_K, bbit_verified_pairs


def _pairs(spark, tmp_path, texts):
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).write.parquet(f"{sf}/documents.parquet")
    return {
        (r.doc_a, r.doc_b): (r.bb_matches, r.r_est_micro)
        for r in bbit_verified_pairs(spark, sf).collect()
    }


def test_identical_docs_estimate_one(spark, tmp_path):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    other = "one two three four five six seven eight nine ten"
    got = _pairs(spark, tmp_path, [base, base, other])
    assert got[(0, 1)] == (B_K, 1_000_000)
    assert all(p == (0, 1) for p in got)  # LSH never pairs the stranger


def test_correction_formula_exact(spark, tmp_path):
    # near-dup pair: whatever m matches the signatures produce, the
    # emitted estimate must be exactly the frozen integer formula
    base = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11"
    near = base + " w12"
    got = _pairs(spark, tmp_path, [base, near])
    (m, est) = got[(0, 1)]
    assert est == max(0, 4 * m - B_K) * 1_000_000 // (3 * B_K)
    assert 0 < est <= 1_000_000
