"""HLL + Count-Min sketches — semantics beyond the driver's hash
gate: estimator accuracy vs true counts, the merge property, CMS's
one-sided error guarantee."""

from __future__ import annotations

import math

import duckdb

SF = "/root/testdata/sf0.01"
_TOK = "list_filter(string_split_regex(lower(text), '\\s+'), x -> length(x) > 0)"


def _hll_estimate(regs: dict[int, int], m: int) -> float:
    alpha = 0.7213 / (1 + 1.079 / m)
    z = sum(2.0 ** -regs.get(j, 0) for j in range(m))
    e = alpha * m * m / z
    v = sum(1 for j in range(m) if j not in regs)
    if e <= 2.5 * m and v > 0:
        e = m * math.log(m / v)
    return e


def test_hll_estimate_within_band(spark):
    from paper2llm_spark.operators.websketch import HLL_M, hll_registers

    regs = {
        r["bucket"]: r["max_rank"]
        for r in hll_registers(spark, SF).collect()
    }
    assert len(regs) <= HLL_M
    assert all(1 <= v <= 53 for v in regs.values())
    true = duckdb.sql(f"""
        WITH t AS (SELECT {_TOK} AS tok FROM '{SF}/documents.parquet'),
        s AS (SELECT unnest(CASE WHEN len(tok) >= 3 THEN
            list_transform(range(1, len(tok) - 1),
                i -> tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2])
            ELSE [] END) AS sh FROM t)
        SELECT count(DISTINCT sh) FROM s""").fetchone()[0]
    est = _hll_estimate(regs, HLL_M)
    sigma = 1.04 / math.sqrt(HLL_M)
    assert abs(est - true) / true < 3 * sigma, (est, true)


def test_hll_registers_merge_by_max(spark):
    """The reason to materialize registers: sketch(A union B) ==
    elementwise-max(sketch(A), sketch(B)) — mergeable across shards
    and days."""
    from paper2llm_spark.operators.websketch import hll_registers_frame

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    whole = {
        r["bucket"]: r["max_rank"]
        for r in hll_registers_frame(docs).collect()
    }
    a = {r["bucket"]: r["max_rank"] for r in hll_registers_frame(
        docs.filter("doc_id % 2 = 0")).collect()}
    b = {r["bucket"]: r["max_rank"] for r in hll_registers_frame(
        docs.filter("doc_id % 2 = 1")).collect()}
    merged = {k: max(a.get(k, 0), b.get(k, 0)) for k in set(a) | set(b)}
    assert merged == whole


def test_countmin_one_sided_error(spark):
    """CMS point estimates NEVER undercount, and overcount is bounded
    (e/w per unit of total mass; allow 3x slack for d=4)."""
    import hashlib

    from paper2llm_spark.operators.websketch import (
        CMS_D, CMS_W, countmin_counts,
    )

    counters: dict[tuple[int, int], int] = {
        (r["row_idx"], r["bucket"]): r["cnt"]
        for r in countmin_counts(spark, SF).collect()
    }
    truth = dict(duckdb.sql(f"""
        WITH t AS (SELECT {_TOK} AS tok FROM '{SF}/documents.parquet'),
        s AS (SELECT unnest(tok) AS term FROM t)
        SELECT term, count(*) FROM s GROUP BY term""").fetchall())
    total = sum(truth.values())

    def h(j: int, term: str) -> int:
        return int(
            hashlib.md5(f"cms{j}:{term}".encode()).hexdigest()[:15], 16
        ) % CMS_W

    bound = 3 * math.e / CMS_W * total
    for term, n in truth.items():
        est = min(
            counters.get((j, h(j, term)), 0) for j in range(CMS_D)
        )
        assert est >= n, (term, est, n)          # never undercounts
        assert est - n <= bound, (term, est, n)  # bounded overcount
