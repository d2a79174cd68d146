"""Recrawl-rate estimation — Cho & Garcia-Molina 2003 ("Effective
Page Refresh Policies for Web Crawlers" / "Estimating Frequency of
Change"): from k revisits of a page and the number of visits that
observed a change, estimate the page's Poisson change rate and bucket
it into refresh tiers, so the crawler re-fetches news pages hourly
and static pages monthly — the scheduling input the frontier
(``webfrontier.py``) would consume as priority at a real crawl.

Estimator: the paper's bias-regularized MLE for change rate per
visit interval, ``lambda = -ln((n - X + 0.5) / (n + 0.5))`` with
``n`` visits and ``X`` detected changes (§4.2; the +0.5 keeps the
X = n case finite).  With ``n = N_VISITS`` fixed there are only
``n + 1`` possible values, so the micro-nat table is PRECOMPUTED IN
PYTHON and inlined as a CASE literal in BOTH engines — the repo's
md5-literal-table discipline — making the result exact with zero
cross-engine libm risk.

The visit history is synthesized deterministically (md5-rolled):
each url draws a volatility class (static 5% / slow 25% / news 60%
change probability per revisit) and 6 epoch change indicators, both
from md5 — identical rows in both engines.

Plan shape (the scale story): the WHOLE operator — history roll,
change count (fold over a 6-element sequence), table lookup, tier
CASE — is one codegen projection in the scan task: zero exchanges,
joins, Python (plan-asserted).  ``text`` is never read.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_VISITS = 6
_RATES = (5, 25, 60)          # % change probability per class
HOT_MICRO = 900_000           # lambda >= : refresh every wave
WARM_MICRO = 150_000          # lambda >= : refresh regularly

# lambda_micro[X] = floor(-ln((n - X + 0.5)/(n + 0.5)) * 1e6 + 0.5)
LAMBDA_MICRO = [
    math.floor(
        -math.log((N_VISITS - x + 0.5) / (N_VISITS + 0.5)) * 1e6 + 0.5
    )
    for x in range(N_VISITS + 1)
]

_LAM_CASE_SPARK = "CASE n_changes " + " ".join(
    f"WHEN {x} THEN {v}L" for x, v in enumerate(LAMBDA_MICRO)
) + " END"
_LAM_CASE_DUCK = "CASE n_changes " + " ".join(
    f"WHEN {x} THEN {v}" for x, v in enumerate(LAMBDA_MICRO)
) + " END"


def recrawl_priority_frame(docs: DataFrame) -> DataFrame:
    rate = F.element_at(
        F.array(*[F.lit(r) for r in _RATES]),
        (F.expr(
            "conv(substr(md5(concat('cls-', doc_id)), 1, 15), 16, 10)"
        ).cast("bigint") % 3).cast("int") + 1,
    )
    staged = docs.select("doc_id", rate.alias("rate"))
    rolls = F.transform(
        F.sequence(F.lit(1), F.lit(N_VISITS)),
        lambda e: (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("chg-"), F.col("doc_id"),
                                   F.lit("-"), e)),
                    1, 15,
                ), 16, 10,
            ).cast("bigint") % 100 < F.col("rate")
        ).cast("bigint"),
    )
    m = staged.select(
        "doc_id",
        F.lit(N_VISITS).cast("bigint").alias("n_visits"),
        F.aggregate(
            rolls, F.lit(0).cast("bigint"), lambda acc, v: acc + v
        ).alias("n_changes"),
    )
    lam = F.expr(_LAM_CASE_SPARK).cast("bigint")
    out = m.withColumn("lambda_micro", lam)
    tier = F.when(F.col("lambda_micro") >= HOT_MICRO, "hot") \
        .when(F.col("lambda_micro") >= WARM_MICRO, "warm") \
        .otherwise("cold")
    return out.withColumn("tier", tier)


def recrawl_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return recrawl_priority_frame(docs)


RECRAWL_SQL = f"""
WITH cls AS (
  SELECT doc_id,
         ([{', '.join(str(r) for r in _RATES)}])[
           (((('0x' || substr(md5('cls-' || doc_id), 1, 15))::BIGINT) % 3)
            + 1)::INT] AS rate
  FROM documents
),
m AS (
  SELECT doc_id, {N_VISITS}::BIGINT AS n_visits,
         coalesce(list_sum(list_transform(range(1, {N_VISITS} + 1),
           e -> CASE WHEN (('0x' || substr(md5('chg-' || doc_id || '-' || e),
                            1, 15))::BIGINT) % 100 < rate
                     THEN 1 ELSE 0 END)), 0)::BIGINT AS n_changes
  FROM cls
)
SELECT doc_id, n_visits, n_changes,
       ({_LAM_CASE_DUCK})::BIGINT AS lambda_micro,
       CASE WHEN ({_LAM_CASE_DUCK}) >= {HOT_MICRO} THEN 'hot'
            WHEN ({_LAM_CASE_DUCK}) >= {WARM_MICRO} THEN 'warm'
            ELSE 'cold' END AS tier
FROM m
"""


QUERIES: dict[str, tuple] = {
    "web_recrawl_priority": (recrawl_priority, RECRAWL_SQL),
}
