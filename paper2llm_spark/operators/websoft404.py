"""Soft-404 and parked-domain detection — the dead-page gate every
crawl pipeline needs because HTTP 200 lies: CommonCrawl carries
millions of "page not found" bodies served with 200, and expired
domains get replaced wholesale by registrar sales pages (Bar-Yossef
et al., "Sic transit gloria telae", WWW'04 — the canonical soft-404
study — detects them by content, not status).

Semantics (frozen): two lowercase phrase batteries over the body —

* not-found phrases: ``page not found``, ``404 error``,
  ``no longer available``, ``does not exist``,
  ``page cannot be found``;
* parked phrases: ``domain is for sale``, ``parked domain``,
  ``buy this domain``, ``domain has expired``.

Verdict rules, exact-integer on both engines:
``is_soft404 = 1`` iff (``nf_hits >= 1`` AND ``n_chars < 600``) OR
``nf_hits >= 2`` — a single phrase only condemns a SHORT page (real
articles legitimately mention "404 error"); two phrases always do.
``is_parked = 1`` iff ``park_hits >= 1`` — sales pages never occur
as incidental prose at these exact phrasings.

The driver corpus has no dead pages, so the registered query plants
them in-engine: a 5-way hash roll (0) REPLACES the body with a short
2-phrase not-found page, (1) replaces it with a registrar parking
page, (2) appends one not-found phrase to the (long) original body —
exercising the short-page guard — and otherwise leaves the page
alone.  The plant is derived from ``doc_id`` identically in the
DuckDB dual.

Plan shape (the scale story): phrase LIKEs and both CASE verdicts are
ONE codegen projection in the scan task — zero joins, zero exchanges,
zero Python (plan-asserted); at 10^12 pages the gate rides the ingest
scan like the Gopher/C4 batteries (operators/webquality.py) it sits
beside in the funnel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, sql_hash60

NOTFOUND = [
    "page not found",
    "404 error",
    "no longer available",
    "does not exist",
    "page cannot be found",
]
PARKED = [
    "domain is for sale",
    "parked domain",
    "buy this domain",
    "domain has expired",
]

_NF_PAGE = (
    "404 Error - Page Not Found. The page you requested does not "
    "exist on this server. Try the homepage instead."
)
_PARK_PAGE = (
    "This domain is for sale! Buy this domain today through our "
    "marketplace and launch your brand."
)
_NF_TAIL = " The archived copy is no longer available."


def _hits(low: Column, phrases: list[str]) -> Column:
    total = F.lit(0)
    for p in phrases:
        total = total + F.when(low.contains(F.lit(p)), 1).otherwise(0)
    return total


def _sql_hits(expr: str, phrases: list[str]) -> str:
    parts = [
        f"(CASE WHEN position('{p}' IN {expr}) > 0 THEN 1 ELSE 0 END)"
        for p in phrases
    ]
    return "(" + " + ".join(parts) + ")"


def soft404_frame(docs: DataFrame) -> DataFrame:
    """doc_id, text -> phrase hits + frozen soft-404/parked verdicts."""
    low = F.lower(F.col("text"))
    feats = docs.select(
        "doc_id",
        _hits(low, NOTFOUND).cast("long").alias("nf_hits"),
        _hits(low, PARKED).cast("long").alias("park_hits"),
        F.length(F.col("text")).cast("long").alias("n_chars"),
    )
    is_soft404 = F.when(
        ((F.col("nf_hits") >= 1) & (F.col("n_chars") < 600))
        | (F.col("nf_hits") >= 2),
        F.lit(1),
    ).otherwise(F.lit(0))
    is_parked = F.when(F.col("park_hits") >= 1, 1).otherwise(0)
    return feats.select(
        "doc_id", "nf_hits", "park_hits", "n_chars",
        is_soft404.cast("long").alias("is_soft404"),
        is_parked.cast("long").alias("is_parked"),
    )


def synth_dead_docs(docs: DataFrame) -> DataFrame:
    roll = portable_hash60(
        F.concat(F.col("doc_id").cast("string"), F.lit(":404"))
    ) % 5
    planted = (
        F.when(roll == 0, F.lit(_NF_PAGE))
        .when(roll == 1, F.lit(_PARK_PAGE))
        .when(roll == 2, F.concat(F.col("text"), F.lit(_NF_TAIL)))
        .otherwise(F.col("text"))
    )
    return docs.select("doc_id", planted.alias("text"))


def soft404_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return soft404_frame(synth_dead_docs(docs))


_ROLL = sql_hash60("doc_id || ':404'")

SOFT404_SQL = f"""
WITH planted AS (
  SELECT doc_id,
    CASE WHEN {_ROLL} % 5 = 0 THEN '{_NF_PAGE}'
         WHEN {_ROLL} % 5 = 1 THEN '{_PARK_PAGE}'
         WHEN {_ROLL} % 5 = 2 THEN text || '{_NF_TAIL}'
         ELSE text END AS body
  FROM documents
),
f AS (
  SELECT doc_id,
         {_sql_hits("lower(body)", NOTFOUND)}::BIGINT AS nf_hits,
         {_sql_hits("lower(body)", PARKED)}::BIGINT AS park_hits,
         length(body)::BIGINT AS n_chars
  FROM planted
)
SELECT doc_id, nf_hits, park_hits, n_chars,
       (CASE WHEN (nf_hits >= 1 AND n_chars < 600) OR nf_hits >= 2
             THEN 1 ELSE 0 END)::BIGINT AS is_soft404,
       (CASE WHEN park_hits >= 1 THEN 1 ELSE 0 END)::BIGINT AS is_parked
FROM f
"""


QUERIES: dict[str, tuple] = {
    "web_soft404_detect": (soft404_detect, SOFT404_SQL),
}
