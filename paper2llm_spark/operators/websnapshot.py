"""Crawl-snapshot delta — the incremental-ingest primitive: given two
Common-Crawl-style snapshots of the same url space, classify every url
as ``added`` / ``removed`` / ``changed`` / ``unchanged`` by content
digest.  Pipelines run this between monthly crawls so only
added+changed pages re-enter extraction and dedup (CCNet §3 processes
each crawl against the previous one; Dolma's incremental update works
the same way).

Plan shape — the part that matters at 10^12 urls: the obvious
implementation is a full-outer join of the two snapshots on url, which
costs TWO corpus-sized sort exchanges and a merge.  This one is
``union → groupBy(url)`` instead: each side collapses scan-side to
(url, side, digest) short rows, the union is free (no barrier), and
the single map-side-combinable exchange moves one short row per url.
Same answer, half the shuffle.

One non-obvious twist: the digest is aggregated as THREE bigint
columns (15+15+2 hex chars), not as the md5 string — ``max(string)``
has no fixed-width agg buffer, so Spark silently degrades the whole
aggregation to SortAggregate (a per-task sort of every row on url);
with bigints it stays HashAggregate.  Each (url, side) group holds at
most one row, so per-column max reassembles the exact digest, and
``printf('%015x')`` reconstructs the identical lowercase hex in both
engines.  Asserted in ``tests/test_plan_quality.py`` (zero joins, one
hash exchange, partial + final HashAggregate — SortAggregate is the
regression).

The driver corpus is one table, so snapshot B is derived
deterministically in BOTH engines (templated-corpus technique):
~80% of urls survive (60-bit hash roll), a third of the survivors
mutate (`` v2`` suffix), and every ``doc_id % 9 == 0`` contributes a
brand-new url — all four statuses are populated and hash-verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, sql_hash60

KEEP_MOD = 10   # url survives into snapshot B iff hash % 10 < KEEP_LT
KEEP_LT = 8
CHG_MOD = 3     # surviving url's content mutates iff hash % 3 == 0
NEW_MOD = 9     # doc_id % 9 == 0 spawns a new url in snapshot B


def _url(prefix: str = "") -> F.Column:
    return F.concat(
        F.lit("https://"), F.col("source"), F.lit(".test/" + prefix),
        F.col("doc_id").cast("string"),
    )


def _h(salt: str) -> F.Column:
    return portable_hash60(
        F.concat(F.col("doc_id").cast("string"), F.lit(":" + salt))
    )


# (substr start, length) chunks splitting a 32-hex md5 into bigints
_CHUNKS = ((1, 15), (16, 15), (31, 2))


def _digest_cols(m: F.Column, side: str) -> list[F.Column]:
    return [
        F.conv(F.substring(m, start, width), 16, 10)
        .cast("bigint")
        .alias(f"{side}{i}")
        for i, (start, width) in enumerate(_CHUNKS)
    ]


def _side(docs: DataFrame, url: F.Column, side: str, m: F.Column) -> DataFrame:
    return docs.select(
        url.alias("url"), F.lit(side).alias("side"), *_digest_cols(m, "h")
    )


def _rehex(side: str) -> F.Column:
    """Reassemble the lowercase 32-hex digest from the bigint chunks;
    '' when the side is absent."""
    return F.when(F.col(f"{side}0").isNull(), F.lit("")).otherwise(
        F.concat(*[
            F.format_string(f"%0{width}x", F.col(f"{side}{i}"))
            for i, (_start, width) in enumerate(_CHUNKS)
        ])
    )


def snapshot_delta_frame(docs: DataFrame) -> DataFrame:
    """documents -> per-url delta row between synthesized snapshots."""
    snap_a = _side(docs, _url(), "a", F.md5("text"))
    snap_b_kept = _side(
        docs.filter(_h("keep") % KEEP_MOD < KEEP_LT),
        _url(), "b",
        F.md5(
            F.when(_h("chg") % CHG_MOD == 0,
                   F.concat(F.col("text"), F.lit(" v2")))
            .otherwise(F.col("text"))
        ),
    )
    snap_b_new = _side(
        docs.filter(F.col("doc_id") % NEW_MOD == 0),
        _url("new/"), "b",
        F.md5(F.concat(F.col("text"), F.lit(" new"))),
    )
    sides = snap_a.unionByName(snap_b_kept).unionByName(snap_b_new)
    agg = sides.groupBy("url").agg(
        *[
            F.max(
                F.when(F.col("side") == s, F.col(f"h{i}"))
            ).alias(f"{s}{i}")
            for s in ("a", "b")
            for i in range(len(_CHUNKS))
        ]
    )
    same = (
        (F.col("a0") == F.col("b0"))
        & (F.col("a1") == F.col("b1"))
        & (F.col("a2") == F.col("b2"))
    )
    status = (
        F.when(F.col("a0").isNull(), "added")
        .when(F.col("b0").isNull(), "removed")
        .when(same, "unchanged")
        .otherwise("changed")
    )
    return agg.select(
        "url",
        _rehex("a").alias("md5_a"),
        _rehex("b").alias("md5_b"),
        status.alias("status"),
    )


def snapshot_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    # first real step is the groupBy exchange: no spread repartition
    return snapshot_delta_frame(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )


def _sqlh(salt: str) -> str:
    return sql_hash60(f"doc_id || ':{salt}'")


SNAPSHOT_DELTA_SQL = f"""
WITH sides AS (
  SELECT 'https://' || source || '.test/' || doc_id AS url,
         'a' AS side, md5(text) AS m
  FROM documents
  UNION ALL
  SELECT 'https://' || source || '.test/' || doc_id AS url,
         'b' AS side,
         md5(CASE WHEN {_sqlh("chg")} % {CHG_MOD} = 0
                  THEN text || ' v2' ELSE text END) AS m
  FROM documents
  WHERE {_sqlh("keep")} % {KEEP_MOD} < {KEEP_LT}
  UNION ALL
  SELECT 'https://' || source || '.test/new/' || doc_id AS url,
         'b' AS side, md5(text || ' new') AS m
  FROM documents
  WHERE doc_id % {NEW_MOD} = 0
),
agg AS (
  SELECT url,
         max(CASE WHEN side = 'a' THEN m END) AS ma,
         max(CASE WHEN side = 'b' THEN m END) AS mb
  FROM sides GROUP BY url
)
SELECT url,
       coalesce(ma, '') AS md5_a,
       coalesce(mb, '') AS md5_b,
       CASE WHEN ma IS NULL THEN 'added'
            WHEN mb IS NULL THEN 'removed'
            WHEN ma = mb THEN 'unchanged'
            ELSE 'changed' END AS status
FROM agg
"""


QUERIES: dict[str, tuple] = {
    "corpus_snapshot_delta": (snapshot_delta, SNAPSHOT_DELTA_SQL),
}
