"""Broder containment dedup — the asymmetric twin of resemblance.

Broder (1997, "On the resemblance and containment of documents")
defines containment c(A,B) = |S(A) ∩ S(B)| / |S(A)|: how much of A's
shingle set lives inside B.  Resemblance (Jaccard) is what MinHash
estimates and what this repo's LSH family already covers
(operators/dedup.py) — but it MISSES subset duplicates: a short
article A wholly embedded in a long aggregator page B has
resemblance |A|/|B| ≈ 0 while containment(A,B) = 1.  Production
crawls are full of these (digest pages, RSS aggregators, quote
farms), so span-aware pipelines run a containment pass alongside
resemblance.

Semantics (frozen): distinct word-trigram shingle sets per doc,
60-bit md5 shingle hashes; candidate pairs share at least one
shingle whose document frequency is in [2, DF_CAP] (hot shingles are
dropped BEFORE the self-join — stopword-y shingles would otherwise
quadratically explode the join, the same discipline as
operators/dedup.py's n-gram Jaccard).  Per pair: ``shared`` (count
of co-occurring df-capped shingles), both set sizes, and exact
integer metrics ``containment_micro = 1e6 * shared div
least(n_a, n_b)`` and ``jaccard_micro = 1e6 * shared div
(n_a + n_b - shared)``.  Emit pairs with containment >= 0.9 — the
fixture's planted aggregators land at 1.0 containment with Jaccard
well below any resemblance-dedup threshold, which is exactly the
class resemblance misses.

Planting (in-engine, both engines identically): docs whose hash roll
is 0 mod 4 get an aggregator twin (doc_id + 1_000_000) whose text is
the original followed by 120 doc-seeded synthetic filler tokens —
the twin CONTAINS the original but resembles it weakly.

Plan shape (the scale story): shingling + hashing ride the scan;
df computation is one short-row exchange with map-side combine; the
df-cap filter bounds self-join fanout to C(DF_CAP, 2) per shingle by
construction; pair aggregation and the two size joins move only
(bigint, bigint) rows.  Shared-shingle counting never materializes a
per-doc posting list (no collect_list) — at 10^12 docs every stage
is the same bounded equi-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    SQL_TOKENS,
    SQL_TRIGRAMS,
    portable_hash60,
    sql_hash60,
    tokens,
    word_trigrams,
)

DF_CAP = 16
CONTAIN_MICRO = 900_000
N_FILLER = 120


def _h(doc_id: Column, salt: str) -> Column:
    return portable_hash60(
        F.concat(doc_id.cast("string"), F.lit(":" + salt))
    )


def synth_aggregator_docs(docs: DataFrame) -> DataFrame:
    """Original docs plus aggregator twins for every 4th hash roll."""
    doc_id = F.col("doc_id")
    filler = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(N_FILLER)),
            lambda i: F.concat(
                F.lit("fill"),
                (portable_hash60(
                    F.concat(doc_id.cast("string"), F.lit(":f:"),
                             i.cast("string"))
                ) % 1000).cast("string"),
            ),
        ),
    )
    twins = docs.where(_h(doc_id, "contain") % 4 == 0).select(
        (doc_id + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" "), filler).alias("text"),
    )
    return docs.select("doc_id", "text").unionByName(twins)


def containment_pairs_frame(base: DataFrame) -> DataFrame:
    """doc_id, text -> high-containment pairs with exact integer metrics."""
    sh = base.select(
        "doc_id",
        F.array_distinct(word_trigrams(tokens(F.col("text")))).alias("shg"),
    )
    sizes = sh.select("doc_id", F.size("shg").cast("long").alias("n_sh"))
    ex = sh.select(
        "doc_id",
        F.explode(F.transform("shg", portable_hash60)).alias("h"),
    )
    kept = (
        ex.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
        .where((F.col("df") >= 2) & (F.col("df") <= DF_CAP))
        .select("h")
    )
    ex = ex.join(kept, "h")
    pairs = (
        ex.alias("a")
        .join(ex.alias("b"), on=[F.col("a.h") == F.col("b.h"),
                                 F.col("a.doc_id") < F.col("b.doc_id")])
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
    )
    out = (
        pairs
        .join(sizes.select(F.col("doc_id").alias("doc_a"),
                           F.col("n_sh").alias("n_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"),
                           F.col("n_sh").alias("n_b")), "doc_b")
        .select(
            "doc_a", "doc_b", "shared", "n_a", "n_b",
            F.expr("cast(1000000 * shared div least(n_a, n_b) as bigint)")
            .alias("containment_micro"),
            F.expr(
                "cast(1000000 * shared div (n_a + n_b - shared) as bigint)"
            ).alias("jaccard_micro"),
        )
    )
    return out.where(F.col("containment_micro") >= CONTAIN_MICRO)


def containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return containment_pairs_frame(synth_aggregator_docs(docs))


_ROLL = sql_hash60("doc_id || ':contain'")
_FILLER = (
    "array_to_string(list_transform(range(1, " + str(N_FILLER + 1) + "), "
    "i -> 'fill' || (" + sql_hash60("doc_id || ':f:' || i") + " % 1000)), ' ')"
)
_TOK = SQL_TOKENS.format(expr="text")
_TRI = SQL_TRIGRAMS.format(tok="tok")

CONTAINMENT_PAIRS_SQL = f"""
WITH base AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text || ' ' || {_FILLER} AS text
  FROM documents WHERE {_ROLL} % 4 = 0
),
tk AS (SELECT doc_id, {_TOK} AS tok FROM base),
sh AS (SELECT doc_id, list_distinct({_TRI}) AS shg FROM tk),
sizes AS (SELECT doc_id, len(shg)::BIGINT AS n_sh FROM sh),
ex AS (
  SELECT doc_id, {sql_hash60('s')} AS h
  FROM sh, unnest(shg) AS u(s)
),
kept AS (
  SELECT h FROM ex GROUP BY h
  HAVING count(*) BETWEEN 2 AND {DF_CAP}
),
kx AS (SELECT ex.doc_id, ex.h FROM ex JOIN kept USING (h)),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS shared
  FROM kx a JOIN kx b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
m AS (
  SELECT p.doc_a, p.doc_b, p.shared, sa.n_sh AS n_a, sb.n_sh AS n_b
  FROM pairs p
  JOIN sizes sa ON sa.doc_id = p.doc_a
  JOIN sizes sb ON sb.doc_id = p.doc_b
)
SELECT doc_a, doc_b, shared, n_a, n_b,
       (1000000 * shared // least(n_a, n_b))::BIGINT AS containment_micro,
       (1000000 * shared // (n_a + n_b - shared))::BIGINT AS jaccard_micro
FROM m
WHERE (1000000 * shared // least(n_a, n_b)) >= {CONTAIN_MICRO}
"""


QUERIES: dict[str, tuple] = {
    "dedup_containment": (containment_pairs, CONTAINMENT_PAIRS_SQL),
}
