"""SoftDeDup document reweighting (She et al. 2024, "SoftDedup: an
Efficient Data Reweighting Method for Speeding Up Language Model
Pre-training") — instead of REMOVING near-duplicates, down-weight
documents whose n-grams are common under the corpus distribution, so
the sampler sees rare content more often without discarding tokens.

Frozen deterministic variant of the paper's commonness score:

* commonness of doc d = mean over its word-trigram occurrences of
  ``ln p(g)`` with ``p(g) = count(g) / G`` (corpus occurrence counts);
* quantized ONCE per gram type to exact nonneg micro-nats
  ``nlp_micro(g) = floor((ln G − ln count(g)) · 1e6 + 0.5)`` (two
  shape-identical double ``ln``; keeping the value NONNEGATIVE means
  the later integer divisions can never hit the Spark-trunc vs
  DuckDB-floor negative divergence);
* per-doc mean NLL = exact bigint sum div n_grams;
* sampling weight = max-normalized rarity,
  ``weight_micro = 1e6 · nll div max_nll`` — the paper's monotone
  "sharpened" reweighting collapsed to its deterministic core: the
  most template-like doc gets the smallest weight, the rarest gets
  1e6; docs too short for a trigram carry NULLs.

Plan shape (the scale story): gram counts are ONE map-side-combinable
``groupBy(gram)`` (Heaps-bounded output); the count table re-enters
the scoring explode as a BROADCAST hash join and the two corpus-wide
scalars (G, max NLL) as 1-row broadcast crossJoins — the corpus-sized
exchanges are the gram-count partials and the per-doc (doc_id, sum,
count) rows, never raw text (plan-asserted).  At 10^12 pages the gram
table outgrows a broadcast: swap the hint for a shuffle equi-join on
gram (the weblm fallback note applies verbatim).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import SQL_TOKENS, SQL_TRIGRAMS, tokens, word_trigrams

MICRO = 1_000_000


def softdedup_frame(docs: DataFrame) -> DataFrame:
    grams = docs.select(
        "doc_id",
        F.explode(word_trigrams(tokens(F.col("text")))).alias("gram"),
    )
    cnts = grams.groupBy("gram").agg(F.count("*").alias("cnt"))
    total = cnts.agg(F.sum("cnt").alias("g_total"))
    scored = (
        grams.join(F.broadcast(cnts), "gram")
        .join(F.broadcast(total))
        .select(
            "doc_id",
            F.expr(
                "cast(floor((ln(cast(g_total as double))"
                f" - ln(cast(cnt as double))) * {MICRO} + 0.5) as bigint)"
            ).alias("nlp_micro"),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum("nlp_micro").alias("nlp_sum"),
        )
        .select(
            "doc_id", "n_grams",
            F.expr("nlp_sum div n_grams").alias("nll_micro"),
        )
    )
    mx = scored.agg(F.max("nll_micro").alias("max_nll"))
    weighted = scored.join(F.broadcast(mx)).select(
        "doc_id", "n_grams", "nll_micro",
        F.expr(f"({MICRO} * nll_micro) div greatest(1, max_nll)")
        .alias("weight_micro"),
    )
    base = docs.select("doc_id")
    return base.join(weighted, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_grams", F.lit(0).cast("bigint")).alias("n_grams"),
        "nll_micro", "weight_micro",
    )


def softdedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return softdedup_frame(docs)


_TOK = SQL_TOKENS.format(expr="text")
_TRI = SQL_TRIGRAMS.format(tok="tok")

SOFTDEDUP_SQL = f"""
WITH t AS (SELECT doc_id, {_TOK} AS tok FROM documents),
g AS (SELECT doc_id, unnest({_TRI}) AS gram FROM t),
c AS (SELECT gram, count(*)::BIGINT AS cnt FROM g GROUP BY gram),
tot AS (SELECT sum(cnt)::BIGINT AS g_total FROM c),
sc AS (
  SELECT doc_id,
         count(*)::BIGINT AS n_grams,
         sum(floor((ln(g_total::DOUBLE) - ln(cnt::DOUBLE))
                   * {MICRO} + 0.5)::BIGINT)::BIGINT AS nlp_sum
  FROM g JOIN c USING (gram), tot
  GROUP BY doc_id
),
m AS (
  SELECT doc_id, n_grams, (nlp_sum // n_grams)::BIGINT AS nll_micro
  FROM sc
),
mx AS (SELECT max(nll_micro)::BIGINT AS max_nll FROM m)
SELECT d.doc_id,
       coalesce(m.n_grams, 0)::BIGINT AS n_grams,
       m.nll_micro,
       CASE WHEN m.nll_micro IS NOT NULL THEN
         (({MICRO} * m.nll_micro) // greatest(1, mx.max_nll))::BIGINT END
         AS weight_micro
FROM documents d LEFT JOIN m ON m.doc_id = d.doc_id, mx
"""


QUERIES: dict[str, tuple] = {
    "corpus_softdedup_weights": (softdedup_weights, SOFTDEDUP_SQL),
}
