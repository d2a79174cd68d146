"""Inverted-index postings builder — the index-construction job of a
search stack (Dean 2009's "Challenges in Building Large-Scale
Information Retrieval Systems"; Zobel & Moffat 2006 survey): per
term, the sorted posting list of (doc_id, tf) pairs, DELTA-GAP
encoded (each doc_id stored as its gap from the previous — the
transform that makes postings compress to a few bits/entry with
varint/PFOR downstream).  ``search_bm25_topk`` scores queries by
building postings on the fly; this operator MATERIALIZES the index a
serving system would load.

Stop-term discipline: terms with ``df > min(DF_CAP, CAP_PCT% of N)``
are dropped BEFORE the collect (window count, then filter), so no
aggregation buffer ever holds a stop word's corpus-sized posting
list — the same hot-set rule as ``dedup_ngram_jaccard``; a
production index would route those few hundred terms to a dedicated
impact-ordered store.  On a Zipf vocabulary the absolute ``DF_CAP``
binds; the fractional arm exists because the synthetic fixture's
vocabulary is ~31 template words whose dfs all scale with the corpus
— a fixed cutoff would be vacuous at one sf and all-dropping at
another.

Postings serialize as comma-joined strings (exact cross-engine; the
parquet-level encoding choice is the sink's concern).

Plan shape (the scale story): tokenize+explode scan-side; exchange 1
is the map-side-combinable ``groupBy(term, doc_id)`` tf count; df
comes from a second map-side-combinable ``groupBy(term)`` count whose
|vocabulary|-row result re-enters by BROADCAST hash join — NOT a
``count() over (partition by term)`` window, which would sort the
whole (term, doc_id, tf) table inside |vocabulary| skewed partitions
(measured 2x the query on the 31-term fixture, and a straggler
factory on any Zipf corpus); then the ``groupBy(term)`` collect.
Every shuffled row is two ids and a count; collect buffers are
bounded by the cap (plan-asserted: cap filter sits under the collect
aggregate).  The broadcast assumes a natural-language vocabulary
(Heaps' law keeps |terms| ≪ corpus); an id-polluted vocabulary would
swap the hint for an equi-join that reuses the term clustering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import SQL_TOKENS, tokens

DF_CAP = 1_000_000  # absolute stop-term cutoff (the production bound)
CAP_PCT = 80        # ...and never more than this % of the corpus


def index_postings_frame(docs: DataFrame) -> DataFrame:
    docs = docs.select("doc_id", "text")
    t = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    )
    g = t.groupBy("term", "doc_id").agg(
        F.count("*").cast("bigint").alias("tf")
    )
    n_total = docs.agg(F.count("*").cast("bigint").alias("n_total"))
    dfs = g.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))
    g = g.join(F.broadcast(dfs), "term") \
        .crossJoin(F.broadcast(n_total)).filter(
            (F.col("df") <= DF_CAP)
            & (100 * F.col("df") <= CAP_PCT * F.col("n_total"))
        )
    p = g.groupBy("term").agg(
        F.max("df").cast("bigint").alias("df"),
        F.sort_array(
            F.collect_list(F.struct("doc_id", "tf"))
        ).alias("post"),
    )
    # stage ds/tfl as BOUND attributes before the gap transform: HOF
    # lambdas are interpreted with no CSE, so an inlined `ds`
    # re-materializes the whole posting array per element_at — O(n^2)
    # per term (measured 14x on the fixture's 66k-entry lists)
    staged = p.select(
        "term", "df",
        F.transform(F.col("post"), lambda s: s["doc_id"]).alias("ds"),
        F.transform(F.col("post"), lambda s: s["tf"]).alias("tfl"),
    )
    gaps = F.transform(
        F.sequence(F.lit(1), F.size("ds")),
        lambda j: F.element_at(F.col("ds"), j) - F.when(
            j == 1, F.lit(0).cast("bigint")
        ).otherwise(F.element_at(F.col("ds"), j - 1)),
    )
    return staged.select(
        "term", "df",
        F.array_join(F.transform(gaps, lambda v: v.cast("string")), ",")
        .alias("gaps"),
        F.array_join(
            F.transform(F.col("tfl"), lambda v: v.cast("string")), ","
        ).alias("tfs"),
    )


def index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return index_postings_frame(docs)


_TOK = SQL_TOKENS.format(expr="text")

INDEX_SQL = f"""
WITH t AS (
  SELECT doc_id, unnest({_TOK}) AS term FROM documents
),
g AS (
  SELECT term, doc_id, count(*)::BIGINT AS tf
  FROM t GROUP BY term, doc_id
),
n AS (SELECT count(*)::BIGINT AS n_total FROM documents),
w AS (
  SELECT term, doc_id, tf, n_total,
         count(*) OVER (PARTITION BY term) AS df
  FROM g, n
),
p AS (
  SELECT term, max(df)::BIGINT AS df,
         list(doc_id ORDER BY doc_id) AS ds,
         list(tf ORDER BY doc_id) AS tfl
  FROM w WHERE df <= {DF_CAP} AND 100 * df <= {CAP_PCT} * n_total
  GROUP BY term
)
SELECT term, df,
       array_to_string(list_transform(range(1, len(ds) + 1),
         j -> (ds[j] - CASE WHEN j = 1 THEN 0 ELSE ds[j-1] END)::VARCHAR),
         ',') AS gaps,
       array_to_string(list_transform(tfl, v -> v::VARCHAR), ',') AS tfs
FROM p
"""


QUERIES: dict[str, tuple] = {
    "search_index_postings": (index_postings, INDEX_SQL),
}
