"""TextRank keyword scoring (Mihalcea & Tarau, EMNLP 2004) — PageRank
over the word co-occurrence graph; the graph-centrality alternative
to RAKE's (webrake.py) frequency heuristics, and the second half of
the paper pair every keyword-extraction survey starts from.  Run
corpus-wide it yields the vocabulary's topical backbone (cluster
labels, facet seeds); the original per-document variant is the same
dataflow over per-doc graphs.

Semantics (frozen): nodes are lowercased tokens; an UNDIRECTED edge
links words ADJACENT anywhere in the corpus at least MIN_CO times
(the paper's window-2 co-occurrence, unweighted — its keyword
setting); self-loops dropped.  Scoring is this repo's exact-integer
PageRank (webgraph.py discipline): ranks in bigint micro-units,
``rank div deg`` contributions, 0.15/0.85 as exact ratios, 3
unrolled rounds — bit-identical across engines where float PageRank
never could be.  Output: ``(w, rank_micro)`` per graph node.

Plan shape (the scale story): the bigram groupBy is the ONE
corpus-sized exchange; the co-occurrence graph is Heaps-bounded
(vocabulary-sized), so every PR round is a short-row equi-join +
map-side-combinable agg over collapsed rows; the edge list
materializes once (localCheckpoint).  Zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import SQL_TOKENS, sql_ngrams, tokens, word_ngrams

MIN_CO = 3
TR_ITERS = 3
TR_BASE = 150_000
TR_INIT = 1_000_000


def textrank_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return textrank_frame(docs)


def textrank_frame(docs: DataFrame) -> DataFrame:
    big = (
        docs.select(
            F.explode(word_ngrams(tokens(F.col("text")), 2)).alias("g")
        )
        .select(
            F.substring_index("g", " ", 1).alias("w1"),
            F.substring_index("g", " ", -1).alias("w2"),
        )
        .filter(F.col("w1") != F.col("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= MIN_CO)
    )
    # undirected: unify orientations, then keep distinct directed arcs
    edges = (
        big.select("w1", "w2")
        .unionByName(big.select(F.col("w2").alias("w1"),
                                F.col("w1").alias("w2")))
        .distinct()
        .localCheckpoint()
    )
    deg = edges.groupBy("w1").agg(F.count(F.lit(1)).alias("deg"))
    ed = edges.join(deg, "w1")
    nodes = edges.select(F.col("w1").alias("w")).distinct()
    ranks = nodes.select("w", F.lit(TR_INIT).cast("bigint").alias("r"))
    for _ in range(TR_ITERS):
        contrib = (
            ed.join(ranks.withColumnRenamed("w", "w1"), "w1")
            .select("w2", F.expr("r div deg").alias("cb"))
            .groupBy("w2")
            .agg(F.sum("cb").alias("s"))
            .withColumnRenamed("w2", "w")
        )
        ranks = nodes.join(contrib, "w", "left").select(
            "w",
            (
                F.lit(TR_BASE)
                + F.expr("(85 * coalesce(s, 0)) div 100")
            ).cast("bigint").alias("r"),
        )
    return ranks.select("w", F.col("r").alias("rank_micro"))


_TOK = SQL_TOKENS.format(expr="text")
_BIGRAMS = sql_ngrams("tok", 2)


def _textrank_sql() -> str:
    ctes = [
        f"""t AS (SELECT {_TOK} AS tok FROM documents),
bg AS (
  SELECT split_part(g, ' ', 1) AS w1, split_part(g, ' ', 2) AS w2,
         count(*) AS c
  FROM (SELECT {_BIGRAMS} AS gs FROM t), unnest(gs) AS u(g)
  WHERE split_part(g, ' ', 1) <> split_part(g, ' ', 2)
  GROUP BY 1, 2 HAVING count(*) >= {MIN_CO}
),
e AS (SELECT DISTINCT w1, w2 FROM
       (SELECT w1, w2 FROM bg UNION ALL SELECT w2, w1 FROM bg)),
deg AS (SELECT w1, count(*) AS deg FROM e GROUP BY 1),
nodes AS (SELECT DISTINCT w1 AS w FROM e),
r0 AS (SELECT w, {TR_INIT}::BIGINT AS r FROM nodes)"""
    ]
    for i in range(1, TR_ITERS + 1):
        p = i - 1
        ctes.append(
            f"""c{i} AS (SELECT e.w2 AS w, sum(r.r // d.deg) AS s
       FROM e JOIN r{p} r ON r.w = e.w1 JOIN deg d ON d.w1 = e.w1
       GROUP BY 1),
r{i} AS (SELECT n.w,
        ({TR_BASE} + (85 * coalesce(c.s, 0)) // 100)::BIGINT AS r
        FROM nodes n LEFT JOIN c{i} c ON c.w = n.w)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT w, r AS rank_micro FROM r{TR_ITERS}"
    )


TEXTRANK_SQL = _textrank_sql()


QUERIES: dict[str, tuple] = {
    "text_textrank_words": (textrank_words, TEXTRANK_SQL),
}
