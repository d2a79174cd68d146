"""Self-BLEU diversity audit — per-document n-gram precision
against the rest of a sample (Zhu et al. SIGIR 2018, Texygen: the
standard diversity read-out for generated corpora; HIGH Self-BLEU
means the corpus is repeating itself).  In a training-data pipeline
it is the mode-collapse check run over synthetic/augmented data
before mixing it in.

Semantics (frozen): sample = every ``SAMPLE_EVERY = 41``-st doc
(the websearch query-seed cadence — sample-based by design: the
metric is pairwise by nature, so production runs it on a sample,
never the corpus).  Per sampled doc and n in {1, 2}: over DISTINCT
word n-grams, ``matched_n`` = grams that appear in at least one
OTHER sampled doc (equivalently grams whose sample document
frequency >= 2), and ``selfbleu{n}_micro = matched_n * 1e6 div
max(|grams_n|, 1)`` — the set-precision form of BLEU-n with the
other docs as references.

Plan shape (the scale story): the sample is |corpus|/41 rows; each
doc's distinct grams explode into (doc, gram) short rows; the
document-frequency table is ONE map-side-combinable
``groupBy(gram)`` over the sample, re-entering by BROADCAST; the
per-doc precision is a second short groupBy.  Nothing outside the
sample is ever read past the scan filter (pushed);
zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import SQL_TOKENS, tokens

SAMPLE_EVERY = 41
MICRO = 1_000_000


def self_bleu(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") % SAMPLE_EVERY == 0
    )
    staged = docs.select("doc_id", tokens(F.col("text")).alias("tok"))
    grams = staged.select(
        "doc_id",
        F.array_distinct("tok").alias("g1"),
        F.array_distinct(
            F.when(
                F.size("tok") >= 2,
                F.expr(
                    "transform(sequence(1, size(tok) - 1),"
                    " i -> concat_ws(' ', element_at(tok, i),"
                    " element_at(tok, i + 1)))"
                ),
            ).otherwise(F.expr("cast(array() as array<string>)"))
        ).alias("g2"),
    )
    out = None
    for n in (1, 2):
        rows = grams.select(
            "doc_id", F.explode_outer(f"g{n}").alias("gram")
        )
        df_tbl = (
            rows.filter(F.col("gram").isNotNull())
            .groupBy("gram")
            .agg(F.countDistinct("doc_id").cast("bigint").alias("df"))
        )
        per_doc = (
            rows.join(F.broadcast(df_tbl), "gram", "left")
            .groupBy("doc_id")
            .agg(
                F.sum(F.expr("if(gram is not null, 1, 0)"))
                .cast("bigint").alias(f"n_grams{n}"),
                F.sum(F.expr("if(coalesce(df, 0) >= 2, 1, 0)"))
                .cast("bigint").alias(f"matched{n}"),
            )
        )
        out = per_doc if out is None else out.join(per_doc, "doc_id")
    return out.select(
        "doc_id",
        F.col("n_grams1"),
        F.col("matched1"),
        F.expr(f"matched1 * {MICRO} div greatest(n_grams1, 1)")
        .cast("bigint").alias("selfbleu1_micro"),
        F.col("n_grams2"),
        F.col("matched2"),
        F.expr(f"matched2 * {MICRO} div greatest(n_grams2, 1)")
        .cast("bigint").alias("selfbleu2_micro"),
    )


_TOK = SQL_TOKENS.format(expr="text")

SELF_BLEU_SQL = f"""
WITH sample AS (
  SELECT doc_id, {_TOK} AS tok FROM documents
  WHERE doc_id % {SAMPLE_EVERY} = 0
),
grams AS (
  SELECT doc_id,
         list_distinct(tok) AS g1,
         list_distinct(case when len(tok) >= 2 then
           list_transform(range(1, len(tok)),
             i -> tok[i] || ' ' || tok[i+1]) else [] end) AS g2
  FROM sample
),
r1 AS (SELECT doc_id, unnest(g1) AS gram FROM grams),
r2 AS (SELECT doc_id, unnest(g2) AS gram FROM grams),
d1 AS (SELECT gram, count(DISTINCT doc_id)::BIGINT AS df
       FROM r1 GROUP BY 1),
d2 AS (SELECT gram, count(DISTINCT doc_id)::BIGINT AS df
       FROM r2 GROUP BY 1),
p1 AS (
  SELECT r.doc_id, count(*)::BIGINT AS n_grams1,
         sum(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END)::BIGINT AS matched1
  FROM r1 r JOIN d1 d USING (gram) GROUP BY 1
),
p2 AS (
  SELECT r.doc_id, count(*)::BIGINT AS n_grams2,
         sum(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END)::BIGINT AS matched2
  FROM r2 r JOIN d2 d USING (gram) GROUP BY 1
)
SELECT g.doc_id,
       coalesce(p1.n_grams1, 0)::BIGINT AS n_grams1,
       coalesce(p1.matched1, 0)::BIGINT AS matched1,
       (coalesce(p1.matched1, 0) * {MICRO}
        // greatest(coalesce(p1.n_grams1, 0), 1))::BIGINT
         AS selfbleu1_micro,
       coalesce(p2.n_grams2, 0)::BIGINT AS n_grams2,
       coalesce(p2.matched2, 0)::BIGINT AS matched2,
       (coalesce(p2.matched2, 0) * {MICRO}
        // greatest(coalesce(p2.n_grams2, 0), 1))::BIGINT
         AS selfbleu2_micro
FROM grams g
LEFT JOIN p1 ON p1.doc_id = g.doc_id
LEFT JOIN p2 ON p2.doc_id = g.doc_id
"""


QUERIES: dict[str, tuple] = {
    "corpus_self_bleu": (self_bleu, SELF_BLEU_SQL),
}
