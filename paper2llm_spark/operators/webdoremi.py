"""DoReMi-style domain reweighting — per-source excess LM loss to
mixture weights (Xie et al. NeurIPS 2023 DoReMi reweights domains
by excess loss against a reference; the production shape of "give
more epochs to the domains the model finds hardest"; the learned
counterpart of the heuristic `corpus_mixture_plan` /
`corpus_temperature_mix` allocators).

Composes `text_lm_perplexity` verbatim (the registered bigram LM
with its held-out split and Stupid-Backoff floor) — a green row
re-certifies the LM chain and derives the mixture table from it.

Semantics (frozen): per source over the LM-scored docs:
``mean_nll_micro = total_nll div total_tokens`` (token-weighted,
exact); ``excess_micro = mean_nll_micro - global_mean_micro``
(signed).  Weights: each source's un-normalized mass is frozen
FIRST — ``e_micro = floor(exp(excess_micro / 1e6) * 1e6 + 0.5)``,
ONE shape-identical double exp per source (the webwilson literal-
surface discipline; never a float summed across rows) — then
``weight_micro = e_micro * 1e6 div sum(e_micro)`` is exact integer
normalization.  Harder domains (positive excess) get more weight,
the DoReMi direction at temperature 1.

Plan shape (the scale story): the LM pipeline is the composed
cost; the audit joins its per-doc output to the (doc_id, source)
projection — a doc_id equi-join of short rows (broadcast at
fixture scale, SMJ at corpus scale) — then collapses to |sources|
rows where all the exp/normalization arithmetic lives; the global
mean and the normalizer re-enter as 1-row broadcasts.  Zero
Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .weblm import LM_PERPLEXITY_SQL, lm_perplexity_frame

MICRO = 1_000_000


def doremi_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    scored = lm_perplexity_frame(docs).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    per_source = scored.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum("nll_micro").cast("bigint").alias("total_nll"),
    ).select(
        "source",
        "n_docs",
        "total_tokens",
        F.expr("total_nll div total_tokens").cast("bigint")
        .alias("mean_nll_micro"),
        "total_nll",
    )
    glob = per_source.agg(
        F.expr("sum(total_nll) div sum(total_tokens)")
        .cast("bigint").alias("g_mean")
    )
    massed = per_source.crossJoin(F.broadcast(glob)).select(
        "source",
        "n_docs",
        "total_tokens",
        "mean_nll_micro",
        F.expr("mean_nll_micro - g_mean").cast("bigint")
        .alias("excess_micro"),
        F.expr(
            f"cast(floor(exp((mean_nll_micro - g_mean) / 1e6) * {MICRO}"
            f" + 0.5) as bigint)"
        ).alias("e_micro"),
    )
    total_mass = massed.agg(
        F.sum("e_micro").cast("bigint").alias("mass")
    )
    return massed.crossJoin(F.broadcast(total_mass)).select(
        "source",
        "n_docs",
        "total_tokens",
        "mean_nll_micro",
        "excess_micro",
        F.expr(f"e_micro * {MICRO} div mass").cast("bigint")
        .alias("weight_micro"),
    )


DOREMI_SQL = f"""
WITH scored AS (
  SELECT p.doc_id, p.n_tokens, p.nll_micro, d.source
  FROM ({LM_PERPLEXITY_SQL}) p JOIN documents d USING (doc_id)
),
per_source AS (
  SELECT source,
         count(*)::BIGINT AS n_docs,
         sum(n_tokens)::BIGINT AS total_tokens,
         sum(nll_micro)::BIGINT AS total_nll
  FROM scored GROUP BY 1
),
g AS (SELECT (sum(total_nll) // sum(total_tokens))::BIGINT AS g_mean
      FROM per_source),
massed AS (
  SELECT source, n_docs, total_tokens,
         (total_nll // total_tokens)::BIGINT AS mean_nll_micro,
         ((total_nll // total_tokens) - g_mean)::BIGINT AS excess_micro,
         floor(exp(((total_nll // total_tokens) - g_mean) / 1e6)
               * {MICRO} + 0.5)::BIGINT AS e_micro
  FROM per_source, g
),
t AS (SELECT sum(e_micro)::BIGINT AS mass FROM massed)
SELECT source, n_docs, total_tokens, mean_nll_micro, excess_micro,
       (e_micro * {MICRO} // mass)::BIGINT AS weight_micro
FROM massed, t
"""


QUERIES: dict[str, tuple] = {
    "corpus_doremi_weights": (doremi_weights, DOREMI_SQL),
}
