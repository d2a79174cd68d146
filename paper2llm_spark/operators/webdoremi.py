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
(signed).  Weights: each source's un-normalized mass is an
INTEGER-ONLY fixed-point exponential — no libm seam at all
(round-4 advisor note: a raw ``exp()`` evaluated independently by
JVM and DuckDB can differ by an ulp on another platform and flip
the rounded bigint): clamp ``x = excess_micro`` to ±``EXP_CLAMP``
(10 nats; masses saturate, the DoReMi temperature knob's natural
range), take ``ax = |x|``, run the truncated Taylor series
``t_0 = 1e6; t_k = t_{k-1}·ax div (k·1e6)``, ``S = Σ_{0..K} t_k``
(K = 40; every intermediate is a nonnegative bigint, so Spark's
truncate-toward-zero ``div`` == DuckDB's floor ``//``, and the
largest product ``t_{k-1}·ax < 2^62``), and set ``e_micro = S``
for ``x >= 0`` else ``1e12 div S`` — bit-identical in any engine
with 64-bit integer arithmetic.  Then ``weight_micro = e_micro *
1e6 div sum(e_micro)`` is exact integer normalization.  Harder
domains (positive excess) get more weight, the DoReMi direction at
temperature 1.

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
EXP_CLAMP = 10 * MICRO  # ±10 nats; see module docstring
EXP_K = 40  # Taylor terms: remainder at ax=10 is ~1e41/41! ≈ 3e-9 rel


# Spark evaluates the recurrence t_k = t_{k-1}·ax div (k·1e6) as ONE
# aggregate-HOF fold (~20 expression-tree nodes — the simhash/r2
# expression-tree discipline; an unrolled 41-column chain measurably
# taxed Catalyst analysis).  The DuckDB dual runs the SAME recurrence
# as a recursive CTE (a 41-deep lateral-alias chain exceeds its binder
# recursion limit); the unit replay test pins both to the reference
# Python fold (``exp_series``).
_EXP_FOLD = (
    f"aggregate(sequence(1, {EXP_K}),"
    f" named_struct('t', cast({MICRO} as bigint),"
    f"              's', cast({MICRO} as bigint)),"
    f" (acc, k) -> named_struct("
    f"   't', acc.t * ax div (cast(k as bigint) * {MICRO}),"
    f"   's', acc.s + acc.t * ax div (cast(k as bigint) * {MICRO})),"
    f" acc -> acc.s)"
)


def exp_series(x: int) -> int:
    """Reference Python fold of the frozen integer exp — the replay
    oracle for both engines' implementations."""
    ax = min(abs(max(min(x, EXP_CLAMP), -EXP_CLAMP)), EXP_CLAMP)
    t = MICRO
    s = MICRO
    for k in range(1, EXP_K + 1):
        t = (t * ax) // (k * MICRO)
        s += t
    return s if x >= 0 else (MICRO * MICRO) // s


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
    staged = per_source.crossJoin(F.broadcast(glob)).select(
        "source",
        "n_docs",
        "total_tokens",
        "mean_nll_micro",
        F.expr("mean_nll_micro - g_mean").cast("bigint")
        .alias("excess_micro"),
    ).withColumn(
        "ax",
        F.expr(
            f"abs(greatest(least(excess_micro, {EXP_CLAMP}),"
            f" -{EXP_CLAMP}))"
        ).cast("bigint"),
    ).withColumn("s_pos", F.expr(_EXP_FOLD).cast("bigint"))
    massed = staged.withColumn(
        "e_micro",
        F.expr(
            f"case when excess_micro >= 0 then s_pos"
            f" else cast({MICRO * MICRO} as bigint) div s_pos end"
        ).cast("bigint"),
    ).select(
        "source", "n_docs", "total_tokens", "mean_nll_micro",
        "excess_micro", "e_micro",
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
WITH RECURSIVE scored AS (
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
massed0 AS (
  SELECT source, n_docs, total_tokens,
         (total_nll // total_tokens)::BIGINT AS mean_nll_micro,
         ((total_nll // total_tokens) - g_mean)::BIGINT AS excess_micro,
         abs(greatest(least((total_nll // total_tokens) - g_mean,
                            {EXP_CLAMP}), -{EXP_CLAMP}))::BIGINT AS ax
  FROM per_source, g
),
ser AS (
  SELECT source, ax, 0 AS k, {MICRO}::BIGINT AS t, {MICRO}::BIGINT AS s
  FROM massed0
  UNION ALL
  SELECT source, ax, k + 1,
         (t * ax) // ((k + 1) * {MICRO}),
         s + (t * ax) // ((k + 1) * {MICRO})
  FROM ser WHERE k < {EXP_K}
),
massed AS (
  SELECT m.source, n_docs, total_tokens, mean_nll_micro, excess_micro,
         (CASE WHEN excess_micro >= 0 THEN ser.s
               ELSE {MICRO * MICRO} // ser.s END)::BIGINT AS e_micro
  FROM massed0 m JOIN ser ON ser.source = m.source AND ser.k = {EXP_K}
),
t AS (SELECT sum(e_micro)::BIGINT AS mass FROM massed)
SELECT source, n_docs, total_tokens, mean_nll_micro, excess_micro,
       (e_micro * {MICRO} // mass)::BIGINT AS weight_micro
FROM massed, t
"""


QUERIES: dict[str, tuple] = {
    "corpus_doremi_weights": (doremi_weights, DOREMI_SQL),
}
