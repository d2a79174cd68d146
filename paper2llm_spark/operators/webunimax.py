"""UniMax language-budget allocation (Chung et al., ICLR 2023,
"UniMax: Fairer and More Effective Language Sampling for Large-Scale
Multilingual Pretraining") — decide how many training tokens each
language contributes given a total budget and a per-language epoch
cap, instead of temperature sampling (which either starves tail
languages or epochs head languages into memorization).

Frozen algorithm — the paper's greedy expressed as its water-filling
closed form so it is ORDER-FREE and exactly integer:

* capacity ``cap_l = EPOCH_CAP * tokens_l`` (a language may repeat at
  most EPOCH_CAP epochs);
* budget ``B = BUDGET_PCT% of total corpus tokens`` (deterministic,
  corpus-derived — no external input).  BUDGET_PCT = 280 puts the
  budget ABOVE one corpus epoch, the paper's actual regime (training
  runs want several epochs of tail languages but must not exceed
  EPOCH_CAP on any of them).  BUDGET_PCT = 300 (a 3-epoch budget
  under a 4-epoch cap) lands the boundary strictly inside this
  corpus's observed language skew (en ~3x each tail language) at
  sf0.001, sf0.01 AND sf0.1 — verified against real token counts —
  so the driver hash certifies BOTH branches (capped tail +
  water-leveled head) at every scale factor;
* sort languages ascending by ``(cap, lang)``; a prefix of small
  languages is fully funded (``alloc = cap``), the rest split the
  remaining budget evenly.  The boundary is the largest ``k`` with
  ``cap_k * (n - k + 1) <= B - prefix_{k-1}`` — this predicate is
  provably monotone along the ascending sort (if language ``i`` fits
  the equal share, every smaller language fit theirs), so ``k`` is a
  simple conditional count, no iteration;
* uncapped languages get ``q = (B - P_k) div (n - k)`` each, and the
  remainder ``r = (B - P_k) mod (n - k)`` goes one token each to the
  first ``r`` of them (ascending order) — allocations sum EXACTLY to
  ``min(B, total capacity)``; maximality of ``k`` guarantees
  ``q + 1 <= cap_i`` for every uncapped language, so no allocation
  exceeds its cap.

Outputs per language: token count, capacity, exact allocation, and
``epochs_micro = alloc * 1e6 div tokens`` (the paper's headline plot —
tail languages pin at EPOCH_CAP * 1e6, head languages fall below 1e6).

Plan shape (the scale story): ONE corpus-sized exchange — the
map-side-combinable ``groupBy(lang)`` token count (short rows).  The
water-filling itself runs on the |languages|-bounded table: one
single-partition window pass (row_number + prefix sum over at most a
few thousand rows — bounded by the number of human languages, not the
corpus) and one 1-row broadcast crossJoin to re-enter the (n, B, k,
P_k) scalars.  No driver collect, no Python, no iteration.

Reference scope anchor: beyond-reference web-scale operator (mixture
tier); completes the sampling family `corpus_temperature_mix` /
`corpus_mixture_plan` / `corpus_dsir_weights` with the epoch-capped
allocator multilingual pretraining actually uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import SQL_TOKENS, tokens

EPOCH_CAP = 4      # max epochs per language (the paper's N)
BUDGET_PCT = 300   # budget as % of total corpus tokens (multi-epoch)
MICRO = 1_000_000


def unimax_frame(docs: DataFrame) -> DataFrame:
    counts = (
        docs.select("lang", F.explode(tokens(F.col("text"))).alias("t"))
        .groupBy("lang")
        .agg(F.count("*").cast("bigint").alias("n_tokens"))
        .withColumn("cap", (F.lit(EPOCH_CAP) * F.col("n_tokens"))
                    .cast("bigint"))
    )
    # |languages|-bounded single-partition window: ascending caps,
    # prefix sums, and the monotone fits-equal-share predicate
    w = Window.orderBy(F.col("cap").asc(), F.col("lang").asc())
    ranked = counts.select(
        "lang", "n_tokens", "cap",
        F.row_number().over(w).cast("bigint").alias("i"),
        F.coalesce(
            F.sum("cap").over(
                w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).cast("bigint").alias("pfx"),
    )
    scalars = ranked.agg(
        F.count("*").cast("bigint").alias("n"),
        F.expr(f"(sum(cap) div {EPOCH_CAP} * {BUDGET_PCT}) div 100")
        .cast("bigint").alias("b"),
    )
    sized = ranked.crossJoin(F.broadcast(scalars))
    flagged = sized.withColumn(
        "fits", (F.col("cap") * (F.col("n") - F.col("i") + 1)
                 <= F.col("b") - F.col("pfx")).cast("bigint"),
    )
    kstats = flagged.agg(
        F.sum("fits").cast("bigint").alias("k"),
        F.sum(F.col("fits") * F.col("cap")).cast("bigint").alias("pk"),
    )
    return (
        flagged.crossJoin(F.broadcast(kstats))
        .select(
            "lang", "n_tokens", "cap",
            F.expr(
                "case when fits = 1 then cap else "
                "(b - pk) div (n - k) + (case when i - k <= "
                "(b - pk) % (n - k) then 1 else 0 end) end"
            ).cast("bigint").alias("alloc_tokens"),
        )
        .withColumn(
            "epochs_micro",
            F.expr(f"(alloc_tokens * {MICRO}) div n_tokens")
            .cast("bigint"),
        )
    )


def unimax_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return unimax_frame(docs)


_TOK = SQL_TOKENS.format(expr="text")

UNIMAX_SQL = f"""
WITH counts AS (
  SELECT lang, count(*)::BIGINT AS n_tokens,
         ({EPOCH_CAP} * count(*))::BIGINT AS cap
  FROM (SELECT lang, unnest({_TOK}) AS t FROM documents)
  GROUP BY lang
),
ranked AS (
  SELECT lang, n_tokens, cap,
         row_number() OVER (ORDER BY cap ASC, lang ASC)::BIGINT AS i,
         coalesce(sum(cap) OVER (ORDER BY cap ASC, lang ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             0)::BIGINT AS pfx
  FROM counts
),
scalars AS (
  SELECT count(*)::BIGINT AS n,
         ((sum(cap)::BIGINT // {EPOCH_CAP} * {BUDGET_PCT}) // 100)::BIGINT
           AS b
  FROM ranked
),
flagged AS (
  SELECT r.*, s.n, s.b,
         (CASE WHEN r.cap * (s.n - r.i + 1) <= s.b - r.pfx
               THEN 1 ELSE 0 END)::BIGINT AS fits
  FROM ranked r CROSS JOIN scalars s
),
kstats AS (
  SELECT sum(fits)::BIGINT AS k,
         sum(fits * cap)::BIGINT AS pk
  FROM flagged
)
SELECT f.lang, f.n_tokens, f.cap,
       (CASE WHEN f.fits = 1 THEN f.cap ELSE
         (f.b - ks.pk) // (f.n - ks.k)
         + (CASE WHEN f.i - ks.k <= (f.b - ks.pk) % (f.n - ks.k)
                 THEN 1 ELSE 0 END) END)::BIGINT AS alloc_tokens,
       ((CASE WHEN f.fits = 1 THEN f.cap ELSE
         (f.b - ks.pk) // (f.n - ks.k)
         + (CASE WHEN f.i - ks.k <= (f.b - ks.pk) % (f.n - ks.k)
                 THEN 1 ELSE 0 END) END) * {MICRO} // f.n_tokens)::BIGINT
         AS epochs_micro
FROM flagged f CROSS JOIN kstats ks
"""


QUERIES: dict[str, tuple] = {
    "corpus_unimax_alloc": (unimax_alloc, UNIMAX_SQL),
}
