"""Bigram language-model perplexity filter — the CCNet quality signal
(Wenzek et al. 2020 §4.3: score every page with a LM trained on a
reference corpus, keep by perplexity band; KenLM in production).  The
LM here is a bigram model with Stupid Backoff (Brants et al. 2007,
the web-scale backoff used for Google's 2T-token LM: no discounting,
``S(w|w') = c(w'w)/c(w')`` if seen else ``alpha * S(w)``,
``alpha = 0.4``), trained on the even-doc_id HALF of the corpus and
scoring ALL docs — a held-out split, so the backoff path is real
(a same-corpus LM would see every bigram of every scored doc and the
unseen branch could never fire).

Exactness (cross-engine): counts are integers; each token's log-prob
is ONE double op of identical shape in both engines —
``ln(cb / c1)`` (both ``/`` on BIGINT yield double in Spark and
DuckDB) or, unseen, ``ln((2*cu) / (5*N))`` (alpha = 0.4 = 2/5 cleared
into the rational; ``cu`` floored at 1 for out-of-vocabulary tokens —
the +1 OOV floor) — then ``floor(x*1e6 + 0.5)`` micro-nats, summed
EXACTLY as bigints per doc (never a float sum across rows).  The
per-doc average is cleared-denominator integer division (Spark
``div`` and DuckDB ``//`` both truncate toward zero, pinned by
tests).

Plan shape (the scale story): ONE corpus-sized exchange — the
``groupBy(w1, w2)`` bigram count over the train split; context
totals (c1), unigram totals (cu) and the grand total N all derive
from that bigram table (vocab-sized, Heaps-bounded — never a second
corpus aggregation).  Scoring joins are **broadcast** (the LM tables
are the small side by construction) and N re-enters as a 1-row
broadcast crossJoin.  At a true 10^12-page corpus the bigram-type
table outgrows a broadcast (Heaps^2): the fallback is the same plan
with a shuffle equi-join of pairs on (w1, w2) — short rows, one more
exchange, nothing else changes.

Reference anchor: this generalizes the reference's per-page quality
gates (`src/core/pdf-to-md.ts` stage list) to the corpus-curation
scale the north rule asks for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import SQL_TOKENS, tokens

BOS = "<s>"          # context of each doc's first token; never a corpus token
LM_TRAIN_MOD = 2     # train split: doc_id % LM_TRAIN_MOD == 0


def _pairs(docs: DataFrame) -> DataFrame:
    """(doc_id, w1, w2) bigram events, one per token; the first token's
    context is the BOS sentinel."""
    base = docs.select("doc_id", tokens(F.col("text")).alias("tok")).filter(
        F.size("tok") >= 1
    )
    pair = F.transform(
        F.sequence(F.lit(1), F.size("tok")),
        lambda i: F.struct(
            F.when(i == 1, F.lit(BOS))
            .otherwise(F.element_at("tok", (i - 1).cast("int")))
            .alias("w1"),
            F.element_at("tok", i.cast("int")).alias("w2"),
        ),
    )
    return base.select("doc_id", F.explode(pair).alias("p")).select(
        "doc_id", "p.w1", "p.w2"
    )


def lm_perplexity_frame(docs: DataFrame) -> DataFrame:
    pairs = _pairs(docs)
    train = pairs.filter(F.col("doc_id") % LM_TRAIN_MOD == 0)

    # the ONE corpus exchange; everything else derives from it
    big = train.groupBy("w1", "w2").agg(F.count("*").cast("bigint").alias("cb"))
    ctx = big.groupBy("w1").agg(F.sum("cb").cast("bigint").alias("c1"))
    uni = big.groupBy("w2").agg(F.sum("cb").cast("bigint").alias("cu"))
    total = uni.agg(F.sum("cu").cast("bigint").alias("n_total"))

    scored = (
        pairs.join(F.broadcast(big), ["w1", "w2"], "left")
        .join(F.broadcast(ctx), ["w1"], "left")
        .join(F.broadcast(uni), ["w2"], "left")
        .crossJoin(F.broadcast(total))
    )
    seen = F.floor(F.log(F.col("cb") / F.col("c1")) * 1e6 + F.lit(0.5)).cast(
        "bigint"
    )
    unseen = F.floor(
        F.log(
            (2 * F.coalesce(F.col("cu"), F.lit(1)))
            / (5 * F.col("n_total"))
        )
        * 1e6
        + F.lit(0.5)
    ).cast("bigint")
    lp = F.when(F.col("cb").isNotNull(), seen).otherwise(unseen)
    agg = scored.select("doc_id", lp.alias("lp")).groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        (-F.sum("lp")).cast("bigint").alias("nll_micro"),
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        "nll_micro",
        F.expr("cast(nll_micro div n_tokens as bigint)").alias(
            "avg_nll_micro"
        ),
    )


def lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return lm_perplexity_frame(docs)


_TOK = SQL_TOKENS.format(expr="text")

LM_PERPLEXITY_SQL = f"""
WITH base AS (
  SELECT doc_id, {_TOK} AS tok FROM documents
  WHERE len({_TOK}) >= 1
),
pairs AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(tok) + 1),
           i -> CASE WHEN i = 1 THEN '{BOS}' ELSE tok[i-1] END)) AS w1,
         unnest(list_transform(range(1, len(tok) + 1), i -> tok[i])) AS w2
  FROM base
),
b AS (
  SELECT w1, w2, count(*)::BIGINT AS cb FROM pairs
  WHERE doc_id % {LM_TRAIN_MOD} = 0 GROUP BY w1, w2
),
ctx AS (SELECT w1, sum(cb)::BIGINT AS c1 FROM b GROUP BY w1),
uni AS (SELECT w2, sum(cb)::BIGINT AS cu FROM b GROUP BY w2),
tot AS (SELECT sum(cu)::BIGINT AS n_total FROM uni),
scored AS (
  SELECT p.doc_id,
         CASE WHEN b.cb IS NOT NULL
              THEN floor(ln(b.cb / ctx.c1) * 1e6 + 0.5)::BIGINT
              ELSE floor(ln((2 * coalesce(uni.cu, 1))
                            / (5 * tot.n_total)) * 1e6 + 0.5)::BIGINT
         END AS lp
  FROM pairs p
  LEFT JOIN b USING (w1, w2)
  LEFT JOIN ctx USING (w1)
  LEFT JOIN uni USING (w2)
  CROSS JOIN tot
)
SELECT doc_id, count(*)::BIGINT AS n_tokens,
       (-sum(lp))::BIGINT AS nll_micro,
       ((-sum(lp)) // count(*))::BIGINT AS avg_nll_micro
FROM scored GROUP BY doc_id
"""


QUERIES: dict[str, tuple] = {
    "text_lm_perplexity": (lm_perplexity, LM_PERPLEXITY_SQL),
}
