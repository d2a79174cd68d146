"""Span-corruption planning — the T5/UL2 denoising-objective mask
statistics (Raffel et al. JMLR 2020 §3.1.4: 15% corruption rate,
mean span 3; Tay et al. 2022 UL2 mixes span profiles).  Before a
denoising pretraining run you plan the masks: how many tokens does
the profile actually corrupt, how many sentinel tokens does it
inject (one per maximal masked run — they expand the target
sequence), and how far the realized rate drifts from the nominal
15% at your document lengths.  This operator computes the EXACT
realized plan from a deterministic hash-driven profile — the
dry-run table a data team reads before committing GPU-months.

Semantics (frozen): per document over its token positions
``i = 1..n``: a span STARTS at i iff ``h(doc_id:i:sc) % 20 == 0``
(5% of positions) with length ``L = 2 + h(doc_id:i:sl) % 3``
(2-4, mean 3 — nominal rate 5% x 3 = 15%); spans may overlap and
the MASK is their union (position j is masked iff some start
``s in [j-3, j]`` has ``L_s >= j-s+1`` — the lookback is bounded
by max L, so the union is an exact windowed HOF, no sequential
scan).  Sentinels = maximal masked runs (0->1 transitions).
Output per doc: ``n_tokens``, ``n_starts``, ``n_masked``,
``n_sentinels``, ``mask_rate_micro = n_masked * 1e6 div
max(n_tokens, 1)``.

Plan shape (the scale story): everything is ONE scan projection —
staged start/length arrays, the bounded-lookback union, and the
transition fold are all codegen-side HOFs over per-doc arrays;
zero exchanges, zero joins, zero Python (plan-asserted).  At
10^12 docs this prices the objective for the cost of a scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import SQL_TOKENS, sql_hash60, tokens

MICRO = 1_000_000
START_MOD = 20   # 5% of positions start a span
SPAN_MIN = 2
SPAN_RNG = 3     # L in {2, 3, 4}
MAX_L = SPAN_MIN + SPAN_RNG - 1


def _h(tag: str) -> str:
    # 60-bit portable hash of doc_id:i:tag (Spark SQL side)
    return (
        f"cast(conv(substr(md5(concat(cast(doc_id as string), ':',"
        f" cast(i as string), ':{tag}')), 1, 15), 16, 10) as bigint)"
    )


def span_corruption_frame(docs: DataFrame) -> DataFrame:
    staged = docs.select(
        "doc_id", F.size(tokens(F.col("text"))).cast("int").alias("n")
    )
    starts = (
        f"transform(sequence(1, greatest(n, 1)),"
        f" i -> if(n >= 1 and {_h('sc')} % {START_MOD} = 0,"
        f" {SPAN_MIN} + {_h('sl')} % {SPAN_RNG}, 0))"
    )
    with_arrays = staged.select(
        "doc_id", "n", F.expr(starts).alias("ls")
    )
    # mask[j] = 1 iff some start s in [j - MAX_L + 1, j] covers j
    mask = (
        f"transform(sequence(1, greatest(n, 1)), j ->"
        f" if(n >= 1 and exists(sequence(greatest(j - {MAX_L} + 1, 1), j),"
        f" s -> element_at(ls, s) >= j - s + 1), 1, 0))"
    )
    m = with_arrays.select(
        "doc_id",
        "n",
        F.expr(
            f"size(filter(ls, x -> x > 0)) * if(n >= 1, 1, 0)"
        ).cast("bigint").alias("n_starts"),
        F.expr(mask).alias("mask"),
    )
    return m.select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_tokens"),
        "n_starts",
        F.expr("if(n >= 1, aggregate(mask, 0, (a, v) -> a + v), 0)")
        .cast("bigint").alias("n_masked"),
        F.expr(
            "if(n >= 1, aggregate(sequence(1, size(mask)),"
            " 0, (a, j) -> a + if(element_at(mask, j) = 1 and"
            " (j = 1 or element_at(mask, j - 1) = 0), 1, 0)), 0)"
        ).cast("bigint").alias("n_sentinels"),
        F.expr(
            f"if(n >= 1, aggregate(mask, 0, (a, v) -> a + v), 0)"
            f" * {MICRO} div greatest(n, 1)"
        ).cast("bigint").alias("mask_rate_micro"),
    )


def span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return span_corruption_frame(docs)


def _hq(tag: str) -> str:
    return sql_hash60(
        f"doc_id::VARCHAR || ':' || i::VARCHAR || ':{tag}'"
    )


_TOK = SQL_TOKENS.format(expr="text")

SPAN_CORRUPTION_SQL = f"""
WITH staged AS (
  SELECT doc_id, len({_TOK})::INT AS n FROM documents
),
arr AS (
  SELECT doc_id, n,
         list_transform(range(1, greatest(n, 1) + 1),
           i -> CASE WHEN n >= 1 AND {_hq('sc')} % {START_MOD} = 0
                THEN {SPAN_MIN} + {_hq('sl')} % {SPAN_RNG}
                ELSE 0 END) AS ls
  FROM staged
),
m AS (
  SELECT doc_id, n,
         (len(list_filter(ls, x -> x > 0))
          * CASE WHEN n >= 1 THEN 1 ELSE 0 END)::BIGINT AS n_starts,
         list_transform(range(1, greatest(n, 1) + 1), j ->
           CASE WHEN n >= 1 AND len(list_filter(
                  range(greatest(j - {MAX_L} + 1, 1), j + 1),
                  s -> ls[s] >= j - s + 1)) > 0
                THEN 1 ELSE 0 END) AS mask
  FROM arr
)
SELECT doc_id,
       n::BIGINT AS n_tokens,
       n_starts,
       (CASE WHEN n >= 1 THEN list_sum(mask) ELSE 0 END)::BIGINT
         AS n_masked,
       (CASE WHEN n >= 1 THEN list_sum(list_transform(
           range(1, len(mask) + 1),
           j -> CASE WHEN mask[j] = 1 AND (j = 1 OR mask[j-1] = 0)
                THEN 1 ELSE 0 END)) ELSE 0 END)::BIGINT AS n_sentinels,
       ((CASE WHEN n >= 1 THEN list_sum(mask) ELSE 0 END) * {MICRO}
        // greatest(n, 1))::BIGINT AS mask_rate_micro
FROM m
"""


QUERIES: dict[str, tuple] = {
    "corpus_span_corruption": (span_corruption, SPAN_CORRUPTION_SQL),
}
