"""Systematic probability-proportional-to-size host sampling (Madow
& Madow, Ann. Math. Stat. 1944; the πps systematic design every
survey-sampling text ships; in crawl ops it is how a re-crawl or
audit budget of K fetches is spread over hosts in proportion to
their byte volume — the deterministic cousin of the per-doc A-Res
sampler `corpus_weighted_sample`).

Semantics (frozen): hosts per the webwilson synthesis rule with
byte traffic ``x_h = sum(n_chars)`` (the webgini table).  Hosts
ordered by ``host`` ascending (the frame of reference systematic
sampling needs — frozen, deterministic); ``cum_h`` = cumulative
bytes BEFORE host h, ``T`` = total.  K = 50 draw points sit at
``r_j = j*T + T div 2`` for ``j = 0..K-1`` in the K-scaled space
``[0, K*T)`` where host h covers ``[K*cum_h, K*(cum_h + x_h))``.
Multiplicity by the exact telescoping form::

  m_h = (K*(cum_h + x_h) + SH) div T - (K*cum_h + SH) div T,
  SH  = K*T - 1 - (T div 2)

(the shift keeps every numerator nonnegative, so Spark's
truncating ``div`` equals DuckDB's flooring ``//`` — the webcalib
discipline; the multiplicities sum EXACTLY to K by construction).
Output: selected hosts only —
``(host, bytes, multiplicity, incl_exp_micro = K*x*1e6 div T)``
(the expected inclusion count E[m_h], the πps weight a downstream
Horvitz-Thompson estimator divides by).

Plan shape (the scale story): ONE corpus-sized exchange — the
map-side-combinable groupBy(host) byte collapse; the cumulative
window and the multiplicity projection run on the |hosts|-bounded
table (single-partition window documented, as webgini); T re-enters
by 1-row broadcast.  Zero non-broadcast joins, zero Python,
``text`` never read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, sql_hash60
from .webgini import N_HOSTS

K_DRAWS = 50
MICRO = 1_000_000


def pps_sample_frame(docs: DataFrame) -> DataFrame:
    per_host = docs.select(
        F.concat(
            F.col("source"),
            F.lit("-h"),
            (portable_hash60(F.concat(F.col("doc_id").cast("string"),
                                      F.lit(":wh"))) % N_HOSTS)
            .cast("string"),
        ).alias("host"),
        F.col("n_chars").cast("bigint").alias("bytes"),
    ).groupBy("host").agg(F.sum("bytes").cast("bigint").alias("x"))
    # persist the |hosts|-bounded collapse: the total fold AND the
    # cumulative window both consume it (the webgini persist
    # discipline — without it the corpus groupBy(host) runs twice)
    from pyspark import StorageLevel

    per_host = per_host.persist(StorageLevel.MEMORY_AND_DISK)
    total = per_host.agg(F.sum("x").cast("bigint").alias("t"))
    w = Window.orderBy("host").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per_host.select(
        "host",
        "x",
        (F.sum("x").over(w) - F.col("x")).cast("bigint").alias("cum"),
    ).crossJoin(F.broadcast(total))
    k = K_DRAWS
    sh = f"({k} * t - 1 - t div 2)"
    m = (
        f"({k} * (cum + x) + {sh}) div t - ({k} * cum + {sh}) div t"
    )
    return cum.select(
        "host",
        F.col("x").alias("bytes"),
        F.expr(m).cast("bigint").alias("multiplicity"),
        F.expr(f"{k} * x * {MICRO} div t").cast("bigint")
        .alias("incl_exp_micro"),
    ).filter(F.col("multiplicity") >= 1)


def pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return pps_sample_frame(docs)


_HASH = sql_hash60("doc_id::VARCHAR || ':wh'")
_HOST = f"source || '-h' || ({_HASH} % {N_HOSTS})::VARCHAR"
_SH = f"({K_DRAWS} * t - 1 - t // 2)"
_M = (
    f"({K_DRAWS} * (cum + x) + {_SH}) // t"
    f" - ({K_DRAWS} * cum + {_SH}) // t"
)

PPS_SAMPLE_SQL = f"""
WITH per_host AS (
  SELECT {_HOST} AS host, sum(n_chars)::BIGINT AS x
  FROM documents GROUP BY 1
),
total AS (SELECT sum(x)::BIGINT AS t FROM per_host),
cum AS (
  SELECT host, x,
         (sum(x) OVER (ORDER BY host
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          - x)::BIGINT AS cum
  FROM per_host
)
SELECT host, x AS bytes,
       ({_M})::BIGINT AS multiplicity,
       ({K_DRAWS} * x * {MICRO} // t)::BIGINT AS incl_exp_micro
FROM cum, total
WHERE {_M} >= 1
"""


QUERIES: dict[str, tuple] = {
    "corpus_pps_sample": (pps_sample, PPS_SAMPLE_SQL),
}
