"""Wilson-score host quality ranking (Wilson, JASA 1927; the lower
bound Reddit's "best" comment sort made famous, and the correct way
to rank hosts by pass-rate when host sizes differ by orders of
magnitude).  A host with 2/2 docs passing is NOT better than one
with 180/200 — the naive proportion says it is, the Wilson lower
bound says otherwise — and host-level crawl allocation (FineWeb's
host audits, this repo's `web_host_prior`) needs the
small-sample-sane statistic.

Semantics (frozen): hosts synthesized per the webhost discipline
(no host column in the corpus): ``host = source || '-h' ||
hash60(doc_id ':wh') % 32``.  A doc PASSES iff ``length(text) >=
200`` (a fixed, deterministic stand-in for any upstream quality
gate).  Per host with n docs / k passes, the z=1.96 lower bound in
its nomogram form ``(k + zz/2 - z*sqrt(k*(n-k)/n + zz/4)) / (n +
zz)`` is ONE shape-identical double expression (zz = 3.8416 literal)
frozen to micro-units; the naive proportion ``k*1e6 div n`` is
emitted next to it so the gate certifies the ranking DIFFERENCE, not
just the formula.  Output: ``(host, n_docs, n_pass, naive_micro,
wilson_lo_micro)``.

Plan shape (the scale story): the pass flag is a scan-side codegen
projection; ONE map-side-combinable groupBy(host) collapses 10^12
docs to (host, n, k) short rows; the bound is arithmetic on the
collapsed table.  Zero joins, zero Python (plan-asserted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, sql_hash60

N_HOSTS = 32
PASS_CHARS = 200
_WILSON = (
    "cast(floor((kk + 1.9208 - 1.96 * sqrt(kk * (nn - kk) / nn"
    " + 0.9604)) / (nn + 3.8416) * 1000000.0 + 0.5) as bigint)"
)


def wilson_frame(docs: DataFrame) -> DataFrame:
    tagged = docs.select(
        F.concat(
            F.col("source"), F.lit("-h"),
            (
                portable_hash60(
                    F.concat(F.col("doc_id").cast("string"), F.lit(":wh"))
                ) % N_HOSTS
            ).cast("string"),
        ).alias("host"),
        (F.length("text") >= PASS_CHARS).cast("long").alias("pass"),
    )
    agg = tagged.groupBy("host").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("pass").cast("bigint").alias("n_pass"),
    )
    return agg.select(
        "host", "n_docs", "n_pass",
        F.expr("n_pass * 1000000 div n_docs").cast("bigint")
        .alias("naive_micro"),
        F.expr(
            _WILSON.replace("kk", "cast(n_pass as double)")
            .replace("nn", "cast(n_docs as double)")
        ).alias("wilson_lo_micro"),
    )


def wilson_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return wilson_frame(docs.select("doc_id", "source", "text"))


_H = sql_hash60("doc_id::VARCHAR || ':wh'")
_W_SQL = (
    "floor((kk + 1.9208 - 1.96 * sqrt(kk * (nn - kk) / nn"
    " + 0.9604)) / (nn + 3.8416) * 1000000.0 + 0.5)::BIGINT"
)

WILSON_SQL = f"""
WITH tagged AS (
  SELECT source || '-h' || ({_H} % {N_HOSTS})::VARCHAR AS host,
         (CASE WHEN strlen(text) >= {PASS_CHARS} THEN 1 ELSE 0 END)
           ::BIGINT AS pass
  FROM documents
),
agg AS (
  SELECT host, count(*)::BIGINT AS n_docs, sum(pass)::BIGINT AS n_pass
  FROM tagged GROUP BY 1
)
SELECT host, n_docs, n_pass,
       (n_pass * 1000000 // n_docs)::BIGINT AS naive_micro,
       {_W_SQL.replace("kk", "n_pass::DOUBLE")
              .replace("nn", "n_docs::DOUBLE")} AS wilson_lo_micro
FROM agg
"""


QUERIES: dict[str, tuple] = {
    "web_wilson_hosts": (wilson_hosts, WILSON_SQL),
}
