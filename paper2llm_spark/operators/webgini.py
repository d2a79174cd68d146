"""Host-traffic concentration audit: Gini coefficient +
concentration ratios over per-host byte volume (Gini 1912 via the
ordered cumulative form, Sen 1973; CR-k ratios are the standard
industrial-concentration read-out).  The crawl-ops question: *how
skewed is the corpus across hosts?* — a high Gini means a handful
of hosts dominate the bytes, which is simultaneously a straggler
risk for per-host partitioned jobs (the salting trigger), a
politeness bottleneck for the fetcher fleet, and a diversity red
flag on the datasheet (the host-level twin of
``corpus_source_entropy``'s language view).

Semantics (frozen): hosts synthesized per the webwilson discipline
(``host = source || '-h' || hash60(doc_id ':wh') % 32``); traffic
``x_h = sum(n_chars)`` per host.  With hosts ranked ascending by
``(x, host)`` (i = 1..n, deterministic tiebreak) and ``T = sum x``:

* ``gini_micro = (2*S1 - (n+1)*T) * 1e6 div (n*T)`` where
  ``S1 = sum(i * x_i)`` — the exact ordered-form population Gini
* ``cr1_micro`` / ``cr10_micro`` — byte share of the largest 1 / 10
  hosts: ``sum(x where i > n-k) * 1e6 div T``

All exact bigints; one output row
``(n_hosts, total_bytes, gini_micro, cr1_micro, cr10_micro)``.

Plan shape (the scale story): ONE corpus-sized exchange — the
map-side-combinable ``groupBy(host)`` that collapses 10^12 docs to
(host, bytes) short rows; (n, T) re-enter the ranked table as a
1-row BROADCAST so the conditional CR sums fold into the same final
aggregate; the rank window runs on the |hosts|-bounded table
(single-partition window documented — |hosts| ~10^7 rows of 2
bigints at web scale, a range-partitioned sort if it ever outgrows
one task).  Zero non-broadcast joins, zero Python, ``text`` never
read (the ``n_chars`` column only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, sql_hash60

N_HOSTS = 32
MICRO = 1_000_000
CR_K = 10


def host_gini_frame(docs: DataFrame) -> DataFrame:
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
    # persist the |hosts|-bounded collapse: the scalar fold AND the
    # rank window both consume it, and without the persist the
    # corpus-sized groupBy(host) exchange runs twice (2 bigints/host —
    # the simhash_pairs persist discipline)
    from pyspark import StorageLevel

    per_host = per_host.persist(StorageLevel.MEMORY_AND_DISK)
    scalars = per_host.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("t"),
    )
    w = Window.orderBy(F.col("x").asc(), F.col("host").asc())
    ranked = per_host.select(
        "host", "x", F.row_number().over(w).cast("bigint").alias("i")
    ).crossJoin(F.broadcast(scalars))
    return ranked.agg(
        F.max("n").alias("n_hosts"),
        F.max("t").alias("total_bytes"),
        F.expr(
            f"(2 * sum(i * x) - (max(n) + 1) * max(t)) * {MICRO}"
            f" div (max(n) * max(t))"
        ).cast("bigint").alias("gini_micro"),
        F.expr(
            f"sum(case when i > n - 1 then x else 0 end) * {MICRO}"
            f" div max(t)"
        ).cast("bigint").alias("cr1_micro"),
        F.expr(
            f"sum(case when i > n - {CR_K} then x else 0 end) * {MICRO}"
            f" div max(t)"
        ).cast("bigint").alias("cr10_micro"),
    )


def host_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return host_gini_frame(docs)


_HASH = sql_hash60("doc_id::VARCHAR || ':wh'")
_HOST = f"source || '-h' || ({_HASH} % {N_HOSTS})::VARCHAR"

HOST_GINI_SQL = f"""
WITH per_host AS (
  SELECT {_HOST} AS host, sum(n_chars)::BIGINT AS x
  FROM documents GROUP BY 1
),
scalars AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS t FROM per_host),
ranked AS (
  SELECT host, x,
         row_number() OVER (ORDER BY x ASC, host ASC)::BIGINT AS i
  FROM per_host
)
SELECT max(n)::BIGINT AS n_hosts,
       max(t)::BIGINT AS total_bytes,
       ((2 * sum(i * x) - (max(n) + 1) * max(t)) * {MICRO}
        // (max(n) * max(t)))::BIGINT AS gini_micro,
       (sum(CASE WHEN i > n - 1 THEN x ELSE 0 END) * {MICRO}
        // max(t))::BIGINT AS cr1_micro,
       (sum(CASE WHEN i > n - {CR_K} THEN x ELSE 0 END) * {MICRO}
        // max(t))::BIGINT AS cr10_micro
FROM ranked, scalars
"""


QUERIES: dict[str, tuple] = {
    "web_host_gini": (host_gini, HOST_GINI_SQL),
}
