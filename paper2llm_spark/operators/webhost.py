"""Host-level quality prior — the domain-aggregation stage modern
curation stacks run between page scoring and selection (RefinedWeb's
domain filtering, DCLM's domain-aggregated classifier signals,
FineWeb's host-level audits): a page's keep decision blends its own
quality score with the empirical-Bayes reputation of its host.

Math (all exact bigint, ``div`` truncates identically in both
engines):

* per-doc score = mean hashed-classifier token weight in micro-units
  (``sum_w div n_toks`` — the ``text_quality_classifier`` feature
  reused, so a trained model upgrades BOTH operators at once);
* host prior = shrunk host mean,
  ``(sum_host + M*g_mean) div (n_host + M)`` with M = 20 pseudo-docs —
  small hosts pull to the global mean ``g_mean``, big hosts earn
  their own reputation (Dirichlet / empirical-Bayes smoothing);
* combined = ``(7*doc + 3*prior) div 10`` (page signal dominates,
  host prior tilts borderline pages), keep iff combined >= 0.

Plan shape (the scale story): doc scores are a codegen projection in
the scan task; the ONLY corpus-sized exchange carries
``(host, count, sum)`` partial-agg short rows; the host table
(|hosts| rows) re-enters by **broadcast** hash join and the 1-row
global mean by broadcast crossJoin — the corpus itself never
shuffles, so at 10^12 pages the cost is one scan plus a
vocabulary-of-hosts aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, tokens
from .webquality import QCLF_BUCKETS, QCLF_WEIGHTS, _W_LIST, _BUCKET

PRIOR_M = 20          # pseudo-doc count for shrinkage
COMBINE = (7, 3, 10)  # combined = (7*doc + 3*prior) div 10


def _doc_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, host, doc_score_micro) — scan-side only."""
    staged = docs.select(
        "doc_id",
        F.concat(F.col("source"), F.lit(".test")).alias("host"),
        tokens(F.col("text")).alias("toks"),
    ).withColumn("w", F.lit(QCLF_WEIGHTS))
    sum_w = F.aggregate(
        F.col("toks"), F.lit(0).cast("bigint"),
        lambda acc, t: acc + F.element_at(
            F.col("w"), (portable_hash60(t) % QCLF_BUCKETS).cast("int") + 1
        ),
    )
    return staged.select(
        "doc_id", "host", sum_w.alias("sum_w"),
        F.size("toks").cast("bigint").alias("n_toks"),
    ).select(
        "doc_id", "host",
        F.when(F.col("n_toks") == 0, F.lit(0).cast("bigint"))
        .otherwise(F.expr("sum_w div n_toks")).alias("doc_score_micro"),
    )


def host_prior_frame(docs: DataFrame) -> DataFrame:
    scored = _doc_scores(docs)
    hosts = scored.groupBy("host").agg(
        F.count("*").cast("bigint").alias("host_docs"),
        F.sum("doc_score_micro").cast("bigint").alias("host_sum"),
    )
    glob = scored.agg(
        F.expr("sum(doc_score_micro) div count(*)")
        .cast("bigint").alias("g_mean")
    )
    prior = F.expr(
        f"(host_sum + {PRIOR_M} * g_mean) div (host_docs + {PRIOR_M})"
    )
    a, b, d = COMBINE
    combined = F.expr(
        f"({a} * doc_score_micro + {b} * host_prior_micro) div {d}"
    )
    return scored.join(
        F.broadcast(hosts), "host"
    ).crossJoin(F.broadcast(glob)).select(
        "doc_id", "host", "doc_score_micro", "host_docs",
        prior.cast("bigint").alias("host_prior_micro"),
    ).select(
        "doc_id", "host", "doc_score_micro", "host_docs",
        "host_prior_micro",
        combined.cast("bigint").alias("combined_micro"),
        (combined >= 0).alias("keep"),
    )


def host_prior(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return host_prior_frame(docs)


_TOK = "list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0)"

HOST_PRIOR_SQL = f"""
WITH t AS (
  SELECT doc_id, source || '.test' AS host, {_TOK} AS tok FROM documents
),
m AS (
  SELECT doc_id, host,
         len(tok)::BIGINT AS n_toks,
         coalesce(list_sum(list_transform(tok,
                     x -> ({_W_LIST})[{_BUCKET} + 1])), 0)::BIGINT AS sum_w
  FROM t
),
scored AS (
  SELECT doc_id, host,
         CASE WHEN n_toks = 0 THEN 0 ELSE sum_w // n_toks END::BIGINT
           AS doc_score_micro
  FROM m
),
hosts AS (
  SELECT host, count(*)::BIGINT AS host_docs,
         sum(doc_score_micro)::BIGINT AS host_sum
  FROM scored GROUP BY host
),
gstats AS (
  SELECT (sum(doc_score_micro) // count(*))::BIGINT AS g_mean FROM scored
),
j AS (
  SELECT s.doc_id, s.host, s.doc_score_micro, h.host_docs,
         ((h.host_sum + {PRIOR_M} * g.g_mean)
          // (h.host_docs + {PRIOR_M}))::BIGINT AS host_prior_micro
  FROM scored s JOIN hosts h USING (host), gstats g
)
SELECT doc_id, host, doc_score_micro, host_docs, host_prior_micro,
       (({COMBINE[0]} * doc_score_micro + {COMBINE[1]} * host_prior_micro)
        // {COMBINE[2]})::BIGINT AS combined_micro,
       (({COMBINE[0]} * doc_score_micro + {COMBINE[1]} * host_prior_micro)
        // {COMBINE[2]}) >= 0 AS keep
FROM j
"""


QUERIES: dict[str, tuple] = {
    "web_host_prior": (host_prior, HOST_PRIOR_SQL),
}
