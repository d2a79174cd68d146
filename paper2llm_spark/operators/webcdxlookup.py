"""CDX index lookup — the wayback/Common-Crawl index SERVING path
(``webcdx.py`` builds the index; this operator answers "which archives
hold this url, at which timestamp" the way pywb / cdx-server route a
query: canonicalize the query url to its SURT, hash it to a shard, and
probe only that shard).

Query workload (deterministic, from the corpus itself): every 7th
document is queried; of those, every 3rd query asks for a url variant
that was NEVER captured (a ``/missing/`` path) so the MISS polarity is
driver-certified alongside hits.  Hit queries use a MESSY url variant
(an extra session param, different host case, a fragment) that was
never captured byte-for-byte — a hit therefore certifies that
lookup-time canonicalization reproduces index-time canonicalization,
the property the whole SURT scheme exists for.

Plan shape (the scale story): a lookup batch is tiny relative to the
index (thousands of queries against a 10^11-entry index), so the probe
is an INNER join with the query batch **broadcast** onto the streaming
index — the index NEVER reshuffles for a lookup batch; misses are
recovered by an anti-join of the query batch against the (query-sized)
hit set, never against the index.  Plan-asserted: the only exchanges
are the index build's own two, and the index side of the probe is
scan->join with no added shuffle.  The shard column routes a serving
deployment to one ZipNum shard per query; the broadcast probe is the
batch-analytics equivalent of that binary search.

Reference scope anchor: beyond-reference web-scale operator; companion
of ``operators/webcdx.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .webcdx import (
    _SURT_SQL,
    _h,
    _sqlh,
    cdx_index_frame,
    cdx_sql,
    surt_key,
    synth_captures,
)

QUERY_EVERY = 7   # every 7th doc is queried
MISS_EVERY = 3    # every 3rd query probes a never-captured path


def synth_queries(docs: DataFrame) -> DataFrame:
    """documents -> (query_url) rows: messy variants of captured urls
    plus planted misses."""
    doc_id = F.col("doc_id")
    probing = docs.filter(doc_id % QUERY_EVERY == 0)
    is_miss = _h(doc_id, "miss") % MISS_EVERY == 0
    path = F.when(is_miss, "/missing/").otherwise(F.lit("/docs/"))
    url = F.concat(
        F.lit("HTTPS://www."), F.upper(F.col("source")),
        F.lit(".EXAMPLE.org"), path, doc_id.cast("string"),
        F.lit("?b=2&phpsessid=zz&a=1&utm_medium=mail#top"),
    )
    return probing.select(url.alias("query_url"))


def cdx_lookup_frame(queries: DataFrame, index: DataFrame) -> DataFrame:
    """(query_url) x CDX index -> per-query hit/miss with capture info."""
    keyed = queries.select(
        "query_url", surt_key(F.col("query_url")).alias("surt"),
    )
    hits = index.join(F.broadcast(keyed), "surt").groupBy(
        "query_url", "surt"
    ).agg(
        F.lit(1).cast("bigint").alias("hit"),
        F.count("digest").cast("bigint").alias("n_entries"),
        F.sum("n_captures").cast("bigint").alias("n_captures"),
        F.min("first_ts").alias("earliest_ts"),
    )
    misses = keyed.join(
        F.broadcast(hits.select("surt")), "surt", "left_anti"
    ).select(
        "query_url", "surt",
        F.lit(0).cast("bigint").alias("hit"),
        F.lit(0).cast("bigint").alias("n_entries"),
        F.lit(0).cast("bigint").alias("n_captures"),
        F.lit(None).cast("string").alias("earliest_ts"),
    )
    return hits.unionByName(misses)


def cdx_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    index = cdx_index_frame(synth_captures(docs))
    return cdx_lookup_frame(synth_queries(docs), index)


_QUERY_SQL = f"""
  SELECT 'HTTPS://www.' || upper(source) || '.EXAMPLE.org'
         || CASE WHEN {_sqlh("miss")} % {MISS_EVERY} = 0
                 THEN '/missing/' ELSE '/docs/' END
         || doc_id || '?b=2&phpsessid=zz&a=1&utm_medium=mail#top'
           AS query_url
  FROM documents WHERE doc_id % {QUERY_EVERY} = 0
"""

CDX_LOOKUP_SQL = f"""
WITH {cdx_sql()},
q AS ({_QUERY_SQL}),
qk AS (
  SELECT query_url, {_SURT_SQL.format(u="query_url")} AS surt FROM q
)
SELECT qk.query_url, qk.surt,
       max(CASE WHEN cdx.digest IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         AS hit,
       count(cdx.digest)::BIGINT AS n_entries,
       sum(coalesce(cdx.n_captures, 0))::BIGINT AS n_captures,
       min(cdx.first_ts) AS earliest_ts
FROM qk LEFT JOIN cdx ON cdx.surt = qk.surt
GROUP BY qk.query_url, qk.surt
"""


QUERIES: dict[str, tuple] = {
    "web_cdx_lookup": (cdx_lookup, CDX_LOOKUP_SQL),
}
