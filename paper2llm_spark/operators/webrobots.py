"""robots.txt compliance filtering (SURVEY.md §2.11).

Between frontier and fetch, every polite crawler applies the
Robots Exclusion Protocol (RFC 9309; the Google REP): for each URL,
find the most specific rule whose path-prefix matches and honor it —
**longest prefix wins, Allow beats Disallow on ties, no match means
allowed**.  CCNet/C4-style corpora apply the same check retroactively
to drop pages whose host forbids crawling.  This operator joins a
per-host rule table against the page URLs and emits the matched rule
and the keep decision per page.

Scale shape — ZERO exchanges:

* the rule table (host, path_prefix, allow) is deduplicated with a
  small-side groupBy (`max(allow)` per (host, prefix) — the RFC
  tie-break) and then **broadcast**: real-world robots state is
  ~10^6-10^7 hosts × a few rules, orders of magnitude below the corpus;
* instead of exploding each URL into its prefixes and re-aggregating
  (an exchange of corpus-sized rows), the operator does ONE left
  broadcast join PER PATH DEPTH LEVEL on the exact (host, prefix) key
  — rule prefixes sit at segment boundaries and real rules are
  shallow, so depth is a small constant — and picks the longest match
  in a codegen projection.  No explode, no groupBy, no shuffle: the
  whole check rides the scan task;
* if the rule table ever outgrew broadcast, the same equi-join keys
  co-partition — the plan degrades to a shuffle join, never a scan of
  rule text per page.

The driver corpus has no robots column, so the registered query
synthesizes both sides in-engine from ``documents`` alone (the
templated-corpus technique): each source host gets ``ROBOTS_RULES``
hash-rolled rules over a fixed path-segment universe (half 1-segment,
half 2-segment; 1-in-3 Allow), and each page's URL gets a hash-rolled
2-segment path — byte-identical in both engines, so keeps and denies
both occur and longest-match beats shorter rules observably.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, sql_hash60

PATH_SEGS = (
    "public", "blog", "private", "tmp", "admin", "data", "news", "shop",
)
ROBOTS_RULES = 4   # synthesized rules per host (2 one-seg + 2 two-seg)
ALLOW_MOD = 3      # 1/3 of rules are Allow


def robots_filter_frame(pages: DataFrame, rules: DataFrame) -> DataFrame:
    """pages(url) x rules(host, path_prefix, allow) -> per-page verdict.

    RFC 9309 semantics: longest matching prefix wins; Allow wins a
    same-length tie (folded into the rule dedup); no match => allowed.
    """
    dedup = rules.groupBy("host", "path_prefix").agg(
        F.max(F.col("allow").cast("int")).alias("allow_i")
    )
    staged = pages.select(
        "url",
        F.regexp_extract("url", r"https://([^/]+)", 1).alias("host"),
        F.regexp_extract("url", r"https://[^/]+(/.*)$", 1).alias("path"),
    ).select(
        "url", "host", "path",
        F.regexp_extract("path", r"^(/[^/]+)", 1).alias("p1"),
        F.regexp_extract("path", r"^(/[^/]+/[^/]+)", 1).alias("p2"),
    )
    r1 = dedup.select(
        F.col("host").alias("h1"), F.col("path_prefix").alias("pp1"),
        F.col("allow_i").alias("a1"),
    )
    r2 = dedup.select(
        F.col("host").alias("h2"), F.col("path_prefix").alias("pp2"),
        F.col("allow_i").alias("a2"),
    )
    joined = (
        staged.join(
            F.broadcast(r1),
            (F.col("host") == F.col("h1")) & (F.col("p1") == F.col("pp1")),
            "left",
        )
        .join(
            F.broadcast(r2),
            (F.col("host") == F.col("h2")) & (F.col("p2") == F.col("pp2")),
            "left",
        )
    )
    # longest match wins: a level-2 hit shadows level-1; no hit => allow
    matched = F.when(F.col("a2").isNotNull(), F.col("pp2")).when(
        F.col("a1").isNotNull(), F.col("pp1")
    ).otherwise(F.lit(""))
    verdict = F.when(F.col("a2").isNotNull(), F.col("a2") == 1).when(
        F.col("a1").isNotNull(), F.col("a1") == 1
    ).otherwise(F.lit(True))
    return joined.select(
        "url", "host", "path",
        matched.alias("matched_prefix"),
        verdict.alias("allowed"),
    )


def _seg(h: Column) -> Column:
    return F.element_at(
        F.array(*[F.lit(s) for s in PATH_SEGS]),
        (h % len(PATH_SEGS)).cast("int") + 1,
    )


def synth_rules(docs: DataFrame) -> DataFrame:
    """Per distinct source host: ROBOTS_RULES hash-rolled rules (first
    half 1-segment prefixes, second half 2-segment)."""
    hosts = docs.select(
        F.concat(F.col("source"), F.lit(".test")).alias("host")
    ).distinct()
    ks = F.array(*[F.lit(k) for k in range(ROBOTS_RULES)])
    r = hosts.select("host", F.explode(ks).alias("k"))
    roll = lambda salt: portable_hash60(  # noqa: E731
        F.concat(F.col("host"), F.lit(f":{salt}:"), F.col("k").cast("string"))
    )
    one_seg = F.concat(F.lit("/"), _seg(roll("s1")))
    two_seg = F.concat(one_seg, F.lit("/"), _seg(roll("s2")))
    return r.select(
        "host",
        F.when(F.col("k") < ROBOTS_RULES // 2, one_seg)
        .otherwise(two_seg)
        .alias("path_prefix"),
        (roll("a") % ALLOW_MOD == 0).alias("allow"),
    )


def synth_pages(docs: DataFrame) -> DataFrame:
    roll = lambda salt: portable_hash60(  # noqa: E731
        F.concat(F.col("doc_id").cast("string"), F.lit(f":{salt}"))
    )
    return docs.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".test/"),
            _seg(roll("p1")), F.lit("/"), _seg(roll("p2")), F.lit("/"),
            F.col("doc_id").cast("string"),
        ).alias("url")
    )


def robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return robots_filter_frame(synth_pages(docs), synth_rules(docs))


def _sql_seg(hash_expr: str) -> str:
    segs = ", ".join(f"'{s}'" for s in PATH_SEGS)
    return f"(([{segs}])[({hash_expr}) % {len(PATH_SEGS)} + 1])"


_R_S1 = _sql_seg(sql_hash60("host || ':s1:' || k"))
_R_S2 = _sql_seg(sql_hash60("host || ':s2:' || k"))
_R_A = sql_hash60("host || ':a:' || k")
_P_S1 = _sql_seg(sql_hash60("doc_id || ':p1'"))
_P_S2 = _sql_seg(sql_hash60("doc_id || ':p2'"))

ROBOTS_FILTER_SQL = f"""
WITH hosts AS (SELECT DISTINCT source || '.test' AS host FROM documents),
raw_rules AS (
  SELECT host,
         CASE WHEN k < {ROBOTS_RULES // 2} THEN '/' || {_R_S1}
              ELSE '/' || {_R_S1} || '/' || {_R_S2} END AS path_prefix,
         ({_R_A}) % {ALLOW_MOD} = 0 AS allow
  FROM hosts, range(0, {ROBOTS_RULES}) t(k)
),
rules AS (
  SELECT host, path_prefix, max(allow::INT) AS allow_i
  FROM raw_rules GROUP BY 1, 2
),
pages AS (
  SELECT 'https://' || source || '.test/' || {_P_S1} || '/' || {_P_S2}
         || '/' || doc_id AS url
  FROM documents
),
staged AS (
  SELECT url,
         regexp_extract(url, 'https://([^/]+)', 1) AS host,
         regexp_extract(url, 'https://[^/]+(/.*)$', 1) AS path
  FROM pages
),
px AS (
  SELECT url, host, path,
         regexp_extract(path, '^(/[^/]+)', 1) AS p1,
         regexp_extract(path, '^(/[^/]+/[^/]+)', 1) AS p2
  FROM staged
)
SELECT px.url, px.host, px.path,
       CASE WHEN r2.allow_i IS NOT NULL THEN r2.path_prefix
            WHEN r1.allow_i IS NOT NULL THEN r1.path_prefix
            ELSE '' END AS matched_prefix,
       CASE WHEN r2.allow_i IS NOT NULL THEN r2.allow_i = 1
            WHEN r1.allow_i IS NOT NULL THEN r1.allow_i = 1
            ELSE TRUE END AS allowed
FROM px
LEFT JOIN rules r1 ON px.host = r1.host AND px.p1 = r1.path_prefix
LEFT JOIN rules r2 ON px.host = r2.host AND px.p2 = r2.path_prefix
"""


QUERIES: dict[str, tuple] = {
    "web_robots_filter": (robots_filter, ROBOTS_FILTER_SQL),
}
