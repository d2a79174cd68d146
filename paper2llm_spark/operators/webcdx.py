"""SURT canonicalization + CDX capture index — the Common Crawl /
OpenWayback URL-index shape (IIPC's CDX(J) format; SURT = Sort-
friendly URI Reordering Transform, the key order every wayback index
uses).  This is the lookup-side companion of the WARC/WAT/WET
container trio in ``sources/warc.py``: given captures, build the index
that answers "which archives hold this url, at which timestamps".

SURT canonicalization (frozen subset of the iipc/urlcanon rules):

1. fragment dropped, scheme dropped (case-insensitive);
2. host lowercased, default ports (``:80``/``:443``) stripped,
   leading ``www\\d*.`` stripped;
3. host components REVERSED and comma-joined —
   ``foo.example.org`` -> ``org,example,foo`` — so one registered
   domain's captures are lexicographically contiguous;
4. path lowercased (empty -> ``/``);
5. query split on ``&``, session/tracking params dropped
   (``utm_*``, ``jsessionid``, ``phpsessid``, ``sid``), the rest
   SORTED and rejoined — param order never splits a key.

Index build: captures collapse by (surt, digest) — the CDX revisit
rule: identical content at the same canonical url is ONE index entry
carrying its capture count and earliest 14-digit CDX timestamp — then
each entry lands in a shard by ``portable_hash60(surt) % N`` and gets
its lexicographic rank within the shard.  Production note: Common
Crawl's ZipNum index is RANGE-sharded (a sampled repartitionByRange +
sortWithinPartitions in Spark); range boundaries come from runtime
sampling and are not reproducible cross-engine, so the registered
query uses deterministic hash shards — the serving contract is the
same (route a lookup key to its shard, binary-search the sorted
shard), only the shard-assignment function differs, and lookups route
by the identical hash.

Plan shape (the scale story): canonicalization is pure codegen string
work in the scan task; the ONLY corpus-sized exchange is the
map-side-combinable groupBy(surt, digest) of SHORT rows (two hashes +
a 14-char ts); the shard-rank window exchanges the collapsed index
entries, orders of magnitude smaller.  No joins, no Python
(plan-asserted).

The synthesized captures emit TWO url variants per document — one
messy (mixed-case scheme/host, ``www.``, ``:443``, fragment, utm
params, unsorted query) and one clean — which MUST collapse to the
same SURT key: the driver hash certifies every canonicalization rule,
because any broken rule doubles the key count.

Reference scope anchor: beyond-reference web-scale operator; the
reference's own URL handling (``src/core/url-handlers.ts``) is ported
in ``operators/urls.py`` (P1-P5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, sql_hash60

N_SHARDS = 16
_SESSION_PARAM = r"^(utm_[a-z]+|jsessionid|phpsessid|sid)="


def surt_key(url: Column) -> Column:
    """URL -> SURT canonical key (frozen rules above)."""
    nofrag = F.regexp_replace(url, "#.*$", "")
    noscheme = F.regexp_replace(nofrag, "^[a-zA-Z]+://", "")
    hostport = F.regexp_extract(noscheme, "^([^/?]*)", 1)
    rest = F.regexp_extract(noscheme, "^[^/?]*(.*)$", 1)
    hp = F.regexp_replace(F.lower(hostport), ":(80|443)$", "")
    port = F.regexp_extract(hp, r"(:\d+)$", 1)
    host = F.regexp_replace(
        F.regexp_replace(hp, r":\d+$", ""), r"^www\d*\.", "")
    host_rev = F.concat(
        F.concat_ws(",", F.reverse(F.split(host, r"\."))), port)
    path = F.lower(F.regexp_extract(rest, "^([^?]*)", 1))
    qraw = F.regexp_extract(rest, r"^[^?]*\?(.*)$", 1)
    params = F.filter(
        F.split(qraw, "&"),
        lambda p: (p != "") & ~p.rlike(_SESSION_PARAM),
    )
    qsorted = F.array_join(F.array_sort(params), "&")
    return F.concat(
        host_rev, F.lit(")"),
        F.when(path == "", "/").otherwise(path),
        F.when(qsorted == "", "").otherwise(F.concat(F.lit("?"), qsorted)),
    )


def _h(doc_id: Column, salt: str) -> Column:
    return portable_hash60(
        F.concat(doc_id.cast("string"), F.lit(":" + salt))
    )


def _cdx_ts(doc_id: Column, salt: str) -> Column:
    """Deterministic 14-digit CDX timestamp (yyyyMMddHHmmss)."""
    h = _h(doc_id, salt)
    return F.concat(
        (F.lit(2014) + h % 10).cast("string"),
        F.lpad((F.lit(1) + h % 12).cast("string"), 2, "0"),
        F.lpad((F.lit(1) + h % 28).cast("string"), 2, "0"),
        F.lpad((h % 24).cast("string"), 2, "0"),
        F.lpad((h % 60).cast("string"), 2, "0"),
        F.lit("00"),
    )


def synth_captures(docs: DataFrame) -> DataFrame:
    """documents -> (url, ts, digest) captures, TWO url variants per
    document that canonicalize to the SAME surt."""
    doc_id = F.col("doc_id")
    messy = F.concat(
        F.lit("HTTP"),
        F.when(_h(doc_id, "tls") % 2 == 0, "S").otherwise(""),
        F.lit("://WWW."), F.upper(F.col("source")),
        F.lit(".Example.ORG"),
        F.when(_h(doc_id, "tls") % 2 == 0, ":443").otherwise(":80"),
        F.lit("/Docs/"), doc_id.cast("string"),
        F.lit("?utm_source=feed&b=2&a=1"),
        F.when(_h(doc_id, "frag") % 3 == 0, "#sec-2").otherwise(""),
    )
    clean = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.org/docs/"),
        doc_id.cast("string"), F.lit("?a=1&b=2"),
    )
    digest = F.md5(F.col("text"))
    pair = F.array(
        F.struct(messy.alias("url"), _cdx_ts(doc_id, "t0").alias("ts")),
        F.struct(clean.alias("url"), _cdx_ts(doc_id, "t1").alias("ts")),
    )
    return docs.select(
        digest.alias("digest"), F.explode(pair).alias("cap")
    ).select(F.col("cap.url").alias("url"), F.col("cap.ts").alias("ts"),
             "digest")


def cdx_index_frame(captures: DataFrame) -> DataFrame:
    """(url, ts, digest) captures -> sharded, ranked CDX entries."""
    keyed = captures.select(
        surt_key(F.col("url")).alias("surt"), "ts", "digest", "url",
    )
    entries = keyed.groupBy("surt", "digest").agg(
        F.count(F.lit(1)).alias("n_captures"),
        F.min("ts").alias("first_ts"),
        F.min("url").alias("sample_url"),
    ).withColumn(
        "shard", portable_hash60(F.col("surt")) % N_SHARDS
    )
    w = Window.partitionBy("shard").orderBy("surt", "digest")
    return entries.select(
        "surt", "digest", "n_captures", "first_ts", "shard",
        F.row_number().over(w).cast("bigint").alias("idx_in_shard"),
        "sample_url",
    )


def cdx_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return cdx_index_frame(synth_captures(docs))


def _sqlh(salt: str) -> str:
    return sql_hash60(f"doc_id || ':{salt}'")


def _cdx_ts_sql(salt: str) -> str:
    h = _sqlh(salt)
    return (
        f"((2014 + {h} % 10)::VARCHAR"
        f" || lpad((1 + {h} % 12)::VARCHAR, 2, '0')"
        f" || lpad((1 + {h} % 28)::VARCHAR, 2, '0')"
        f" || lpad(({h} % 24)::VARCHAR, 2, '0')"
        f" || lpad(({h} % 60)::VARCHAR, 2, '0') || '00')"
    )


# DuckDB twin of surt_key() over a column named u
_SURT_SQL = """
  (SELECT array_to_string(list_reverse(string_split(host, '.')), ',')
          || port || ')'
          || CASE WHEN path = '' THEN '/' ELSE path END
          || CASE WHEN qsorted = '' THEN '' ELSE '?' || qsorted END
   FROM (SELECT
           regexp_replace(
             regexp_replace(hp, ':\\d+$', ''),
             '^www\\d*\\.', '') AS host,
           regexp_extract(hp, '(:\\d+)$', 1) AS port,
           lower(regexp_extract(rest, '^([^?]*)', 1)) AS path,
           array_to_string(list_sort(list_filter(
             string_split(regexp_extract(rest, '^[^?]*\\?(.*)$', 1),
                          '&'),
             p -> p <> '' AND NOT regexp_matches(p,
                    '^(utm_[a-z]+|jsessionid|phpsessid|sid)='))),
             '&') AS qsorted
         FROM (SELECT noscheme,
                      regexp_replace(
                        lower(regexp_extract(noscheme,
                                             '^([^/?]*)', 1)),
                        ':(80|443)$', '') AS hp,
                      regexp_extract(noscheme, '^[^/?]*(.*)$', 1)
                        AS rest
               FROM (SELECT regexp_replace(
                              regexp_replace({u}, '#.*$', ''),
                              '^[a-zA-Z]+://', '') AS noscheme))))
"""


def cdx_sql() -> str:
    """CDX index build as a CTE chain ending in ``cdx`` — reused by the
    lookup dual in ``webcdxlookup.py`` (both sides must see ONE index)."""
    return f"""caps AS (
  SELECT u.url AS url, u.ts AS ts, md5(text) AS digest
  FROM documents,
       unnest([
         struct_pack(
           url := 'HTTP'
             || CASE WHEN {_sqlh("tls")} % 2 = 0 THEN 'S' ELSE '' END
             || '://WWW.' || upper(source) || '.Example.ORG'
             || CASE WHEN {_sqlh("tls")} % 2 = 0
                     THEN ':443' ELSE ':80' END
             || '/Docs/' || doc_id || '?utm_source=feed&b=2&a=1'
             || CASE WHEN {_sqlh("frag")} % 3 = 0
                     THEN '#sec-2' ELSE '' END,
           ts := {_cdx_ts_sql("t0")}),
         struct_pack(
           url := 'https://' || source || '.example.org/docs/'
             || doc_id || '?a=1&b=2',
           ts := {_cdx_ts_sql("t1")})
       ]) AS t(u)
),
keyed AS (
  SELECT {_SURT_SQL.format(u="url")} AS surt, ts, digest, url
  FROM caps
),
entries AS (
  SELECT surt, digest,
         count(*)::BIGINT AS n_captures,
         min(ts) AS first_ts,
         min(url) AS sample_url,
         ({sql_hash60("surt")} % {N_SHARDS})::BIGINT AS shard
  FROM keyed
  GROUP BY surt, digest
),
cdx AS (
  SELECT surt, digest, n_captures, first_ts, shard,
         row_number() OVER (PARTITION BY shard
                            ORDER BY surt, digest)::BIGINT
           AS idx_in_shard,
         sample_url
  FROM entries
)"""


CDX_INDEX_SQL = "WITH " + cdx_sql() + "\nSELECT * FROM cdx"


QUERIES: dict[str, tuple] = {
    "web_cdx_index": (cdx_index, CDX_INDEX_SQL),
}
