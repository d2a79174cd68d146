"""URL feature battery — lexical URL features for spam/quality
filtering.  Learned crawl policies and spam classifiers (Ntoulas et
al. 2006 "Detecting spam web pages through content analysis";
Ma et al. 2009 "Beyond blacklists: learning to detect malicious web
sites from suspicious URLs") score a URL BEFORE fetching it: host
digit density, IP-literal hosts, explicit ports, deep paths, long
query strings, and session-id parameters are all cheap, strong
signals.  This operator extracts the standard battery from the raw
URL string — no fetch, no DOM.

Semantics (frozen, everything parsed from the final URL text):

* ``host``        — authority up to the first ``:``, ``/`` or ``?``;
* ``is_ip_host``  — host is a dotted-quad literal;
* ``has_port``    — explicit ``:port`` after the host;
* ``path_depth``  — number of ``/``-separated segments in the path
  (0 when no path);
* ``n_params``    — ``&``-separated parameters in the query
  (0 when no ``?``);
* ``digit_milli`` — 1000 * digit count div host length (exact
  integer);
* ``n_hyphens``   — hyphens in the host;
* ``has_session`` — a ``(php)?sessid|sessionid|sid`` parameter;
* ``url_len``     — total URL length;
* ``spam_micro``  — a fixed integer-weighted combination of the
  above (the battery as one score; weights are the operator's
  contract, not learned here).

The driver corpus has no URL column, so the registered query plants
the full variety in-engine (IP hosts, ports, hyphenated subdomains,
1-4 segment paths, session params), identically in the dual.

Plan shape (the scale story): ONE codegen projection — every feature
is a regexp/length expression riding the scan task; zero joins, zero
exchanges, zero Python.  At 10^12 URLs this is the cheapest operator
in the repo, which is the point: it gates the expensive ones.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, sql_hash60

_HOST_RE = r"^https?://([^/:?]+)"
_PORT_RE = r"^https?://[^/:?]+:[0-9]+"
_PATH_RE = r"^https?://[^/?]+(/[^?]*)"
_QUERY_RE = r"\?(.*)$"
_SESSION_RE = r"(?i)[?&](phpsessid|sessionid|sid)="


def _h(doc_id: Column, salt: str) -> Column:
    return portable_hash60(
        F.concat(doc_id.cast("string"), F.lit(":" + salt))
    )


def synth_messy_urls(docs: DataFrame) -> DataFrame:
    doc_id = F.col("doc_id")
    host = F.when(
        _h(doc_id, "ip") % 13 == 0,
        F.concat(F.lit("10.0."), (doc_id % 256).cast("string"),
                 F.lit("."), (doc_id % 100).cast("string")),
    ).otherwise(
        F.concat(F.lower(F.col("source")), F.lit("-"),
                 (doc_id % 10).cast("string"), F.lit(".example"),
                 (doc_id % 7).cast("string"), F.lit(".com")),
    )
    port = F.when(_h(doc_id, "port") % 7 == 0, F.lit(":8080")) \
        .otherwise(F.lit(""))
    path = F.concat_ws(
        "",
        F.transform(
            F.sequence(F.lit(1), (doc_id % 4) + 1),
            lambda i: F.concat(F.lit("/seg"), i.cast("string")),
        ),
    )
    query = F.when(
        _h(doc_id, "q") % 3 == 0,
        F.concat(
            F.lit("?id="), doc_id.cast("string"),
            F.when(_h(doc_id, "sess") % 5 == 0,
                   F.concat(F.lit("&PHPSESSID=x"),
                            (_h(doc_id, "sv") % 100000).cast("string")))
            .otherwise(F.lit("")),
        ),
    ).otherwise(F.lit(""))
    return docs.select(
        "doc_id",
        F.concat(F.lit("http://"), host, port, path, query).alias("url"),
    )


def url_features_frame(urls: DataFrame) -> DataFrame:
    """doc_id, url -> the lexical feature battery + integer spam score."""
    host = F.regexp_extract("url", _HOST_RE, 1)
    path = F.regexp_extract("url", _PATH_RE, 1)
    query = F.regexp_extract("url", _QUERY_RE, 1)
    feats = urls.select(
        "doc_id", "url",
        host.alias("host"),
        host.rlike(r"^[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+$").alias("is_ip_host"),
        F.col("url").rlike(_PORT_RE).alias("has_port"),
        F.when(path == "", F.lit(0))
        .otherwise(F.size(F.split(path, "/", -1)) - 1)
        .cast("long").alias("path_depth"),
        F.when(query == "", F.lit(0))
        .otherwise(F.size(F.split(query, "&", -1)))
        .cast("long").alias("n_params"),
        F.expr(
            "cast(1000 * length(regexp_replace("
            f"regexp_extract(url, '{_HOST_RE}', 1), '[^0-9]', '')) "
            f"div length(regexp_extract(url, '{_HOST_RE}', 1)) as bigint)"
        ).alias("digit_milli"),
        (F.length(host) - F.length(F.regexp_replace(host, "-", "")))
        .cast("long").alias("n_hyphens"),
        F.col("url").rlike(_SESSION_RE).alias("has_session"),
        F.length("url").cast("long").alias("url_len"),
    )
    spam = (
        F.when(F.col("is_ip_host"), F.lit(300000)).otherwise(F.lit(0))
        + F.when(F.col("has_session"), F.lit(250000)).otherwise(F.lit(0))
        + F.when(F.col("has_port"), F.lit(100000)).otherwise(F.lit(0))
        + F.col("digit_milli") * 100
        + F.col("n_hyphens") * 20000
        + F.when(F.col("path_depth") >= 4, F.lit(50000)).otherwise(F.lit(0))
    )
    return feats.withColumn("spam_micro", spam.cast("long"))


def url_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return url_features_frame(synth_messy_urls(docs))


_IP = sql_hash60("doc_id || ':ip'")
_PORT = sql_hash60("doc_id || ':port'")
_Q = sql_hash60("doc_id || ':q'")
_SESS = sql_hash60("doc_id || ':sess'")
_SV = sql_hash60("doc_id || ':sv'")

URL_FEATURES_SQL = f"""
WITH urls AS (
  SELECT doc_id,
    'http://'
    || CASE WHEN {_IP} % 13 = 0
            THEN '10.0.' || (doc_id % 256) || '.' || (doc_id % 100)
            ELSE lower(source) || '-' || (doc_id % 10) || '.example'
                 || (doc_id % 7) || '.com' END
    || CASE WHEN {_PORT} % 7 = 0 THEN ':8080' ELSE '' END
    || array_to_string(list_transform(range(1, (doc_id % 4) + 2),
                                      i -> '/seg' || i), '')
    || CASE WHEN {_Q} % 3 = 0
            THEN '?id=' || doc_id
                 || CASE WHEN {_SESS} % 5 = 0
                         THEN '&PHPSESSID=x' || ({_SV} % 100000)
                         ELSE '' END
            ELSE '' END AS url
  FROM documents
),
parts AS (
  SELECT doc_id, url,
         regexp_extract(url, '^https?://([^/:?]+)', 1) AS host,
         regexp_extract(url, '^https?://[^/?]+(/[^?]*)', 1) AS path,
         regexp_extract(url, '\\?(.*)$', 1) AS query
  FROM urls
)
SELECT doc_id, url, host,
       regexp_matches(host, '^[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+$')
         AS is_ip_host,
       regexp_matches(url, '^https?://[^/:?]+:[0-9]+') AS has_port,
       (CASE WHEN path = '' THEN 0
             ELSE len(string_split(path, '/')) - 1 END)::BIGINT
         AS path_depth,
       (CASE WHEN query = '' THEN 0
             ELSE len(string_split(query, '&')) END)::BIGINT AS n_params,
       (1000 * length(regexp_replace(host, '[^0-9]', '', 'g'))
        // length(host))::BIGINT AS digit_milli,
       (length(host) - length(replace(host, '-', '')))::BIGINT
         AS n_hyphens,
       regexp_matches(url, '(?i)[?&](phpsessid|sessionid|sid)=')
         AS has_session,
       length(url)::BIGINT AS url_len,
       (CASE WHEN regexp_matches(host,
               '^[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+$')
             THEN 300000 ELSE 0 END
        + CASE WHEN regexp_matches(url,
                 '(?i)[?&](phpsessid|sessionid|sid)=')
               THEN 250000 ELSE 0 END
        + CASE WHEN regexp_matches(url, '^https?://[^/:?]+:[0-9]+')
               THEN 100000 ELSE 0 END
        + (1000 * length(regexp_replace(host, '[^0-9]', '', 'g'))
           // length(host)) * 100
        + (length(host) - length(replace(host, '-', ''))) * 20000
        + CASE WHEN (CASE WHEN path = '' THEN 0
                          ELSE len(string_split(path, '/')) - 1 END) >= 4
               THEN 50000 ELSE 0 END)::BIGINT AS spam_micro
FROM parts
"""


QUERIES: dict[str, tuple] = {
    "web_url_features": (url_features, URL_FEATURES_SQL),
}
