"""Publication-date extraction — the htmldate shape (Barbaresi 2020,
"htmldate: A Python package for extracting publication dates from web
pages"; the date step trafilatura runs during main-content
extraction).  Every page gets at most one date, picked by a frozen
source-precedence cascade with a plausibility filter:

1. ``<meta property="article:published_time" content="ISO...">``
   (the Open Graph / schema.org signal htmldate trusts most);
2. ``<time datetime="YYYY-MM-DD">`` element attribute;
3. URL path segment ``/YYYY/MM/`` (day unknown -> the first of the
   month, htmldate's partial-date convention);
4. first ``YYYY-MM-DD`` date literal in the page text;
5. otherwise no date (``date_src = 'none'``).

Plausibility: a candidate whose year falls outside [1995, 2030] is
REJECTED and the cascade falls through to the next source (htmldate's
min/max date filter) — the synthesized corpus plants a 1970 meta date
on some pages so the filter is exercised in both polarities.

Dates stay ``yyyy-MM-dd`` STRINGS end-to-end: pandas widens DuckDB
DATE values to midnight timestamps, which would hash-mismatch Spark
dates (the repo-wide convention).

Plan shape (the scale story): the whole operator is ONE codegen
projection in the scan task — regexp pulls, the validity CASE and the
precedence coalesce; ZERO exchanges, joins or Python (plan-asserted).
At 10^12 pages this costs exactly one pass over the bytes, the same
discipline as ``webmeta.py`` / ``webcharset.py``.

The driver corpus has no html column, so the registered query
synthesizes heads/bodies in-engine (the ``web_meta_extract``
technique): each candidate source carries a DIFFERENT
doc_id-derived date, presence is hash-rolled per source, and the URL
year/month ride the url itself — so the driver hash certifies the full
precedence matrix, not just one happy path.

Reference scope anchor: beyond-reference web-scale operator
(north_rule's extraction tier); the reference's own metadata surface
is title extraction, `src/core/utils/text-processing.ts`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, sql_hash60

YEAR_MIN, YEAR_MAX = "1995", "2030"

_META_RE = (
    r'(?is)<meta[^>]*property=["\x27]article:published_time["\x27]'
    r'[^>]*content=["\x27]([0-9]{4}-[0-9]{2}-[0-9]{2})'
)
_META_RE_REV = (
    r'(?is)<meta[^>]*content=["\x27]([0-9]{4}-[0-9]{2}-[0-9]{2})'
    r'[^>]*property=["\x27]article:published_time["\x27]'
)
_TIME_RE = r'(?is)<time[^>]*datetime=["\x27]([0-9]{4}-[0-9]{2}-[0-9]{2})'
_URL_RE = r"/((?:19|20)[0-9]{2})/(0[1-9]|1[0-2])/"
_TEXT_RE = (
    r"\b((?:19|20)[0-9]{2}-(?:0[1-9]|1[0-2])"
    r"-(?:0[1-9]|[12][0-9]|3[01]))\b"
)


def _h(doc_id: Column, salt: str) -> Column:
    return portable_hash60(
        F.concat(doc_id.cast("string"), F.lit(":" + salt))
    )


def _date_of(doc_id: Column, salt: str) -> Column:
    """Deterministic per-(doc, source) yyyy-MM-dd string."""
    h = _h(doc_id, salt)
    return F.concat(
        (F.lit(2000) + h % 25).cast("string"), F.lit("-"),
        F.lpad((F.lit(1) + h % 12).cast("string"), 2, "0"), F.lit("-"),
        F.lpad((F.lit(1) + h % 28).cast("string"), 2, "0"),
    )


def synth_date_pages(docs: DataFrame) -> DataFrame:
    """documents -> (url, html:binary) with hash-rolled date sources:
    meta (sometimes implausible year 1970), time element, /YYYY/MM/
    url segment, body text date — each carrying a DIFFERENT date."""
    doc_id = F.col("doc_id")
    meta_date = F.when(_h(doc_id, "m70") % 7 == 0, F.lit("1970-01-02")) \
        .otherwise(_date_of(doc_id, "meta"))
    url_col = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".test/"),
        F.when(
            _h(doc_id, "upath") % 5 < 2,
            F.concat(
                (F.lit(2000) + _h(doc_id, "uy") % 25).cast("string"),
                F.lit("/"),
                F.lpad((F.lit(1) + _h(doc_id, "um") % 12).cast("string"),
                       2, "0"),
                F.lit("/"),
            ),
        ).otherwise(F.lit("")),
        doc_id.cast("string"),
    )
    page = F.concat(
        F.lit("<html><head><title>Doc "), doc_id.cast("string"),
        F.lit("</title>"),
        F.when(
            _h(doc_id, "meta") % 2 == 0,
            F.concat(
                F.lit('<meta property="article:published_time" '
                      'content="'),
                meta_date, F.lit('T10:00:00Z">'),
            ),
        ).otherwise(F.lit("")),
        F.lit("</head><body><p>Doc "), doc_id.cast("string"),
        F.lit("</p>"),
        F.when(
            _h(doc_id, "time") % 3 != 0,
            F.concat(F.lit('<time datetime="'), _date_of(doc_id, "time"),
                     F.lit('">then</time>')),
        ).otherwise(F.lit("")),
        F.when(
            _h(doc_id, "text") % 11 != 0,
            F.concat(F.lit("<p>posted on "), _date_of(doc_id, "text"),
                     F.lit(" by the desk</p>")),
        ).otherwise(F.lit("")),
        F.lit("</body></html>"),
    )
    return docs.select(
        url_col.alias("url"), F.encode(page, "UTF-8").alias("html")
    )


def _valid(d: Column) -> Column:
    """Candidate -> itself iff non-empty and year plausible, else NULL."""
    y = F.substring(d, 1, 4)
    return F.when(
        (d != "") & (y >= YEAR_MIN) & (y <= YEAR_MAX), d
    )


def date_extract_frame(pages: DataFrame) -> DataFrame:
    """(url, html:binary) -> per-url date candidates, the precedence
    pick and its source tag."""
    html = F.decode(F.col("html"), "UTF-8")
    meta_raw = F.when(
        F.regexp_extract(html, _META_RE, 1) != "",
        F.regexp_extract(html, _META_RE, 1),
    ).otherwise(F.regexp_extract(html, _META_RE_REV, 1))
    url_y = F.regexp_extract(F.col("url"), _URL_RE, 1)
    url_raw = F.when(
        url_y != "",
        F.concat(url_y, F.lit("-"),
                 F.regexp_extract(F.col("url"), _URL_RE, 2),
                 F.lit("-01")),
    ).otherwise(F.lit(""))
    cands = pages.select(
        "url",
        _valid(meta_raw).alias("meta_date"),
        _valid(F.regexp_extract(html, _TIME_RE, 1)).alias("time_date"),
        _valid(url_raw).alias("url_date"),
        # the text fallback scans TAG-STRIPPED text, so attribute
        # values (meta content, time datetime) can never satisfy it
        _valid(
            F.regexp_extract(
                F.regexp_replace(html, "<[^>]+>", " "), _TEXT_RE, 1
            )
        ).alias("text_date"),
    )
    return cands.select(
        "url", "meta_date", "time_date", "url_date", "text_date",
        F.coalesce("meta_date", "time_date", "url_date", "text_date")
        .alias("pub_date"),
        F.when(F.col("meta_date").isNotNull(), "meta")
        .when(F.col("time_date").isNotNull(), "time")
        .when(F.col("url_date").isNotNull(), "url")
        .when(F.col("text_date").isNotNull(), "text")
        .otherwise("none").alias("date_src"),
    )


def date_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return date_extract_frame(synth_date_pages(docs))


def _sqlh(salt: str) -> str:
    return sql_hash60(f"doc_id || ':{salt}'")


def _date_sql(salt: str) -> str:
    h = _sqlh(salt)
    return (
        f"((2000 + {h} % 25)::VARCHAR || '-' "
        f"|| lpad((1 + {h} % 12)::VARCHAR, 2, '0') || '-' "
        f"|| lpad((1 + {h} % 28)::VARCHAR, 2, '0'))"
    )


def _valid_sql(expr: str) -> str:
    return (
        f"CASE WHEN {expr} <> '' AND substr({expr}, 1, 4) >= '{YEAR_MIN}'"
        f" AND substr({expr}, 1, 4) <= '{YEAR_MAX}' THEN {expr} END"
    )


_META_SQL = _META_RE.replace("\x27", "''")
_META_REV_SQL = _META_RE_REV.replace("\x27", "''")
_TIME_SQL = _TIME_RE.replace("\x27", "''")

DATE_EXTRACT_SQL = f"""
WITH pages AS (
  SELECT
    'https://' || source || '.test/'
      || CASE WHEN {_sqlh("upath")} % 5 < 2
              THEN (2000 + {_sqlh("uy")} % 25)::VARCHAR || '/'
                   || lpad((1 + {_sqlh("um")} % 12)::VARCHAR, 2, '0')
                   || '/'
              ELSE '' END
      || doc_id AS url,
    '<html><head><title>Doc ' || doc_id || '</title>'
    || CASE WHEN {_sqlh("meta")} % 2 = 0
            THEN '<meta property="article:published_time" content="'
                 || CASE WHEN {_sqlh("m70")} % 7 = 0 THEN '1970-01-02'
                         ELSE {_date_sql("meta")} END
                 || 'T10:00:00Z">'
            ELSE '' END
    || '</head><body><p>Doc ' || doc_id || '</p>'
    || CASE WHEN {_sqlh("time")} % 3 <> 0
            THEN '<time datetime="' || {_date_sql("time")}
                 || '">then</time>'
            ELSE '' END
    || CASE WHEN {_sqlh("text")} % 11 <> 0
            THEN '<p>posted on ' || {_date_sql("text")}
                 || ' by the desk</p>'
            ELSE '' END
    || '</body></html>' AS page
  FROM documents
),
raw AS (
  SELECT url,
         CASE WHEN regexp_extract(page, '{_META_SQL}', 1) <> ''
              THEN regexp_extract(page, '{_META_SQL}', 1)
              ELSE regexp_extract(page, '{_META_REV_SQL}', 1) END
           AS meta_raw,
         regexp_extract(page, '{_TIME_SQL}', 1) AS time_raw,
         regexp_extract(url, '{_URL_RE}', 1) AS url_y,
         regexp_extract(url, '{_URL_RE}', 2) AS url_m,
         regexp_extract(regexp_replace(page, '<[^>]+>', ' ', 'g'),
                        '{_TEXT_RE}', 1) AS text_raw
  FROM pages
),
cands AS (
  SELECT url,
         {_valid_sql("meta_raw")} AS meta_date,
         {_valid_sql("time_raw")} AS time_date,
         {_valid_sql("CASE WHEN url_y <> '' THEN url_y || '-' || url_m || '-01' ELSE '' END")}
           AS url_date,
         {_valid_sql("text_raw")} AS text_date
  FROM raw
)
SELECT url, meta_date, time_date, url_date, text_date,
       coalesce(meta_date, time_date, url_date, text_date) AS pub_date,
       CASE WHEN meta_date IS NOT NULL THEN 'meta'
            WHEN time_date IS NOT NULL THEN 'time'
            WHEN url_date IS NOT NULL THEN 'url'
            WHEN text_date IS NOT NULL THEN 'text'
            ELSE 'none' END AS date_src
FROM cands
"""


QUERIES: dict[str, tuple] = {
    "web_date_extract": (date_extract, DATE_EXTRACT_SQL),
}
