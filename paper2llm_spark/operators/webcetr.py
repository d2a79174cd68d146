"""CETR — Content Extraction via Tag Ratios (Weninger, Hsu & Han,
SIGIR 2010), the second published main-content extractor in the engine
(jusText block classification lives in ``webboiler.py``).  CETR is
line-based where jusText is block-based: the north_rule's
"HTML boilerplate strip / DOM heuristics" stage gets two independent
published heuristics, and ``web_extract_agreement`` (webvote.py) audits
where they disagree.

Algorithm (frozen, deterministic; a documented simplification of the
paper's CETR-KM clustering):

1. drop ``<script>`` blocks wholesale (the paper's preprocessing);
2. split the page into PHYSICAL LINES (``\\n``), drop
   whitespace-only lines;
3. per line: ``tags`` = number of ``<`` characters, ``chars`` =
   tag-stripped whitespace-collapsed text length;
4. tag ratio in exact integer micro-units (the paper's
   ``TR(i) = chars/max(1, tags)``)::

       tr_micro = (1_000_000 * chars) div greatest(1, tags)

5. smoothing: moving SUM over the +-1 line window (the paper uses a
   Gaussian kernel; a radius-1 box filter is the frozen variant) with
   the window row count carried alongside, so the smoothed ratio stays
   a rational with exact integer parts;
6. decision (replaces the paper's k-means step with a closed-form
   threshold): a line is content iff its window-average tag ratio is
   at least the page-average tag ratio, compared as the exact cross
   product ``smooth_sum * n_lines >= smooth_cnt * page_sum``.

Plan shape (the scale story): page synthesis, line split and per-line
features are all codegen expressions in the scan task; the ONLY
exchange is the single hashpartitioning on ``url`` shared by the
row_number, the +-1 rows window and the whole-page window
(plan-asserted).  No joins, no Python — at 10^12 pages this is one
shuffle of short line rows.

The driver corpus has no html column, so the registered query
synthesizes line-structured pages in-engine (the ``webboiler``
technique): nav / heading / sidebar / footer lines are tag-dense
(boilerplate), two long bare-text and ``<p>`` content lines are
text-dense, a hash-rolled short connective line between content lines
exercises the smoothing promotion, and hash-rolled presence of an
ad-line varies the layout per document.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, sql_hash60, tokens

MICRO = 1_000_000

_NAV_LINE = (
    '<div class="nav"><a href="/">Home</a> <a href="/about">About</a> '
    '<a href="/contact">Contact</a></div>'
)
_SIDEBAR_LINE = (
    '<div class="sidebar"><a href="/r1">related</a> <a href="/r2">more'
    "</a> <a href=\"/r3\">links</a></div>"
)
_AD_LINE = '<div class="ad"><a href="/buy">buy</a><b>now</b><i>!</i></div>'
_FOOTER_LINE = "<div>copyright 2024 example corp</div>"
# stopword-rich wrap (4 of 5 words are jusText stopwords) so the
# content lines rate `good` under jusText too — webvote.py runs BOTH
# extractors on this page set and a stopword-poor synth would make the
# jusText arm vacuously empty
_PARA_UNIT = ("with the ", " of them")


def _h(doc_id: Column, salt: str) -> Column:
    return portable_hash60(
        F.concat(doc_id.cast("string"), F.lit(":" + salt))
    )


def synth_cetr_pages(docs: DataFrame) -> DataFrame:
    """documents -> (url, html:binary) pages whose lines exercise every
    CETR class; byte-identical in the DuckDB dual (``_PAGES_SQL``)."""
    doc_id = F.col("doc_id")
    staged = docs.select(
        "doc_id", "source", tokens(F.col("text")).alias("tok")
    ).select(
        "doc_id", "source",
        F.concat(F.col("tok"), F.col("tok"), F.col("tok")).alias("rep"),
    )

    def span(start: int, n: int) -> Column:
        return F.array_join(F.slice(F.col("rep"), start, n), " ")

    def para(start: int, n: int) -> Column:
        return F.array_join(
            F.transform(
                F.slice(F.col("rep"), start, n),
                lambda t: F.concat(
                    F.lit(_PARA_UNIT[0]), t, F.lit(_PARA_UNIT[1])
                ),
            ),
            " ",
        )

    lines = [
        F.lit("<html>"),
        F.concat(F.lit("<head><title>Doc "), doc_id.cast("string"),
                 F.lit("</title><script>var x=1;</script></head>")),
        F.lit("<body>"),
        F.lit(_NAV_LINE),
        F.concat(F.lit("<h1>Document "), doc_id.cast("string"),
                 F.lit("</h1>")),
        F.concat(F.lit("<p>"), para(1, 14), F.lit("</p>")),
        F.when(_h(doc_id, "mid") % 3 != 0,
               F.concat(F.lit("and then with more of "), span(15, 3)))
        .otherwise(F.lit("")),
        F.concat(F.lit("<p>"), para(18, 14), F.lit("</p>")),
        F.when(_h(doc_id, "ad") % 2 == 0, F.lit(_AD_LINE))
        .otherwise(F.lit("")),
        F.lit(_SIDEBAR_LINE),
        F.lit(_FOOTER_LINE),
        F.lit("</body></html>"),
    ]
    page = F.concat_ws("\n", *lines)
    return staged.select(
        F.concat(F.lit("https://"), F.col("source"), F.lit(".test/"),
                 doc_id.cast("string")).alias("url"),
        F.encode(page, "UTF-8").alias("html"),
    )


def cetr_lines_frame(pages: DataFrame) -> DataFrame:
    """(url, html:binary) -> one row per non-blank physical line with
    tag-ratio features and the smoothed content decision."""
    noscript = F.regexp_replace(
        F.decode(F.col("html"), "UTF-8"),
        r"(?is)<script\b.*?</script\s*>", "")
    lines = pages.select(
        "url", F.posexplode(F.split(noscript, "\n")).alias("pos", "ln"),
    ).filter(F.trim(F.col("ln")) != "")
    ltext = F.trim(F.regexp_replace(
        F.regexp_replace(F.col("ln"), "<[^>]+>", " "), r"\s+", " "))
    feats = lines.select(
        "url", "pos", ltext.alias("line_text"),
        (F.length("ln")
         - F.length(F.replace(F.col("ln"), F.lit("<"), F.lit(""))))
        .cast("bigint").alias("tags"),
    ).withColumn(
        "chars", F.length("line_text").cast("bigint")
    ).withColumn(
        "tr_micro",
        F.expr(f"({MICRO} * chars) div greatest(1, tags)"),
    )
    worder = Window.partitionBy("url").orderBy("pos")
    wpage = Window.partitionBy("url")
    smooth = feats.select(
        "url",
        F.row_number().over(worder).cast("bigint").alias("line_idx"),
        "chars", "tags", "tr_micro", "line_text",
        F.sum("tr_micro").over(worder.rowsBetween(-1, 1))
        .alias("smooth_sum"),
        F.count("tr_micro").over(worder.rowsBetween(-1, 1))
        .alias("smooth_cnt"),
        F.sum("tr_micro").over(wpage).alias("page_sum"),
        F.count("tr_micro").over(wpage).alias("n_lines"),
    )
    return smooth.select(
        "url", "line_idx", "chars", "tags", "tr_micro",
        F.expr("smooth_sum div smooth_cnt").alias("smooth_micro"),
        (F.col("smooth_sum") * F.col("n_lines")
         >= F.col("smooth_cnt") * F.col("page_sum"))
        .cast("int").alias("is_content"),
        "line_text",
    )


def cetr_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return cetr_lines_frame(synth_cetr_pages(docs))


_TOK = "list_filter(string_split_regex(lower({e}), '\\s+'), t -> length(t) > 0)"


def _sqlh(salt: str) -> str:
    return sql_hash60(f"doc_id || ':{salt}'")


def _span_sql(start: int, n: int) -> str:
    # coalesce: DuckDB array_to_string([]) is NULL (Spark array_join
    # gives ''), and a NULL line would be SKIPPED by concat_ws
    return (f"coalesce(array_to_string(rep[{start}:{start + n - 1}],"
            f" ' '), '')")


def _para_sql(start: int, n: int) -> str:
    return (
        f"coalesce(array_to_string(list_transform("
        f"rep[{start}:{start + n - 1}], "
        f"t -> '{_PARA_UNIT[0]}' || t || '{_PARA_UNIT[1]}'), ' '), '')"
    )


# the synthesized page, line for line = synth_cetr_pages; used by the
# dual here AND by webvote.py (both extractors must see ONE page set)
PAGES_SQL = f"""
  SELECT 'https://' || source || '.test/' || doc_id AS url,
    concat_ws(chr(10),
      '<html>',
      '<head><title>Doc ' || doc_id
        || '</title><script>var x=1;</script></head>',
      '<body>',
      '{_NAV_LINE.replace("'", "''")}',
      '<h1>Document ' || doc_id || '</h1>',
      '<p>' || {_para_sql(1, 14)} || '</p>',
      CASE WHEN {_sqlh("mid")} % 3 <> 0
           THEN 'and then with more of ' || {_span_sql(15, 3)}
           ELSE '' END,
      '<p>' || {_para_sql(18, 14)} || '</p>',
      CASE WHEN {_sqlh("ad")} % 2 = 0
           THEN '{_AD_LINE.replace("'", "''")}' ELSE '' END,
      '{_SIDEBAR_LINE.replace("'", "''")}',
      '{_FOOTER_LINE}',
      '</body></html>') AS page
  FROM (SELECT doc_id, source, tok || tok || tok AS rep
        FROM (SELECT doc_id, source, {_TOK.format(e="text")} AS tok
              FROM documents))
"""


def cetr_sql(pages_cte: str) -> str:
    """CETR classification over any (url, page) CTE — reused by the
    extractor-agreement dual in webvote.py."""
    return f"""
li AS (
  SELECT url,
         unnest(range(1, len(ls) + 1)) AS pos,
         unnest(ls) AS ln
  FROM (
    SELECT url,
           string_split(
             regexp_replace(page, '(?is)<script\\b.*?</script\\s*>',
                            '', 'g'),
             chr(10)) AS ls
    FROM {pages_cte})
),
lf AS (
  SELECT url, pos,
         trim(regexp_replace(regexp_replace(ln, '<[^>]+>', ' ', 'g'),
                             '\\s+', ' ', 'g')) AS line_text,
         (length(ln) - length(replace(ln, '<', '')))::BIGINT AS tags
  FROM li
  WHERE trim(ln) <> ''
),
lr AS (
  SELECT url, pos, line_text, tags,
         length(line_text)::BIGINT AS chars,
         ({MICRO} * length(line_text)::BIGINT)
           // greatest(1, tags) AS tr_micro
  FROM lf
),
sm AS (
  SELECT url,
         row_number() OVER (PARTITION BY url ORDER BY pos)::BIGINT
           AS line_idx,
         chars, tags, tr_micro, line_text,
         sum(tr_micro) OVER (PARTITION BY url ORDER BY pos
             ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS smooth_sum,
         count(tr_micro) OVER (PARTITION BY url ORDER BY pos
             ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS smooth_cnt,
         sum(tr_micro) OVER (PARTITION BY url) AS page_sum,
         count(tr_micro) OVER (PARTITION BY url) AS n_lines
  FROM lr
),
cetr AS (
  SELECT url, line_idx, chars, tags, tr_micro,
         (smooth_sum // smooth_cnt)::BIGINT AS smooth_micro,
         (smooth_sum * n_lines >= smooth_cnt * page_sum)::INT
           AS is_content,
         line_text
  FROM sm
)"""


CETR_LINES_SQL = f"""
WITH pages AS ({PAGES_SQL}),
{cetr_sql("pages")}
SELECT * FROM cetr
"""


QUERIES: dict[str, tuple] = {
    "web_cetr_lines": (cetr_lines, CETR_LINES_SQL),
}
