"""Arc90 Readability block scoring — the THIRD main-content extractor
family in the engine (jusText blocks in ``webboiler.py``, CETR lines in
``webcetr.py``).  This is the class/id-prior + comma/length + link
density heuristic behind readability.js / Firefox Reader Mode and
python-readability, i.e. the "DOM heuristics" arm the north_rule
names.

Algorithm (frozen, deterministic; the scoring core of Arc90's
readability.js ``grabArticle``):

1. candidate elements = non-nested ``<div>``/``<p>`` elements
   (``regexp_extract_all`` of the full element, match index 0);
2. per element: ``attrs`` (the opening-tag attribute string),
   tag-stripped whitespace-collapsed ``btext``, ``chars``,
   ``link_chars`` (anchor-text length), ``commas``;
3. class/id prior (readability.js regexes, frozen subset)::

       +25  attrs ~ (?i)article|content|entry|main|post|body|text
       -25  attrs ~ (?i)comment|sidebar|footer|nav|banner|promo|\\bad\\b

4. content points: ``+1`` (the element itself), ``+1`` per comma,
   ``+min(3, chars div 100)`` — all exact integers;
5. link-density penalty, exact: the score is scaled by
   ``(1 - link_density)`` as the nonnegative integer fraction
   ``ld_comp_micro = greatest(0, chars - link_chars) * 1e6
   div greatest(1, chars)`` (clamped nonneg so Spark ``div``
   truncation and DuckDB ``//`` flooring can never disagree — they
   differ on negatives), then ``score_micro = base * ld_comp_micro``
   (int x nonneg-int product, exact in both engines);
6. the page's top candidate (readability.js picks the best-scoring
   ancestor) = ``row_number`` over (score_micro desc, block_idx asc).

Plan shape (the scale story): synthesis, element extraction and all
features/scores are codegen expressions in the scan task; the ONLY
exchange is the single hashpartitioning on ``url`` for the top-block
window (plan-asserted).  Zero joins, zero Python.

The driver corpus has no html column, so the registered query
synthesizes attribute-bearing pages in-engine: a nav div (negative
prior + link density), a main ``<div class="article-content">`` with
planted commas (positive prior), a neutral ``<p>`` (no prior),
hash-rolled comment / sidebar divs (negative prior), a footer — both
prior polarities, the comma and length point arms, and the link
penalty all exercised; presence rolls vary the layout per document.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, sql_hash60, tokens

MICRO = 1_000_000

POSITIVE_RE = r"(?i)article|content|entry|main|post|body|text"
NEGATIVE_RE = r"(?i)comment|sidebar|footer|nav|banner|promo|\bad\b"

_ELEM = r"(?is)<(?:div|p)\b[^>]*>.*?</(?:div|p)\s*>"
_ATTRS = r"(?is)^<(?:div|p)\b([^>]*)>"
_ANCHOR_TEXT = r"(?is)<a\b[^>]*>(.*?)</a\s*>"

_NAV = (
    '<div class="nav menu"><a href="/">Home</a> <a href="/blog">Blog'
    '</a> <a href="/contact">Contact us today</a></div>'
)
_SIDEBAR = (
    '<div class="sidebar widget"><a href="/r1">related</a> '
    '<a href="/r2">reading</a> list</div>'
)
_FOOTER = '<div class="footer">copyright 2024 example corp</div>'


def _h(doc_id: Column, salt: str) -> Column:
    return portable_hash60(
        F.concat(doc_id.cast("string"), F.lit(":" + salt))
    )


def synth_arc90_pages(docs: DataFrame) -> DataFrame:
    """documents -> (url, html:binary) pages with class/id-attributed
    non-nested blocks; byte-identical in the DuckDB dual."""
    doc_id = F.col("doc_id")
    staged = docs.select(
        "doc_id", "source", tokens(F.col("text")).alias("tok")
    ).select(
        "doc_id", "source",
        F.concat(F.col("tok"), F.col("tok"), F.col("tok")).alias("rep"),
    )

    def span(start: int, n: int) -> Column:
        return F.array_join(F.slice(F.col("rep"), start, n), " ")

    main = F.concat(
        F.lit('<div class="article-content" id="main">notes for item '),
        doc_id.cast("string"), F.lit(", that is, "), span(1, 16),
        F.lit(", and also, "), span(17, 12), F.lit("</div>"),
    )
    neutral = F.concat(F.lit("<p>"), span(29, 9), F.lit("</p>"))
    comment = F.concat(
        F.lit('<div id="comments">a short remark on '),
        doc_id.cast("string"), F.lit("</div>"),
    )
    page = F.concat(
        F.lit("<html><body>"),
        F.lit(_NAV),
        F.lit("<h1>Document "), doc_id.cast("string"), F.lit("</h1>"),
        main,
        F.when(_h(doc_id, "np") % 3 != 0, neutral).otherwise(F.lit("")),
        F.when(_h(doc_id, "cm") % 2 == 0, comment).otherwise(F.lit("")),
        F.lit(_SIDEBAR),
        F.lit(_FOOTER),
        F.lit("</body></html>"),
    )
    return staged.select(
        F.concat(F.lit("https://"), F.col("source"), F.lit(".test/"),
                 doc_id.cast("string")).alias("url"),
        F.encode(page, "UTF-8").alias("html"),
    )


def arc90_blocks_frame(pages: DataFrame) -> DataFrame:
    """(url, html:binary) -> one row per candidate element with the
    Arc90 score decomposition and the per-page top-candidate flag."""
    elems = pages.select(
        "url",
        F.posexplode(
            F.regexp_extract_all(
                F.decode(F.col("html"), "UTF-8"), F.lit(_ELEM), F.lit(0)
            )
        ).alias("pos", "elem"),
    )
    btext = F.trim(F.regexp_replace(
        F.regexp_replace(F.col("elem"), "<[^>]+>", " "), r"\s+", " "))
    feats = elems.select(
        "url", "pos",
        F.regexp_extract(F.col("elem"), _ATTRS, 1).alias("attrs"),
        btext.alias("btext"),
        F.aggregate(
            F.regexp_extract_all(
                F.col("elem"), F.lit(_ANCHOR_TEXT), F.lit(1)),
            F.lit(0).cast("bigint"),
            lambda acc, s: acc + F.length(s),
        ).alias("link_chars"),
    ).select(
        "url", "pos", "attrs", "btext", "link_chars",
        F.length("btext").cast("bigint").alias("chars"),
        (F.length("btext")
         - F.length(F.replace(F.col("btext"), F.lit(","), F.lit(""))))
        .cast("bigint").alias("commas"),
    )
    prior = (
        F.when(F.col("attrs").rlike(POSITIVE_RE), F.lit(25))
        .when(F.col("attrs").rlike(NEGATIVE_RE), F.lit(-25))
        .otherwise(F.lit(0)).cast("bigint")
    )
    scored = feats.select(
        "url", "pos", "attrs", "btext", "link_chars", "chars", "commas",
        prior.alias("prior"),
    ).withColumn(
        "base_score",
        F.col("prior") + F.lit(1) + F.col("commas")
        + F.expr("least(3, chars div 100)"),
    ).withColumn(
        "ld_comp_micro",
        F.expr(f"greatest(0, chars - link_chars) * {MICRO}"
               " div greatest(1, chars)"),
    ).withColumn(
        "score_micro", F.col("base_score") * F.col("ld_comp_micro"),
    )
    w = Window.partitionBy("url").orderBy("pos")
    wtop = Window.partitionBy("url").orderBy(
        F.col("score_micro").desc(), F.col("pos").asc())
    return scored.select(
        "url",
        F.row_number().over(w).cast("bigint").alias("block_idx"),
        "attrs", "chars", "link_chars", "commas", "prior",
        "base_score", "score_micro",
        (F.row_number().over(wtop) == 1).cast("int").alias("is_top"),
        "btext",
    )


def readability_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return arc90_blocks_frame(synth_arc90_pages(docs))


_TOK = "list_filter(string_split_regex(lower({e}), '\\s+'), t -> length(t) > 0)"


def _sqlh(salt: str) -> str:
    return sql_hash60(f"doc_id || ':{salt}'")


def _span_sql(start: int, n: int) -> str:
    # coalesce: DuckDB array_to_string([]) is NULL, Spark array_join ''
    return (f"coalesce(array_to_string(rep[{start}:{start + n - 1}],"
            f" ' '), '')")


ARC90_BLOCKS_SQL = f"""
WITH r AS (
  SELECT doc_id, source, tok || tok || tok AS rep
  FROM (SELECT doc_id, source, {_TOK.format(e="text")} AS tok
        FROM documents)
),
pages AS (
  SELECT 'https://' || source || '.test/' || doc_id AS url,
    '<html><body>'
    || '{_NAV.replace("'", "''")}'
    || '<h1>Document ' || doc_id || '</h1>'
    || '<div class="article-content" id="main">notes for item '
      || doc_id || ', that is, ' || {_span_sql(1, 16)}
      || ', and also, ' || {_span_sql(17, 12)} || '</div>'
    || CASE WHEN {_sqlh("np")} % 3 <> 0
            THEN '<p>' || {_span_sql(29, 9)} || '</p>' ELSE '' END
    || CASE WHEN {_sqlh("cm")} % 2 = 0
            THEN '<div id="comments">a short remark on ' || doc_id
                 || '</div>'
            ELSE '' END
    || '{_SIDEBAR.replace("'", "''")}'
    || '{_FOOTER}'
    || '</body></html>' AS page
  FROM r
),
e AS (
  SELECT url,
         unnest(range(1, len(es) + 1)) AS pos,
         unnest(es) AS elem
  FROM (
    SELECT url,
           regexp_extract_all(
             page, '(?is)<(?:div|p)\\b[^>]*>.*?</(?:div|p)\\s*>', 0)
             AS es
    FROM pages)
),
f AS (
  SELECT url, pos,
         regexp_extract(elem, '(?is)^<(?:div|p)\\b([^>]*)>', 1)
           AS attrs,
         trim(regexp_replace(regexp_replace(elem, '<[^>]+>', ' ', 'g'),
                             '\\s+', ' ', 'g')) AS btext,
         coalesce(list_sum(list_transform(
             regexp_extract_all(elem, '(?is)<a\\b[^>]*>(.*?)</a\\s*>', 1),
             s -> length(s))), 0)::BIGINT AS link_chars
  FROM e
),
g AS (
  SELECT url, pos, attrs, btext, link_chars,
         length(btext)::BIGINT AS chars,
         (length(btext) - length(replace(btext, ',', '')))::BIGINT
           AS commas,
         CASE WHEN regexp_matches(attrs, '{POSITIVE_RE}') THEN 25
              WHEN regexp_matches(attrs, '{NEGATIVE_RE}') THEN -25
              ELSE 0 END::BIGINT AS prior
  FROM f
),
s AS (
  SELECT *,
         (prior + 1 + commas + least(3, chars // 100))::BIGINT
           AS base_score,
         (greatest(0, chars - link_chars) * {MICRO}
          // greatest(1, chars))::BIGINT AS ld_comp_micro
  FROM g
)
SELECT url,
       row_number() OVER (PARTITION BY url ORDER BY pos)::BIGINT
         AS block_idx,
       attrs, chars, link_chars, commas, prior, base_score,
       (base_score * ld_comp_micro)::BIGINT AS score_micro,
       (row_number() OVER (PARTITION BY url
           ORDER BY base_score * ld_comp_micro DESC, pos ASC) = 1)::INT
         AS is_top,
       btext
FROM s
"""


QUERIES: dict[str, tuple] = {
    "web_readability_extract": (readability_extract, ARC90_BLOCKS_SQL),
}
