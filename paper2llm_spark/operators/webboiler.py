"""Block-level boilerplate classification — the jusText shape
(Pomikalek 2011, "Removing boilerplate and duplicate content from web
corpora"), the DOM-heuristic main-content step the north_rule names
(HTML boilerplate strip / DOM heuristics) and the stage trafilatura /
boilerpipe run between raw crawl HTML and extracted text.

Algorithm (frozen, deterministic; a documented simplification of
jusText's context-sensitive pass):

1. drop ``<head>`` and ``<script>`` wholesale;
2. split the page into blocks at block-tag boundaries
   (``p/div/h1-6/html/body``); inline tags (``<a>`` ...) stay inside
   their block;
3. per block: ``chars`` (tag-stripped, whitespace-collapsed text
   length), ``link_chars`` (total anchor-text length), ``n_words``,
   ``stop_words`` (frozen stopword list);
4. initial class, all thresholds as EXACT integer cross-products so
   both engines agree bit-for-bit (jusText's published constants:
   MAX_LINK_DENSITY 0.2, LENGTH_LOW 70, LENGTH_HIGH 200,
   STOPWORDS_LOW 0.30, STOPWORDS_HIGH 0.32)::

       5*link_chars > chars          -> bad
       chars < 70                    -> short
       25*stop_words >= 8*n_words    -> good if chars > 200 else neargood
       10*stop_words >= 3*n_words    -> neargood
       else                          -> bad

5. context pass: ``short`` becomes good iff the nearest *sure*
   (good/bad) neighbours on BOTH sides are good; ``neargood`` becomes
   good iff EITHER sure neighbour is good; page edges count as bad.
   (jusText additionally promotes headings near good content — this
   frozen version classifies them like any block, so a lone ``<h1>``
   after a nav bar stays boilerplate; documented simplification.)

Plan shape (the scale story): synthesis + block split + per-block
features are all codegen expressions in the scan task; the ONLY
exchange is the single hashpartitioning on ``url`` shared by the
row_number / prev-sure / next-sure windows (plan-asserted).  No joins,
no Python — at 10^12 pages this is one shuffle of short block rows.

The driver corpus has no html column, so the registered query
synthesizes pages in-engine (the ``web_meta_extract`` technique): each
document becomes a page with a nav bar (link density 1 -> bad), a lone
heading (short -> bad), two stopword-rich >200-char paragraphs built
from cycled corpus tokens (good), a hash-rolled short connective
between them (short -> promoted good), a neargood trailer after the
last paragraph (promoted good), a link-heavy sidebar (bad), a
hash-rolled neargood block stranded between sidebar and footer (stays
bad) and a stopword-free copyright footer (bad) — every class and both
promotion polarities are exercised, presence rolls vary the block
layout per document.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, sql_hash60, tokens

# frozen stopword list (subset of jusText's English list)
STOPWORDS = (
    "the", "of", "and", "a", "to", "in", "with", "that", "for",
    "is", "it", "on", "them", "more", "here",
)

MAX_LINK_DENSITY = (5, 1)   # link_chars/chars > 1/5
LENGTH_LOW = 70
LENGTH_HIGH = 200
STOP_HIGH = (25, 8)         # stop/words >= 8/25 = 0.32
STOP_LOW = (10, 3)          # stop/words >= 3/10 = 0.30

_BLOCK_SPLIT = r"(?i)</?(?:p|div|h[1-6]|html|body)\b[^>]*>"
_ANCHOR_TEXT = r"(?is)<a\b[^>]*>(.*?)</a\s*>"

_NAV = (
    '<div><a href="/">Home</a> <a href="/about">About</a> '
    '<a href="/contact">Contact us</a></div>'
)
_SHORT_MID = "<p>and so it goes on for now</p>"
_SIDEBAR = (
    '<div><a href="/rel">related links</a> plus a few more items '
    "over here</div>"
)
_FOOTER = (
    "<div>copyright 2024 example corporation limited worldwide "
    "print edition archive</div>"
)
_PARA_UNIT = ("with the ", " of them")  # 4 of 5 words are stopwords


def _h(doc_id: Column, salt: str) -> Column:
    return portable_hash60(
        F.concat(doc_id.cast("string"), F.lit(":" + salt))
    )


def synth_boiler_pages(docs: DataFrame) -> DataFrame:
    """documents -> (url, html:binary) pages with the planted block
    layout; byte-identical in the DuckDB dual."""
    doc_id = F.col("doc_id")
    staged = docs.select(
        "doc_id", "source", tokens(F.col("text")).alias("tok")
    ).select(
        "doc_id", "source",
        F.concat(F.col("tok"), F.col("tok"), F.col("tok")).alias("rep"),
    )

    def para(start: int) -> Column:
        return F.concat(
            F.lit("<p>"),
            F.array_join(
                F.transform(
                    F.slice(F.col("rep"), start, 14),
                    lambda t: F.concat(
                        F.lit(_PARA_UNIT[0]), t, F.lit(_PARA_UNIT[1])
                    ),
                ),
                " ",
            ),
            F.lit("</p>"),
        )

    near_mid = F.concat(
        F.lit("<p>the notes of the day for item "), doc_id.cast("string"),
        F.lit(" and more of it in the list over here today</p>"),
    )
    near_tail = F.concat(
        F.lit("<p>a short recap of the items in this set for "),
        doc_id.cast("string"),
        F.lit(" with notes to keep over here</p>"),
    )
    page = F.concat(
        F.lit("<html><head><title>Doc "), doc_id.cast("string"),
        F.lit("</title><script>var x=1;</script></head><body>"),
        F.lit(_NAV),
        F.lit("<h1>Document "), doc_id.cast("string"), F.lit("</h1>"),
        F.lit("<script>if (x < 2) { x = 2; }</script>"),
        para(1),
        F.when(_h(doc_id, "smid") % 3 != 0, F.lit(_SHORT_MID))
        .otherwise(F.lit("")),
        para(15),
        near_mid,
        F.lit(_SIDEBAR),
        F.when(_h(doc_id, "ntail") % 2 == 0, near_tail)
        .otherwise(F.lit("")),
        F.lit(_FOOTER),
        F.lit("</body></html>"),
    )
    return staged.select(
        F.concat(F.lit("https://"), F.col("source"), F.lit(".test/"),
                 doc_id.cast("string")).alias("url"),
        F.encode(page, "UTF-8").alias("html"),
    )


def boiler_blocks_frame(pages: DataFrame) -> DataFrame:
    """(url, html:binary) -> one row per non-empty block with features,
    initial class and context-promoted final class."""
    stripped = F.regexp_replace(
        F.regexp_replace(
            F.decode(F.col("html"), "UTF-8"),
            r"(?is)<head\b.*?</head\s*>", ""),
        r"(?is)<script\b.*?</script\s*>", "")
    blocks = pages.select(
        "url", F.posexplode(F.split(stripped, _BLOCK_SPLIT))
        .alias("pos", "blk"),
    )
    btext = F.trim(F.regexp_replace(
        F.regexp_replace(F.col("blk"), "<[^>]+>", " "), r"\s+", " "))
    feats = blocks.select(
        "url", "pos", btext.alias("btext"),
        F.aggregate(
            F.regexp_extract_all(
                F.col("blk"), F.lit(_ANCHOR_TEXT), F.lit(1)),
            F.lit(0).cast("bigint"),
            lambda acc, s: acc + F.length(s),
        ).alias("link_chars"),
    ).filter(F.col("btext") != "").select(
        "url", "pos", "btext", "link_chars",
        F.length("btext").cast("bigint").alias("chars"),
        tokens(F.col("btext")).alias("w"),
        # staged as a bound attribute: HOF lambdas are interpreted
        # without CSE, so the literal array must not rebuild per element
        F.array(*[F.lit(s) for s in STOPWORDS]).alias("stop_arr"),
    ).select(
        "url", "pos", "btext", "link_chars", "chars",
        F.size("w").cast("bigint").alias("n_words"),
        F.size(F.filter(
            F.col("w"),
            lambda x: F.array_contains(F.col("stop_arr"), x),
        )).cast("bigint").alias("stop_words"),
    )
    ld_n, ld_d = MAX_LINK_DENSITY
    sh_n, sh_d = STOP_HIGH
    sl_n, sl_d = STOP_LOW
    cls = (
        F.when(F.col("link_chars") * ld_n > F.col("chars") * ld_d, "bad")
        .when(F.col("chars") < LENGTH_LOW, "short")
        .when(
            F.col("stop_words") * sh_n >= F.col("n_words") * sh_d,
            F.when(F.col("chars") > LENGTH_HIGH, "good")
            .otherwise("neargood"),
        )
        .when(F.col("stop_words") * sl_n >= F.col("n_words") * sl_d,
              "neargood")
        .otherwise(F.lit("bad"))
    )
    classed = feats.withColumn("cls", cls).withColumn(
        "sure",
        F.when(F.col("cls").isin("good", "bad"), F.col("cls")),
    )
    w = Window.partitionBy("url").orderBy("pos")
    prev_sure = F.coalesce(
        F.last("sure", ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit("bad"),
    )
    next_sure = F.coalesce(
        F.first("sure", ignorenulls=True).over(
            w.rowsBetween(1, Window.unboundedFollowing)),
        F.lit("bad"),
    )
    final = (
        F.when(F.col("cls").isin("good", "bad"), F.col("cls"))
        .when(
            F.col("cls") == "short",
            F.when((F.col("p") == "good") & (F.col("n") == "good"),
                   "good").otherwise("bad"),
        )
        .otherwise(
            F.when((F.col("p") == "good") | (F.col("n") == "good"),
                   "good").otherwise("bad"),
        )
    )
    return classed.select(
        "url",
        F.row_number().over(w).cast("bigint").alias("block_idx"),
        "chars", "n_words", "stop_words", "link_chars", "cls",
        prev_sure.alias("p"), next_sure.alias("n"), "btext",
    ).select(
        "url", "block_idx", "chars", "n_words", "stop_words",
        "link_chars", "cls", final.alias("cls_final"), "btext",
    )


def boilerplate_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return boiler_blocks_frame(synth_boiler_pages(docs))


_TOK = "list_filter(string_split_regex(lower({e}), '\\s+'), t -> length(t) > 0)"
_STOP_SQL = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"


def _sqlh(salt: str) -> str:
    return sql_hash60(f"doc_id || ':{salt}'")


_PARA_SQL = (
    "'<p>' || array_to_string(list_transform(rep[{a}:{b}], "
    f"t -> '{_PARA_UNIT[0]}' || t || '{_PARA_UNIT[1]}'), ' ') || '</p>'"
)

def justext_sql(pages_cte: str) -> str:
    """jusText classification over any (url, page) CTE — ends in a
    ``just`` CTE with the block rows; reused by the extractor-agreement
    dual in webvote.py (both extractors must see ONE page set)."""
    return f"""
b AS (
  SELECT url,
         unnest(range(1, len(blks) + 1)) AS pos,
         unnest(blks) AS blk
  FROM (
    SELECT url,
           string_split_regex(
             regexp_replace(
               regexp_replace(page, '(?is)<head\\b.*?</head\\s*>', '', 'g'),
               '(?is)<script\\b.*?</script\\s*>', '', 'g'),
             '(?i)</?(?:p|div|h[1-6]|html|body)\\b[^>]*>') AS blks
    FROM {pages_cte})
),
t AS (
  SELECT url, pos,
         trim(regexp_replace(regexp_replace(blk, '<[^>]+>', ' ', 'g'),
                             '\\s+', ' ', 'g')) AS btext,
         coalesce(list_sum(list_transform(
             regexp_extract_all(blk, '(?is)<a\\b[^>]*>(.*?)</a\\s*>', 1),
             s -> length(s))), 0)::BIGINT AS link_chars
  FROM b
),
f AS (
  SELECT url, pos, btext, link_chars,
         length(btext)::BIGINT AS chars,
         len(w)::BIGINT AS n_words,
         len(list_filter(w, x -> list_contains({_STOP_SQL}, x)))::BIGINT
           AS stop_words
  FROM (SELECT *, {_TOK.format(e="btext")} AS w FROM t)
  WHERE btext <> ''
),
c AS (
  SELECT *,
         CASE WHEN link_chars * {MAX_LINK_DENSITY[0]}
                   > chars * {MAX_LINK_DENSITY[1]} THEN 'bad'
              WHEN chars < {LENGTH_LOW} THEN 'short'
              WHEN stop_words * {STOP_HIGH[0]} >= n_words * {STOP_HIGH[1]}
              THEN CASE WHEN chars > {LENGTH_HIGH}
                        THEN 'good' ELSE 'neargood' END
              WHEN stop_words * {STOP_LOW[0]} >= n_words * {STOP_LOW[1]}
              THEN 'neargood'
              ELSE 'bad' END AS cls
  FROM f
),
s AS (
  SELECT *,
         CASE WHEN cls IN ('good', 'bad') THEN cls END AS sure
  FROM c
),
wdw AS (
  SELECT *,
         row_number() OVER (PARTITION BY url ORDER BY pos)::BIGINT
           AS block_idx,
         coalesce(last_value(sure IGNORE NULLS) OVER (
             PARTITION BY url ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           'bad') AS p,
         coalesce(first_value(sure IGNORE NULLS) OVER (
             PARTITION BY url ORDER BY pos
             ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING),
           'bad') AS n
  FROM s
),
just AS (
  SELECT url, block_idx, chars, n_words, stop_words, link_chars, cls,
         CASE WHEN cls IN ('good', 'bad') THEN cls
              WHEN cls = 'short'
              THEN CASE WHEN p = 'good' AND n = 'good'
                        THEN 'good' ELSE 'bad' END
              ELSE CASE WHEN p = 'good' OR n = 'good'
                        THEN 'good' ELSE 'bad' END
         END AS cls_final,
         btext
  FROM wdw
)"""


BOILER_BLOCKS_SQL = f"""
WITH d AS (
  SELECT doc_id, source, {_TOK.format(e="text")} AS tok FROM documents
),
r AS (SELECT doc_id, source, tok || tok || tok AS rep FROM d),
pages AS (
  SELECT 'https://' || source || '.test/' || doc_id AS url,
    '<html><head><title>Doc ' || doc_id
    || '</title><script>var x=1;</script></head><body>'
    || '{_NAV.replace("'", "''")}'
    || '<h1>Document ' || doc_id || '</h1>'
    || '<script>if (x < 2) {{ x = 2; }}</script>'
    || {_PARA_SQL.format(a=1, b=14)}
    || CASE WHEN {_sqlh("smid")} % 3 <> 0
            THEN '{_SHORT_MID}' ELSE '' END
    || {_PARA_SQL.format(a=15, b=28)}
    || '<p>the notes of the day for item ' || doc_id
    || ' and more of it in the list over here today</p>'
    || '{_SIDEBAR.replace("'", "''")}'
    || CASE WHEN {_sqlh("ntail")} % 2 = 0
            THEN '<p>a short recap of the items in this set for '
                 || doc_id || ' with notes to keep over here</p>'
            ELSE '' END
    || '{_FOOTER}'
    || '</body></html>' AS page
  FROM r
),
{{JUSTEXT}}
SELECT * FROM just
"""

BOILER_BLOCKS_SQL = BOILER_BLOCKS_SQL.replace("{JUSTEXT}", justext_sql("pages"))


QUERIES: dict[str, tuple] = {
    "web_boilerplate_blocks": (boilerplate_blocks, BOILER_BLOCKS_SQL),
}
