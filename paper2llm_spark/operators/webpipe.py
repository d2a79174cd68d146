"""Boilerpipe shallow-text classification (Kohlschuetter, Fankhauser
& Nejdl, WSDM 2010, "Boilerplate detection using shallow text
features"), the FIFTH published main-content extractor in the engine
(jusText blocks, CETR lines, Arc90 elements, BTE token span are the
other four).  Boilerpipe's insight is that two cheap per-block
features — word count and anchor-word link density — plus the SAME
features of the neighbouring blocks classify boilerplate almost as
well as deep DOM analysis.

The classifier is the library's published ``NumWordsRulesClassifier``
decision tree, frozen verbatim (thresholds are the learned constants
from the paper's news-corpus training)::

    curr.linkDensity >  0.333333                 -> BOILERPLATE
    curr.linkDensity <= 0.333333:
      prev.linkDensity <= 0.555556:
        CONTENT iff curr.numWords > 16
                 or next.numWords > 15
                 or prev.numWords > 4
      prev.linkDensity > 0.555556:
        CONTENT iff curr.numWords > 40
                 or next.numWords > 17

Link densities compare in exact integer micro-units
(``ld_micro = 1e6 * link_words div greatest(1, n_words)`` vs the
literals 333333 / 555556), so both engines agree bit-for-bit — the
float thresholds appear only as frozen integer constants.

Plan shape (the scale story): page synthesis, block split (same
block-tag regex as jusText) and the word/anchor-word counts are
codegen expressions in the scan task; prev/next features are lag/lead
over the ONE hashpartitioning(url) window that also drives the block
index (plan-asserted).  No joins, no Python — at 10^12 pages this is
one shuffle of short block rows, the same exchange discipline as the
other extractor families.

The synthesized page set is engineered so that EVERY leaf of the tree
fires on the corpus (the driver gate stays discriminating): an
all-link nav (link-density kill), a long lead paragraph directly after
it (high-prev-ld ``numWords > 40`` leaf), a two-word heading between
paragraphs (``next > 15`` promotion), a six-word trailer after a long
paragraph (``prev > 4`` promotion), an all-link sidebar (kill), a
four-word footer after the sidebar (high-prev-ld boilerplate leaf) and
a hash-rolled two-word closer after the footer (the all-small
boilerplate leaf: prev has exactly 4 words, the learned boundary).

Reference scope anchor: beyond-reference web-scale operator per the
brief's north_rule ("HTML boilerplate strip ... DOM heuristics"); the
reference's own extraction surface is ``src/core/markdown-processor.ts``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, sql_hash60, tokens

MICRO = 1_000_000
LD_KILL = 333_333      # curr link density > 0.333333 -> boilerplate
LD_PREV_HIGH = 555_556  # prev link density branch point
W_CURR_LOW, W_NEXT_LOW, W_PREV_LOW = 16, 15, 4   # low-prev-ld leaf
W_CURR_HIGH, W_NEXT_HIGH = 40, 17                # high-prev-ld leaf

_BLOCK_SPLIT = r"(?i)</?(?:p|div|h[1-6]|html|body)\b[^>]*>"
_ANCHOR_TEXT = r"(?is)<a\b[^>]*>(.*?)</a\s*>"

_NAV = (
    '<div><a href="/">Home</a> <a href="/about">About</a> '
    '<a href="/contact">Contact</a></div>'
)
_SIDEBAR = (
    '<div><a href="/r1">related</a> <a href="/r2">more</a> '
    '<a href="/r3">links</a></div>'
)
_FOOTER = "<div>copyright 2024 example corp</div>"  # exactly 4 words
_PARA_UNIT = ("with the ", " of them")


def _h(doc_id: Column, salt: str) -> Column:
    return portable_hash60(
        F.concat(doc_id.cast("string"), F.lit(":" + salt))
    )


def synth_pipe_pages(docs: DataFrame) -> DataFrame:
    """documents -> (url, html:binary) pages whose block sequence fires
    every leaf of the NumWordsRulesClassifier; byte-identical in the
    DuckDB dual."""
    doc_id = F.col("doc_id")
    staged = docs.select(
        "doc_id", "source", tokens(F.col("text")).alias("tok")
    ).select(
        "doc_id", "source",
        F.concat(F.col("tok"), F.col("tok"), F.col("tok")).alias("rep"),
    )

    def para(start: int) -> Column:
        # 14 corpus tokens x 5-word wrap = 70 words, link density 0
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

    page = F.concat(
        F.lit("<html><head><title>Doc "), doc_id.cast("string"),
        F.lit("</title></head><body>"),
        F.lit(_NAV),
        para(1),                                       # lead: 70 words
        F.concat(F.lit("<h1>Document "), doc_id.cast("string"),
                 F.lit("</h1>")),                      # 2 words
        para(15),
        F.when(_h(doc_id, "mid") % 3 != 0,
               F.lit("<p>a short aside on this very page</p>"))
        .otherwise(F.lit("")),                         # 7 words, rolled
        para(29),
        F.concat(F.lit("<p>notes for item "), doc_id.cast("string"),
                 F.lit(" here too</p>")),              # 6 words
        F.lit(_SIDEBAR),
        F.lit(_FOOTER),
        F.when(_h(doc_id, "fin") % 2 == 0,
               F.concat(F.lit("<p>fin "), doc_id.cast("string"),
                        F.lit("</p>")))
        .otherwise(F.lit("")),                         # 2 words, rolled
        F.lit("</body></html>"),
    )
    return staged.select(
        F.concat(F.lit("https://"), F.col("source"), F.lit(".test/"),
                 doc_id.cast("string")).alias("url"),
        F.encode(page, "UTF-8").alias("html"),
    )


def pipe_blocks_frame(pages: DataFrame) -> DataFrame:
    """(url, html:binary) -> one row per non-empty block with the
    shallow-text features and the NumWordsRules content decision."""
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
            lambda acc, s: acc + F.size(tokens(s)),
        ).alias("link_words"),
    ).filter(F.col("btext") != "").select(
        "url", "pos", "btext", "link_words",
        F.size(tokens(F.col("btext"))).cast("bigint").alias("n_words"),
    ).withColumn(
        "ld_micro",
        F.expr(f"({MICRO} * link_words) div greatest(1, n_words)"),
    )
    w = Window.partitionBy("url").orderBy("pos")
    ctx = feats.select(
        "url",
        F.row_number().over(w).cast("bigint").alias("block_idx"),
        "n_words", "link_words", "ld_micro",
        F.lag("n_words", 1, 0).over(w).alias("prev_words"),
        F.lead("n_words", 1, 0).over(w).alias("next_words"),
        F.lag("ld_micro", 1, 0).over(w).alias("prev_ld_micro"),
        "btext",
    )
    is_content = (
        F.when(F.col("ld_micro") > LD_KILL, F.lit(0))
        .when(
            F.col("prev_ld_micro") <= LD_PREV_HIGH,
            ((F.col("n_words") > W_CURR_LOW)
             | (F.col("next_words") > W_NEXT_LOW)
             | (F.col("prev_words") > W_PREV_LOW)).cast("int"),
        )
        .otherwise(
            ((F.col("n_words") > W_CURR_HIGH)
             | (F.col("next_words") > W_NEXT_HIGH)).cast("int"),
        )
    )
    return ctx.select(
        "url", "block_idx", "n_words", "link_words", "ld_micro",
        "prev_words", "next_words", "prev_ld_micro",
        is_content.alias("is_content"), "btext",
    )


def pipe_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return pipe_blocks_frame(synth_pipe_pages(docs))


_TOK = "list_filter(string_split_regex(lower({e}), '\\s+'), t -> length(t) > 0)"


def _sqlh(salt: str) -> str:
    return sql_hash60(f"doc_id || ':{salt}'")


_PARA_SQL = (
    "'<p>' || array_to_string(list_transform(rep[{a}:{b}], "
    f"t -> '{_PARA_UNIT[0]}' || t || '{_PARA_UNIT[1]}'), ' ') || '</p>'"
)

PIPE_BLOCKS_SQL = f"""
WITH d AS (
  SELECT doc_id, source, {_TOK.format(e="text")} AS tok FROM documents
),
r AS (SELECT doc_id, source, tok || tok || tok AS rep FROM d),
pages AS (
  SELECT 'https://' || source || '.test/' || doc_id AS url,
    '<html><head><title>Doc ' || doc_id || '</title></head><body>'
    || '{_NAV.replace("'", "''")}'
    || {_PARA_SQL.format(a=1, b=14)}
    || '<h1>Document ' || doc_id || '</h1>'
    || {_PARA_SQL.format(a=15, b=28)}
    || CASE WHEN {_sqlh("mid")} % 3 <> 0
            THEN '<p>a short aside on this very page</p>'
            ELSE '' END
    || {_PARA_SQL.format(a=29, b=42)}
    || '<p>notes for item ' || doc_id || ' here too</p>'
    || '{_SIDEBAR.replace("'", "''")}'
    || '{_FOOTER}'
    || CASE WHEN {_sqlh("fin")} % 2 = 0
            THEN '<p>fin ' || doc_id || '</p>' ELSE '' END
    || '</body></html>' AS page
  FROM r
),
b AS (
  SELECT url,
         unnest(range(1, len(blks) + 1)) AS pos,
         unnest(blks) AS blk
  FROM (
    SELECT url,
           string_split_regex(
             regexp_replace(
               regexp_replace(page, '(?is)<head\\b.*?</head\\s*>',
                              '', 'g'),
               '(?is)<script\\b.*?</script\\s*>', '', 'g'),
             '{_BLOCK_SPLIT}') AS blks
    FROM pages)
),
t AS (
  SELECT url, pos,
         trim(regexp_replace(regexp_replace(blk, '<[^>]+>', ' ', 'g'),
                             '\\s+', ' ', 'g')) AS btext,
         coalesce(list_sum(list_transform(
             regexp_extract_all(blk, '{_ANCHOR_TEXT}', 1),
             s -> len({_TOK.format(e="s")}))), 0)::BIGINT AS link_words
  FROM b
),
f AS (
  SELECT url, pos, btext, link_words,
         len({_TOK.format(e="btext")})::BIGINT AS n_words
  FROM t
  WHERE btext <> ''
),
ld AS (
  SELECT url, pos, btext, link_words, n_words,
         ({MICRO} * link_words) // greatest(1, n_words) AS ld_micro
  FROM f
),
ctx AS (
  SELECT url,
         row_number() OVER w::BIGINT AS block_idx,
         n_words, link_words, ld_micro,
         coalesce(lag(n_words) OVER w, 0)::BIGINT AS prev_words,
         coalesce(lead(n_words) OVER w, 0)::BIGINT AS next_words,
         coalesce(lag(ld_micro) OVER w, 0)::BIGINT AS prev_ld_micro,
         btext
  FROM ld
  WINDOW w AS (PARTITION BY url ORDER BY pos)
)
SELECT url, block_idx, n_words, link_words, ld_micro,
       prev_words, next_words, prev_ld_micro,
       CASE WHEN ld_micro > {LD_KILL} THEN 0
            WHEN prev_ld_micro <= {LD_PREV_HIGH}
            THEN CASE WHEN n_words > {W_CURR_LOW}
                        OR next_words > {W_NEXT_LOW}
                        OR prev_words > {W_PREV_LOW}
                      THEN 1 ELSE 0 END
            ELSE CASE WHEN n_words > {W_CURR_HIGH}
                        OR next_words > {W_NEXT_HIGH}
                      THEN 1 ELSE 0 END
       END AS is_content,
       btext
FROM ctx
"""


QUERIES: dict[str, tuple] = {
    "web_boilerpipe_blocks": (pipe_blocks, PIPE_BLOCKS_SQL),
}
