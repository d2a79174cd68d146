"""Extractor fallback cascade — the trafilatura architecture
(Barbaresi, ACL 2021: run the precise extractor first, SANITY-CHECK its
output, fall back to a recall-oriented extractor, finally to bare
tag-stripping).  This is how production extraction stacks actually
deploy the extractor families this engine carries: not one classifier,
but an ordered cascade with per-document output gates.

Frozen cascade (deterministic; trafilatura's own order is
main-extractor > readability > justext > baseline html2txt — here the
two arms with full cross-engine duals stand in):

1. **jusText** (``webboiler.boiler_blocks_frame``): final-``good``
   blocks joined in block order; ACCEPT iff extracted chars >=
   ``MIN_EXTRACT_CHARS`` (trafilatura's ``min_extracted_size`` gate);
2. **CETR** (``webcetr.cetr_lines_frame``): content lines joined in
   line order, same gate;
3. **raw baseline** (html2txt): head/script dropped, tags stripped,
   whitespace collapsed — never gated (the last resort).

Per url the operator emits which arm fired, the extracted size in
chars and tokens, and the portable 60-bit hash of the extracted text —
the driver row therefore certifies the full composition: both
upstream classifiers, both output gates, and the order-stable text
reassembly.

Plan shape (the scale story): each arm scans the page table once
(three scans total — trafilatura's own per-document cost, and a scan
is the cheapest node to repeat: column-pruned, no shuffle); the raw
arm is pure codegen in the scan task with zero exchanges; each
classifier arm collapses per url inside the SAME hashpartitioning(url)
its classification windows already created (window -> groupBy(url)
reuses the partitioning, no second exchange per arm); the cascade is
two LEFT joins of url-keyed per-document rows — Catalyst picks the
physical join from stats (broadcast at small sf, sort-merge at crawl
scale; nothing is hinted).  Every exchanged row is (url, extracted
text) — the operator's own output.  No Python (plan-asserted).

The synthesized corpus plants three page classes (hash-rolled
``cls = h(doc_id) % 3``) so every cascade arm fires and the driver
hash certifies the gates in both polarities:

- ``cls 0`` article: stopword-rich long paragraphs -> jusText wins;
- ``cls 1`` bare listing: long paragraphs of stopword-FREE compound
  words -> jusText classifies every block ``bad`` (its stopword gate),
  CETR's structure-free tag ratio still finds them -> CETR wins;
- ``cls 2`` link-farm stub: nav/sidebar/ad/footer only -> both
  classifiers extract below the gate -> raw baseline.

Reference scope anchor: beyond-reference web-scale operator (the
north_rule's "HTML boilerplate strip ... DOM heuristics" stage as a
deployable config); the reference's own HTML branch is
``operators/html_extract.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, sql_hash60, tokens
from .webboiler import boiler_blocks_frame, justext_sql
from .webcetr import _AD_LINE, _NAV_LINE, _SIDEBAR_LINE, cetr_lines_frame, cetr_sql

MIN_EXTRACT_CHARS = 100  # trafilatura min_extracted_size shape

_PARA_UNIT = ("with the ", " of them")  # stopword-rich wrap (jusText-good)
_FOOTER_LINE = "<div>copyright 2024 example corp</div>"


def _h(doc_id: Column, salt: str) -> Column:
    return portable_hash60(
        F.concat(doc_id.cast("string"), F.lit(":" + salt))
    )


def synth_cascade_pages(docs: DataFrame) -> DataFrame:
    """documents -> (url, html:binary) pages in three cascade classes;
    byte-identical in the DuckDB dual (``_PAGES_SQL``)."""
    doc_id = F.col("doc_id")
    staged = docs.select(
        "doc_id", "source", tokens(F.col("text")).alias("tok")
    ).select(
        "doc_id", "source",
        F.concat(F.col("tok"), F.col("tok"), F.col("tok")).alias("rep"),
    )
    cls = _h(doc_id, "cls") % 3

    def stop_para(start: int, n: int) -> Column:
        return F.array_join(
            F.transform(
                F.slice(F.col("rep"), start, n),
                lambda t: F.concat(
                    F.lit(_PARA_UNIT[0]), t, F.lit(_PARA_UNIT[1])
                ),
            ),
            " ",
        )

    def bare_para(start: int, n: int) -> Column:
        # compound words ("x"-prefixed) are never jusText stopwords
        return F.array_join(
            F.transform(
                F.slice(F.col("rep"), start, n),
                lambda t: F.concat(F.lit("x"), t),
            ),
            " ",
        )

    def para_line(start: int, n: int) -> Column:
        return (
            F.when(cls == 0,
                   F.concat(F.lit("<p>"), stop_para(start, n),
                            F.lit("</p>")))
            .when(cls == 1,
                  F.concat(F.lit("<p>"), bare_para(start, n * 2),
                           F.lit("</p>")))
            .otherwise(F.lit(""))
        )

    lines = [
        F.lit("<html>"),
        F.concat(F.lit("<head><title>Doc "), doc_id.cast("string"),
                 F.lit("</title><script>var x=1;</script></head>")),
        F.lit("<body>"),
        F.lit(_NAV_LINE),
        F.concat(F.lit("<h1>Document "), doc_id.cast("string"),
                 F.lit("</h1>")),
        para_line(1, 14),
        F.when((cls == 0) & (_h(doc_id, "mid") % 3 != 0),
               F.lit("<p>and so it goes on for now</p>"))
        .otherwise(F.lit("")),
        para_line(18, 14),
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


def _order_join(df: DataFrame, idx: str, txt: str) -> DataFrame:
    """Per-url order-stable text reassembly: collect (idx, text) structs,
    sort by idx, join with newlines — the cross-engine twin of DuckDB's
    ``string_agg(txt, chr(10) ORDER BY idx)``."""
    return df.groupBy("url").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(idx, txt))),
                lambda s: s[txt],
            ),
            "\n",
        ).alias("text")
    )


def cascade_frame(pages: DataFrame) -> DataFrame:
    """(url, html:binary) -> one row per url with the cascade verdict."""
    just = _order_join(
        boiler_blocks_frame(pages).filter(F.col("cls_final") == "good"),
        "block_idx", "btext",
    ).select("url", F.col("text").alias("just_text"))
    cetr = _order_join(
        cetr_lines_frame(pages).filter(F.col("is_content") == 1),
        "line_idx", "line_text",
    ).select("url", F.col("text").alias("cetr_text"))
    raw_text = F.trim(F.regexp_replace(F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.decode(F.col("html"), "UTF-8"),
                             r"(?is)<head\b.*?</head\s*>", ""),
            r"(?is)<script\b.*?</script\s*>", ""),
        "<[^>]+>", " "), r"\s+", " "))
    raw = pages.select("url", raw_text.alias("raw_text"))

    merged = raw.join(just, "url", "left").join(cetr, "url", "left")
    jc = F.coalesce(F.length("just_text"), F.lit(0)).cast("bigint")
    cc = F.coalesce(F.length("cetr_text"), F.lit(0)).cast("bigint")
    extractor = (
        F.when(jc >= MIN_EXTRACT_CHARS, "justext")
        .when(cc >= MIN_EXTRACT_CHARS, "cetr")
        .otherwise(F.lit("raw"))
    )
    text = (
        F.when(jc >= MIN_EXTRACT_CHARS, F.col("just_text"))
        .when(cc >= MIN_EXTRACT_CHARS, F.col("cetr_text"))
        .otherwise(F.col("raw_text"))
    )
    return merged.select(
        "url", extractor.alias("extractor"), text.alias("text")
    ).select(
        "url", "extractor",
        F.length("text").cast("bigint").alias("n_chars"),
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
        portable_hash60(F.col("text")).alias("text_hash60"),
    )


def extract_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return cascade_frame(synth_cascade_pages(docs))


_TOK = "list_filter(string_split_regex(lower({e}), '\\s+'), t -> length(t) > 0)"


def _sqlh(salt: str) -> str:
    return sql_hash60(f"doc_id || ':{salt}'")


def _stop_para_sql(start: int, n: int) -> str:
    return (
        f"coalesce(array_to_string(list_transform("
        f"rep[{start}:{start + n - 1}], "
        f"t -> '{_PARA_UNIT[0]}' || t || '{_PARA_UNIT[1]}'), ' '), '')"
    )


def _bare_para_sql(start: int, n: int) -> str:
    return (
        f"coalesce(array_to_string(list_transform("
        f"rep[{start}:{start + n - 1}], t -> 'x' || t), ' '), '')"
    )


def _para_line_sql(start: int, n: int) -> str:
    return (
        f"CASE WHEN {_sqlh('cls')} % 3 = 0"
        f" THEN '<p>' || {_stop_para_sql(start, n)} || '</p>'"
        f" WHEN {_sqlh('cls')} % 3 = 1"
        f" THEN '<p>' || {_bare_para_sql(start, n * 2)} || '</p>'"
        f" ELSE '' END"
    )


_PAGES_SQL = f"""
  SELECT 'https://' || source || '.test/' || doc_id AS url,
    concat_ws(chr(10),
      '<html>',
      '<head><title>Doc ' || doc_id
        || '</title><script>var x=1;</script></head>',
      '<body>',
      '{_NAV_LINE.replace("'", "''")}',
      '<h1>Document ' || doc_id || '</h1>',
      {_para_line_sql(1, 14)},
      CASE WHEN {_sqlh("cls")} % 3 = 0 AND {_sqlh("mid")} % 3 <> 0
           THEN '<p>and so it goes on for now</p>' ELSE '' END,
      {_para_line_sql(18, 14)},
      CASE WHEN {_sqlh("ad")} % 2 = 0
           THEN '{_AD_LINE.replace("'", "''")}' ELSE '' END,
      '{_SIDEBAR_LINE.replace("'", "''")}',
      '{_FOOTER_LINE}',
      '</body></html>') AS page
  FROM (SELECT doc_id, source, tok || tok || tok AS rep
        FROM (SELECT doc_id, source, {_TOK.format(e="text")} AS tok
              FROM documents))
"""


EXTRACT_CASCADE_SQL = f"""
WITH pages AS ({_PAGES_SQL}),
{justext_sql("pages")},
{cetr_sql("pages")},
jt AS (
  SELECT url, string_agg(btext, chr(10) ORDER BY block_idx)
           AS just_text
  FROM just WHERE cls_final = 'good' GROUP BY url
),
ct AS (
  SELECT url, string_agg(line_text, chr(10) ORDER BY line_idx)
           AS cetr_text
  FROM cetr WHERE is_content = 1 GROUP BY url
),
rw AS (
  SELECT url,
         trim(regexp_replace(regexp_replace(regexp_replace(
           regexp_replace(page, '(?is)<head\\b.*?</head\\s*>', '', 'g'),
           '(?is)<script\\b.*?</script\\s*>', '', 'g'),
           '<[^>]+>', ' ', 'g'), '\\s+', ' ', 'g')) AS raw_text
  FROM pages
),
merged AS (
  SELECT rw.url,
         coalesce(length(just_text), 0)::BIGINT AS jc,
         coalesce(length(cetr_text), 0)::BIGINT AS cc,
         just_text, cetr_text, raw_text
  FROM rw LEFT JOIN jt ON rw.url = jt.url
          LEFT JOIN ct ON rw.url = ct.url
),
verdict AS (
  SELECT url,
         CASE WHEN jc >= {MIN_EXTRACT_CHARS} THEN 'justext'
              WHEN cc >= {MIN_EXTRACT_CHARS} THEN 'cetr'
              ELSE 'raw' END AS extractor,
         CASE WHEN jc >= {MIN_EXTRACT_CHARS} THEN just_text
              WHEN cc >= {MIN_EXTRACT_CHARS} THEN cetr_text
              ELSE raw_text END AS text
  FROM merged
)
SELECT url, extractor,
       length(text)::BIGINT AS n_chars,
       len({_TOK.format(e="text")})::BIGINT AS n_tokens,
       {sql_hash60("text")} AS text_hash60
FROM verdict
"""


QUERIES: dict[str, tuple] = {
    "web_extract_cascade": (extract_cascade, EXTRACT_CASCADE_SQL),
}
