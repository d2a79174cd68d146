"""Markdown heading-outline extraction — the document-structure tree
the reference's section splitter walks linearly (src/core/
markdown-splitter.ts findSectionBoundaries scans ``^#{1,6} `` heading
lines to cut main/appendix/backmatter): here generalized to the full
outline, one row per heading with its LEVEL and its PARENT heading
(the nearest preceding heading of strictly smaller level).  A
web-scale extraction tier wants this for nav/TOC synthesis, section-
aware chunking (text_passage_chunks cuts flat windows; the outline
gives semantic cut points) and structure-based quality signals
(docs whose outline jumps h1->h4 are scraper damage).

Semantics (frozen): a heading line matches ``^#{1,6} `` (1-6 hashes
then a space); level = number of hashes; title = everything after
the space.  h_idx is the 1-based position among the doc's headings
in document order.  parent_idx = the h_idx of the LAST preceding
heading with ``level < own level``, else 0 (an "orphan" ``##`` before
any ``#`` has parent 0 — markdown tolerates it, so do we).  Docs with
no headings emit no rows.

Cross-engine mapping: pure array HOFs — Spark ``filter/transform/
slice/try_element_at(…, -1)`` is DuckDB ``list_filter/list_transform/
range/[-1]`` (DuckDB ``range(1, i)`` is end-exclusive = Spark
``slice(idxs, 1, i-1)``; both yield the empty prefix at i=1, and
last-of-empty is NULL in both via try_element_at / [-1]).  The
``slice`` formulation deliberately avoids ``sequence(1, i-1)``,
which Spark evaluates DESCENDING for i=1.

The driver corpus is single-line prose, so the registered query
plants outlines in-engine by hash roll: roll 0 = a well-formed
5-heading tree (h1 h2 h3 h2 h1, one title derived from the doc's own
text), roll 1 = a pathological shape (orphan h2 first, h3->h4 jump),
roll 2 = no headings (zero rows).  Identical plant in the dual.

Plan shape (the scale story): per-document local work — the outline
is built by HOFs inside the scan task and exploded; zero joins, zero
exchanges, zero Python (plan-asserted).  The parent scan is O(H^2)
in headings per doc; H is bounded (~10^2) on real pages and each
step is an int compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, sql_hash60

_HEAD_RX = "^#{1,6} "


def outline_frame(docs: DataFrame) -> DataFrame:
    """doc_id, text -> one row per heading: h_idx, level, parent_idx, title."""
    lines = F.split(F.col("text"), "\n", -1)
    heads = F.filter(lines, lambda x: x.rlike(_HEAD_RX))
    lv = F.transform(
        heads, lambda h: F.length(F.regexp_extract(h, "^(#{1,6}) ", 1))
    )
    titles = F.transform(
        heads, lambda h: F.regexp_extract(h, "^#{1,6} (.*)$", 1)
    )
    idxs = F.sequence(F.lit(1), F.size(heads))  # only evaluated when >=1 head

    def parent(i):
        prefix = F.slice(idxs, F.lit(1), i - 1)
        cands = F.filter(
            prefix,
            lambda j: F.try_element_at(lv, j) < F.try_element_at(lv, i),
        )
        return F.coalesce(F.try_element_at(cands, F.lit(-1)), F.lit(0))

    rows = F.when(
        F.size(heads) >= 1,
        F.transform(
            idxs,
            lambda i: F.struct(
                i.cast("long").alias("h_idx"),
                F.try_element_at(lv, i).cast("long").alias("level"),
                parent(i).cast("long").alias("parent_idx"),
                F.try_element_at(titles, i).alias("title"),
            ),
        ),
    )
    return (
        docs.select("doc_id", F.explode(rows).alias("h"))
        .select("doc_id", "h.h_idx", "h.level", "h.parent_idx", "h.title")
    )


def synth_outline_docs(docs: DataFrame) -> DataFrame:
    roll = portable_hash60(
        F.concat(F.col("doc_id").cast("string"), F.lit(":out"))
    ) % 3
    nl = F.lit("\n")
    tree = F.concat(
        F.lit("# Introduction\n"),
        F.col("text"),
        F.lit("\n## "),
        F.expr("substr(text, 1, 10)"),
        F.lit("\n### Setup\n## Results\n# Conclusion"),
    )
    patho = F.concat(
        F.lit("## Orphan\n# Top\n"),
        F.col("text"),
        F.lit("\n### Deep\n#### Deeper\n## Mid"),
    )
    planted = (
        F.when(roll == 0, tree).when(roll == 1, patho).otherwise(F.col("text"))
    )
    _ = nl
    return docs.select("doc_id", planted.alias("text"))


def heading_outline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return outline_frame(synth_outline_docs(docs))


_ROLL = sql_hash60("doc_id || ':out'")

OUTLINE_SQL = f"""
WITH planted AS (
  SELECT doc_id,
    CASE
      WHEN {_ROLL} % 3 = 0 THEN
        '# Introduction' || chr(10) || text || chr(10)
        || '## ' || substr(text, 1, 10) || chr(10)
        || '### Setup' || chr(10) || '## Results' || chr(10)
        || '# Conclusion'
      WHEN {_ROLL} % 3 = 1 THEN
        '## Orphan' || chr(10) || '# Top' || chr(10) || text || chr(10)
        || '### Deep' || chr(10) || '#### Deeper' || chr(10) || '## Mid'
      ELSE text
    END AS body
  FROM documents
),
s AS (
  SELECT doc_id,
         list_filter(string_split(body, chr(10)),
                     x -> regexp_matches(x, '^#{{1,6}} ')) AS heads
  FROM planted
),
a AS (
  SELECT doc_id, heads,
         list_transform(heads,
           h -> length(regexp_extract(h, '^(#{{1,6}}) ', 1))) AS lv,
         list_transform(heads,
           h -> regexp_extract(h, '^#{{1,6}} (.*)$', 1)) AS titles
  FROM s
  WHERE len(heads) > 0
),
e AS (
  SELECT doc_id, lv, titles,
         unnest(range(1, len(heads) + 1)) AS h_idx
  FROM a
)
SELECT doc_id,
       h_idx::BIGINT AS h_idx,
       lv[h_idx]::BIGINT AS level,
       coalesce(list_filter(range(1, h_idx),
                            j -> lv[j] < lv[h_idx])[-1], 0)::BIGINT
         AS parent_idx,
       titles[h_idx] AS title
FROM e
"""


QUERIES: dict[str, tuple] = {
    "text_heading_outline": (heading_outline, OUTLINE_SQL),
}
