"""HTML table -> Markdown table extraction — the reference's Markdown
serializer preserves tables (its converter fixtures include pipe
tables; `src/core/html/html-extract` keeps tabular content), and at
corpus scale every training-data pipeline either extracts or drops
``<table>`` content explicitly (trafilatura ``include_tables``,
resiliparse, Gopher's table heuristics).

Semantics (frozen): pull every ``<tr>...</tr>`` region, split it into
``<td>``/``<th>`` cells, join cells with `` | `` pipes, and emit a
GitHub-flavored Markdown table — first row is the header, followed by
a ``| --- | ... |`` separator sized to the header's column count,
then the data rows.  Pages without tables emit ``n_rows = 0`` and an
empty ``table_md``.

Both engines run the IDENTICAL non-greedy regexes (`<tr>(.*?)</tr>`,
`<t[dh]>(.*?)</t[dh]>`) — Java regex and RE2 agree on these patterns
— and identical higher-order list functions, so the dual is exact.

The driver corpus has no html column, so the registered query
synthesizes pages in-engine: a 4-way hash roll plants a 2-column
3-row table, a 3-row variant with an extra data row, or no table at
all — exercising the header/separator logic, both row counts, and
the empty branch.

Plan shape (the scale story): regex pulls + list HOFs are ONE codegen
projection in the scan task — zero joins, zero exchanges, zero Python
(plan-asserted).  Table extraction rides the main-content-extraction
scan for free at 10^12 pages.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, sql_hash60

ROW_RE = "<tr>(.*?)</tr>"
CELL_RE = "<t[dh]>(.*?)</t[dh]>"


def _h(doc_id: Column, salt: str) -> Column:
    return portable_hash60(
        F.concat(doc_id.cast("string"), F.lit(":" + salt))
    )


def synth_table_pages(docs: DataFrame) -> DataFrame:
    doc_id = F.col("doc_id")
    base = F.concat(
        F.lit("<table><tr><th>key</th><th>value</th></tr>"
              "<tr><td>id</td><td>"),
        doc_id.cast("string"),
        F.lit("</td></tr><tr><td>lang</td><td>"),
        F.col("lang"),
        F.lit("</td></tr>"),
    )
    extra = F.concat(
        F.lit("<tr><td>source</td><td>"), F.col("source"),
        F.lit("</td></tr>"),
    )
    table = (
        F.when(_h(doc_id, "tbl") % 4 == 0, F.lit(""))
        .when(_h(doc_id, "tbl") % 4 == 1,
              F.concat(base, extra, F.lit("</table>")))
        .otherwise(F.concat(base, F.lit("</table>")))
    )
    page = F.concat(
        F.lit("<html><body><p>"), F.col("text"), F.lit("</p>"),
        table, F.lit("</body></html>"),
    )
    return docs.select(
        F.concat(F.lit("https://"), F.col("source"), F.lit(".test/"),
                 doc_id.cast("string")).alias("url"),
        page.alias("page"),
    )


def table_extract_frame(pages: DataFrame) -> DataFrame:
    """url, page -> url, n_rows, n_cells, table_md (GFM pipe table)."""
    feats = pages.select(
        "url",
        F.expr(f"regexp_extract_all(page, '{ROW_RE}', 1)").alias("rows"),
    ).select(
        "url",
        F.size("rows").cast("long").alias("n_rows"),
        F.expr(
            f"aggregate(rows, 0L, (acc, r) -> "
            f"acc + size(regexp_extract_all(r, '{CELL_RE}', 1)))"
        ).alias("n_cells"),
        F.expr(
            f"transform(rows, r -> concat('| ', array_join("
            f"regexp_extract_all(r, '{CELL_RE}', 1), ' | '), ' |'))"
        ).alias("md_lines"),
        F.expr(
            f"size(regexp_extract_all("
            f"coalesce(try_element_at(rows, 1), ''), '{CELL_RE}', 1))"
        ).alias("n_header_cols"),
    )
    sep = F.concat(
        F.lit("| "),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.col("n_header_cols")),
                lambda _: F.lit("---"),
            ),
            " | ",
        ),
        F.lit(" |"),
    )
    table_md = F.when(F.col("n_rows") == 0, F.lit("")).otherwise(
        F.concat_ws(
            "\n",
            F.element_at("md_lines", 1),
            sep,
            F.array_join(
                F.slice(F.col("md_lines"), 2, F.greatest(
                    F.col("n_rows") - 1, F.lit(1))),
                "\n",
            ),
        )
    )
    return feats.select(
        "url", "n_rows", "n_cells", table_md.alias("table_md"),
    )


def table_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return table_extract_frame(synth_table_pages(docs))


def _sqlh(salt: str) -> str:
    return sql_hash60(f"doc_id || ':{salt}'")


TABLE_EXTRACT_SQL = f"""
WITH pages AS (
  SELECT 'https://' || source || '.test/' || doc_id AS url,
    '<html><body><p>' || text || '</p>'
    || CASE WHEN {_sqlh("tbl")} % 4 = 0 THEN ''
            WHEN {_sqlh("tbl")} % 4 = 1 THEN
              '<table><tr><th>key</th><th>value</th></tr>'
              || '<tr><td>id</td><td>' || doc_id || '</td></tr>'
              || '<tr><td>lang</td><td>' || lang || '</td></tr>'
              || '<tr><td>source</td><td>' || source || '</td></tr>'
              || '</table>'
            ELSE
              '<table><tr><th>key</th><th>value</th></tr>'
              || '<tr><td>id</td><td>' || doc_id || '</td></tr>'
              || '<tr><td>lang</td><td>' || lang || '</td></tr>'
              || '</table>'
       END
    || '</body></html>' AS page
  FROM documents
),
f AS (
  SELECT url,
         regexp_extract_all(page, '{ROW_RE}', 1) AS rws
  FROM pages
),
g AS (
  SELECT url,
         len(rws)::BIGINT AS n_rows,
         coalesce(list_sum(list_transform(rws,
             r -> len(regexp_extract_all(r, '{CELL_RE}', 1)))), 0
         )::BIGINT AS n_cells,
         list_transform(rws, r -> '| ' || array_to_string(
             regexp_extract_all(r, '{CELL_RE}', 1), ' | ') || ' |'
         ) AS md_lines,
         CASE WHEN len(rws) >= 1 THEN
           len(regexp_extract_all(rws[1], '{CELL_RE}', 1))
         ELSE 0 END AS n_header_cols
  FROM f
)
SELECT url, n_rows, n_cells,
       CASE WHEN n_rows = 0 THEN ''
            ELSE md_lines[1] || chr(10)
                 || '| ' || array_to_string(list_transform(
                        range(1, n_header_cols + 1), x -> '---'), ' | ')
                 || ' |' || chr(10)
                 || array_to_string(
                        list_slice(md_lines, 2, len(md_lines)), chr(10))
       END AS table_md
FROM g
"""


QUERIES: dict[str, tuple] = {
    "web_table_extract": (table_extract, TABLE_EXTRACT_SQL),
}
