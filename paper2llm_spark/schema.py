"""Spark schemas — the §1.4 data model of SURVEY.md.

OcrImage/OcrPage/OcrResult mirror ``src/types/interfaces.ts:103-132`` of
the reference; the pages input shape is the BASELINE.json ``input_hint``.
Image descriptions travel as ``array<struct<id,desc>>`` rather than
``MapType`` (Arrow boundary caveat, SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql import types as T

OCR_IMAGE = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("base64", T.StringType()),
        T.StructField("top_left_x", T.IntegerType()),
        T.StructField("top_left_y", T.IntegerType()),
        T.StructField("bottom_right_x", T.IntegerType()),
        T.StructField("bottom_right_y", T.IntegerType()),
    ]
)

PAGE_DIMENSIONS = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("dpi", T.IntegerType()),
    ]
)

# one row per parsed page — the unit of parallelism between the parse
# stage and the groupBy-sort reassembly (shuffle #2 of SURVEY.md §3.4)
PAGE_ROW = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("page_index", T.IntegerType()),
        T.StructField("page_markdown", T.StringType()),
        T.StructField("images", T.ArrayType(OCR_IMAGE)),
        T.StructField("dimensions", PAGE_DIMENSIONS),
        T.StructField("model", T.StringType()),
        T.StructField("err", T.StringType()),
        T.StructField("bytes_in", T.LongType()),
        T.StructField("parse_partition", T.IntegerType()),
        T.StructField("parse_wall_ms", T.LongType()),
    ]
)

# chunk plan rows (skew split of large PDFs by page ranges)
CHUNK_ROW = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("page_lo", T.IntegerType()),
        T.StructField("page_hi", T.IntegerType()),
        T.StructField("n_pages", T.IntegerType()),
        T.StructField("html", T.BinaryType()),
    ]
)

TITLE_VALIDATION = T.StructType(
    [
        T.StructField("matches", T.BooleanType()),
        T.StructField("original_title", T.StringType()),
        T.StructField("bibtex_title", T.StringType()),
        T.StructField("normalized_original", T.StringType()),
        T.StructField("normalized_bibtex", T.StringType()),
    ]
)

SECTIONS = T.StructType(
    [
        T.StructField("main_content", T.StringType()),
        T.StructField("backmatter", T.StringType()),
        T.StructField("appendix", T.StringType()),
        T.StructField("title", T.StringType()),
    ]
)

BIBTEX_RESULT = T.StructType(
    [
        T.StructField("bibtex", T.StringType()),
        T.StructField("bibtex_key", T.StringType()),
        T.StructField("bibtex_formatted", T.StringType()),
        T.StructField("title_validation", TITLE_VALIDATION),
    ]
)

DESC_ENTRY = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("desc", T.StringType()),
    ]
)

LINEAGE = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("url_range", T.StringType()),
        T.StructField("doc_count", T.LongType()),
        T.StructField("bytes_in", T.LongType()),
        T.StructField("bytes_out", T.LongType()),
        T.StructField("wall_ms", T.LongType()),
        T.StructField("run_id", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

CHECKPOINT = T.StructType(
    [
        T.StructField("bucket", T.IntegerType()),
        T.StructField("status", T.StringType()),
        T.StructField("run_id", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)
