"""Passage chunking — the retrieval-prep step every RAG / dense-index
pipeline runs after main-content extraction (LangChain's
RecursiveCharacterTextSplitter, LlamaIndex's SentenceSplitter, the
DPR paper's 100-word passages): slide a fixed token window over each
document with a stride smaller than the window so consecutive
passages overlap, and emit one row per passage.

The reference's splitter (`src/core/utils/markdown-splitter.ts`)
cuts ONE document into main/appendix/backmatter sections; this is the
corpus-scale sibling — cut EVERY document into retrieval passages.

Frozen parameters (DPR-ish, scaled to the synthetic corpus's ~50-token
documents): window ``W = 32`` tokens, stride ``S = 24`` (8-token
overlap).  A document with ``n`` tokens yields
``1 + ceil((n - W) / S)`` passages (one if ``n <= W``); passage ``i``
covers tokens ``[i*S, min(i*S + W, n))``.  Empty documents yield no
rows.  All arithmetic is exact integer (``div`` / ``//``), so both
engines count the same chunks.

Plan shape (the scale story): tokenize + count + explode + slice is
ONE generate stage inside the scan task — zero joins, zero exchanges,
zero Python (plan-asserted in test_plan_quality).  At 10^12 documents
the chunker adds only the explode fan-out (~n/S rows per doc) to the
scan; there is nothing to shuffle because every passage is derived
from its own document's row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import SQL_TOKENS, tokens

WINDOW = 32
STRIDE = 24


def passage_chunks_frame(docs: DataFrame) -> DataFrame:
    """doc_id, text -> one row per overlapping token-window passage."""
    toked = docs.select(
        "doc_id", tokens(F.col("text")).alias("toks")
    ).withColumn("n", F.size("toks")).where(F.col("n") > 0)
    # 1 + ceil((n - W) / S) chunks, exact integer math on both engines
    n_chunks = (
        F.when(F.col("n") <= WINDOW, F.lit(1))
        .otherwise(
            F.expr(f"(n - {WINDOW} + {STRIDE - 1}) div {STRIDE} + 1")
        )
    )
    exploded = toked.select(
        "doc_id", "toks", "n",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    tok_start = F.col("chunk_idx") * STRIDE
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        tok_start.cast("long").alias("tok_start"),
        F.least(F.lit(WINDOW), F.col("n") - tok_start)
        .cast("long").alias("n_tokens"),
        F.array_join(
            F.slice(F.col("toks"), tok_start + 1, WINDOW), " "
        ).alias("chunk_text"),
    )


def passage_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return passage_chunks_frame(docs)


_TOKS = SQL_TOKENS.format(expr="text")

PASSAGE_CHUNKS_SQL = f"""
WITH t AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
),
c AS (
  SELECT doc_id, toks, len(toks)::BIGINT AS n FROM t WHERE len(toks) > 0
),
g AS (
  SELECT doc_id, toks, n,
         unnest(range(0,
             CASE WHEN n <= {WINDOW} THEN 1
                  ELSE (n - {WINDOW} + {STRIDE - 1}) // {STRIDE} + 1
             END)) AS chunk_idx
  FROM c
)
SELECT doc_id,
       chunk_idx::BIGINT AS chunk_idx,
       (chunk_idx * {STRIDE})::BIGINT AS tok_start,
       least({WINDOW}, n - chunk_idx * {STRIDE})::BIGINT AS n_tokens,
       array_to_string(
           list_slice(toks, chunk_idx * {STRIDE} + 1,
                      chunk_idx * {STRIDE} + {WINDOW}), ' ') AS chunk_text
FROM g
"""


QUERIES: dict[str, tuple] = {
    "text_passage_chunks": (passage_chunks, PASSAGE_CHUNKS_SQL),
}
