"""Language-ID confusion matrix — the eval table of the n-gram
language identifier against the corpus's labeled ``lang`` column
(the standard langid benchmark read-out: Lui & Baldwin ACL 2012
report exactly per-class precision/recall from this matrix; CCNet
and every multilingual curation pipeline audit their fastText LID
the same way before trusting per-language routing).

Composes `text_lang_id`'s classifier verbatim (`with_lang`, the
same fused marker-score projection the curation pipeline uses) —
the confusion table transitively re-certifies the classifier under
a second driver row, now against ground truth.

Semantics (frozen): cell = (true ``lang``, predicted ``pred_lang``)
with ``n`` docs; ``recall_micro = n * 1e6 div row_total`` where
``row_total`` is the true-language row sum (the diagonal cell's
value IS per-class recall); ``hit`` marks the diagonal.  Output one
row per non-empty cell.

Plan shape (the scale story): prediction is the scan-side marker
fold (zero joins — the true label rides the SAME row, never a
second corpus pass); ONE corpus-sized exchange — the map-side-
combinable ``groupBy(lang, pred_lang)`` collapsing 10^12 docs to
|langs|^2 short rows; row totals via a window over that bounded
cell table.  Zero Python, ``text`` pruned to the token column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import tokens
from .textstats import LANG_ID_SQL, with_lang

MICRO = 1_000_000


def langid_confusion_frame(docs: DataFrame) -> DataFrame:
    staged = docs.select(
        "doc_id", "lang", tokens(F.col("text")).alias("toks")
    )
    cells = (
        with_lang(staged)
        .groupBy("lang", "pred_lang")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    w = Window.partitionBy("lang")
    return cells.select(
        "lang",
        "pred_lang",
        "n",
        F.expr(f"n * {MICRO} div sum(n) over (partition by lang)")
        .cast("bigint")
        .alias("recall_micro"),
        (F.col("lang") == F.col("pred_lang")).alias("hit"),
    )


def langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return langid_confusion_frame(docs)


LANGID_CONFUSION_SQL = f"""
WITH p AS ({LANG_ID_SQL}),
cells AS (
  SELECT d.lang, p.pred_lang, count(*)::BIGINT AS n
  FROM p JOIN documents d USING (doc_id)
  GROUP BY 1, 2
)
SELECT lang, pred_lang, n,
       (n * {MICRO} // sum(n) OVER (PARTITION BY lang))::BIGINT
         AS recall_micro,
       lang = pred_lang AS hit
FROM cells
"""


QUERIES: dict[str, tuple] = {
    "ml_langid_confusion": (langid_confusion, LANGID_CONFUSION_SQL),
}
