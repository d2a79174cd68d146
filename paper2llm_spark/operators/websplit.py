"""Deterministic salted-hash train/val/test split assignment — the
leakage-free split every training pipeline needs before anything else
touches the data.  Random splits are irreproducible across reruns and
leak when the corpus is re-deduplicated or re-sharded; the standard
answer (TFDS split slicing, Hive bucketed sampling, every feature
store's "hash of entity id" rule) is a SALTED HASH of the stable
document key: membership depends only on the id, so adding or
removing other documents never reshuffles anyone, and a changed salt
is an explicit, auditable resplit.

Semantics (frozen): ``bucket = hash60(doc_id || ':split:v1') % 1000``
(the repo's portable 60-bit md5 hash — engine-identical); ``split =
train`` for bucket < 900, ``val`` for bucket < 950, else ``test``
(90/5/5).  ``lang`` is carried so the dual certifies per-language
stratification counts downstream; the salt string is versioned into
the key so a deliberate resplit is a visible constant change, never a
silent drift.

Plan shape (the scale story): ONE codegen projection in the scan
task — md5 + modulo + two comparisons; zero exchanges, zero joins,
zero Python (plan-asserted).  The 90/5/5 proportions at corpus scale
follow from hash uniformity; the pytest gate checks the tolerance
band at fixture scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, sql_hash60

SPLIT_SALT = ":split:v1"
TRAIN_PER_MILLE = 900
VAL_PER_MILLE = 950


def split_frame(docs: DataFrame) -> DataFrame:
    bucket = (
        portable_hash60(
            F.concat(F.col("doc_id").cast("string"), F.lit(SPLIT_SALT))
        )
        % 1000
    )
    return docs.select(
        "doc_id",
        "lang",
        bucket.cast("bigint").alias("bucket"),
        F.when(bucket < TRAIN_PER_MILLE, F.lit("train"))
        .when(bucket < VAL_PER_MILLE, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    return split_frame(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )


_B = sql_hash60(f"doc_id::VARCHAR || '{SPLIT_SALT}'") + " % 1000"

SPLIT_ASSIGN_SQL = f"""
SELECT doc_id, lang,
       ({_B})::BIGINT AS bucket,
       CASE WHEN {_B} < {TRAIN_PER_MILLE} THEN 'train'
            WHEN {_B} < {VAL_PER_MILLE} THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


QUERIES: dict[str, tuple] = {
    "corpus_split_assign": (split_assign, SPLIT_ASSIGN_SQL),
}
