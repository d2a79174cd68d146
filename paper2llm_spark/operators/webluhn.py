"""Luhn-validated payment-card detection (ISO/IEC 7812; Luhn 1960,
US patent 2,950,048) — the checksum upgrade over regex-only PII
scanning.  A bare 16-digit regex flags order numbers, tracking ids
and timestamps; production scrubbers (Presidio's credit-card
recognizer, scrubadub) validate the Luhn check digit first, which
kills ~90% of random-digit false positives (only 1 in 10 random
numbers passes).  Complements this repo's regex PII battery
(webpii.py) with the checksum tier.

Semantics (frozen): candidates are MAXIMAL digit runs of length
13-19 (PAN lengths per ISO/IEC 7812) — maximal via splitting on
non-digits, never a lookaround (RE2 has none, the webgarbage.py
portability rule); Luhn: from the RIGHT, double every second digit,
subtract 9 when the double exceeds 9, valid iff the total is
divisible by 10 — computed as an exact integer HOF fold over the
digit positions.  Per doc: ``n_candidates``, ``n_luhn_valid``, and
``pan_flag = n_luhn_valid > 0``.

The corpus has no card numbers: the registered query plants both
polarities in-engine — hash roll 0 mod 6 appends the classic valid
test PAN 4111111111111111, roll 1 mod 6 its off-by-one invalid twin
(candidate but NOT valid), roll 2 mod 6 a 12-digit run (too short —
never a candidate).

Plan shape (the scale story): planting, the digit-run split, and the
per-candidate Luhn fold are ONE projection of array HOFs riding the
scan — zero exchanges, zero joins, zero Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, sql_hash60

PAN_MIN, PAN_MAX = 13, 19
VALID_PAN = "4111111111111111"
INVALID_PAN = "4111111111111112"


def _h(doc_id: Column, salt: str) -> Column:
    return portable_hash60(F.concat(doc_id.cast("string"), F.lit(":" + salt)))


def _planted(docs: DataFrame) -> DataFrame:
    roll = _h(F.col("doc_id"), "luhn") % 6
    return docs.select(
        "doc_id",
        F.when(roll == 0, F.concat(F.col("text"), F.lit(" " + VALID_PAN)))
        .when(roll == 1, F.concat(F.col("text"), F.lit(" " + INVALID_PAN)))
        .when(roll == 2, F.concat(F.col("text"), F.lit(" 411111111111")))
        .otherwise(F.col("text"))
        .alias("text"),
    )


def luhn_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return luhn_frame(_planted(docs))


def _digit(s: Column, i: Column) -> Column:
    return F.substr(s, i, F.lit(1)).cast("int")


def luhn_frame(docs: DataFrame) -> DataFrame:
    runs = F.filter(
        F.split(F.col("text"), "[^0-9]+"),
        lambda s: (F.length(s) >= PAN_MIN) & (F.length(s) <= PAN_MAX),
    )
    staged = docs.select("doc_id", runs.alias("runs"))
    # Luhn per candidate: double every second digit from the RIGHT,
    # subtract 9 when the double exceeds 9 — all exact integers
    valid = F.filter(
        F.col("runs"),
        lambda s: F.aggregate(
            F.sequence(F.lit(1), F.length(s)),
            F.lit(0),
            lambda acc, i: acc
            + F.when(
                (F.length(s) - i) % 2 == 1,
                F.when(
                    _digit(s, i) * 2 > 9, _digit(s, i) * 2 - 9
                ).otherwise(_digit(s, i) * 2),
            ).otherwise(_digit(s, i)),
        )
        % 10
        == 0,
    )
    return staged.select(
        "doc_id",
        F.size("runs").cast("bigint").alias("n_candidates"),
        F.size(valid).cast("bigint").alias("n_luhn_valid"),
        (F.size(valid) > 0).alias("pan_flag"),
    )


_ROLL = sql_hash60("doc_id || ':luhn'")

LUHN_SQL = f"""
WITH planted AS (
  SELECT doc_id,
         CASE ({_ROLL}) % 6
           WHEN 0 THEN text || ' {VALID_PAN}'
           WHEN 1 THEN text || ' {INVALID_PAN}'
           WHEN 2 THEN text || ' 411111111111'
           ELSE text END AS text
  FROM documents
),
staged AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '[^0-9]+'),
                     s -> length(s) BETWEEN {PAN_MIN} AND {PAN_MAX}) AS runs
  FROM planted
),
v AS (
  SELECT doc_id, runs,
         list_filter(runs, s ->
           list_sum(list_transform(range(1, length(s) + 1), i ->
             CASE WHEN (length(s) - i) % 2 = 1
                  THEN CASE WHEN substr(s, i, 1)::INT * 2 > 9
                            THEN substr(s, i, 1)::INT * 2 - 9
                            ELSE substr(s, i, 1)::INT * 2 END
                  ELSE substr(s, i, 1)::INT END)) % 10 = 0) AS ok
  FROM staged
)
SELECT doc_id,
       len(runs)::BIGINT AS n_candidates,
       len(ok)::BIGINT AS n_luhn_valid,
       len(ok) > 0 AS pan_flag
FROM v
"""


QUERIES: dict[str, tuple] = {
    "text_luhn_scan": (luhn_scan, LUHN_SQL),
}
