"""Line-wrap dehyphenation repair — the classic PDF/OCR extraction
fix-up (pdfminer's and trafilatura's dehyphenation pass; GROBID and
Grotoap do the same before tokenization): a PDF layout engine wraps
``over-\\nthe-\\nline`` at the column edge and a faithful text dump
keeps the soft hyphen + newline, corrupting every affected token.
In the reference's world this is the seam between OCR markdown and
the assembled page text (src/core/markdown-processor.ts joins page
chunks verbatim); a web-scale extraction tier must repair wraps
BEFORE tokenization or every downstream signal (token counts, BPE
fertility, n-gram dedup) sees phantom vocabulary.

Semantics (frozen): a *soft break* is lowercase letter + ``-`` +
newline + lowercase letter; repair removes the hyphen AND the
newline, fusing the halves (``([a-z])-\\n([a-z])`` -> ``$1$2``).
Uppercase on either side is treated as a hard hyphen (proper nouns,
"X-\\nray") and left alone.  Matches are non-overlapping, so a chain
``a-\\nb-\\nc`` repairs the first break only (the consumed ``b``
cannot start the next match) — frozen, and identical in both RE2
and Java regex.  Emit per doc the repair count and the md5 of the
repaired body so the dual checks the rebuilt bytes.

Cross-engine mapping: the pattern string ``[a-z]-\\n[a-z]`` is
shipped with a LITERAL backslash-n so Java regex (Spark) and RE2
(DuckDB) both interpret the escape themselves; replacement backrefs
are ``$1$2`` (Java) vs ``\\1\\2`` + the ``'g'`` flag (RE2) — same
rewrite.

The driver corpus is single-line prose, so the registered query
plants damage in-engine by hash roll: roll 0 splices ``-\\n`` into
the middle of the doc (repairs only if both neighbours are
lowercase — exercises the hard-hyphen branch on real text), roll 1
appends a tail with two guaranteed soft breaks, roll 2 leaves the
doc alone (0 repairs).  Identical plant in the dual.

Plan shape (the scale story): per-document local work — zero joins,
zero exchanges, zero Python (plan-asserted); two regexp passes and
an md5 inside the scan task.  At 100 TB the operator is
embarrassingly parallel and the only cost is the RE2/Java regex
scan, linear in corpus bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, sql_hash60

# literal backslash-n: the REGEX ENGINE interprets the escape, so the
# same pattern text means the same thing to Java regex and RE2.
_BREAK = "([a-z])-\\n([a-z])"

_TAIL = " over-\nthe-\nline wrap"  # two guaranteed soft breaks
_TAIL_SQL = _TAIL.replace("\n", "' || chr(10) || '")


def dehyphenate_frame(docs: DataFrame) -> DataFrame:
    """doc_id, text -> repair count + md5 of the dehyphenated body."""
    n = F.size(F.regexp_extract_all(F.col("text"), F.lit(_BREAK), F.lit(0)))
    repaired = F.regexp_replace(F.col("text"), _BREAK, "$1$2")
    return docs.select(
        "doc_id",
        n.cast("long").alias("n_repairs"),
        F.md5(repaired).alias("repaired_md5"),
    )


def synth_wrapped_docs(docs: DataFrame) -> DataFrame:
    roll = portable_hash60(
        F.concat(F.col("doc_id").cast("string"), F.lit(":hyph"))
    ) % 3
    spliced = F.concat(
        F.expr("substr(text, 1, least(40, length(text) div 2))"),
        F.lit("-\n"),
        F.expr("substr(text, least(40, length(text) div 2) + 1)"),
    )
    planted = (
        F.when(roll == 0, spliced)
        .when(roll == 1, F.concat(F.col("text"), F.lit(_TAIL)))
        .otherwise(F.col("text"))
    )
    return docs.select("doc_id", planted.alias("text"))


def dehyphenate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return dehyphenate_frame(synth_wrapped_docs(docs))


_ROLL = sql_hash60("doc_id || ':hyph'")

DEHYPHENATE_SQL = f"""
WITH planted AS (
  SELECT doc_id,
    CASE
      WHEN {_ROLL} % 3 = 0 THEN
        substr(text, 1, least(40, length(text) // 2))
        || '-' || chr(10)
        || substr(text, least(40, length(text) // 2) + 1)
      WHEN {_ROLL} % 3 = 1 THEN text || '{_TAIL_SQL}'
      ELSE text
    END AS body
  FROM documents
)
SELECT doc_id,
       length(regexp_extract_all(body, '([a-z])-\\n([a-z])'))::BIGINT
         AS n_repairs,
       md5(regexp_replace(body, '([a-z])-\\n([a-z])', '\\1\\2', 'g'))
         AS repaired_md5
FROM planted
"""


QUERIES: dict[str, tuple] = {
    "text_dehyphenate": (dehyphenate, DEHYPHENATE_SQL),
}
