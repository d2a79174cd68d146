"""Code-vs-prose detection — the corpus-routing signal every
training-data pipeline computes before mixing (The Stack / StarCoder
route code to their own pipeline; C4 and Gopher *remove* code-ish
lines from prose; RedPajama-v2 carries a ``curly_bracket`` ratio for
the same reason).

Heuristic battery, all exact-integer and engine-portable:

* **symbol density** — count of the 8 code-y symbols ``; { } ( ) = <
  >`` per mille of characters (counted by replace-diff, which both
  engines implement identically);
* **keyword hits** — how many of 6 language keywords (``def ``,
  ``return``, ``import ``, ``function``, ``const ``, ``#include``)
  appear at least once (substring LIKE, identical in both engines);
* **indent lines** — count of newline-followed-by-4-spaces
  occurrences (replace-diff / 4, non-overlapping in both engines).

Verdict (frozen rule): ``is_code = 1`` iff ``symbol_permille >= 25``
AND ``kw_hits >= 1``, OR ``kw_hits >= 3``.  Thresholds are integers
compared against exact integer cross-products — no floats anywhere.

The driver corpus is pure prose, so the registered query plants code
in-engine: a 3-way hash roll appends a Python-ish block, a JS-ish
block, or nothing — both code families and the prose class are
exercised, and the plant happens identically in the DuckDB dual.

Plan shape (the scale story): ONE codegen projection in the scan task
— zero joins, zero exchanges, zero Python (plan-asserted).  This is
the same shape RedPajama-v2 uses to compute its 40+ signals over
5 trillion tokens: signals ride the ingest scan for free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, sql_hash60

SYMBOLS = [";", "{", "}", "(", ")", "=", "<", ">"]
KEYWORDS = ["def ", "return", "import ", "function", "const ", "#include"]

_PY_BLOCK = (
    "\ndef compute(x):\n    y = (x * 2);\n    return y + 1;\n"
)
_JS_BLOCK = (
    "\nfunction render(el) {\n    const n = el.count;\n"
    "    return n < 10;\n}\n"
)


def _sym_count(col: Column) -> Column:
    total = F.lit(0)
    for s in SYMBOLS:
        total = total + (
            F.length(col) - F.length(F.replace(col, F.lit(s), F.lit("")))
        )
    return total


def _sql_sym_count(expr: str) -> str:
    parts = []
    for s in SYMBOLS:
        lit = s.replace("'", "''")
        parts.append(
            f"(length({expr}) - length(replace({expr}, '{lit}', '')))"
        )
    return "(" + " + ".join(parts) + ")"


def _kw_hits(col: Column) -> Column:
    total = F.lit(0)
    for k in KEYWORDS:
        total = total + F.when(
            col.contains(F.lit(k)), F.lit(1)
        ).otherwise(F.lit(0))
    return total


def _sql_kw_hits(expr: str) -> str:
    parts = [
        f"(CASE WHEN position('{k}' IN {expr}) > 0 THEN 1 ELSE 0 END)"
        for k in KEYWORDS
    ]
    return "(" + " + ".join(parts) + ")"


def code_detect_frame(docs: DataFrame) -> DataFrame:
    """doc_id, text -> exact-integer code signals + frozen verdict."""
    body = F.col("text")
    n_chars = F.greatest(F.length(body), F.lit(1))
    feats = docs.select(
        "doc_id",
        _sym_count(body).cast("long").alias("n_symbols"),
        n_chars.cast("long").alias("n_chars"),
        _kw_hits(body).cast("long").alias("kw_hits"),
        (
            (F.length(body)
             - F.length(F.replace(body, F.lit("\n    "), F.lit("\n"))))
            / 4
        ).cast("long").alias("indent_lines"),
    )
    permille = F.expr("1000 * n_symbols div n_chars")
    is_code = F.when(
        ((permille >= 25) & (F.col("kw_hits") >= 1))
        | (F.col("kw_hits") >= 3),
        F.lit(1),
    ).otherwise(F.lit(0))
    return feats.select(
        "doc_id", "n_symbols", "kw_hits", "indent_lines",
        permille.cast("long").alias("symbol_permille"),
        is_code.cast("long").alias("is_code"),
    )


def synth_code_docs(docs: DataFrame) -> DataFrame:
    roll = portable_hash60(
        F.concat(F.col("doc_id").cast("string"), F.lit(":code"))
    ) % 3
    planted = (
        F.when(roll == 0, F.concat(F.col("text"), F.lit(_PY_BLOCK)))
        .when(roll == 1, F.concat(F.col("text"), F.lit(_JS_BLOCK)))
        .otherwise(F.col("text"))
    )
    return docs.select("doc_id", planted.alias("text"))


def code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return code_detect_frame(synth_code_docs(docs))


_ROLL = sql_hash60("doc_id || ':code'")
_PY_SQL = _PY_BLOCK.replace("\n", "' || chr(10) || '")
_JS_SQL = _JS_BLOCK.replace("\n", "' || chr(10) || '")

CODE_DETECT_SQL = f"""
WITH planted AS (
  SELECT doc_id,
    CASE WHEN {_ROLL} % 3 = 0 THEN text || '{_PY_SQL}'
         WHEN {_ROLL} % 3 = 1 THEN text || '{_JS_SQL}'
         ELSE text END AS body
  FROM documents
),
f AS (
  SELECT doc_id,
         {_sql_sym_count("body")}::BIGINT AS n_symbols,
         greatest(length(body), 1)::BIGINT AS n_chars,
         {_sql_kw_hits("body")}::BIGINT AS kw_hits,
         ((length(body)
           - length(replace(body, chr(10) || '    ', chr(10)))) // 4
         )::BIGINT AS indent_lines
  FROM planted
)
SELECT doc_id, n_symbols, kw_hits, indent_lines,
       (1000 * n_symbols // n_chars)::BIGINT AS symbol_permille,
       (CASE WHEN (1000 * n_symbols // n_chars >= 25 AND kw_hits >= 1)
                  OR kw_hits >= 3
             THEN 1 ELSE 0 END)::BIGINT AS is_code
FROM f
"""


QUERIES: dict[str, tuple] = {
    "text_code_detect": (code_detect, CODE_DETECT_SQL),
}
