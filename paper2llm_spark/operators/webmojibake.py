"""Mojibake detection + repair — the encoding-damage fixer (ftfy's
core use-case): UTF-8 bytes decoded as cp1252/Latin-1 turn ``\\u00e9``
into ``\\u00c3\\u00a9`` and the curly apostrophe into a 3-codepoint
``\\u00e2\\u20ac\\u2122`` sequence; web corpora are full of it (ftfy
was built for exactly this, and CCNet-style pipelines run an
equivalent scrub), and a repair table of the most frequent damaged
digraphs recovers the overwhelming majority of the damage.

Semantics (frozen): a fixed, ordered 12-entry repair table — the 9
most common damaged accented letters (e-acute, e-grave, a-grave,
a/o/u-umlaut, n-tilde, c-cedilla, i-diaeresis) plus the curly
apostrophe / opening curly quote / em-dash trio — derived at import
time from the REAL double-decode (encode UTF-8, re-decode cp1252 with
latin-1 fallback for cp1252's 5 undefined bytes), so no hand-typed
mojibake can be subtly wrong (the damaged form of a-grave ends in
U+00A0 NBSP, not a space).  ``n_markers`` counts the telltale lead
sequences (U+00C3, U+00E2+U+20AC, U+00C2) on the ORIGINAL text via
replace-diff; ``n_fixed`` sums per-entry occurrence counts (also
replace-diff, before repair); the repair is the chained ``replace()``
of every table entry in order.  No entry's output can create another
entry's input (outputs are plain accented letters and punctuation),
so the chain is effectively order-insensitive, but the order is
frozen anyway.  Both engines run the identical chain, and the dual
hashes the repaired text (md5) so the repair is checked
byte-for-byte.

The driver corpus is clean ASCII, so the registered query plants
damage in-engine: a 3-way hash roll appends one of two damaged
phrases (the second contains a sharp-s whose damage is OUTSIDE the
table — the detected-but-unrepaired residue branch) or nothing, with
the plant derived from ``doc_id`` identically in the DuckDB dual.

Plan shape (the scale story): marker counts + the 12-deep replace
chain are ONE codegen projection in the scan task — zero joins, zero
exchanges, zero Python (plan-asserted).  ``replace`` on literal
needles stays in whole-stage codegen, so at 10^12 documents the
repair rides the ingest scan next to NFC normalization
(operators/webnormalize.py), which this pass logically precedes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, sql_hash60


def _double_decode(s: str) -> str:
    """The classic damage: UTF-8 bytes re-decoded as cp1252 (latin-1
    for the 5 bytes cp1252 leaves undefined)."""
    out = []
    for b in s.encode("utf-8"):
        try:
            out.append(bytes([b]).decode("cp1252"))
        except UnicodeDecodeError:
            out.append(chr(b))
    return "".join(out)


_FIXED_CHARS = [
    "é",  # e-acute
    "è",  # e-grave
    "à",  # a-grave (damaged form ends in NBSP)
    "ä",  # a-umlaut
    "ö",  # o-umlaut
    "ü",  # u-umlaut
    "ñ",  # n-tilde
    "ç",  # c-cedilla
    "ï",  # i-diaeresis
    "’",  # right single quote (3-codepoint damage)
    "“",  # left double quote (3-codepoint damage)
    "—",  # em-dash (3-codepoint damage)
]

# (damaged, repaired), damage derived — correct by construction.
REPAIRS: list[tuple[str, str]] = [
    (_double_decode(c), c) for c in _FIXED_CHARS
]

MARKERS = ["Ã", "â€", "Â"]

# plant A: accents + the full 3-codepoint trio; plant B: remaining
# accents AND a sharp-s, whose damage is NOT in the table (residue).
_PLANT_A = " " + _double_decode(
    "Café déjà vu — it’s “quoted’ "
    "naïve."
)
_PLANT_B = " " + _double_decode(
    "résumé français süß mañana "
    "mère spät."
)


def _count_occurrences(col: Column, needle: str) -> Column:
    width = len(needle)
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit(""))))
        / width
    ).cast("long")


def _sql_count(expr: str, needle: str) -> str:
    lit = needle.replace("'", "''")
    return (
        f"((length({expr}) - length(replace({expr}, '{lit}', '')))"
        f" // {len(needle)})"
    )


def mojibake_frame(docs: DataFrame) -> DataFrame:
    """doc_id, text -> marker/fix counts + md5 of the repaired text."""
    body = F.col("text")
    n_markers = F.lit(0).cast("long")
    for m in MARKERS:
        n_markers = n_markers + _count_occurrences(body, m)
    n_fixed = F.lit(0).cast("long")
    repaired = body
    for damaged, fixed in REPAIRS:
        n_fixed = n_fixed + _count_occurrences(body, damaged)
        repaired = F.replace(repaired, F.lit(damaged), F.lit(fixed))
    return docs.select(
        "doc_id",
        n_markers.alias("n_markers"),
        n_fixed.alias("n_fixed"),
        F.when(n_markers >= 1, 1).otherwise(0).cast("long")
        .alias("is_mojibake"),
        F.length(repaired).cast("long").alias("repaired_len"),
        F.md5(repaired).alias("repaired_md5"),
    )


def synth_mojibake_docs(docs: DataFrame) -> DataFrame:
    roll = portable_hash60(
        F.concat(F.col("doc_id").cast("string"), F.lit(":moji"))
    ) % 3
    planted = (
        F.when(roll == 0, F.concat(F.col("text"), F.lit(_PLANT_A)))
        .when(roll == 1, F.concat(F.col("text"), F.lit(_PLANT_B)))
        .otherwise(F.col("text"))
    )
    return docs.select("doc_id", planted.alias("text"))


def mojibake_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return mojibake_frame(synth_mojibake_docs(docs))


_ROLL = sql_hash60("doc_id || ':moji'")


def _sql_lit(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _build_sql() -> str:
    plant = (
        f"CASE WHEN {_ROLL} % 3 = 0 THEN text || {_sql_lit(_PLANT_A)}"
        f" WHEN {_ROLL} % 3 = 1 THEN text || {_sql_lit(_PLANT_B)}"
        " ELSE text END"
    )
    markers = " + ".join(_sql_count("body", m) for m in MARKERS)
    fixes = " + ".join(_sql_count("body", d) for d, _f in REPAIRS)
    repaired = "body"
    for damaged, fixed in REPAIRS:
        repaired = (
            f"replace({repaired}, {_sql_lit(damaged)}, {_sql_lit(fixed)})"
        )
    return f"""
WITH planted AS (
  SELECT doc_id, {plant} AS body FROM documents
),
f AS (
  SELECT doc_id,
         ({markers})::BIGINT AS n_markers,
         ({fixes})::BIGINT AS n_fixed,
         {repaired} AS repaired
  FROM planted
)
SELECT doc_id, n_markers, n_fixed,
       (CASE WHEN n_markers >= 1 THEN 1 ELSE 0 END)::BIGINT AS is_mojibake,
       length(repaired)::BIGINT AS repaired_len,
       md5(repaired) AS repaired_md5
FROM f
"""


MOJIBAKE_SQL = _build_sql()


QUERIES: dict[str, tuple] = {
    "text_mojibake_repair": (mojibake_repair, MOJIBAKE_SQL),
}
