"""Rmgarbage OCR-garbage token detection (Taghva, Nartker, Borsack &
Condit, "Automatic removal of garbage strings in OCR text" — the
post-OCR cleanup pass digitization pipelines run between OCR output and
indexing/training).  This is the OCR-side quality twin of the HTML
extractor families: the reference's pipeline produces OCR markdown
(``pdf/parser.py``), and at crawl scale a fraction of PDF payloads
come back as garbage strings this filter exists to catch.

Frozen rule set (a deterministic subset of the paper's rules; each a
pure regex/integer predicate over a whitespace token, case preserved):

- **L** (long): more than 40 characters;
- **A** (alnum): alphanumeric chars are a minority —
  ``2 * n_alnum < n_chars``;
- **R** (repeat): 4+ identical consecutive characters, frozen to the
  closed alphabet ``[a-z0-9;]`` (RE2 — the DuckDB dual's engine — has
  no backreferences, so the rule is an explicit alternation over the
  alphabet; documented simplification);
- **V** (vowels): 3+ all-letter token with no vowel or no consonant;
- **P** (punct): 2+ non-alphanumeric characters strictly inside the
  token (first/last char exempt, the paper's interior-punctuation
  rule);
- **C** (case): a lowercase letter immediately followed by an
  uppercase one.

A token is garbage iff ANY rule fires; the operator emits per-document
rule counts and the exact garbage ratio in integer micro-units.

Plan shape (the scale story): the whole operator is ONE codegen
projection in the scan task — token split plus six ``size(filter(...))``
higher-order counts over a STAGED token array (HOF lambdas are
interpreted with no CSE, so the split must not re-run per rule); zero
hash exchanges, zero joins, zero Python (plan-asserted; the round-robin
input spread is the only movement).

The driver corpus is clean text, so the registered query plants OCR
noise deterministically: five garbage archetypes (one per rule family,
several firing multiple rules at once — the paper's own observation)
are appended per document under independent hash rolls with modulus 3,
leaving ~13% of documents noise-free so the zero polarity is also
driver-certified.

Reference scope anchor: beyond-reference web-scale operator; the OCR
surface it guards is the reference's ``src/core/pdf-to-md.ts`` pipeline
(ported in ``paper2llm_spark/pdf/``).
"""

from __future__ import annotations

import string

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, sql_hash60

MICRO = 1_000_000
MAX_TOKEN_LEN = 40

# explicit 4-repeat alternation over the frozen alphabet (RE2-safe)
_REPEAT4 = "|".join(f"{c}{{4}}" for c in string.ascii_lowercase
                    + string.digits + ";")
_ALLLETTER = "^[A-Za-z]{3,}$"
_VOWEL = "[AEIOUaeiou]"
_CONSONANT = "[B-DF-HJ-NP-TV-Zb-df-hj-np-tv-z]"
_CASEFLIP = "[a-z][A-Z]"

# one archetype per rule family; several fire multiple rules at once
GARBAGE = {
    "gl": "i" * 45,       # L + R + V (no consonant)
    "gp": "a;;b;;c",      # P + A
    "gv": "bcdfgh",       # V (no vowel)
    "gc": "aBcDeFgH",     # C
    "ga": ")(*&^%$(",     # A + P
}


def _h(doc_id: Column, salt: str) -> Column:
    return portable_hash60(
        F.concat(doc_id.cast("string"), F.lit(":" + salt))
    )


def synth_ocr_text(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, ocr_text) with hash-rolled planted noise;
    byte-identical in the DuckDB dual."""
    doc_id = F.col("doc_id")
    parts = [F.col("text")]
    for salt, tok in GARBAGE.items():
        parts.append(
            F.when(_h(doc_id, salt) % 3 == 0, F.lit(" " + tok))
            .otherwise(F.lit(""))
        )
    return docs.select("doc_id", F.concat(*parts).alias("ocr_text"))


def _n_alnum(t: Column) -> Column:
    return F.length(F.regexp_replace(t, "[^A-Za-z0-9]", ""))


def _interior_punct(t: Column) -> Column:
    inner = t.substr(F.lit(2), F.greatest(F.length(t) - 2, F.lit(0)))
    return F.length(F.regexp_replace(inner, "[A-Za-z0-9]", ""))


_RULES = {
    "l": lambda t: F.length(t) > MAX_TOKEN_LEN,
    "a": lambda t: 2 * _n_alnum(t) < F.length(t),
    "r": lambda t: t.rlike(_REPEAT4),
    "v": lambda t: t.rlike(_ALLLETTER)
    & (~t.rlike(_VOWEL) | ~t.rlike(_CONSONANT)),
    "p": lambda t: _interior_punct(t) >= 2,
    "c": lambda t: t.rlike(_CASEFLIP),
}


def garbage_frame(docs: DataFrame) -> DataFrame:
    """(doc_id, ocr_text) -> per-document Rmgarbage stats."""
    staged = docs.select(
        "doc_id",
        F.filter(
            F.split(F.col("ocr_text"), r"\s+"),
            lambda t: F.length(t) > 0,
        ).alias("toks"),
    )
    toks = F.col("toks")
    counts = [
        F.size(F.filter(toks, rule)).cast("bigint").alias(f"n_rule_{k}")
        for k, rule in _RULES.items()
    ]
    any_rule = F.size(F.filter(
        toks,
        lambda t: (
            _RULES["l"](t) | _RULES["a"](t) | _RULES["r"](t)
            | _RULES["v"](t) | _RULES["p"](t) | _RULES["c"](t)
        ),
    )).cast("bigint")
    return staged.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        any_rule.alias("n_garbage"),
        *counts,
    ).withColumn(
        "garbage_ratio_micro",
        F.expr(f"({MICRO} * n_garbage) div greatest(1, n_tokens)"),
    )


def ocr_garbage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return garbage_frame(synth_ocr_text(docs))


def _sqlh(salt: str) -> str:
    return sql_hash60(f"doc_id || ':{salt}'")


_PLANT_SQL = " || ".join(
    ["text"]
    + [
        f"CASE WHEN {_sqlh(salt)} % 3 = 0 THEN ' {tok}' ELSE '' END"
        for salt, tok in GARBAGE.items()
    ]
)

_SQL_RULES = {
    "l": "length(t) > 40",
    "a": "2 * length(regexp_replace(t, '[^A-Za-z0-9]', '', 'g'))"
         " < length(t)",
    "r": f"regexp_matches(t, '{_REPEAT4}')",
    "v": f"regexp_matches(t, '{_ALLLETTER}') AND"
         f" (NOT regexp_matches(t, '{_VOWEL}')"
         f"  OR NOT regexp_matches(t, '{_CONSONANT}'))",
    "p": "length(regexp_replace(substr(t, 2, greatest(length(t) - 2, 0)),"
         " '[A-Za-z0-9]', '', 'g')) >= 2",
    "c": f"regexp_matches(t, '{_CASEFLIP}')",
}

_ANY_SQL = " OR ".join(f"({r})" for r in _SQL_RULES.values())

_COUNT_COLS = ",\n       ".join(
    f"len(list_filter(toks, t -> {rule}))::BIGINT AS n_rule_{k}"
    for k, rule in _SQL_RULES.items()
)

OCR_GARBAGE_SQL = f"""
WITH planted AS (
  SELECT doc_id, {_PLANT_SQL} AS ocr_text FROM documents
),
staged AS (
  SELECT doc_id,
         list_filter(string_split_regex(ocr_text, '\\s+'),
                     t -> length(t) > 0) AS toks
  FROM planted
)
SELECT doc_id,
       len(toks)::BIGINT AS n_tokens,
       len(list_filter(toks, t -> {_ANY_SQL}))::BIGINT AS n_garbage,
       {_COUNT_COLS},
       (({MICRO} * len(list_filter(toks, t -> {_ANY_SQL})))
          // greatest(1, len(toks)))::BIGINT AS garbage_ratio_micro
FROM staged
"""


QUERIES: dict[str, tuple] = {
    "text_ocr_garbage": (ocr_garbage, OCR_GARBAGE_SQL),
}
