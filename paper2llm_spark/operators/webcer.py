"""Character-error-rate audit through a frozen OCR-noise channel —
the eval harness of any OCR/extraction stage (CER/WER per Levenshtein
1966 edit distance is THE post-OCR metric: ICDAR competition scoring,
Rmgarbage's upstream counterpart; this engine's own PDF branch is
exactly the producer such an audit would score).  With no reference
transcription in the corpus, the audit drives a DETERMINISTIC noise
channel over the text and scores the channel — certifying the metric
machinery (edit distance, normalization, micro rates) end-to-end so a
real (reference, hypothesis) column pair drops straight in.

Semantics (frozen): reference = the document text with every
non-ASCII char replaced by ``?`` (DuckDB's ``levenshtein`` counts
BYTES while Spark's counts CHARS — the ASCII normalization makes the
two identical by construction; the fixture is pure ASCII so the
replace is a no-op there).  Noise channel, applied in order:

1. substitution: ``translate(ref, 'u', 'v')``  (OCR u/v confusion)
2. deletion: every ``'th'`` -> ``'t'``  (dropped-glyph shape;
   global replace — DuckDB needs the explicit ``'g'`` flag)

Output per doc: ``n_chars`` (reference length), ``edit_dist`` (exact
Levenshtein), ``cer_micro = dist * 1e6 div max(n_chars, 1)``.

Plan shape (the scale story): one codegen projection — normalize,
corrupt, ``levenshtein`` are all JVM built-ins; zero exchanges, zero
joins, zero Python (plan-asserted).  Levenshtein is O(n*m) per doc:
at corpus scale a CER audit runs on an eval SAMPLE (compose with
`corpus_stratified_sample`), and the banded O(n*d) variant
(`levenshtein(a, b, threshold)`) is the documented long-doc guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MICRO = 1_000_000

_ASCII = "[^\\x00-\\x7f]"


def cer_audit_frame(docs: DataFrame) -> DataFrame:
    staged = docs.select(
        "doc_id",
        F.regexp_replace("text", r"[^\x00-\x7F]", "?").alias("ref"),
    ).select(
        "doc_id",
        "ref",
        F.regexp_replace(F.translate("ref", "u", "v"), "th", "t")
        .alias("hyp"),
    )
    return staged.select(
        "doc_id",
        F.length("ref").cast("bigint").alias("n_chars"),
        F.levenshtein("ref", "hyp").cast("bigint").alias("edit_dist"),
        F.expr(
            f"levenshtein(ref, hyp) * {MICRO}"
            f" div greatest(length(ref), 1)"
        ).cast("bigint").alias("cer_micro"),
    )


def cer_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return cer_audit_frame(docs)


CER_SQL = f"""
WITH staged AS (
  SELECT doc_id,
         regexp_replace(text, '{_ASCII}', '?', 'g') AS ref
  FROM documents
),
pair AS (
  SELECT doc_id, ref,
         regexp_replace(translate(ref, 'u', 'v'), 'th', 't', 'g') AS hyp
  FROM staged
)
SELECT doc_id,
       length(ref)::BIGINT AS n_chars,
       levenshtein(ref, hyp)::BIGINT AS edit_dist,
       (levenshtein(ref, hyp) * {MICRO}
        // greatest(length(ref), 1))::BIGINT AS cer_micro
FROM pair
"""


QUERIES: dict[str, tuple] = {
    "text_cer_audit": (cer_audit, CER_SQL),
}
