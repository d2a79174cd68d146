"""ROUGE audit of the Luhn summarizer — n-gram recall of the chosen
sentence against the lead-sentence baseline (Lin 2004 defined
ROUGE; "lead" is THE baseline every summarization paper reports
against, and leads are notoriously hard to beat — Nenkova 2005).
The summarization-eval member of the audit family (recall→ANN,
MRR/nDCG→rankers, CER→extraction, this→summaries).

The fixture corpus is SINGLE-SENTENCE (measured: every doc segments
to exactly 1 sentence under the summarizer's boundary rule), which
would make a lead-vs-best audit vacuous — so the audit first
SENTENCEIZES the corpus into ``CHUNK_W = 12``-token sentences
(chunks joined by ``'. '`` with a final period; empty docs
dropped), then runs the summarizer's OWN pipeline over that second
corpus: the Spark side through `luhn_frame` verbatim, the dual by
splicing the registered `LUHN_SUMMARY_SQL` pipeline tail onto the
chunked corpus CTE (the webvote transitive-re-certification
discipline — the splice point is assert-guarded so a summarizer
refactor fails loudly here, not silently).

Semantics (frozen): per doc with a valid pick (``best_sent >= 0``):

* ``rouge1_micro = |U(sys) ∩ U(ref)| * 1e6 div max(|U(ref)|, 1)``
  over DISTINCT unigrams of the chosen sentence vs sentence 0
* ``rouge2_micro`` — the same over distinct word bigrams
* ``lead_is_best`` — the pick IS the lead (recalls trivially 1e6);
  the chunked fixture exercises both polarities

Plan shape (the scale story): the summarizer's own dataflow does
the heavy work over the chunked scan; the audit adds one doc_id
equi-join of the per-doc result onto the re-segmented chunks (both
sides 2-3 short columns; broadcast at audit scale, doc_id SMJ at
corpus scale) and per-doc set arithmetic on staged gram arrays.
Zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import SQL_TOKENS, tokens
from .websummary import LUHN_SUMMARY_SQL, _sents, luhn_frame

MICRO = 1_000_000
CHUNK_W = 12


def sentenceized(docs: DataFrame) -> DataFrame:
    """(doc_id, text) -> (doc_id, text) with 12-token sentences."""
    staged = docs.select(
        "doc_id", tokens(F.col("text")).alias("tok")
    ).filter(F.size("tok") > 0)
    return staged.select(
        "doc_id",
        F.expr(
            f"concat(array_join(transform("
            f"sequence(0, (size(tok) + {CHUNK_W - 1}) div {CHUNK_W} - 1),"
            f" i -> array_join(slice(tok, i * {CHUNK_W} + 1, {CHUNK_W}),"
            f" ' ')), '. '), '.')"
        ).alias("text"),
    )


def _grams(col, n: int):
    toks = tokens(col)
    if n == 1:
        return F.array_distinct(toks)
    return F.array_distinct(
        F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.concat_ws(
                    " ", F.element_at(toks, i), F.element_at(toks, i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
    )


def rouge_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    ).select("doc_id", "text")
    chunked = sentenceized(docs)
    best = luhn_frame(chunked).filter(F.col("best_sent") >= 0).select(
        "doc_id", "best_sent"
    )
    seg = chunked.select(
        "doc_id", _sents(F.col("text")).alias("sents")
    ).filter(F.size("sents") > 0)
    pair = seg.join(best, "doc_id").select(
        "doc_id",
        "best_sent",
        F.element_at("sents", F.col("best_sent").cast("int") + 1)
        .alias("sys"),
        F.element_at("sents", 1).alias("ref"),
    )
    staged = pair.select(
        "doc_id",
        "best_sent",
        _grams(F.col("sys"), 1).alias("s1"),
        _grams(F.col("ref"), 1).alias("r1"),
        _grams(F.col("sys"), 2).alias("s2"),
        _grams(F.col("ref"), 2).alias("r2"),
    )
    return staged.select(
        "doc_id",
        "best_sent",
        (F.col("best_sent") == 0).alias("lead_is_best"),
        F.expr(
            f"size(array_intersect(s1, r1)) * {MICRO}"
            f" div greatest(size(r1), 1)"
        ).cast("bigint").alias("rouge1_micro"),
        F.expr(
            f"size(array_intersect(s2, r2)) * {MICRO}"
            f" div greatest(size(r2), 1)"
        ).cast("bigint").alias("rouge2_micro"),
    )


_TOK = SQL_TOKENS.format(expr="text")

CHUNKED_SQL = f"""
  SELECT doc_id,
         array_to_string(list_transform(
           range(0, (len(tok) + {CHUNK_W - 1}) // {CHUNK_W}),
           i -> array_to_string(
             tok[i * {CHUNK_W} + 1:i * {CHUNK_W} + {CHUNK_W}], ' ')),
           '. ') || '.' AS text
  FROM (SELECT doc_id, {_TOK} AS tok FROM documents)
  WHERE len(tok) > 0
"""

# splice the registered summarizer pipeline onto the chunked corpus;
# assert-guard the splice point so a summarizer refactor fails loudly
_SPLIT = "),\nseg AS ("
assert _SPLIT in LUHN_SUMMARY_SQL, "LUHN_SUMMARY_SQL shape changed"
_LUHN_TAIL = LUHN_SUMMARY_SQL.split(_SPLIT, 1)[1]
_LUHN_ON_CHUNKS = f"WITH corpus AS ({CHUNKED_SQL}{_SPLIT}{_LUHN_TAIL}"

_SENTS_SQL = (
    "list_filter(list_transform("
    "string_split(regexp_replace(text, '([.!?]) ', '\\1' || chr(1), 'g'),"
    " chr(1)), s -> trim(s)), s -> s != '')"
)

_TOK_OF = ("list_filter(string_split_regex(lower({x}), '\\s+'),"
           " t -> length(t) > 0)")


def _grams_sql(x: str, n: int) -> str:
    tok = _TOK_OF.format(x=x)
    if n == 1:
        return f"list_distinct({tok})"
    return (
        f"list_distinct(case when len({tok}) >= 2 then"
        f" list_transform(range(1, len({tok})),"
        f" i -> ({tok})[i] || ' ' || ({tok})[i+1]) else [] end)"
    )


ROUGE_AUDIT_SQL = f"""
WITH best AS (
  SELECT doc_id, best_sent FROM ({_LUHN_ON_CHUNKS})
  WHERE best_sent >= 0
),
chunked AS ({CHUNKED_SQL}),
seg AS (
  SELECT doc_id, {_SENTS_SQL} AS sents FROM chunked
),
pair AS (
  SELECT b.doc_id, b.best_sent,
         s.sents[b.best_sent + 1] AS sys,
         s.sents[1] AS ref
  FROM best b JOIN seg s USING (doc_id)
  WHERE len(s.sents) > 0
),
staged AS (
  SELECT doc_id, best_sent,
         {_grams_sql("sys", 1)} AS s1, {_grams_sql("ref", 1)} AS r1,
         {_grams_sql("sys", 2)} AS s2, {_grams_sql("ref", 2)} AS r2
  FROM pair
)
SELECT doc_id, best_sent,
       best_sent = 0 AS lead_is_best,
       (len(list_intersect(s1, r1)) * {MICRO}
        // greatest(len(r1), 1))::BIGINT AS rouge1_micro,
       (len(list_intersect(s2, r2)) * {MICRO}
        // greatest(len(r2), 1))::BIGINT AS rouge2_micro
FROM staged
"""


QUERIES: dict[str, tuple] = {
    "text_rouge_audit": (rouge_audit, ROUGE_AUDIT_SQL),
}
