"""Cross-source corpus-overlap audit — the pre-mixing check every
multi-source training run needs (Soldaini et al. 2024 Dolma's
inter-source dedup audits; Gao et al. 2020 The Pile's overlap
analysis): estimate the shingle-set Jaccard between every pair of
sources from per-source MinHash sketches, so "how much of source B is
already in source A" is answered WITHOUT a corpus-sized join.

MinHash at the *corpus* level: the min of a seeded permutation over
the union of two sets is the min of the two sets' mins, so a
per-source signature (64 seeded minima over all its docs' shingles)
supports unbiased pairwise Jaccard estimation between sources —
``E[matches/64] = J(S_a, S_b)``.  Same universal-hash family as
doc-level MinHash (``dedup.py:87``: one md5 per shingle, then
``(A_i·h + B_i) mod P`` exact in int64), fresh ``ovA:/ovB:`` seeds.

Plan shape (the scale story): per-doc 64-min folds run scan-side
(staged-array discipline of ``dedup._minhash_array`` — one md5 per
shingle); the ONLY corpus-sized exchange is the map-side-combinable
``groupBy(source)`` whose partial aggregates are 64 bigints per
(partition × source) — at 10^12 docs the shuffle carries
|partitions|·|sources| short rows.  The pairwise stage runs on the
|sources|-row signature table via broadcast nested-loop self-join
(a.source < b.source) — never a corpus join.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import SQL_TOKENS, SQL_TRIGRAMS, tokens, word_trigrams
from .dedup import MH_PRIME, _hash32

N_OV = 64        # corpus-level sketch width
_OV_INIT = 1 << 62

_OV_A = [
    1 + int(hashlib.md5(f"ovA:{i}".encode()).hexdigest()[:7], 16)
    for i in range(N_OV)
]
_OV_B = [
    int(hashlib.md5(f"ovB:{i}".encode()).hexdigest()[:7], 16)
    for i in range(N_OV)
]


def _ov_sig(shingles) -> "F.Column":
    """All N_OV seeded minima in one fold (dedup._minhash_array shape:
    hash staged once, seeds derived arithmetically)."""
    hashed = F.transform(shingles, _hash32)
    folded = F.aggregate(
        hashed,
        F.array_repeat(F.lit(_OV_INIT).cast("bigint"), N_OV),
        lambda acc, h: F.zip_with(
            acc,
            F.array(*[
                (F.lit(_OV_A[i]) * h + F.lit(_OV_B[i])) % F.lit(MH_PRIME)
                for i in range(N_OV)
            ]),
            lambda a, b: F.least(a, b),
        ),
    )
    return F.transform(folded, lambda v: F.when(v != F.lit(_OV_INIT), v))


def source_overlap_frame(docs: DataFrame) -> DataFrame:
    shingled = docs.select(
        "source", tokens(F.col("text")).alias("tok")
    ).select("source", word_trigrams(F.col("tok")).alias("shingles"))
    per_doc = shingled.select(
        "source", _ov_sig(F.col("shingles")).alias("sig")
    ).select(
        "source",
        *[F.element_at("sig", i + 1).alias(f"m{i}") for i in range(N_OV)],
    )
    sigs = per_doc.groupBy("source").agg(
        *[F.min(f"m{i}").alias(f"m{i}") for i in range(N_OV)]
    ).select(
        "source", F.array(*[f"m{i}" for i in range(N_OV)]).alias("sig")
    )
    a = sigs.select(F.col("source").alias("source_a"),
                    F.col("sig").alias("sig_a"))
    b = sigs.select(F.col("source").alias("source_b"),
                    F.col("sig").alias("sig_b"))
    pairs = a.join(F.broadcast(b), F.col("source_a") < F.col("source_b"))
    n_match = F.size(F.filter(
        F.zip_with("sig_a", "sig_b", lambda x, y: x.eqNullSafe(y)),
        lambda v: v,
    )).cast("bigint")
    return pairs.select(
        "source_a", "source_b", n_match.alias("n_match"),
    ).withColumn(
        "est_jaccard_micro",
        F.expr(f"cast(1000000 * n_match div {N_OV} as bigint)"),
    )


def source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return source_overlap_frame(docs)


def _overlap_sql() -> str:
    tok = SQL_TOKENS.format(expr="text")
    tri = SQL_TRIGRAMS.format(tok="tok")
    mins = ", ".join(
        f"min(list_min(list_transform(hs,"
        f" h -> ({_OV_A[i]} * h + {_OV_B[i]}) % {MH_PRIME})))::BIGINT AS m{i}"
        for i in range(N_OV)
    )
    arr = "[" + ", ".join(f"m{i}" for i in range(N_OV)) + "]"
    return f"""
WITH t AS (SELECT doc_id, source, {tok} AS tok FROM documents),
s AS (SELECT source, {tri} AS tri FROM t),
h AS (SELECT source, list_transform(tri,
        x -> ('0x' || substr(md5(x), 1, 8))::BIGINT) AS hs FROM s),
g AS (SELECT source, {mins} FROM h GROUP BY source),
sig AS (SELECT source, {arr} AS sig FROM g)
SELECT a.source AS source_a, b.source AS source_b,
       len(list_filter(range(1, {N_OV} + 1),
           i -> a.sig[i] IS NOT DISTINCT FROM b.sig[i]))::BIGINT AS n_match,
       (1000000 * len(list_filter(range(1, {N_OV} + 1),
           i -> a.sig[i] IS NOT DISTINCT FROM b.sig[i])) // {N_OV})::BIGINT
         AS est_jaccard_micro
FROM sig a JOIN sig b ON a.source < b.source
"""


SOURCE_OVERLAP_SQL = _overlap_sql()


QUERIES: dict[str, tuple] = {
    "corpus_source_overlap": (source_overlap, SOURCE_OVERLAP_SQL),
}
