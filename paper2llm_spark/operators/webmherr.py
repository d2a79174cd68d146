"""MinHash estimator-error audit — estimated vs exact Jaccard on
the verified near-dup pairs (Broder 1997's estimator has standard
error ``sqrt(j(1-j)/k)``; auditing the sketch against exact overlap
on the surviving pairs is how a production dedup stack validates
its ``k`` before trusting the threshold — the sketch-quality twin
of `ann_recall_audit`).

Composes `dedup_lsh_verified` verbatim (signatures -> bands ->
candidate join -> signature verification) and re-derives the EXACT
trigram Jaccard for those pairs only — a green row certifies the
whole MinHash chain AND quantifies its estimator error under one
driver hash.

Semantics (frozen): for each verified pair: ``est_jaccard4`` (the
composed operator's 4dp match fraction over N_MINHASH components),
``true_jaccard4 = round(|A ∩ B| / |A ∪ B|, 4)`` over DISTINCT
word-trigram sets (the signatures' own shingle universe),
``abs_err_micro = |floor(est*1e6+0.5) - floor(true*1e6+0.5)|`` —
exact integers from the two rounded doubles.

Plan shape (the scale story): the pair list is the LSH-verified
output — dup-graph-bounded, orders of magnitude smaller than the
corpus — and BROADCASTS onto the shingle table twice (side A, side
B); the intersection/union arithmetic runs per pair on two staged
distinct-shingle arrays.  Nothing corpus-sized moves in the audit;
zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import LSH_VERIFIED_SQL, _docs, _shingled, lsh_verified_pairs

MICRO = 1_000_000


def minhash_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = lsh_verified_pairs(spark, sf_dir).select(
        "doc_a", "doc_b", "est_jaccard"
    )
    sets = _shingled(_docs(spark, sf_dir)).select(
        "doc_id", F.array_distinct("shingles").alias("sh")
    )
    joined = (
        sets.join(
            F.broadcast(pairs), F.col("doc_id") == F.col("doc_a")
        )
        .select("doc_a", "doc_b", "est_jaccard", F.col("sh").alias("sa"))
        .join(
            sets.select(F.col("doc_id").alias("doc_b_"), F.col("sh").alias("sb")),
            F.col("doc_b") == F.col("doc_b_"),
        )
        .drop("doc_b_")
    )
    scored = joined.select(
        "doc_a",
        "doc_b",
        "est_jaccard",
        F.expr(
            "round(size(array_intersect(sa, sb)) /"
            " (size(sa) + size(sb) - size(array_intersect(sa, sb))), 4)"
        ).alias("true_jaccard"),
    )
    return scored.select(
        "doc_a",
        "doc_b",
        F.col("est_jaccard").alias("est_jaccard4"),
        F.col("true_jaccard").alias("true_jaccard4"),
        F.expr(
            f"abs(cast(floor(est_jaccard * {MICRO} + 0.5) as bigint)"
            f" - cast(floor(true_jaccard * {MICRO} + 0.5) as bigint))"
        ).cast("bigint").alias("abs_err_micro"),
    )


MINHASH_ERROR_SQL = f"""
WITH pairs AS (SELECT doc_a, doc_b, est_jaccard FROM ({LSH_VERIFIED_SQL})),
t AS (SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> length(x) > 0) AS tok
      FROM documents),
sets AS (
  SELECT doc_id,
         list_distinct(case when len(tok) >= 3 then
           list_transform(range(1, len(tok) - 1),
             i -> tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2])
           else [] end) AS sh
  FROM t
),
joined AS (
  SELECT p.doc_a, p.doc_b, p.est_jaccard, a.sh AS sa, b.sh AS sb
  FROM pairs p
  JOIN sets a ON a.doc_id = p.doc_a
  JOIN sets b ON b.doc_id = p.doc_b
),
scored AS (
  SELECT doc_a, doc_b, est_jaccard,
         round(len(list_intersect(sa, sb)) /
               (len(sa) + len(sb) - len(list_intersect(sa, sb))), 4)
           AS true_jaccard
  FROM joined
)
SELECT doc_a, doc_b,
       est_jaccard AS est_jaccard4,
       true_jaccard AS true_jaccard4,
       abs(floor(est_jaccard * {MICRO} + 0.5)::BIGINT
           - floor(true_jaccard * {MICRO} + 0.5)::BIGINT)::BIGINT
         AS abs_err_micro
FROM scored
"""


QUERIES: dict[str, tuple] = {
    "sketch_minhash_error": (minhash_error, MINHASH_ERROR_SQL),
}
