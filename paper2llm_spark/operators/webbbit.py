"""b-bit minwise hashing — storage-shrunk MinHash verification
(Li & König, WWW 2010 / CACM 2011, "b-bit minwise hashing").

The published result: storing only the lowest ``b`` bits of each of
``k`` minwise hashes keeps resemblance estimable — a matched b-bit
component is either a true minhash match (probability R, the
resemblance) or an accidental low-bit collision (probability
C = 1/2^b), so E[match rate] = C + (1 - C)·R and the corrected
estimator is R̂ = (P̂ - C)/(1 - C).  At b=2 a signature costs
2 bits/hash instead of 32-64 — the paper's headline is dedup over
billions of pages where full signatures don't fit in memory; k is
raised (the variance cost of small b) because 16 two-bit hashes still
undercut one 32-bit hash.

Composition with this repo's dedup family (operators/dedup.py): the
4-band/8-hash LSH stays the CANDIDATE generator (banding needs full
hashes); b-bit signatures replace the full-width signature at the
VERIFICATION step — the piece that must be stored per document and
carried through the pair join.  Both signature families fold out of
the SAME staged shingle-hash array in one pass, so the b-bit variant
adds zero scans and zero joins to the verified-pairs plan.

Semantics (frozen): word-trigram shingles, 32-bit md5 base hashes
(dedup.py's ``_hash32``); ``B_K = 64`` seeded permutations
``(a_i·h + b_i) mod MH_PRIME`` with the seed table derived from
md5("bbit-a-{i}") / md5("bbit-b-{i}") — the literal-table discipline
used for PQ codebooks and the CDC gear table, identical constants
baked into both engines' queries; b = 2, so the stored component is
``min_i mod 4``.  Per LSH-candidate pair: ``bb_matches`` = number of
equal 2-bit components and the Li-König estimate in exact integer
micro-units::

    r_est_micro = greatest(0, 4·bb_matches - 64) · 1_000_000 div 192

(= (P̂ - 1/4)/(3/4) with P̂ = matches/64, clamped at 0 where the
unbiased estimator goes negative on non-duplicate collisions).

Plan shape (the scale story): one corpus scan computes the staged
shingle-hash array; BOTH folds (8 full hashes for bands, 64 two-bit
components for verification) are arithmetic over that array in the
same projection.  The b-bit array rides the band self-join exactly as
dedup.py's verified pairs carry full signatures — 16 bytes/row vs 512
for 64 full hashes, which is the paper's point — and the match count
is a zip_with fold, no extra join.  At 10^12 docs the plan is the
LSH-pairs plan plus constant-size baggage.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import SQL_TOKENS, SQL_TRIGRAMS
from .dedup import (
    MH_PRIME,
    N_BANDS,
    _MH_A,
    _MH_B,
    _MH_INIT,
    _docs,
    _hash32,
    _shingled,
)

B_K = 64   # number of permutations kept at b bits
B_B = 2    # bits stored per permutation -> components in [0, 4)


def _seed(tag: str, i: int) -> int:
    # 7 hex digits (28 bits) keeps a_i * h32 < 2^60: exact int64 in both
    # engines — the same magnitude bound dedup.py's seed table obeys.
    return int(hashlib.md5(f"bbit-{tag}-{i}".encode()).hexdigest()[:7], 16)


# seed table: a_i forced odd (a multiplier of 0 would collapse the
# permutation); identical literals are baked into the DuckDB dual.
_BB_A = [_seed("a", i) | 1 for i in range(B_K)]
_BB_B = [_seed("b", i) for i in range(B_K)]


def _dual_fold(shingles) -> "F.Column":
    """ONE pass over the staged shingle hashes producing the 8 full
    band hashes followed by the 64 b-bit source minima (72 elements);
    the b-bit truncation (mod 4) happens after the fold."""
    hashed = F.transform(shingles, _hash32)
    n_all = len(_MH_A) + B_K
    folded = F.aggregate(
        hashed,
        F.array_repeat(F.lit(_MH_INIT).cast("bigint"), n_all),
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    (F.lit(a) * h + F.lit(b)) % F.lit(MH_PRIME)
                    for a, b in zip(_MH_A + _BB_A, _MH_B + _BB_B)
                ]
            ),
            lambda a, b: F.least(a, b),
        ),
    )
    return F.transform(folded, lambda v: F.when(v != F.lit(_MH_INIT), v))


def bbit_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = _shingled(_docs(spark, sf_dir)).select(
        "doc_id", _dual_fold(F.col("shingles")).alias("sig")
    )
    staged = sig.select(
        "doc_id",
        F.slice("sig", 1, len(_MH_A)).alias("full"),
        F.transform(
            F.slice("sig", len(_MH_A) + 1, B_K), lambda v: v % 4
        ).alias("bb"),
    )
    bands = staged.select(
        "doc_id",
        "bb",
        F.posexplode(
            F.when(
                F.element_at("full", 1).isNotNull(),
                F.array(
                    *[
                        F.md5(
                            F.concat_ws(
                                ",",
                                F.element_at("full", 2 * b + 1),
                                F.element_at("full", 2 * b + 2),
                            )
                        )
                        for b in range(N_BANDS)
                    ]
                ),
            )
        ).alias("band", "band_hash"),
    )
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.bb").alias("bb_a"),
            F.col("b.bb").alias("bb_b"),
        )
        .distinct()
    )
    matches = F.aggregate(
        F.zip_with("bb_a", "bb_b", lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, v: acc + v,
    ).cast("bigint")
    return cand.select(
        "doc_a",
        "doc_b",
        matches.alias("bb_matches"),
    ).select(
        "doc_a",
        "doc_b",
        "bb_matches",
        F.expr(
            f"greatest(0, 4 * bb_matches - {B_K}) * 1000000 div {3 * B_K}"
        ).alias("r_est_micro"),
    )


def _bbit_sql() -> str:
    tok = SQL_TOKENS.format(expr="text")
    tri = SQL_TRIGRAMS.format(tok="tok")
    full_cols = ", ".join(
        f"list_min(list_transform(hs, h -> ({a} * h + {b}) % {MH_PRIME}))"
        f" AS mh{i}"
        for i, (a, b) in enumerate(zip(_MH_A, _MH_B))
    )
    bb_cols = ", ".join(
        f"list_min(list_transform(hs, h -> ({a} * h + {b}) % {MH_PRIME})) % 4"
        f" AS bb{i}"
        for i, (a, b) in enumerate(zip(_BB_A, _BB_B))
    )
    band_rows = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {b} AS band,"
        f" md5(mh{2 * b}::VARCHAR || ',' || mh{2 * b + 1}::VARCHAR) AS band_hash"
        " FROM sig"
        for b in range(N_BANDS)
    )
    match_terms = " + ".join(
        f"(CASE WHEN a.bb{i} = b.bb{i} THEN 1 ELSE 0 END)" for i in range(B_K)
    )
    return f"""
WITH t AS (SELECT doc_id, {tok} AS tok FROM documents),
s AS (SELECT doc_id, {tri} AS tri FROM t),
h AS (SELECT doc_id, list_transform(tri,
        x -> ('0x' || substr(md5(x), 1, 8))::BIGINT) AS hs FROM s),
sig AS (SELECT doc_id, {full_cols}, {bb_cols} FROM h),
bands AS (
{band_rows}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
),
m AS (
  SELECT doc_a, doc_b, ({match_terms})::BIGINT AS bb_matches
  FROM cand JOIN sig a ON a.doc_id = doc_a JOIN sig b ON b.doc_id = doc_b
)
SELECT doc_a, doc_b, bb_matches,
       greatest(0, 4 * bb_matches - {B_K}) * 1000000 // {3 * B_K}
         AS r_est_micro
FROM m
"""


BBIT_SQL = _bbit_sql()


QUERIES: dict[str, tuple] = {
    "dedup_bbit_minhash": (bbit_verified_pairs, BBIT_SQL),
}
