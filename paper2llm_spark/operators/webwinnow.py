"""Winnowing document fingerprints — Schleimer, Wilkerson & Aiken 2003
(the MOSS algorithm): from each window of ``W`` consecutive k-gram
hashes select the minimum (rightmost on ties), giving a fingerprint
set with the winnowing guarantee — any shared token run of length
>= W + K - 1 between two documents shares at least one selected
fingerprint — at an expected density of 2/(W+1) selections per
position.  This is the local-fingerprint counterpart to the global
ExactSubstr pass (``websubstr.py``): sketches cheap enough to store
per document, strong enough to seed plagiarism / near-dup candidate
lookup.

Exactness: gram hashes are ``portable_hash60`` (md5-derived bigint,
identical in both engines); the rightmost-min rule is position
arithmetic, no floats anywhere.  The classic dedupe-of-adjacent-
window-selections trick replaces a struct ``distinct``: once a
position stops being the window minimum it can never become it again
(anything that beat it stays in the window at least as long), so equal
selections are always consecutive — keep window ``j`` iff ``j == 1``
or its selected position differs from window ``j-1``'s.

Plan shape (the scale story): the ENTIRE operator is one codegen'd
projection chain over bound arrays in the scan task — gram hashes,
window argmins, and the consecutive-dedupe all run on the staged
``gh``/``poss`` attributes (HOF lambdas are interpreted with no CSE,
so each stage is bound before reuse), then a single ``explode``.
ZERO exchanges, zero joins, zero Python (plan-asserted): at 10^12
pages the cost is the scan itself, and the fingerprint table
partitions however the sink wants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, tokens

K_GRAM = 4   # k: fingerprint gram size, in tokens
W_WIN = 4    # w: winnowing window, in grams (guarantee t = w + k - 1)
_SEP = "\x1f"


def winnow_fingerprints_frame(docs: DataFrame) -> DataFrame:
    k, w = K_GRAM, W_WIN
    staged = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    n = F.size("toks")
    gram_hashes = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - k + 1),
            lambda i: portable_hash60(
                F.array_join(F.slice(F.col("toks"), i, k), _SEP)
            ),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    g = staged.select("doc_id", gram_hashes.alias("gh")) \
        .filter(F.size("gh") >= w)

    # rightmost index of the window minimum, per window start j
    def _rpos(j):
        mv = F.array_min(F.slice(F.col("gh"), j, w))
        return F.array_max(
            F.filter(
                F.sequence(j, j + w - 1),
                lambda i: F.element_at(F.col("gh"), i) == mv,
            )
        )

    p = g.select(
        "doc_id", "gh",
        F.transform(
            F.sequence(F.lit(1), F.size("gh") - w + 1), _rpos
        ).alias("poss"),
    )
    kept = F.filter(
        F.sequence(F.lit(1), F.size("poss")),
        lambda j: (j == 1)
        | (F.element_at(F.col("poss"), j)
           != F.element_at(F.col("poss"), j - 1)),
    )
    return p.select(
        "doc_id", "gh", "poss", F.explode(kept).alias("j")
    ).select(
        "doc_id",
        F.element_at("poss", F.col("j")).cast("bigint").alias("pos"),
        F.element_at(
            "gh", F.element_at("poss", F.col("j")).cast("int")
        ).cast("bigint").alias("fp"),
    )


def winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return winnow_fingerprints_frame(docs)


_K, _W = K_GRAM, W_WIN

WINNOW_SQL = f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> length(x) > 0) AS toks
  FROM documents
),
g AS (
  SELECT doc_id,
    CASE WHEN len(toks) >= {_K}
      THEN list_transform(range(1, len(toks) - {_K} + 2),
             i -> ('0x' || substr(md5(
                 array_to_string(toks[i:i+{_K}-1], chr(31))), 1, 15))::BIGINT)
      ELSE [] END AS gh
  FROM t
),
p AS (
  SELECT doc_id, gh,
    list_transform(range(1, len(gh) - {_W} + 2),
      j -> list_max(list_filter(range(j, j + {_W}),
                    i -> gh[i] = list_min(gh[j:j+{_W}-1])))) AS poss
  FROM g WHERE len(gh) >= {_W}
),
s AS (
  SELECT doc_id, gh, poss,
    list_filter(range(1, len(poss) + 1),
                j -> j = 1 OR poss[j] != poss[j-1]) AS kept
  FROM p
),
u AS (SELECT doc_id, gh, poss, unnest(kept) AS j FROM s)
SELECT doc_id, poss[j]::BIGINT AS pos, gh[poss[j]]::BIGINT AS fp FROM u
"""


DF_CAP = 64       # drop boilerplate fingerprints shared by > CAP docs
MIN_SHARED = 2    # report pairs sharing >= 2 surviving fingerprints


def winnow_pairs_frame(docs: DataFrame) -> DataFrame:
    """MOSS candidate pairs: documents sharing >= ``MIN_SHARED``
    winnowing fingerprints, with the shared count (the score MOSS
    ranks matches by).

    Plan shape: fingerprints stay zero-shuffle (above); then (1) a
    groupBy(doc_id, fp) dedupes multi-position selections, (2) a count
    window on ``fp`` applies the ``DF_CAP`` hot-set prune BEFORE the
    self-join — the same stop-shingle discipline as
    ``dedup_ngram_jaccard``, bounding pair fanout at C(CAP, 2) per
    fingerprint — and (3) the capped posting self-join + pair groupBy.
    Every exchanged row is (bigint, bigint): the text never shuffles.
    """
    fps = winnow_fingerprints_frame(docs) \
        .groupBy("doc_id", "fp").agg(F.count("*").alias("_n")) \
        .select("doc_id", "fp")
    from pyspark.sql import Window
    df_cnt = F.count("*").over(Window.partitionBy("fp"))
    capped = fps.withColumn("df", df_cnt) \
        .filter((F.col("df") >= 2) & (F.col("df") <= DF_CAP)) \
        .select("doc_id", "fp")
    a, b = capped.alias("a"), capped.alias("b")
    pairs = a.join(b, "fp").filter(F.col("a.doc_id") < F.col("b.doc_id"))
    return pairs.groupBy(
        F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
    ).agg(F.count("*").cast("bigint").alias("n_shared")) \
        .filter(F.col("n_shared") >= MIN_SHARED)


def winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return winnow_pairs_frame(docs)


WINNOW_PAIRS_SQL = f"""
WITH fp_all AS ({WINNOW_SQL}),
fps AS (SELECT DISTINCT doc_id, fp FROM fp_all),
capped AS (
  SELECT doc_id, fp FROM (
    SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS df FROM fps
  ) WHERE df BETWEEN 2 AND {DF_CAP}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_shared
FROM capped a JOIN capped b USING (fp)
WHERE a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= {MIN_SHARED}
"""


QUERIES: dict[str, tuple] = {
    "text_winnow_fingerprints": (winnow_fingerprints, WINNOW_SQL),
    "dedup_winnow_pairs": (winnow_pairs, WINNOW_PAIRS_SQL),
}
