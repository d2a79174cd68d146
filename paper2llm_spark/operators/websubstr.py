"""Exact-substring duplicated-span detection — the ExactSubstr stage of
Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
Better"): find every maximal token span that occurs more than once
anywhere in the corpus, so training can drop repeated boilerplate and
licence blocks *inside* otherwise-unique documents (span-level, not
doc-level, dedup).

Re-expressed join-free for Spark instead of the paper's distributed
suffix array:

* every token position emits its k-gram rolling fingerprint
  (``portable_hash60`` over the separator-joined window — exact in
  both engines, no float anywhere);
* a count window partitioned by fingerprint marks positions whose gram
  occurs >1 time corpus-wide;
* matched positions collapse to maximal spans per document by
  gaps-and-islands (new island iff the gap to the previous matched
  position exceeds k), then ``groupBy(doc_id, island)``.

Plan shape (the scale story): gram fingerprints are built scan-side
(one ``transform`` over the bound token array, zero extra rows until
the explode). EXACTLY TWO hash exchanges: (1) the total-token-sized
shuffle of 16-byte ``(doc_id, pos, gh)`` rows partitioned by ``gh`` —
the inherent ExactSubstr cost, which the paper pays as a distributed
suffix-array sort; a groupBy+join formulation would shuffle the same
rows AND re-shuffle the dup set, so the single count-window is
strictly cheaper — and (2) the matched-positions-only shuffle on
``doc_id`` for the island merge (duplicated tokens are a small
fraction of the corpus).  The final ``groupBy(doc_id, island)`` reuses
the ``doc_id`` partitioning — no third exchange (plan-asserted).
Known skew: a corpus-wide boilerplate gram lands its whole posting on
one window partition; the production mitigation is the same hot-set
pre-pass as ``dedup_ngram_jaccard`` (grams past a df cap are
duplicated by definition and can be marked without enumeration).

``MIN_MATCH_TOK`` = 4 on the ~54-token synthetic docs, proportionally
the paper's 50-token threshold on ~2k-token web pages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, tokens

MIN_MATCH_TOK = 4   # k: minimum duplicated run, in tokens
_SEP = "\x1f"       # unit separator; never inside a whitespace token
_NEG = -1_000_000   # lag default: first matched position always breaks


def substring_spans_frame(docs: DataFrame) -> DataFrame:
    k = MIN_MATCH_TOK
    staged = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    n = F.size("toks")
    seqs = F.when(n >= k, F.sequence(F.lit(1), n - k + 1)) \
        .otherwise(F.array().cast("array<int>"))
    gram = F.transform(
        seqs,
        lambda i: F.struct(
            i.cast("bigint").alias("pos"),
            portable_hash60(
                F.array_join(F.slice(F.col("toks"), i, k), _SEP)
            ).alias("gh"),
        ),
    )
    pos_df = staged.select("doc_id", F.explode(gram).alias("g")).select(
        "doc_id", F.col("g.pos").alias("pos"), F.col("g.gh").alias("gh")
    )
    cnt = F.count("*").over(Window.partitionBy("gh"))
    matched = pos_df.withColumn("cnt", cnt) \
        .filter(F.col("cnt") > 1).select("doc_id", "pos")

    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    brk = F.when(
        F.col("pos") - F.lag("pos", 1, _NEG).over(w_doc) > k, F.lit(1)
    ).otherwise(F.lit(0))
    islands = matched.withColumn("brk", brk).withColumn(
        "island", F.sum("brk").over(w_doc)
    )
    return islands.groupBy("doc_id", "island").agg(
        F.min("pos").cast("bigint").alias("span_start"),
        (F.max("pos") + k - 1).cast("bigint").alias("span_end"),
        (F.max("pos") + k - F.min("pos")).cast("bigint").alias("span_toks"),
    ).select("doc_id", "span_start", "span_end", "span_toks")


def substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return substring_spans_frame(docs)


_K = MIN_MATCH_TOK

SUBSTRING_SPANS_SQL = f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> length(x) > 0) AS toks
  FROM documents
),
p AS (
  SELECT doc_id, toks,
         unnest(range(1, greatest(len(toks) - {_K} + 2, 1))) AS pos
  FROM t
),
m AS (
  SELECT doc_id, pos::BIGINT AS pos,
         ('0x' || substr(md5(
             array_to_string(toks[pos:pos+{_K}-1], chr(31))), 1, 15))::BIGINT
           AS gh
  FROM p
),
w AS (SELECT doc_id, pos, count(*) OVER (PARTITION BY gh) AS cnt FROM m),
matched AS (SELECT doc_id, pos FROM w WHERE cnt > 1),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos, 1, {_NEG})
                      OVER (PARTITION BY doc_id ORDER BY pos) > {_K}
              THEN 1 ELSE 0 END AS brk
  FROM matched
),
isl2 AS (
  SELECT doc_id, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM isl
)
SELECT doc_id,
       min(pos)::BIGINT AS span_start,
       (max(pos) + {_K} - 1)::BIGINT AS span_end,
       (max(pos) + {_K} - min(pos))::BIGINT AS span_toks
FROM isl2
GROUP BY doc_id, island
"""


QUERIES: dict[str, tuple] = {
    "dedup_substring_spans": (substring_spans, SUBSTRING_SPANS_SQL),
}
