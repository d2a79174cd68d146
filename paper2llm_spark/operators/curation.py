"""End-to-end training-corpus curation — the composition a real
100 TB pipeline runs nightly: language gate -> quality gate -> PII
scrub -> exact dedup -> near-dup (LSH cluster) keep.

Composed from the same builders the standalone driver queries use, so
every stage's semantics are already individually hash-verified against
DuckDB; this query verifies the COMPOSITION end-to-end.

Plan shape (the part that matters at 10^12 docs):

* lang + quality + PII are per-row projections of ``text`` fused into
  ONE pass over the scan — zero joins, zero shuffles; the naive
  operator-output join (4-way self-join on doc_id) would shuffle the
  corpus four times for no reason.
* the near-dup keep-list join is the only corpus-sized shuffle
  (doc_id on both sides); the LSH cluster table itself is built from
  the bounded band-bucket join (see dedup.py).
* exact dedup is a window min over md5(clean) — one more short-key
  shuffle, map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import tokens
from .dedup import LSH_CLUSTERS_SQL, lsh_duplicate_clusters
from .textstats import (
    LANG_ID_SQL,
    PII_SCRUB_SQL,
    QUALITY_SQL,
    _PII_PLANT,
    _docs,
    with_lang,
    with_pii_scrub,
    with_quality,
)

# Sits between the corpus quality p25 (~0.40) and median (~0.45): the
# gate keeps a majority and drops a real tail at every tested SF, so
# the correctness row is non-vacuous in both directions.
QUALITY_MIN = 0.42
CURATION_LANG = "en"


def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per document surviving the full curation chain, with its
    scrubbed text and provenance columns."""
    staged = _docs(spark, sf_dir).select(
        "doc_id",
        "text",
        tokens(F.col("text")).alias("toks"),
        F.expr(_PII_PLANT).alias("pii_text"),
    )
    enriched = with_pii_scrub(with_quality(with_lang(staged)))
    clusters = lsh_duplicate_clusters(spark, sf_dir).select(
        "doc_id", "cluster", "keep"
    )
    filtered = (
        enriched.filter(
            (F.col("pred_lang") == CURATION_LANG)
            & (F.col("quality") >= QUALITY_MIN)
        )
        .join(clusters, "doc_id")
        .filter("keep")
    )
    grp_min = F.min("doc_id").over(Window.partitionBy(F.md5("clean")))
    return (
        filtered.withColumn("grp_min", grp_min)
        .filter(F.col("doc_id") == F.col("grp_min"))
        .select("doc_id", "clean", "n_words", "quality", "cluster")
    )


CURATION_SQL = f"""
WITH lang AS ({LANG_ID_SQL}),
qual AS ({QUALITY_SQL}),
pii AS ({PII_SCRUB_SQL}),
keepers AS ({LSH_CLUSTERS_SQL}),
filtered AS (
  SELECT l.doc_id, p.clean, q.n_words, q.quality, k.cluster
  FROM lang l
  JOIN qual q USING (doc_id)
  JOIN pii p USING (doc_id)
  JOIN keepers k USING (doc_id)
  WHERE l.pred_lang = '{CURATION_LANG}' AND q.quality >= {QUALITY_MIN} AND k.keep
),
dd AS (
  SELECT *, min(doc_id) OVER (PARTITION BY md5(clean)) AS grp_min FROM filtered
)
SELECT doc_id, clean, n_words, quality, cluster FROM dd WHERE doc_id = grp_min
"""


QUERIES: dict[str, tuple] = {
    "corpus_curation": (corpus_curation, CURATION_SQL),
}
