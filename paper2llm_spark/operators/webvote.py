"""Extractor-ensemble agreement audit — run TWO independent published
main-content extractors (jusText block classification, ``webboiler``;
CETR tag-ratio lines, ``webcetr``) over the SAME page set and measure
where they agree, the QA step ensemble extractors (trafilatura's
precision/recall modes, Dolma's extractor comparisons) run before
committing an extraction config for a 10^12-page crawl.

Per url: the token sets of jusText's final-``good`` blocks and CETR's
``is_content`` lines, compared as exact integers —

    n_just, n_cetr   distinct extracted tokens per extractor
    n_inter, n_union set intersection / union sizes
    jaccard_micro    (1e6 * n_inter) div greatest(1, n_union)

Plan shape (the scale story): both extractors share ONE synthesized
page scan (the CETR line-structured synth — its block tags make it
valid jusText input too); each arm's classification windows
hash-partition on ``url``; the token sets collapse to DISTINCT
(url, token) short rows (vocabulary-bounded per page, never raw text),
and the agreement is a full-outer equi-join of those short rows plus
one groupBy(url) — every exchanged row is a url + one token.  At
10^12 pages nothing corpus-sized is ever joined on text.

Both engines compose the SAME classification SQL used by the
individual extractor gates (``webboiler.justext_sql`` /
``webcetr.cetr_sql``), so this operator transitively re-verifies both
over a second page corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens
from .webboiler import boiler_blocks_frame, justext_sql
from .webcetr import PAGES_SQL, cetr_lines_frame, cetr_sql, synth_cetr_pages

MICRO = 1_000_000


def extract_agreement_frame(pages: DataFrame) -> DataFrame:
    just = (
        boiler_blocks_frame(pages)
        .filter(F.col("cls_final") == "good")
        .select("url", F.explode(tokens(F.col("btext"))).alias("tok"))
        .distinct()
        .withColumn("in_just", F.lit(1).cast("bigint"))
    )
    cetr = (
        cetr_lines_frame(pages)
        .filter(F.col("is_content") == 1)
        .select("url", F.explode(tokens(F.col("line_text"))).alias("tok"))
        .distinct()
        .withColumn("in_cetr", F.lit(1).cast("bigint"))
    )
    joined = just.join(cetr, ["url", "tok"], "full_outer").select(
        "url",
        F.coalesce("in_just", F.lit(0)).alias("in_just"),
        F.coalesce("in_cetr", F.lit(0)).alias("in_cetr"),
    )
    agg = joined.groupBy("url").agg(
        F.sum("in_just").alias("n_just"),
        F.sum("in_cetr").alias("n_cetr"),
        F.sum(F.col("in_just") * F.col("in_cetr")).alias("n_inter"),
        F.count(F.lit(1)).alias("n_union"),
    )
    return agg.select(
        "url", "n_just", "n_cetr", "n_inter", "n_union",
        F.expr(f"({MICRO} * n_inter) div greatest(1, n_union)")
        .alias("jaccard_micro"),
    )


def extract_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return extract_agreement_frame(synth_cetr_pages(docs))


_TOK = "list_filter(string_split_regex(lower({e}), '\\s+'), t -> length(t) > 0)"

EXTRACT_AGREEMENT_SQL = f"""
WITH pages AS ({PAGES_SQL}),
{justext_sql("pages")},
{cetr_sql("pages")},
jt AS (
  SELECT DISTINCT url, unnest({_TOK.format(e="btext")}) AS tok
  FROM just WHERE cls_final = 'good'
),
ct AS (
  SELECT DISTINCT url, unnest({_TOK.format(e="line_text")}) AS tok
  FROM cetr WHERE is_content = 1
),
j AS (
  SELECT coalesce(jt.url, ct.url) AS url,
         CASE WHEN jt.tok IS NOT NULL THEN 1 ELSE 0 END::BIGINT
           AS in_just,
         CASE WHEN ct.tok IS NOT NULL THEN 1 ELSE 0 END::BIGINT
           AS in_cetr
  FROM jt FULL OUTER JOIN ct
    ON jt.url = ct.url AND jt.tok = ct.tok
),
a AS (
  SELECT url,
         sum(in_just)::BIGINT AS n_just,
         sum(in_cetr)::BIGINT AS n_cetr,
         sum(in_just * in_cetr)::BIGINT AS n_inter,
         count(*)::BIGINT AS n_union
  FROM j GROUP BY url
)
SELECT url, n_just, n_cetr, n_inter, n_union,
       (({MICRO} * n_inter) // greatest(1, n_union))::BIGINT
         AS jaccard_micro
FROM a
"""


QUERIES: dict[str, tuple] = {
    "web_extract_agreement": (extract_agreement, EXTRACT_AGREEMENT_SQL),
}
