"""Tukey-fence and Hampel length-outlier gate (Tukey, *Exploratory
Data Analysis* 1977 box-plot fences over a ladder-of-powers
re-expression; Hampel 1974 / Davies & Gather 1993 MAD identifier) —
the robust-statistics tier of corpus length filtering.  Fixed length
caps (Gopher's min/max words, C4's line rules) encode one corpus's
shape; the fence rule adapts to WHATEVER distribution the crawl slice
has, which is why dataset datasheets report box-plot outlier rates
next to the fixed-threshold attrition.

Semantics (frozen, all exact integers): per doc ``v = char length``.
Web doc lengths are log-normal-ish (right-skewed), so the raw-scale
lower fence sits below zero and flags nothing — Tukey's own answer is
to re-express before fencing (the ladder of powers), and the exact
integer re-expression is the **log2 bit-length** ``lg2 =
length(bin(max(v,1))) - 1`` (the webquantile ``bin()`` trick — no
floating log anywhere).  Order statistics are **type-1** (the minimal
value whose cumulative count reaches the rank): Q1 at ``ceil(N/4)``,
median at ``ceil(N/2)``, Q3 at ``ceil(3N/4)``.  Tukey fences in lg2
space with ``(3*IQR) div 2`` as the exact stand-in for 1.5*IQR;
verdict ``low | in | high``.  Hampel stays on RAW ``v`` where the MAD
keeps resolution: MAD = type-1 median of ``|v - med|``, outlier iff
``10000*|v - med| > 44478*MAD`` (the 3*1.4826 consistency constant as
an exact integer cross-product; MAD = 0 degenerates to "any v != med",
the identifier's own documented behavior).  Both tail polarities are
PLANTED in-engine: every ``doc_id % 97 == 0`` doc also enters as a
x50+13 giant and a div-50 dwarf variant (shifted ids), so low / high /
hampel verdicts are all non-vacuously certified by the dual.

Plan shape (the scale story): the ONLY corpus-sized exchange is the
``groupBy(v)`` histogram collapse (map-side combinable 16-byte rows,
bounded by the number of DISTINCT lengths, ~10^4-10^6 regardless of
row count — the webcorpus length-quantile discipline).  The histogram
is localCheckpointed once; the lg2 histogram DERIVES from it (<= 64
rows), quartile and MAD passes are single-partition windows over
COLLAPSED tables only; the fence scalars re-enter the corpus as a
1-row broadcast.  Zero corpus joins, zero Python (plan-asserted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

PLANT_MOD = 97
GIANT_BASE = 10_000_000
DWARF_BASE = 20_000_000


def _lg2(col):
    return (F.length(F.bin(F.greatest(col, F.lit(1)))) - 1).cast("bigint")


def fence_frame(lens: DataFrame) -> DataFrame:
    """(doc_id, v:bigint) -> per-doc Tukey (lg2 space) + Hampel (raw)
    verdicts."""
    hist = (
        lens.groupBy("v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint()
    )
    n1 = hist.agg(F.sum("c").cast("bigint").alias("n"))
    xhist = (
        hist.groupBy(_lg2(F.col("v")).alias("x"))
        .agg(F.sum("c").alias("c"))
    )
    wx = Window.orderBy("x").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    xcum = xhist.select("x", F.sum("c").over(wx).alias("cum"))
    quart = (
        xcum.crossJoin(F.broadcast(n1))
        .agg(
            F.max("n").alias("n"),
            F.min(F.when(F.expr("cum >= (n + 3) div 4"), F.col("x")))
            .alias("q1"),
            F.min(F.when(F.expr("cum >= (3 * n + 3) div 4"), F.col("x")))
            .alias("q3"),
        )
    )
    fences = quart.select(
        "n",
        (F.col("q1") - F.expr("(3 * (q3 - q1)) div 2")).alias("lo"),
        (F.col("q3") + F.expr("(3 * (q3 - q1)) div 2")).alias("hi"),
    )
    wv = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    vcum = hist.select("v", F.sum("c").over(wv).alias("cum"))
    med1 = (
        vcum.crossJoin(F.broadcast(n1))
        .agg(
            F.max("n").alias("n"),
            F.min(F.when(F.expr("cum >= (n + 1) div 2"), F.col("v")))
            .alias("med"),
        )
    )
    dh = (
        hist.crossJoin(F.broadcast(med1))
        .groupBy(F.abs(F.col("v") - F.col("med")).alias("d"))
        .agg(F.sum("c").alias("c"), F.max("n").alias("n"),
             F.max("med").alias("med"))
    )
    wd = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dcum = dh.select("d", "n", "med", F.sum("c").over(wd).alias("cum"))
    mad = dcum.agg(
        F.max("med").alias("med"),
        F.min(F.when(F.expr("cum >= (n + 1) div 2"), F.col("d")))
        .alias("mad"),
    )
    consts = fences.select("lo", "hi").crossJoin(F.broadcast(mad))
    return lens.crossJoin(F.broadcast(consts)).select(
        "doc_id",
        F.col("v").alias("n_chars"),
        _lg2(F.col("v")).alias("lg2"),
        F.when(_lg2(F.col("v")) < F.col("lo"), F.lit("low"))
        .when(_lg2(F.col("v")) > F.col("hi"), F.lit("high"))
        .otherwise(F.lit("in"))
        .alias("tukey_flag"),
        (F.abs(F.col("v") - F.col("med")) * 10000
         > F.col("mad") * 44478).alias("hampel_out"),
    )


def outlier_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    lens = docs.select(
        "doc_id", F.length("text").cast("bigint").alias("v")
    )
    seed = lens.filter(F.col("doc_id") % PLANT_MOD == 0)
    giant = seed.select(
        (F.col("doc_id") + GIANT_BASE).alias("doc_id"),
        (F.col("v") * 50 + 13).alias("v"),
    )
    dwarf = seed.select(
        (F.col("doc_id") + DWARF_BASE).alias("doc_id"),
        F.expr("v div 50").alias("v"),
    )
    return fence_frame(lens.unionByName(giant).unionByName(dwarf))


_LENS = f"""
  SELECT doc_id, length(text)::BIGINT AS v FROM documents
  UNION ALL
  SELECT doc_id + {GIANT_BASE}, length(text)::BIGINT * 50 + 13
  FROM documents WHERE doc_id % {PLANT_MOD} = 0
  UNION ALL
  SELECT doc_id + {DWARF_BASE}, length(text)::BIGINT // 50
  FROM documents WHERE doc_id % {PLANT_MOD} = 0
"""

OUTLIER_FENCES_SQL = f"""
WITH lens AS ({_LENS}),
hist AS (SELECT v, count(*)::BIGINT AS c FROM lens GROUP BY 1),
n1 AS (SELECT sum(c)::BIGINT AS n FROM hist),
xhist AS (
  SELECT (length(bin(greatest(v, 1))) - 1)::BIGINT AS x,
         sum(c)::BIGINT AS c
  FROM hist GROUP BY 1
),
xcum AS (SELECT x, sum(c) OVER (ORDER BY x) AS cum FROM xhist),
quart AS (
  SELECT max(n)::BIGINT AS n,
         min(CASE WHEN cum >= (n + 3) // 4 THEN x END)::BIGINT AS q1,
         min(CASE WHEN cum >= (3 * n + 3) // 4 THEN x END)::BIGINT AS q3
  FROM xcum, n1
),
fences AS (
  SELECT (q1 - (3 * (q3 - q1)) // 2)::BIGINT AS lo,
         (q3 + (3 * (q3 - q1)) // 2)::BIGINT AS hi
  FROM quart
),
vcum AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM hist),
med1 AS (
  SELECT min(CASE WHEN cum >= (n + 1) // 2 THEN v END)::BIGINT AS med
  FROM vcum, n1
),
dh AS (
  SELECT abs(v - med)::BIGINT AS d, sum(c)::BIGINT AS c
  FROM hist, med1 GROUP BY 1
),
dcum AS (SELECT d, sum(c) OVER (ORDER BY d) AS cum FROM dh),
mad AS (
  SELECT min(CASE WHEN cum >= (n + 1) // 2 THEN d END)::BIGINT AS mad
  FROM dcum, n1
)
SELECT doc_id, v AS n_chars,
       (length(bin(greatest(v, 1))) - 1)::BIGINT AS lg2,
       CASE WHEN (length(bin(greatest(v, 1))) - 1) < lo THEN 'low'
            WHEN (length(bin(greatest(v, 1))) - 1) > hi THEN 'high'
            ELSE 'in' END AS tukey_flag,
       (abs(v - med) * 10000 > mad * 44478) AS hampel_out
FROM lens, fences, med1, mad
"""


QUERIES: dict[str, tuple] = {
    "corpus_outlier_fences": (outlier_fences, OUTLIER_FENCES_SQL),
}
