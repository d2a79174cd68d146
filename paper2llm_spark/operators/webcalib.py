"""Classifier reliability diagram — calibration audit of the hashed
quality classifier against the Gopher rule battery (Murphy & Winkler
1977 reliability diagrams; Guo et al. ICML 2017 made the binned
audit standard; DeGroot & Fienberg 1983 decomposition).  The
curation question it answers: *when the fastText-style classifier
scores a document higher, is it actually more likely to pass the
editorial rules?*  — the sanity check every filtered-corpus release
runs before trusting a learned filter to replace a rule battery
(FineWeb's classifier-vs-heuristics comparisons are exactly this
table).

Composes the two existing quality signals (webquality.py): the
classifier score is re-derived EXACTLY (bigint ``sum_w`` over the
literal weight table — not the rounded float ``logit`` the
registered query exposes), and the "truth" label is the Gopher
§A1.1 composite keep.  Both are pure functions of ``text``, so the
whole feature side fuses into ONE scan projection (the webfunnel.py
discipline), transitively re-certifying both signal definitions
under this query's driver row.

Semantics (frozen): per-doc score key
``key = (sum_w + n_toks*1e6) div n_toks`` (mean token weight in
micro-units SHIFTED +1e6 so the numerator is nonnegative — Spark
``div`` truncates toward zero while DuckDB ``//`` floors, and the
shift makes truncation == floor; empty docs pin ``key = 1e6``,
i.e. mean 0).  Deciles: ``ntile(10)`` ordered by (key, doc_id) —
rank-based, bit-exact, never float-order dependent (the CCNet
tercile discipline, webcorpus.py).  Per bin: ``n``, ``n_pos``
(Gopher keeps), ``mean_score_micro = sum(key) div n - 1e6`` (shift
removed after the nonneg division), ``pos_rate_micro = n_pos*1e6
div n``.  A calibrated-enough classifier shows pos_rate rising
with mean_score; the fixture's planted quality spread makes both
columns non-degenerate.

Plan shape (the scale story): one fused scan projection (zero
joins — the label never travels through a second corpus pass), ONE
exchange of (doc_id, key, label) short rows for the global ntile
sort, then a 10-row groupBy.  At 10^12 docs the global sort is the
only cost beyond the scan; a production variant swaps ntile for
approx-percentile cut points broadcast back (rank semantics within
±epsilon) — documented, not needed for the exact contract here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, tokens
from .webquality import (
    GOPHER_ALPHA_FRAC, GOPHER_MAX_AVG_LEN, GOPHER_MAX_WORDS,
    GOPHER_MIN_AVG_LEN, GOPHER_MIN_REQ_STOP, GOPHER_MIN_WORDS,
    GOPHER_REQ_STOPWORDS, GOPHER_RULES_SQL, GOPHER_SYMBOL_FRAC,
    QCLF_BUCKETS, QCLF_WEIGHTS, _BUCKET, _TOK, _W_LIST,
)

N_BINS = 10
SHIFT = 1_000_000


def calibration_bins_frame(docs: DataFrame) -> DataFrame:
    staged = docs.select(
        "doc_id", tokens(F.col("text")).alias("toks")
    ).withColumn("w", F.lit(QCLF_WEIGHTS))
    toks = F.col("toks")
    n_toks = F.size(toks).cast("bigint")
    sum_w = F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, t: acc
        + F.element_at(
            F.col("w"), (portable_hash60(t) % QCLF_BUCKETS).cast("int") + 1
        ),
    )
    # Gopher §A1.1 composite (gopher_rules_frame twins)
    sum_len = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
    )
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("bigint")
    n_sym = F.size(
        F.filter(toks, lambda t: t.startswith("#") | t.contains("..."))
    ).cast("bigint")
    n_stop = sum(
        F.array_contains(toks, w).cast("int") for w in GOPHER_REQ_STOPWORDS
    ).cast("bigint")
    a_num, a_den = GOPHER_ALPHA_FRAC
    s_num, s_den = GOPHER_SYMBOL_FRAC
    label = (
        (n_toks >= GOPHER_MIN_WORDS)
        & (n_toks <= GOPHER_MAX_WORDS)
        & (sum_len >= GOPHER_MIN_AVG_LEN * n_toks)
        & (sum_len <= GOPHER_MAX_AVG_LEN * n_toks)
        & (a_den * n_alpha >= a_num * n_toks)
        & (s_den * n_sym <= s_num * n_toks)
        & (n_stop >= GOPHER_MIN_REQ_STOP)
    )
    scored = staged.select(
        "doc_id",
        n_toks.alias("n_toks"),
        sum_w.alias("sum_w"),
        label.alias("label"),
    ).select(
        "doc_id",
        "label",
        F.expr(
            f"case when n_toks = 0 then cast({SHIFT} as bigint)"
            f" else (sum_w + n_toks * {SHIFT}) div n_toks end"
        ).cast("bigint").alias("key"),
    )
    w = Window.orderBy(F.col("key"), F.col("doc_id"))
    binned = scored.select(
        "doc_id", "label", "key",
        F.ntile(N_BINS).over(w).cast("bigint").alias("bin"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.col("label").cast("int")).cast("bigint").alias("n_pos"),
            F.expr(f"sum(key) div count(*) - {SHIFT}")
            .cast("bigint")
            .alias("mean_score_micro"),
            F.expr(f"sum(cast(label as int)) * {SHIFT} div count(*)")
            .cast("bigint")
            .alias("pos_rate_micro"),
        )
    )


def calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return calibration_bins_frame(docs)


CALIBRATION_SQL = f"""
WITH g AS (SELECT doc_id, keep FROM ({GOPHER_RULES_SQL})),
t AS (SELECT doc_id, {_TOK} AS tok FROM documents),
m AS (
  SELECT doc_id,
         len(tok)::BIGINT AS n_toks,
         coalesce(list_sum(list_transform(tok,
                     x -> ({_W_LIST})[{_BUCKET} + 1])), 0)::BIGINT AS sum_w
  FROM t
),
scored AS (
  SELECT m.doc_id, g.keep AS label,
         CASE WHEN n_toks = 0 THEN {SHIFT}
              ELSE (sum_w + n_toks * {SHIFT}) // n_toks
         END::BIGINT AS key
  FROM m JOIN g ON g.doc_id = m.doc_id
),
binned AS (
  SELECT doc_id, label, key,
         ntile({N_BINS}) OVER (ORDER BY key, doc_id)::BIGINT AS bin
  FROM scored
)
SELECT bin,
       count(*)::BIGINT AS n,
       sum(label::INT)::BIGINT AS n_pos,
       (sum(key) // count(*) - {SHIFT})::BIGINT AS mean_score_micro,
       (sum(label::INT) * {SHIFT} // count(*))::BIGINT AS pos_rate_micro
FROM binned GROUP BY bin
"""


QUERIES: dict[str, tuple] = {
    "ml_calibration_bins": (calibration_bins, CALIBRATION_SQL),
}
