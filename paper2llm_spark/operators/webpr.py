"""Precision-recall threshold sweep of the hashed quality classifier
against the Gopher rule battery — the operating-point table read
before picking a filter threshold (Davis & Goadrich ICML 2006 on PR
curves for skewed classes; every curated-corpus release reports the
chosen point's precision/recall against a rule or human label).
Completes the classifier-audit pair: ``ml_calibration_bins`` asks
*is the score honest?*, this asks *where should the knife fall?*

Semantics (frozen): per-doc feature side identical to webcalib.py —
exact bigint ``sum_w``/``n_toks`` classifier score fused with the
Gopher §A1.1 composite label in one projection; the doc's unshifted
mean token weight in micro-units is compared as the exact integer
cross-product ``sum_w >= th * n_toks`` (empty docs satisfy every
threshold — ``0 >= th*0`` — frozen, and they can never be Gopher
positives so they land in fp/tn only).  For each threshold in
``THRESHOLDS``
(micro-units, spanning the fixture's score spread so tp/fp/fn/tn
are all non-degenerate somewhere on the sweep):

* ``tp/fp/fn/tn`` — exact counts vs the Gopher label
* ``precision_micro = tp*1e6 div max(tp+fp, 1)``
* ``recall_micro    = tp*1e6 div max(tp+fn, 1)``
* ``f1_micro = 2*p*r div max(p+r, 1)`` over the micro ints — the
  harmonic mean computed on the already-floored micro terms (frozen
  as part of the contract; the double-rounding is identical in both
  engines by construction)

Plan shape (the scale story): the webpack.py collapse discipline —
ALL thresholds fold into ONE map-side partial aggregate (4 counters
x |THRESHOLDS| conditional sums over one fused scan projection);
output rows explode from the single aggregated row.  One one-row
exchange, zero joins, zero Python, single scan (plan-asserted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, tokens
from .webquality import (
    GOPHER_RULES_SQL, QCLF_BUCKETS, QCLF_WEIGHTS, _BUCKET, _TOK, _W_LIST,
    gopher_flags,
)

THRESHOLDS = (-200_000, -100_000, 0, 100_000, 200_000)
MICRO = 1_000_000


def pr_curve_frame(docs: DataFrame) -> DataFrame:
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
    # the "truth" side is THE shared Gopher battery expression
    # (webquality.gopher_flags) fused into the same projection — no
    # inline re-implementation to go stale (round-4 advisor note)
    label = gopher_flags(toks)["keep"]
    scored = staged.select(
        sum_w.alias("sum_w"), n_toks.alias("n_toks"), label.alias("label")
    )
    aggs = []
    for th in THRESHOLDS:
        pred = f"(sum_w >= {th} * n_toks)"
        tag = _tag(th)
        for name, cond in [
            (f"tp_{tag}", f"{pred} and label"),
            (f"fp_{tag}", f"{pred} and not label"),
            (f"fn_{tag}", f"not {pred} and label"),
            (f"tn_{tag}", f"not {pred} and not label"),
        ]:
            aggs.append(
                F.sum(F.expr(f"cast(({cond}) as int)"))
                .cast("bigint")
                .alias(name)
            )
    one = scored.agg(*aggs)
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(th).cast("bigint").alias("threshold_micro"),
                    F.col(f"tp_{_tag(th)}").alias("tp"),
                    F.col(f"fp_{_tag(th)}").alias("fp"),
                    F.col(f"fn_{_tag(th)}").alias("fn"),
                    F.col(f"tn_{_tag(th)}").alias("tn"),
                )
                for th in THRESHOLDS
            ]
        )
    )
    return one.select(rows.alias("r")).select(
        F.col("r.threshold_micro").alias("threshold_micro"),
        F.col("r.tp").alias("tp"),
        F.col("r.fp").alias("fp"),
        F.col("r.fn").alias("fn"),
        F.col("r.tn").alias("tn"),
        F.expr(f"r.tp * {MICRO} div greatest(r.tp + r.fp, 1)")
        .cast("bigint").alias("precision_micro"),
        F.expr(f"r.tp * {MICRO} div greatest(r.tp + r.fn, 1)")
        .cast("bigint").alias("recall_micro"),
        F.expr(
            f"2 * (r.tp * {MICRO} div greatest(r.tp + r.fp, 1))"
            f" * (r.tp * {MICRO} div greatest(r.tp + r.fn, 1))"
            f" div greatest((r.tp * {MICRO} div greatest(r.tp + r.fp, 1))"
            f" + (r.tp * {MICRO} div greatest(r.tp + r.fn, 1)), 1)"
        ).cast("bigint").alias("f1_micro"),
    )


def _tag(th: int) -> str:
    return f"m{abs(th)}" if th < 0 else f"p{th}"


def pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return pr_curve_frame(docs)


def _dual_cells() -> str:
    cells = []
    for th in THRESHOLDS:
        pred = f"(sum_w >= {th} * n_toks)"
        tag = _tag(th)
        cells.append(
            f"sum(({pred} AND label)::INT)::BIGINT AS tp_{tag},\n"
            f"         sum(({pred} AND NOT label)::INT)::BIGINT AS fp_{tag},\n"
            f"         sum((NOT {pred} AND label)::INT)::BIGINT AS fn_{tag},\n"
            f"         sum((NOT {pred} AND NOT label)::INT)::BIGINT AS tn_{tag}"
        )
    return ",\n         ".join(cells)


def _dual_rows() -> str:
    return ",\n    ".join(
        f"{{'th': {th}::BIGINT, 'tp': tp_{_tag(th)}, 'fp': fp_{_tag(th)},"
        f" 'fn': fn_{_tag(th)}, 'tn': tn_{_tag(th)}}}"
        for th in THRESHOLDS
    )


PR_CURVE_SQL = f"""
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
  SELECT m.sum_w, m.n_toks, g.keep AS label
  FROM m JOIN g ON g.doc_id = m.doc_id
),
one AS (
  SELECT {_dual_cells()}
  FROM scored
),
stacked AS (SELECT unnest([{_dual_rows()}]) AS r FROM one)
SELECT r['th']::BIGINT AS threshold_micro,
       r['tp']::BIGINT AS tp, r['fp']::BIGINT AS fp,
       r['fn']::BIGINT AS fn, r['tn']::BIGINT AS tn,
       (r['tp'] * {MICRO} // greatest(r['tp'] + r['fp'], 1))::BIGINT
         AS precision_micro,
       (r['tp'] * {MICRO} // greatest(r['tp'] + r['fn'], 1))::BIGINT
         AS recall_micro,
       (2 * (r['tp'] * {MICRO} // greatest(r['tp'] + r['fp'], 1))
          * (r['tp'] * {MICRO} // greatest(r['tp'] + r['fn'], 1))
          // greatest((r['tp'] * {MICRO} // greatest(r['tp'] + r['fp'], 1))
                      + (r['tp'] * {MICRO} // greatest(r['tp'] + r['fn'], 1)),
                      1))::BIGINT AS f1_micro
FROM stacked
"""


QUERIES: dict[str, tuple] = {
    "ml_pr_curve": (pr_curve, PR_CURVE_SQL),
}
