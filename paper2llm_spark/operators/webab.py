"""A/B conversion-lift analysis — the two-proportion experiment
read-out (the z-test per standard two-sample proportion inference;
Kohavi, Tang & Xu's "Trustworthy Online Controlled Experiments" is
the field handbook; deterministic hash-based arm assignment is
exactly how production experiment platforms bucket users).

Semantics (frozen): arm = ``hash60(user_id ':ab') % 2`` (0 =
control, 1 = treatment — user-level, so every event of a user lands
in one arm); a user CONVERTS iff they have >= ``PURCHASE_MIN = 14``
``purchase`` events (a frequency threshold — EVERY fixture user has
at least one purchase, so the >= 1 rule would make both arms 100%
and the z-test permanently NULL; the threshold splits the fixture
8/15 and both polarities land in both arms).  One output row:

* ``n_c / conv_c / n_t / conv_t`` — exact user counts per arm
* ``cr_c_micro / cr_t_micro = conv * 1e6 div n`` — conversion rates
* ``lift_micro = cr_t_micro * 1e6 div max(cr_c_micro, 1) - 1e6`` —
  relative lift with the division kept NONNEGATIVE and the -100%
  shift applied after (Spark's truncating ``div`` == DuckDB's
  flooring ``//`` only on nonnegative numerators — the webcalib
  shift discipline); negative lift surfaces as a negative result
  without ever dividing a negative
* ``z_milli`` — the pooled two-proportion z statistic
  ``(p_t - p_c) / sqrt(p*(1-p)*(1/n_t + 1/n_c))`` as ONE
  shape-identical double expression frozen to milli-units (the
  webwilson discipline; NULL when either arm is empty or p is
  degenerate 0/1 — both engines agree by construction)

Plan shape (the scale story): ONE corpus-sized exchange — the
map-side-combinable ``groupBy(user_id)`` conversion rollup (arm is
a pure hash of the key, computed scan-side); the experiment table
collapses to per-arm counters in a second tiny aggregate.  Zero
joins, zero Python; only ``user_id``/``event_type`` read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, sql_hash60

MICRO = 1_000_000
PURCHASE_MIN = 14

_Z = (
    "case when n_c = 0 or n_t = 0 then null else "
    "(case when (conv_c + conv_t) = 0"
    "        or (conv_c + conv_t) = (n_c + n_t) then null else "
    "cast(floor((conv_t / n_t - conv_c / n_c) / "
    "sqrt(((conv_c + conv_t) / (n_c + n_t))"
    " * (1 - (conv_c + conv_t) / (n_c + n_t))"
    " * (1 / n_t + 1 / n_c)) * 1000.0 + 0.5) as bigint) end) end"
)


def ab_lift_frame(events: DataFrame) -> DataFrame:
    users = events.select(
        "user_id",
        (F.col("event_type") == "purchase").cast("int").alias("p"),
    ).groupBy("user_id").agg(
        (F.sum("p") >= PURCHASE_MIN).cast("bigint").alias("converted")
    ).select(
        (portable_hash60(
            F.concat(F.col("user_id").cast("string"), F.lit(":ab"))
        ) % 2).alias("arm"),
        "converted",
    )
    arms = users.agg(
        F.sum(F.expr("case when arm = 0 then 1 else 0 end"))
        .cast("bigint").alias("n_c"),
        F.sum(F.expr("case when arm = 0 then converted else 0 end"))
        .cast("bigint").alias("conv_c"),
        F.sum(F.expr("case when arm = 1 then 1 else 0 end"))
        .cast("bigint").alias("n_t"),
        F.sum(F.expr("case when arm = 1 then converted else 0 end"))
        .cast("bigint").alias("conv_t"),
    )
    return arms.select(
        "n_c", "conv_c", "n_t", "conv_t",
        F.expr(f"conv_c * {MICRO} div greatest(n_c, 1)")
        .cast("bigint").alias("cr_c_micro"),
        F.expr(f"conv_t * {MICRO} div greatest(n_t, 1)")
        .cast("bigint").alias("cr_t_micro"),
        F.expr(
            f"(conv_t * {MICRO} div greatest(n_t, 1)) * {MICRO}"
            f" div greatest(conv_c * {MICRO} div greatest(n_c, 1), 1)"
            f" - {MICRO}"
        ).cast("bigint").alias("lift_micro"),
        F.expr(_Z).alias("z_milli"),
    )


def ab_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = spark.read.parquet(f"{sf_dir}/events.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return ab_lift_frame(events)


_HASH = sql_hash60("user_id::VARCHAR || ':ab'")

AB_LIFT_SQL = f"""
WITH users AS (
  SELECT ({_HASH} % 2) AS arm,
         (sum((event_type = 'purchase')::INT) >= {PURCHASE_MIN})::BIGINT
           AS converted
  FROM events GROUP BY user_id
),
arms AS (
  SELECT sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS n_c,
         sum(CASE WHEN arm = 0 THEN converted ELSE 0 END)::BIGINT AS conv_c,
         sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS n_t,
         sum(CASE WHEN arm = 1 THEN converted ELSE 0 END)::BIGINT AS conv_t
  FROM users
)
SELECT n_c, conv_c, n_t, conv_t,
       (conv_c * {MICRO} // greatest(n_c, 1))::BIGINT AS cr_c_micro,
       (conv_t * {MICRO} // greatest(n_t, 1))::BIGINT AS cr_t_micro,
       ((conv_t * {MICRO} // greatest(n_t, 1)) * {MICRO}
        // greatest(conv_c * {MICRO} // greatest(n_c, 1), 1)
        - {MICRO})::BIGINT AS lift_micro,
       (CASE WHEN n_c = 0 OR n_t = 0 THEN NULL ELSE
          (CASE WHEN (conv_c + conv_t) = 0
                  OR (conv_c + conv_t) = (n_c + n_t) THEN NULL ELSE
           floor((conv_t / n_t - conv_c / n_c) /
                 sqrt(((conv_c + conv_t) / (n_c + n_t))
                      * (1 - (conv_c + conv_t) / (n_c + n_t))
                      * (1 / n_t + 1 / n_c)) * 1000.0 + 0.5)::BIGINT
           END) END) AS z_milli
FROM arms
"""


QUERIES: dict[str, tuple] = {
    "events_ab_lift": (ab_lift, AB_LIFT_SQL),
}
