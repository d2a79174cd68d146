"""A/B lift — full Python replay including the z statistic, and the
degenerate-conversion NULL guard."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

from paper2llm_spark.operators.webab import (
    MICRO, PURCHASE_MIN, ab_lift, ab_lift_frame,
)

SF = "/root/testdata/sf0.001"


def _arm(user_id: int) -> int:
    return int(hashlib.md5(f"{user_id}:ab".encode()).hexdigest()[:15],
               16) % 2


def test_full_python_replay(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet")
    per: dict[int, int] = {}
    for u, t in zip(ev["user_id"], ev["event_type"]):
        per[int(u)] = per.get(int(u), 0) + (t == "purchase")
    n = {0: 0, 1: 0}
    conv = {0: 0, 1: 0}
    for u, np in per.items():
        a = _arm(u)
        n[a] += 1
        conv[a] += np >= PURCHASE_MIN
    r = ab_lift(spark, SF).collect()[0]
    assert (r.n_c, r.conv_c, r.n_t, r.conv_t) == (n[0], conv[0],
                                                  n[1], conv[1])
    cr_c = conv[0] * MICRO // max(n[0], 1)
    cr_t = conv[1] * MICRO // max(n[1], 1)
    assert (r.cr_c_micro, r.cr_t_micro) == (cr_c, cr_t)
    assert r.lift_micro == cr_t * MICRO // max(cr_c, 1) - MICRO
    p = (conv[0] + conv[1]) / (n[0] + n[1])
    z = (conv[1] / n[1] - conv[0] / n[0]) / math.sqrt(
        p * (1 - p) * (1 / n[1] + 1 / n[0])
    )
    assert r.z_milli == math.floor(z * 1000.0 + 0.5)
    # both polarities exist in the fixture: neither arm is 0% or 100%
    assert 0 < r.conv_c < r.n_c and 0 < r.conv_t < r.n_t


def test_degenerate_conversion_nulls_z(spark):
    # every user converts -> pooled p = 1 -> z undefined -> NULL
    rows = [
        (k, u, "purchase")
        for k, u in enumerate(
            [u for u in (1, 2) for _ in range(PURCHASE_MIN)]
        )
    ]
    events = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string"
    )
    got = ab_lift_frame(events).collect()[0]
    assert got.conv_c + got.conv_t == got.n_c + got.n_t
    assert got.z_milli is None
