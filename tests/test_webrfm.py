"""RFM segmentation — full Python replay (including ntile tiling)
and score-structure invariants."""

from __future__ import annotations

import math

import pandas as pd

from paper2llm_spark.operators.webrfm import N_TILES, rfm_segments

SF = "/root/testdata/sf0.001"


def _ntile(order: list[int], k: int) -> dict[int, int]:
    """user_id list in window order -> user_id -> 1-based tile."""
    n = len(order)
    out, idx = {}, 0
    base, extra = divmod(n, k)
    for tile in range(1, k + 1):
        size = base + (1 if tile <= extra else 0)
        for _ in range(size):
            out[order[idx]] = tile
            idx += 1
    return out


def test_full_python_replay(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet")
    max_date = ev["ts"].max().date()
    per: dict[int, dict] = {}
    for _, row in ev.iterrows():
        u = int(row["user_id"])
        d = per.setdefault(u, {"last": row["ts"], "f": 0, "m": 0})
        d["last"] = max(d["last"], row["ts"])
        d["f"] += 1
        d["m"] += int(math.floor(float(row["value"]) * 100 + 0.5))
    rolled = {
        u: ((max_date - d["last"].date()).days, d["f"], d["m"])
        for u, d in per.items()
    }
    r_tiles = _ntile(sorted(rolled, key=lambda u: (rolled[u][0], u)), N_TILES)
    f_tiles = _ntile(sorted(rolled, key=lambda u: (-rolled[u][1], u)), N_TILES)
    m_tiles = _ntile(sorted(rolled, key=lambda u: (-rolled[u][2], u)), N_TILES)
    rows = {r.user_id: r for r in rfm_segments(spark, SF).collect()}
    assert set(rows) == set(rolled)
    for u, r in rows.items():
        rec, f, m = rolled[u]
        assert (r.recency_days, r.frequency, r.monetary_cents) == (rec, f, m)
        assert (r.r, r.f, r.m) == (r_tiles[u], f_tiles[u], m_tiles[u]), u
        assert r.segment == 100 * r.r + 10 * r.f + r.m


def test_tiles_are_balanced(spark):
    rows = rfm_segments(spark, SF).collect()
    for attr in ("r", "f", "m"):
        counts: dict[int, int] = {}
        for r in rows:
            v = getattr(r, attr)
            counts[v] = counts.get(v, 0) + 1
        assert set(counts) == set(range(1, N_TILES + 1))
        assert max(counts.values()) - min(counts.values()) <= 1
