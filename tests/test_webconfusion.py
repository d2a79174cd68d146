"""Lang-ID confusion matrix — full Python classifier replay against
the labeled corpus and matrix invariants."""

from __future__ import annotations

import pandas as pd

from paper2llm_spark.operators.textstats import _LANG_MARKERS, _LANG_ORDER
from paper2llm_spark.operators.webconfusion import MICRO, langid_confusion

SF = "/root/testdata/sf0.001"


def _pred(text: str) -> str:
    toks = [t for t in text.lower().split() if t]
    scores = {lang: sum(t in set(m) for t in toks)
              for lang, m in _LANG_MARKERS.items()}
    best = max(scores.values())
    if best == 0:
        return "und"
    for lang in _LANG_ORDER:  # earlier language wins ties
        if scores[lang] == best:
            return lang
    raise AssertionError


def test_full_python_replay(spark):
    df = pd.read_parquet(f"{SF}/documents.parquet")
    cells: dict[tuple, int] = {}
    for lang, text in zip(df["lang"], df["text"]):
        key = (lang, _pred(text))
        cells[key] = cells.get(key, 0) + 1
    rows = langid_confusion(spark, SF).collect()
    got = {(r.lang, r.pred_lang): r.n for r in rows}
    assert got == cells
    row_totals: dict[str, int] = {}
    for (lang, _), n in cells.items():
        row_totals[lang] = row_totals.get(lang, 0) + n
    for r in rows:
        assert r.recall_micro == r.n * MICRO // row_totals[r.lang]
        assert r.hit == (r.lang == r.pred_lang)


def test_matrix_invariants(spark):
    rows = langid_confusion(spark, SF).collect()
    # both polarities reach the table
    assert any(r.hit for r in rows) and any(not r.hit for r in rows)
    # per-true-language recall cells sum to ~1e6 (floor rounding only)
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        tot = sum(r.recall_micro for r in rs)
        assert MICRO - len(rs) < tot <= MICRO, lang
