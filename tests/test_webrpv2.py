"""Semantic tests for the RedPajama-v2 signal battery.

Cross-engine value equality vs DuckDB is covered by the parametrized
oracle gate in test_driver_contract.py; these replay the decoration
rolls and signal arithmetic in plain Python on crafted inputs so the
SEMANTICS (not just engine agreement) are pinned.
"""

from __future__ import annotations

import hashlib
import math

from paper2llm_spark.operators.webrpv2 import (
    BARE_MOD,
    BULLET_MOD,
    CAPS_MOD,
    ELLIPSIS_MOD,
    RPV2_SENT_TOKENS,
    rpv2_signals_frame,
)
from paper2llm_spark.operators.webquality import GOPHER_REQ_STOPWORDS

DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def _doc(i, text):
    return (i, text, "en", "s0", len(text))


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _replay(doc_id: int, text: str) -> dict:
    toks = [t for t in text.lower().split() if t]
    n_sent = (len(toks) + RPV2_SENT_TOKENS - 1) // RPV2_SENT_TOKENS
    lines = []
    for i in range(1, n_sent + 1):
        base = " ".join(toks[(i - 1) * RPV2_SENT_TOKENS:i * RPV2_SENT_TOKENS])
        if _h60(f"u:{doc_id}:{i}") % CAPS_MOD == 0:
            base = base.upper()
        bullet = "- " if _h60(f"b:{doc_id}:{i}") % BULLET_MOD == 0 else ""
        if _h60(f"e:{doc_id}:{i}") % ELLIPSIS_MOD == 0:
            end = "..."
        elif _h60(f"t:{doc_id}:{i}") % BARE_MOD == 0:
            end = ""
        else:
            end = "."
        lines.append(bullet + base + end)
    dtoks = [t for t in "\n".join(lines).split() if t]
    n = len(dtoks)
    counts: dict[str, int] = {}
    for t in dtoks:
        counts[t] = counts.get(t, 0) + 1
    lnu = lambda x: math.floor(math.log(x) * 1e6 + 0.5)  # noqa: E731
    ent_num = n * lnu(n) - sum(c * lnu(c) for c in counts.values())
    r4 = lambda x: math.floor(x * 1e4 + 0.5) / 1e4  # noqa: E731
    alpha = lambda t: any(ch.isalpha() for ch in t)  # noqa: E731
    caps = lambda t: any(  # noqa: E731
        "A" <= ch <= "Z" for ch in t
    ) and not any("a" <= ch <= "z" for ch in t)
    clean = lambda t: "".join(ch for ch in t.lower() if ch.isalpha())  # noqa: E731
    return {
        "word_count": n,
        "mean_word_length": r4(sum(len(t) for t in dtoks) / n),
        "frac_all_caps_words": r4(sum(caps(t) for t in dtoks) / n),
        "frac_no_alph_words": r4(sum(not alpha(t) for t in dtoks) / n),
        "frac_unique_words": r4(len(counts) / n),
        "stop_word_fraction": r4(
            sum(clean(t) in GOPHER_REQ_STOPWORDS for t in dtoks) / n
        ),
        "symbol_word_ratio": r4(
            sum(t.startswith("#") or "..." in t for t in dtoks) / n
        ),
        "entropy_micro_x_n": ent_num,
        "unigram_entropy": r4(ent_num / n / 1e6),
        "num_sentences": n_sent,
        "frac_lines_terminal_punct": r4(
            sum(bool(l) and l[-1] in '.!?"' for l in lines) / n_sent
        ),
        "frac_lines_end_ellipsis": r4(
            sum(l.endswith("...") for l in lines) / n_sent
        ),
        "frac_lines_start_bullet": r4(
            sum(l.startswith("- ") for l in lines) / n_sent
        ),
        "frac_lines_all_caps": r4(
            sum(l == l.upper() and any(ch.isalpha() for ch in l)
                for l in lines) / n_sent
        ),
    }


def test_rpv2_signals_replay_exact(spark):
    texts = {
        1: "the quick brown fox jumps over the lazy dog and then "
           "the dog naps under the old oak tree all afternoon long "
           "while birds sing songs of summer above the shaded yard",
        2: "alpha beta gamma delta epsilon zeta eta theta iota kappa "
           "lambda mu nu xi omicron pi rho sigma tau upsilon",
        3: "one two three",
    }
    rows = [_doc(i, t) for i, t in texts.items()]
    out = {
        r["doc_id"]: r.asDict()
        for r in rpv2_signals_frame(
            spark.createDataFrame(rows, DOC_SCHEMA)
        ).collect()
    }
    for doc_id, text in texts.items():
        want = _replay(doc_id, text)
        got = {k: out[doc_id][k] for k in want}
        assert got == want, (doc_id, got, want)


def test_rpv2_empty_doc_vanishes(spark):
    # zero tokens -> zero exploded rows -> no output row, same as the
    # dual's unnest over an empty list
    rows = [_doc(1, "   "), _doc(2, "hello world")]
    out = rpv2_signals_frame(
        spark.createDataFrame(rows, DOC_SCHEMA)
    ).collect()
    assert [r["doc_id"] for r in out] == [2]
