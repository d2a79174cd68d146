"""MinHash estimator error — full Python replay of both the sketch
estimate and the exact Jaccard, plus the Broder error bound."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

from paper2llm_spark.operators.dedup import (
    MH_PRIME, N_MINHASH, _MH_A, _MH_B,
)
from paper2llm_spark.operators.webmherr import MICRO, minhash_error

SF = "/root/testdata/sf0.001"


def _trigrams(text: str) -> set:
    tok = [t for t in text.lower().split() if t]
    return {" ".join(tok[i:i + 3]) for i in range(len(tok) - 2)}


def _sig(shingles: set) -> list[int]:
    hs = [int(hashlib.md5(s.encode()).hexdigest()[:8], 16) for s in shingles]
    return [
        min((_MH_A[i] * h + _MH_B[i]) % MH_PRIME for h in hs)
        for i in range(N_MINHASH)
    ]


def test_full_python_replay_and_error_bound(spark):
    df = pd.read_parquet(f"{SF}/documents.parquet")
    text = dict(zip(df["doc_id"], df["text"]))
    rows = minhash_error(spark, SF).collect()
    assert rows
    errs = []
    for r in rows:
        a, b = _trigrams(text[r.doc_a]), _trigrams(text[r.doc_b])
        true_j = round(len(a & b) / len(a | b), 4)
        sa, sb = _sig(a), _sig(b)
        est_j = round(sum(x == y for x, y in zip(sa, sb)) / N_MINHASH, 4)
        assert r.true_jaccard4 == true_j, (r.doc_a, r.doc_b)
        assert r.est_jaccard4 == est_j
        want_err = abs(int(est_j * MICRO + 0.5) - int(true_j * MICRO + 0.5))
        assert r.abs_err_micro == want_err
        errs.append(r.abs_err_micro / MICRO)
    # Broder: stderr = sqrt(j(1-j)/k); verified pairs sit near j~1 so
    # the error is small — allow 4 sigma at the worst case j=0.5
    assert sum(errs) / len(errs) < 4 * math.sqrt(0.25 / N_MINHASH)
