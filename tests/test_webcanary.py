"""Privacy canary audit — detector recall/false-positive contract
and plant-structure replay."""

from __future__ import annotations

import pandas as pd

from paper2llm_spark.operators.webcanary import (
    CARRIER_MOD, LEAK_MOD, canary_audit,
)

SF = "/root/testdata/sf0.001"


def test_recall_one_no_false_positives(spark):
    df = pd.read_parquet(f"{SF}/documents.parquet")
    carriers = {int(d) for d in df["doc_id"] if d % CARRIER_MOD == 0}
    leaked = {d for d in carriers if d % LEAK_MOD == 0}
    rows = {r.doc_id: r for r in canary_audit(spark, SF).collect()}
    assert set(rows) == carriers
    assert leaked and leaked != carriers  # both polarities planted
    for d, r in rows.items():
        assert r.leaked == (d in leaked)
        if r.leaked:
            # the Secret Sharer contract: every planted leak is caught
            assert r.leak_detected and r.carrier_flagged
            assert r.leak_span_toks == 5  # the whole canary, exactly
        else:
            # a secret that never left its document must NOT be flagged
            assert not r.leak_detected and not r.carrier_flagged
            assert r.leak_span_toks == 0
