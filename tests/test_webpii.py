"""PII redaction — semantics beyond the driver's hash gate: per-class
counts, sequential redaction bytes, and the clean branch."""

from __future__ import annotations

from paper2llm_spark.operators.webpii import (
    pii_redact, pii_redact_frame, synth_pii_docs,
)

SF = "/root/testdata/sf0.001"


def _redact(spark, texts: list[str]):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {r.doc_id: r for r in pii_redact_frame(df).collect()}


def test_all_three_classes_counted_and_redacted(spark):
    t = (
        "Mail bob.smith+x@corp.example.org, host 10.1.2.3, "
        "call 555-123-4567."
    )
    r = _redact(spark, [t])[0]
    assert (r.n_email, r.n_ip, r.n_phone, r.n_pii) == (1, 1, 1, 3)
    expected = "Mail <EMAIL>, host <IP>, call <PHONE>."
    assert r.redacted_len == len(expected)
    import hashlib
    assert r.redacted_md5 == hashlib.md5(expected.encode()).hexdigest()


def test_phone_inside_email_counted_but_redacted_as_email(spark):
    # counts run on the ORIGINAL text: the dashed digits inside the
    # local part ALSO match the phone pattern; redaction is
    # sequential (email first), so the phone token never appears.
    r = _redact(spark, ["reach 555-867-5309@relay.example.com now"])[0]
    assert r.n_email == 1 and r.n_phone == 1
    assert r.redacted_len == len("reach <EMAIL> now")


def test_clean_text_untouched(spark):
    t = "no personal data here, just prose about version 2.5"
    r = _redact(spark, [t])[0]
    assert r.n_pii == 0
    assert r.redacted_len == len(t)


def test_trailing_punctuation_not_swallowed(spark):
    r = _redact(spark, ["write admin@test.org."])[0]
    assert r.n_email == 1
    assert r.redacted_len == len("write <EMAIL>.")


def test_corpus_plants_every_class(spark):
    out = pii_redact(spark, SF)
    agg = out.groupBy().sum("n_email", "n_ip", "n_phone").collect()[0]
    assert agg[0] > 0 and agg[1] > 0 and agg[2] > 0
    clean = out.filter(out.n_pii == 0).count()
    assert 0 < clean < out.count()


def test_plant_is_deterministic(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = {r.doc_id: r.text for r in synth_pii_docs(docs).collect()}
    b = {r.doc_id: r.text for r in synth_pii_docs(docs).collect()}
    assert a == b
