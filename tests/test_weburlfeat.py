"""URL feature battery — exact feature extraction from adversarial
URL shapes and the integer spam-score arithmetic."""

from __future__ import annotations

from paper2llm_spark.operators.weburlfeat import (
    url_features, url_features_frame,
)

SF = "/root/testdata/sf0.001"


def _feat(spark, url):
    df = spark.createDataFrame([(0, url)], "doc_id long, url string")
    return url_features_frame(df).collect()[0]


def test_ip_host_port_session_deep_path(spark):
    r = _feat(spark, "http://10.0.1.2:8080/a/b/c/d?id=1&PHPSESSID=x9")
    assert r.host == "10.0.1.2"
    assert r.is_ip_host and r.has_port and r.has_session
    assert r.path_depth == 4 and r.n_params == 2
    # host '10.0.1.2': 5 digits of 8 chars -> 625 milli
    assert r.digit_milli == 625
    # 300000(ip) + 250000(session) + 100000(port) + 625*100 + 0 + 50000(deep)
    assert r.spam_micro == 762_500


def test_clean_url_scores_zero(spark):
    r = _feat(spark, "https://example.org/page")
    assert r.host == "example.org"
    assert not r.is_ip_host and not r.has_port and not r.has_session
    assert (r.path_depth, r.n_params, r.digit_milli, r.n_hyphens) == (1, 0, 0, 0)
    assert r.spam_micro == 0


def test_bare_host_has_depth_zero(spark):
    r = _feat(spark, "http://a-b-c.example.com")
    assert r.path_depth == 0 and r.n_hyphens == 2
    assert r.spam_micro == 40_000  # hyphens only


def test_sid_param_matches_mid_query(spark):
    r = _feat(spark, "http://e.com/x?a=1&sid=22&b=3")
    assert r.has_session and r.n_params == 3


def test_corpus_plants_every_shape(spark):
    rows = url_features(spark, SF).collect()
    assert any(r.is_ip_host for r in rows)
    assert any(r.has_port for r in rows)
    assert any(r.has_session for r in rows)
    assert {r.path_depth for r in rows} == {1, 2, 3, 4}
