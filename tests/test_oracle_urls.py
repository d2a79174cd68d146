"""Oracle tests: URL algebra (FIXTURES.md F-URL) and payload detection."""

from paper2llm_spark.oracle.urls import (
    detect_payload,
    get_handler,
    normalize_url,
    url_file_name,
    validate_url,
)


def test_arxiv_abs_to_pdf():
    assert normalize_url("https://arxiv.org/abs/2401.00042") == "https://arxiv.org/pdf/2401.00042.pdf"
    assert normalize_url("https://arxiv.org/html/2401.00042") == "https://arxiv.org/pdf/2401.00042.pdf"
    # already .pdf passes through untouched
    assert normalize_url("https://arxiv.org/pdf/2401.00042.pdf") == "https://arxiv.org/pdf/2401.00042.pdf"


def test_arxiv_filename():
    assert url_file_name("https://arxiv.org/abs/2401.00042") == "arxiv-2401.00042.pdf"


def test_openreview_forum_to_pdf_keeps_query():
    assert (
        normalize_url("https://openreview.net/forum?id=AbCd123")
        == "https://openreview.net/pdf?id=AbCd123"
    )
    assert url_file_name("https://openreview.net/forum?id=AbCd123") == "openreview-AbCd123.pdf"


def test_openreview_missing_id_unchanged_and_invalid():
    assert normalize_url("https://openreview.net/forum") == "https://openreview.net/forum"
    assert validate_url("https://openreview.net/forum") is False
    assert validate_url("https://openreview.net/forum?id=x") is True


def test_acl_append_pdf():
    assert (
        normalize_url("https://aclanthology.org/2024.acl-long.123")
        == "https://aclanthology.org/2024.acl-long.123.pdf"
    )
    assert url_file_name("https://aclanthology.org/2024.acl-long.123") == "acl-2024.acl-long.123.pdf"


def test_biorxiv_full_pdf():
    assert (
        normalize_url("https://www.biorxiv.org/content/10.1101/2024.01.01.573456v2")
        == "https://www.biorxiv.org/content/10.1101/2024.01.01.573456v2.full.pdf"
    )
    assert (
        url_file_name("https://www.biorxiv.org/content/10.1101/2024.01.01.573456v1")
        == "biorxiv-2024.01.01.573456.pdf"
    )


def test_medrxiv_full_pdf():
    assert (
        normalize_url("https://www.medrxiv.org/content/10.1101/2023.12.12.571234v1")
        == "https://www.medrxiv.org/content/10.1101/2023.12.12.571234v1.full.pdf"
    )


def test_neurips_hash_to_file():
    url = "https://papers.nips.cc/paper_files/paper/2023/hash/abc123-Abstract.html"
    assert (
        normalize_url(url)
        == "https://papers.nips.cc/paper_files/paper/2023/file/abc123-Paper.pdf"
    )
    assert url_file_name(url) == "neurips-2023-abc123.pdf"


def test_mlrp_volume_paper():
    assert (
        normalize_url("https://proceedings.mlr.press/v202/smith23a.html")
        == "https://proceedings.mlr.press/v202/smith23a/smith23a.pdf"
    )
    assert url_file_name("https://proceedings.mlr.press/v202/smith23a") == "mlrp-v202-smith23a.pdf"


def test_registry_first_match_order():
    assert get_handler("https://arxiv.org/abs/2401.00042")["domain"] == "arxiv"
    assert get_handler("https://example.com/paper.pdf") is None


def test_generic_url_filename():
    assert url_file_name("https://example.com/files/mypaper.pdf") == "mypaper.pdf"
    assert url_file_name("https://example.com/files/mypaper") == "mypaper.pdf"
    assert url_file_name("https://example.com/") == "document-2026-01-01.pdf"


def test_validate_url_generic():
    assert validate_url("https://example.com/x") is True
    assert validate_url("not a url") is False


def test_detect_payload_magic_bytes():
    assert detect_payload(b"%PDF-1.4\n...") == "pdf"
    assert detect_payload(b"<!DOCTYPE html><html>") == "html"
    assert detect_payload(b"  <html><body>") == "html"
    assert detect_payload(b"") == "empty"
    assert detect_payload(b"\x00\x01binary junk") == "other"
