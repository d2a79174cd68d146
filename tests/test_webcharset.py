"""Charset sniff — semantics beyond the driver's hash gate: every
precedence branch of the HTML5 prescan subset on handcrafted payloads."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"

BOM = b"\xef\xbb\xbf"


def _sniff(spark, payloads: list[bytes]):
    from paper2llm_spark.operators.webcharset import charset_sniff_frame

    df = spark.createDataFrame(
        [(f"u{i}", p) for i, p in enumerate(payloads)],
        "url string, html binary",
    )
    return {r.url: r for r in charset_sniff_frame(df).collect()}


def test_precedence_branches(spark):
    rows = _sniff(spark, [
        BOM + b"<html>plain</html>",                              # u0
        b'<meta charset="windows-1252"><html>x</html>',           # u1
        b'<meta http-equiv="Content-Type" '
        b'content="text/html; charset=ISO-8859-1"><html>x</html>',  # u2
        "café".encode("utf-8"),                              # u3
        b"plain ascii only",                                      # u4
    ])
    assert rows["u0"].detected == "utf-8-bom" and rows["u0"].has_bom == 1
    assert rows["u1"].detected == "windows-1252"
    assert rows["u2"].detected == "iso-8859-1"   # lowercased
    assert rows["u3"].detected == "utf-8"
    assert rows["u3"].n_bytes == 5 and rows["u3"].n_chars == 4
    assert rows["u4"].detected == "ascii"
    assert rows["u4"].n_bytes == rows["u4"].n_chars


def test_bom_beats_meta_declaration(spark):
    """The spec's precedence: a BOM wins over any meta declaration."""
    rows = _sniff(
        spark, [BOM + b'<meta charset="shift_jis"><html>x</html>']
    )
    assert rows["u0"].detected == "utf-8-bom"
    assert rows["u0"].declared == "shift_jis"  # still extracted


def test_corpus_exercises_all_classes(spark):
    from paper2llm_spark.operators.webcharset import charset_sniff

    rows = charset_sniff(spark, SF).collect()
    assert len(rows) == 500
    classes = {r.detected for r in rows}
    assert classes == {
        "utf-8-bom", "windows-1252", "iso-8859-1", "utf-8", "ascii"
    }, classes
