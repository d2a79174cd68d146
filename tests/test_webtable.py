"""HTML table -> Markdown — semantics beyond the driver's hash gate:
header/separator layout, cell counts, and the no-table branch."""

from __future__ import annotations

from paper2llm_spark.operators.webtable import (
    table_extract, table_extract_frame,
)

SF = "/root/testdata/sf0.001"


def _extract(spark, pages: list[str]):
    df = spark.createDataFrame(
        [(f"u{i}", p) for i, p in enumerate(pages)],
        "url string, page string",
    )
    return {r.url: r for r in table_extract_frame(df).collect()}


def test_basic_table_to_gfm(spark):
    page = (
        "<html><body><table>"
        "<tr><th>a</th><th>b</th></tr>"
        "<tr><td>1</td><td>2</td></tr>"
        "<tr><td>3</td><td>4</td></tr>"
        "</table></body></html>"
    )
    r = _extract(spark, [page])["u0"]
    assert r.n_rows == 3 and r.n_cells == 6
    assert r.table_md == (
        "| a | b |\n| --- | --- |\n| 1 | 2 |\n| 3 | 4 |"
    )


def test_no_table_empty_output(spark):
    r = _extract(spark, ["<html><body><p>just prose</p></body></html>"])["u0"]
    assert (r.n_rows, r.n_cells, r.table_md) == (0, 0, "")


def test_separator_width_follows_header(spark):
    page = (
        "<table><tr><th>x</th><th>y</th><th>z</th></tr>"
        "<tr><td>1</td><td>2</td><td>3</td></tr></table>"
    )
    r = _extract(spark, [page])["u0"]
    assert "| --- | --- | --- |" in r.table_md
    assert r.n_cells == 6


def test_ragged_rows_counted_exactly(spark):
    # a data row with fewer cells than the header still renders
    page = (
        "<table><tr><th>a</th><th>b</th></tr>"
        "<tr><td>only</td></tr></table>"
    )
    r = _extract(spark, [page])["u0"]
    assert r.n_rows == 2 and r.n_cells == 3
    assert r.table_md.endswith("| only |")


def test_corpus_exercises_all_branches(spark):
    out = table_extract(spark, SF).collect()
    counts = {r.n_rows for r in out}
    assert counts == {0, 3, 4}
    for r in out:
        if r.n_rows:
            assert r.table_md.splitlines()[1].startswith("| ---")
        else:
            assert r.table_md == ""
