"""CETR tag-ratio lines, Arc90 readability blocks and the
extractor-agreement audit — semantics beyond the driver's hash gate:
formula replays on handcrafted pages, smoothing promotion, prior
polarity, link-density penalty, non-vacuous corpus agreement."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

LONG_TEXT = "plain narrative words " * 12  # tagless content line


def _cetr(spark, page: str):
    from paper2llm_spark.operators.webcetr import cetr_lines_frame

    df = spark.createDataFrame(
        [("u", page.encode())], "url string, html binary"
    )
    return cetr_lines_frame(df).orderBy("line_idx").collect()


def test_cetr_tag_ratio_formula(spark):
    rows = _cetr(
        spark,
        '<div><a href="/">Home</a> <a href="/b">About</a></div>\n'
        f"{LONG_TEXT}\n"
        "<div>short</div>",
    )
    assert len(rows) == 3
    nav, content, short = rows
    # per-line features replayed by hand
    assert nav.tags == 6 and content.tags == 0 and short.tags == 2
    assert nav.tr_micro == (1_000_000 * nav.chars) // 6
    # tagless line: TR = chars / max(1, 0) = chars in micro
    assert content.tr_micro == content.chars * 1_000_000
    # (on a 3-line page the +-1 window promotes the content line's
    # neighbours too — non-promotion is covered by the stranded case)
    assert content.is_content == 1


def test_cetr_smoothing_promotes_short_line_between_content(spark):
    """A short bare line sandwiched between two long content lines is
    promoted by the +-1 smoothing window; the same line stranded in
    boilerplate is not."""
    nav = '<div><a href="/">H</a><a href="/b">A</a><a href="/c">C</a></div>'
    sandwiched = _cetr(
        spark, f"{nav}\n{nav}\n{LONG_TEXT}\nok then\n{LONG_TEXT}\n{nav}"
    )
    assert sandwiched[3].line_text == "ok then"
    assert sandwiched[3].is_content == 1   # window = content+short+content
    assert sandwiched[0].is_content == 0   # window = nav+nav

    stranded = _cetr(
        spark,
        '<div><a href="/">H</a><a href="/b">A</a><a href="/c">C</a></div>\n'
        "ok then\n"
        '<div><a href="/">H</a><a href="/b">A</a><a href="/c">C</a></div>\n'
        f"{LONG_TEXT}\n{LONG_TEXT}",
    )
    assert stranded[1].line_text == "ok then"
    assert stranded[1].is_content == 0


def test_cetr_script_dropped_and_blank_lines_skipped(spark):
    rows = _cetr(
        spark,
        "<script>\nvar boilerplate_that_would_count = 1;\n</script>\n"
        f"\n   \n{LONG_TEXT}",
    )
    assert len(rows) == 1 and rows[0].is_content == 1


def _arc90(spark, body: str):
    from paper2llm_spark.operators.webarc90 import arc90_blocks_frame

    page = f"<html><body>{body}</body></html>"
    df = spark.createDataFrame(
        [("u", page.encode())], "url string, html binary"
    )
    return arc90_blocks_frame(df).orderBy("block_idx").collect()


def test_arc90_score_decomposition(spark):
    rows = _arc90(
        spark,
        '<div class="article">one, two, three '
        + "x" * 250
        + "</div>"
        '<p>plain paragraph</p>'
        '<div id="comments">a remark</div>',
    )
    art, plain, comm = rows
    assert (art.prior, plain.prior, comm.prior) == (25, 0, -25)
    assert art.commas == 2
    # base = prior + 1 + commas + min(3, chars div 100)
    assert art.base_score == 25 + 1 + 2 + min(3, art.chars // 100)
    assert plain.base_score == 0 + 1 + 0 + 0
    # no links: penalty complement is exactly 1e6
    assert art.score_micro == art.base_score * 1_000_000
    assert (art.is_top, plain.is_top, comm.is_top) == (1, 0, 0)


def test_arc90_link_density_kills_link_farm(spark):
    rows = _arc90(
        spark,
        '<div class="main"><a href="/a">all of this text is anchor text'
        "</a></div>"
        '<p>genuine prose sentence</p>',
    )
    farm, prose = rows
    # chars == link_chars -> complement 0 -> score 0 despite +25 prior
    assert farm.prior == 25 and farm.score_micro == 0
    assert prose.is_top == 1


def test_arc90_negative_base_never_flips_sign_disagreement(spark):
    """ld_comp is clamped nonnegative, so a negative base stays exact
    under both Spark `div` (trunc) and DuckDB `//` (floor)."""
    rows = _arc90(spark, '<div class="sidebar">tiny</div>')
    (r,) = rows
    assert r.base_score < 0 and r.score_micro == r.base_score * 1_000_000


def test_agreement_exact_on_identical_extraction(spark):
    """Both extractors reduce a pure-content page to the same token
    set -> jaccard exactly 1e6; token counts replayed by hand."""
    from paper2llm_spark.operators.webvote import extract_agreement_frame

    para = "with the alpha of them with the beta of them " * 6
    page = f"<p>{para.strip()}</p>\n<p>{para.strip()}</p>"
    df = spark.createDataFrame(
        [("u", page.encode())], "url string, html binary"
    )
    (row,) = extract_agreement_frame(df).collect()
    expected = len(set(para.split()))
    assert (row.n_just, row.n_cetr, row.n_inter, row.n_union) == (
        expected, expected, expected, expected)
    assert row.jaccard_micro == 1_000_000


def test_agreement_corpus_not_vacuous(spark):
    """On the synthesized corpus both arms must extract something and
    must NOT agree perfectly (the extractors genuinely differ on nav
    promotion and short lines)."""
    from paper2llm_spark.operators.webvote import extract_agreement

    rows = extract_agreement(spark, SF).collect()
    assert len(rows) == 500
    assert all(r.n_just > 0 and r.n_cetr > 0 for r in rows)
    jac = [r.jaccard_micro for r in rows]
    assert all(0 < j < 1_000_000 for j in jac)
    assert min(jac) < max(jac), "vacuous: constant agreement"


def _bte(spark, page: str):
    from paper2llm_spark.operators.webbte import bte_extract_frame

    df = spark.createDataFrame(
        [("u", page.encode())], "url string, html binary"
    )
    (row,) = bte_extract_frame(df).collect()
    return row


def test_bte_kadane_replay_by_hand(spark):
    """Token signs: <div>=-1 home=+1 </div>=-1 one..five=+5 <a..>=-1
    x=+1 </a>=-1.  Score-5 spans tie (2..8, 4..8, 2..10); the
    deterministic tie-break is smallest END then the EARLIEST argmin
    prefix, so the leftmost-longest span 2..8 wins."""
    row = _bte(
        spark,
        '<div>home</div> one two three four five <a href="/">x</a>',
    )
    assert row.n_tokens == 11
    assert row.n_tags == 4
    assert (row.span_start, row.span_end, row.score) == (2, 8, 5)
    assert row.body_text == "home one two three four five"
    assert row.n_body_words == 6


def test_bte_leftmost_span_on_ties(spark):
    """Two equal-scoring word runs separated by a deep-negative tag
    wall: the deterministic tie-break keeps the EARLIEST span."""
    row = _bte(
        spark,
        "alpha beta <i></i><i></i><i></i><i></i> gamma delta",
    )
    assert (row.span_start, row.span_end) == (1, 2)
    assert row.body_text == "alpha beta"
    assert row.score == 2


def test_bte_span_crosses_cheap_tags(spark):
    """A single tag between word runs is worth crossing (+2-1+2 > +2):
    the span swallows the <b> pair, body text skips the tags."""
    row = _bte(spark, "one two <b>bold</b> three four")
    assert (row.span_start, row.span_end) == (1, 7)
    assert row.body_text == "one two bold three four"
    assert row.score == 5 - 2  # 5 words - 2 tags


def test_bte_script_blocks_stripped(spark):
    row = _bte(
        spark,
        "<script>var spam = 'w w w w w w';</script>real words here",
    )
    assert row.body_text == "real words here"
    assert row.n_tags == 0


def test_bte_corpus_excludes_chrome_keeps_paragraphs(spark):
    """On the synthesized corpus every recovered body contains the
    paragraph stopword wrap but never the nav/footer chrome."""
    from paper2llm_spark.operators.webbte import bte_extract

    rows = bte_extract(spark, SF).collect()
    assert len(rows) == 500
    for r in rows:
        assert "with the" in r.body_text
        assert "Home" not in r.body_text
        assert "copyright" not in r.body_text
        assert 0 < r.n_body_words < r.n_tokens


def _pipe(spark, page: str):
    from paper2llm_spark.operators.webpipe import pipe_blocks_frame

    df = spark.createDataFrame(
        [("u", page.encode())], "url string, html binary"
    )
    return pipe_blocks_frame(df).orderBy("block_idx").collect()


def test_boilerpipe_link_density_kill(spark):
    """A block whose anchor words exceed a third of its words is
    boilerplate regardless of context."""
    rows = _pipe(
        spark,
        '<div><a href="/">one two</a> three four five</div>'
        f"<p>{LONG_TEXT}</p>",
    )
    assert rows[0].n_words == 5 and rows[0].link_words == 2
    assert rows[0].ld_micro == 400_000
    assert rows[0].is_content == 0


def test_boilerpipe_tree_leaves_by_hand(spark):
    """Replay the published NumWordsRulesClassifier on a handcrafted
    block sequence: all-link nav (kill), 70-word lead after it
    (high-prev-ld, words>40 -> content), 4-word footer after an
    all-link sidebar (high-prev-ld, small -> boiler), 2-word closer
    after the 4-word footer (low branch, prev<=4 -> boiler)."""
    para = "w" + " w" * 69  # 70 words, no links
    rows = _pipe(
        spark,
        '<div><a href="/">Home About Contact</a></div>'
        f"<p>{para}</p>"
        '<div><a href="/x">related more links</a></div>'
        "<div>copyright 2024 example corp</div>"
        "<p>fin now</p>",
    )
    flags = [(r.n_words, r.is_content) for r in rows]
    assert flags == [(3, 0), (70, 1), (3, 0), (4, 0), (2, 0)]


def test_boilerpipe_neighbour_promotions(spark):
    """Low-prev-ld branch: a small block is content iff next>15 or
    prev>4 — both promotion arms and the no-promotion arm."""
    para = "w" + " w" * 69
    rows = _pipe(
        spark,
        "<p>short heading here</p>"     # prev none(0), next 70>15 -> 1
        f"<p>{para}</p>"                # 70>16 -> content
        "<p>small trailer block</p>"    # prev 70>4 -> content
        "<p>x</p>"                      # prev 3<=4, next 0 -> boiler
    )
    assert [r.is_content for r in rows] == [1, 1, 1, 0]


def test_boilerpipe_corpus_every_leaf_fires(spark):
    """On the synthesized corpus all five (is_content, kill, prev-high)
    combinations appear — the gate discriminates on every tree path."""
    from paper2llm_spark.operators.webpipe import pipe_blocks

    rows = pipe_blocks(spark, SF).collect()
    combos = {
        (r.is_content, r.ld_micro > 333_333, r.prev_ld_micro > 555_556)
        for r in rows
    }
    assert combos == {
        (0, True, False), (1, False, True), (1, False, False),
        (0, False, True), (0, False, False),
    }
