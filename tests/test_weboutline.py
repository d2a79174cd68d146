"""Heading-outline extraction — parent resolution on well-formed and
pathological trees, plus the no-heading zero-row branch."""

from __future__ import annotations

from paper2llm_spark.operators.weboutline import heading_outline, outline_frame

SF = "/root/testdata/sf0.001"


def _rows(spark, text: str):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    return sorted(outline_frame(df).collect(), key=lambda r: r.h_idx)


def test_well_formed_tree_parents(spark):
    rows = _rows(spark, "# A\nbody\n## B\n### C\n## D\n# E")
    assert [(r.level, r.parent_idx, r.title) for r in rows] == [
        (1, 0, "A"),
        (2, 1, "B"),
        (3, 2, "C"),
        (2, 1, "D"),   # parent is the NEAREST preceding smaller level
        (1, 0, "E"),
    ]
    assert [r.h_idx for r in rows] == [1, 2, 3, 4, 5]


def test_orphan_heading_gets_parent_zero(spark):
    rows = _rows(spark, "## Orphan\n# Top\n#### Jump")
    assert [(r.level, r.parent_idx) for r in rows] == [
        (2, 0),        # orphan ## before any #
        (1, 0),
        (4, 2),        # h1->h4 jump: parent = the h1 (nearest smaller)
    ]


def test_seven_hashes_is_not_a_heading(spark):
    rows = _rows(spark, "####### seven\n# one\n#nospace")
    assert [(r.level, r.title) for r in rows] == [(1, "one")]


def test_no_headings_no_rows(spark):
    assert _rows(spark, "plain prose\nno headings at all") == []


def test_corpus_plants_all_rolls(spark):
    out = heading_outline(spark, SF).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    sizes = {len(v) for v in by_doc.values()}
    assert 5 in sizes              # both plants emit 5 headings
    # roll-0 tree: root h1 has parent 0, its h2 children point at it
    some = next(v for v in by_doc.values() if len(v) == 5)
    some.sort(key=lambda r: r.h_idx)
    assert some[0].parent_idx == 0
    # roll-2 docs emit no rows: fewer docs with outlines than docs
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(by_doc) < n_docs
