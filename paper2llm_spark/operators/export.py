"""Section-export assembly — O1/O2/O3 as Spark SQL over the output table.

``getSectionContent`` / ``getContentWithOptionalBibtex`` /
``calculateImageMetrics`` (content-utils.ts:17-252) re-expressed as
column expressions over the extracted rows (url, markdown, main_content,
backmatter, appendix, title). The reference's S7/S8 download/clipboard
sinks collapse into these columns being written with the output table.

The BibTeX branch is the pipeline's deterministic reality: the
pre-generated ``bibtex`` column is ``""`` (mock path quirk,
bibtex-generator.ts:534), so O2 always regenerates -> empty again ->
lands in the dated fallback mock-citation block (content-utils.ts:148-168)
with the title-mismatch warning (the mock's validation is hardcoded
``matches: false``, :519-525).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.refcols import title_extract_t1
from ..oracle.bibtex import PINNED_YEAR
from ..oracle.export import PINNED_DATE


def section_content(section: str, add_title: bool = False) -> Column:
    """O1 ``getSectionContent`` (content-utils.ts:17-87); NULL when the
    section is absent/empty (JS returns null for falsy content)."""
    md = F.col("markdown")
    main = F.col("main_content")
    back = F.col("backmatter")
    app = F.col("appendix")
    title = F.col("title")

    def _nonempty(c: Column) -> Column:
        return F.when(c.isNotNull() & (c != ""), c)

    if section == "full":
        content = _nonempty(md)
    elif section == "main":
        content = _nonempty(main)
    elif section == "appendix":
        content = _nonempty(app)
    elif section == "backmatter":
        content = _nonempty(back)
    elif section == "allparts":
        app_part = (
            F.when(
                app.isNotNull() & (app != ""),
                F.concat(F.lit("# "), title, F.lit(" - Appendix\n\n---\n\n"), app),
            )
            if add_title
            else _nonempty(app)
        )
        back_part = (
            F.when(
                back.isNotNull() & (back != ""),
                F.concat(F.lit("# "), title, F.lit(" - Backmatter\n\n---\n\n"), back),
            )
            if add_title
            else _nonempty(back)
        )
        content = _nonempty(
            F.concat_ws(
                "\n\n", F.array_compact(F.array(_nonempty(main), app_part, back_part))
            )
        )
    else:
        raise ValueError(f"unknown section {section!r}")

    if add_title and section in ("appendix", "backmatter"):
        section_title = section[0].upper() + section[1:]
        content = F.when(
            content.isNotNull(),
            F.concat(
                F.lit("# "), title, F.lit(f" - {section_title}\n\n---\n\n"), content
            ),
        )
    return content


def content_with_bibtex(
    section: str,
    add_title: bool = False,
    now_year: int = PINNED_YEAR,
    now_date: str = PINNED_DATE,
) -> Column:
    """O2 ``getContentWithOptionalBibtex`` (content-utils.ts:100-199),
    deterministic mock-regeneration branch (see module doc)."""
    content = section_content(section, add_title)
    if section not in ("full", "main", "allparts"):
        return content

    # on-demand regeneration extracts the title from the CONTENT
    # (generateBibTeXFromMarkdown, :139) — mock => matches:false => the
    # title warning block, then the dated fallback citation (:148-168)
    content_title = title_extract_t1(content)
    fallback_title = F.coalesce(F.col("title"), F.lit("Unknown Title"))
    bibtex = F.concat(
        F.lit("% WARNING: This is a fallback mock citation.\n"),
        F.lit("% WARNING: The paper title does not match the citation title.\n"),
        F.lit('% Paper title: "'), content_title, F.lit('"\n'),
        F.lit('% Citation title: "'), content_title, F.lit('"\n'),
        F.lit("% "),
        F.lit("% BibTeX generation failed to find this paper in academic databases.\n"),
        F.lit("% Please replace with the correct citation if available.\n"),
        F.lit("% \n"),
        F.lit(f"% Generated: {now_date}\n"),
        F.lit("@article{unknownYear,\n"),
        F.lit("  title={"),
        F.when(fallback_title != "", fallback_title).otherwise(F.lit("Unknown Title")),
        F.lit("},\n"),
        F.lit("  author={Unknown Author},\n"),
        F.lit("  journal={Unknown Journal},\n"),
        F.lit(f"  year={{{now_year}}},\n"),
        F.lit("  note={This is an automatically generated fallback citation}\n"),
        F.lit("}"),
    )
    return F.when(
        content.isNotNull(),
        F.concat(F.lit("```\n"), bibtex, F.lit("\n```\n\n---\n\n"), content),
    )


# S7 download suffixes: `${base}_main.md` / `_appendix` / `_backmatter`
# (useCopyDownload.ts:306,321,336) and `${base}${sectionName}.md` (:395)
SECTION_SUFFIX = {
    "full": "", "main": "_main", "appendix": "_appendix",
    "backmatter": "_backmatter",
}


def export_file_name(source_name: Column, section: str = "full") -> Column:
    """S7 download naming: base = source filename minus its extension
    (``sourceFilename.replace(/\\.[^/.]+$/, "")``, useCopyDownload.ts:74 —
    note the JS class excludes ``/`` so a dotted directory never loses a
    path segment), then the per-section suffix + ``.md``."""
    base = F.regexp_replace(source_name, r"\.[^/.]+$", "")
    return F.concat(base, F.lit(SECTION_SUFFIX[section] + ".md"))


def format_file_size(bytes_col: Column) -> Column:
    """O4 ``formatFileSize`` (format-utils.ts:18-26): ``{n} B`` under
    1024, else one-decimal KB under 1 MiB, else one-decimal MB. The
    branch tests the RAW byte count, so 1048530 bytes renders as
    ``1024.0 KB`` — quirk preserved. (``formatTimestamp`` is
    locale-dependent display and stays unported.)"""
    kb = F.round(bytes_col / F.lit(1024.0), 1)
    mb = F.round(bytes_col / F.lit(1048576.0), 1)
    return (
        F.when(bytes_col < 1024,
               F.concat(bytes_col.cast("long").cast("string"), F.lit(" B")))
        .when(bytes_col < 1048576, F.concat(kb.cast("string"), F.lit(" KB")))
        .otherwise(F.concat(mb.cast("string"), F.lit(" MB")))
    )


def format_timestamp(ts_col: Column) -> Column:
    """O4 ``formatTimestamp`` (format-utils.ts:7-10):
    ``new Date(isoString).toLocaleString()``. The reference's output
    depends on the viewer's host locale and timezone (display-only); the
    cluster column pins the en-US rendering in the session's UTC timezone
    so it is deterministic across executors —
    ``M/d/yyyy, h:mm:ss AM|PM``, exactly what V8 produces for en-US."""
    return F.date_format(ts_col, "M/d/y, h:mm:ss a")


def with_export_columns(extracted: DataFrame) -> DataFrame:
    """Attach the S7-download column set to the output table."""
    return (
        extracted.withColumn("export_full", section_content("full"))
        .withColumn("export_main", section_content("main"))
        .withColumn("export_appendix", section_content("appendix", add_title=True))
        .withColumn("export_backmatter", section_content("backmatter", add_title=True))
        .withColumn("export_allparts", section_content("allparts", add_title=True))
        .withColumn("export_full_bibtex", content_with_bibtex("full"))
    )
