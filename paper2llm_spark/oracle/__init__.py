"""Pure-Python oracle library (Phase 0 of SURVEY.md §7).

Transliterates the deterministic reference functions of lacerbi/paper2llm
with exact cited semantics. This module is BOTH the golden-output
generator for tests AND the body of the Spark pandas UDFs — one
implementation, two call sites, which is what keeps "byte-identical"
true by construction.
"""

from . import assemble, bibtex, enhance, export, jsstr, pipeline, splitter, urls, vision

__all__ = [
    "assemble",
    "bibtex",
    "enhance",
    "export",
    "jsstr",
    "pipeline",
    "splitter",
    "urls",
    "vision",
]
