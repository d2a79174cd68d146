"""URL algebra as Spark SQL expressions (SURVEY.md §2.2 P1-P5, F1-F3).

The domain-handler registry's first-match dispatch
(domain-handler-registry.ts:40-42) becomes an ordered CASE WHEN chain;
per-repo URL->PDF rewrites (generic-handler.ts:83-131 + configs
:179-404) become ``regexp_replace``/``regexp_extract`` chains; OpenReview
query handling uses ``parse_url``. Pure projections — codegen'd,
shuffle-free, pushdown-friendly.

Caveat (documented, tested): JS ``String.replace`` with a non-global
regex rewrites the FIRST match; Spark ``regexp_replace`` rewrites ALL.
The repo patterns match at most once on real repository URLs (asserted
against the Python oracle over the fixture corpus), so the semantics
coincide on the supported domains.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PINNED_DATE = "2026-01-01"


def _host(url: Column) -> Column:
    return F.lower(F.coalesce(F.parse_url(url, F.lit("HOST")), F.lit("")))


def _path(url: Column) -> Column:
    return F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit(""))


def _query_id(url: Column) -> Column:
    return F.parse_url(url, F.lit("QUERY"), F.lit("id"))


def _authority(url: Column) -> Column:
    """scheme://authority (keeps port/userinfo, unlike parse_url HOST)."""
    return F.regexp_extract(url, r"^([a-z][a-z0-9+.-]*://[^/?#]+)", 1)


def repo_domain(url: Column) -> Column:
    """P1 ``canHandle`` dispatch: registry order arxiv, openreview, acl,
    biorxiv, medrxiv, neurips, mlrp (generic-handler.ts:410-420)."""
    host, path = _host(url), _path(url)
    return (
        F.when(
            host.contains("arxiv.org")
            & path.rlike(r"/(abs|pdf|html)/([0-9]+\.[0-9]+|[\w-]+/[0-9]+)"),
            F.lit("arxiv"),
        )
        .when(
            host.contains("openreview.net") & path.rlike(r"/(forum|pdf|attachment)"),
            F.lit("openreview"),
        )
        .when(
            host.contains("aclanthology.org")
            & (path.rlike(r"/[0-9]{4}\.\w+-\w+\.[0-9]+") | path.rlike(r"/[A-Z][0-9]{2}-[0-9]{4}")),
            F.lit("acl"),
        )
        .when(
            host.contains("biorxiv.org") & path.rlike(r"/content/10\.1101/"),
            F.lit("biorxiv"),
        )
        .when(
            host.contains("medrxiv.org") & path.rlike(r"/content/10\.1101/"),
            F.lit("medrxiv"),
        )
        .when(
            (host.contains("papers.nips.cc") | host.contains("papers.neurips.cc"))
            & (path.rlike(r"/paper/") | path.rlike(r"/paper_files/paper/")),
            F.lit("neurips"),
        )
        .when(
            host.contains("proceedings.mlr.press") & path.rlike(r"/v[0-9]+/[a-z0-9]+"),
            F.lit("mlrp"),
        )
        .otherwise(F.lit(None).cast("string"))
    )


def _ensure_pdf(url: Column) -> Column:
    """ensurePdfExtension (base-handler.ts:47-52)."""
    return F.when(
        ~F.lower(url).endswith(".pdf"), F.concat(url, F.lit(".pdf"))
    ).otherwise(url)


def normalize_pdf_url(url: Column) -> Column:
    """P2 ``normalizePdfUrl`` under the P1 CASE (generic-handler.ts:83-131).

    Already-`.pdf` paths pass through; OpenReview keeps its query string
    on a `/pdf` path (:94-108); each repo's transform rule rewrites the
    path and the result gets the `.pdf` suffix guarantee.
    """
    domain = repo_domain(url)
    host, path = _host(url), _path(url)
    auth = _authority(url)
    qid = _query_id(url)
    query = F.parse_url(url, F.lit("QUERY"))

    def rebuilt(new_path: Column) -> Column:
        return F.concat(auth, new_path)

    arxiv = _ensure_pdf(rebuilt(F.regexp_replace(path, r"/(abs|html)/", "/pdf/")))
    acl = _ensure_pdf(rebuilt(F.regexp_replace(path, r"/([^/]+)$", r"/$1.pdf")))
    rxiv = _ensure_pdf(
        rebuilt(
            F.regexp_replace(
                path,
                r"/content/(10\.1101/[0-9.]+)(v[0-9]+)?(?:\.full\.pdf|\.full|$)",
                r"/content/$1$2.full.pdf",
            )
        )
    )
    neurips = F.when(
        path.rlike(r"(/paper(?:_files/paper)?/[0-9]{4})/hash/([^/]+)-Abstract\.html"),
        _ensure_pdf(
            rebuilt(
                F.regexp_replace(
                    path,
                    r"(/paper(?:_files/paper)?/[0-9]{4})/hash/([^/]+)-Abstract\.html",
                    r"$1/file/$2-Paper.pdf",
                )
            )
        ),
    ).otherwise(_ensure_pdf(url))  # no rule matched (:126)
    mlrp = _ensure_pdf(
        rebuilt(
            F.regexp_replace(path, r"/(v[0-9]+)/([a-z0-9]+)(?:\.html)?$", r"/$1/$2/$2.pdf")
        )
    )
    openreview = F.when(
        qid.isNull() | (qid == ""), url
    ).otherwise(
        F.concat(
            auth,
            F.lit("/pdf"),
            F.when(query.isNotNull(), F.concat(F.lit("?"), query)).otherwise(F.lit("")),
        )
    )

    return (
        F.when(F.lower(path).endswith(".pdf"), url)  # :89-91
        .when(domain == "openreview", openreview)
        .when(domain == "arxiv", arxiv)
        .when(domain == "acl", acl)
        .when((domain == "biorxiv") | (domain == "medrxiv"), rxiv)
        .when(domain == "neurips", neurips)
        .when(domain == "mlrp", mlrp)
        .otherwise(url)
    )


def repo_file_name(url: Column, now_date: str = PINNED_DATE) -> Column:
    """P3 ``getFileName`` templates + P5 generic fallback
    (generic-handler.ts:139-164 + configs; file-handler.ts:297-329)."""
    domain = repo_domain(url)
    path = _path(url)
    qid = _query_id(url)

    arxiv = F.concat(
        F.lit("arxiv-"),
        F.regexp_extract(path, r"/(abs|pdf|html)/([\w.-]+/?[0-9]+|[0-9]+\.[0-9]+)", 2),
        F.lit(".pdf"),
    )
    openreview = F.when(
        qid.isNotNull() & (qid != ""),
        F.concat(F.lit("openreview-"), qid, F.lit(".pdf")),
    ).otherwise(F.lit("openreview-paper.pdf"))
    acl = F.concat(
        F.lit("acl-"), F.regexp_extract(path, r"/([^/]+?)(?:\.pdf)?$", 1), F.lit(".pdf")
    )
    biorxiv = F.concat(
        F.lit("biorxiv-"), F.regexp_extract(path, r"10\.1101/([0-9.]+)", 1), F.lit(".pdf")
    )
    medrxiv = F.concat(
        F.lit("medrxiv-"), F.regexp_extract(path, r"10\.1101/([0-9.]+)", 1), F.lit(".pdf")
    )
    neurips_main = F.regexp_extract(
        path, r"/paper(?:_files/paper)?/([0-9]{4})/(?:hash|file)/([^/\-]+)", 0
    )
    neurips = F.when(
        neurips_main != "",
        F.concat(
            F.lit("neurips-"),
            F.regexp_extract(path, r"/paper(?:_files/paper)?/([0-9]{4})/(?:hash|file)/([^/\-]+)", 1),
            F.lit("-"),
            F.regexp_extract(path, r"/paper(?:_files/paper)?/([0-9]{4})/(?:hash|file)/([^/\-]+)", 2),
            F.lit(".pdf"),
        ),
    ).when(
        F.regexp_extract(path, r"/(?:hash|file)/([^/\-]+)", 1) != "",
        F.concat(
            F.lit("neurips-"),
            F.regexp_extract(path, r"/(?:hash|file)/([^/\-]+)", 1),
            F.lit(".pdf"),
        ),
    ).otherwise(F.lit(f"neurips-paper-{now_date}.pdf"))
    mlrp = F.concat(
        F.lit("mlrp-v"),
        F.regexp_extract(path, r"/v([0-9]+)/([a-z0-9]+)", 1),
        F.lit("-"),
        F.regexp_extract(path, r"/v([0-9]+)/([a-z0-9]+)", 2),
        F.lit(".pdf"),
    )

    # P5: generic last-path-segment fallback (file-handler.ts:297-329)
    last = F.element_at(F.split(path, "/"), -1)
    generic = F.when(
        (last.isNotNull()) & (F.trim(last) != ""),
        F.when(F.lower(last).endswith(".pdf"), last).otherwise(
            F.concat(last, F.lit(".pdf"))
        ),
    ).otherwise(F.lit(f"document-{now_date}.pdf"))

    return (
        F.when(domain == "arxiv", arxiv)
        .when(domain == "openreview", openreview)
        .when(domain == "acl", acl)
        .when(domain == "biorxiv", biorxiv)
        .when(domain == "medrxiv", medrxiv)
        .when(domain == "neurips", neurips)
        .when(domain == "mlrp", mlrp)
        .otherwise(generic)
    )


def validate_url(url: Column) -> Column:
    """F3 ``validateUrl`` (file-handler.ts:257-289): OpenReview needs a
    non-empty ``id`` param; handled domains are valid; generic URLs need
    scheme://authority and non-blank text."""
    qid = _query_id(url)
    wellformed = _authority(url) != ""
    return F.when(
        url.contains("openreview.net"),
        wellformed & qid.isNotNull() & (F.trim(qid) != ""),
    ).otherwise(
        wellformed
        & (repo_domain(url).isNotNull() | (F.trim(url) != ""))
    )
