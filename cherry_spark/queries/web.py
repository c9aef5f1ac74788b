"""URL / domain curation queries (ext/web.py) over deterministic URLs
synthesized from the documents table — the same fixture-synthesis
pattern the decode queries use (queries/steps.py).  The synthesis
deliberately exercises every normalization rule: mixed-case scheme and
host, ``WWW.`` labels, a default ``:443`` port, trailing slashes,
``utm_*`` tracking params in leading/trailing/lone positions, and
fragments."""

from __future__ import annotations

from pyspark.sql import functions as F

from cherry_spark.catalog import query
from cherry_spark.sources.tables import load_table


def _synth_url_spark():
    d = F.col("doc_id")
    return F.concat(
        F.when(d % 2 == 0, F.lit("https://")).otherwise(F.lit("HTTPS://")),
        F.when(d % 7 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.col("source"),
        F.lit("Site.COM"),
        F.when(d % 11 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/Docs/"),
        (d % 50).cast("string"),
        F.when(d % 3 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(d % 4 == 0, F.concat(F.lit("?utm_source=feed&id="), (d % 10).cast("string")))
        .when(d % 4 == 1, F.concat(F.lit("?id="), (d % 10).cast("string"), F.lit("&utm_campaign=x")))
        .when(d % 4 == 2, F.lit("?utm_only=1"))
        .otherwise(F.lit("")),
        F.when(d % 5 == 0, F.lit("#Sec")).otherwise(F.lit("")),
    )


_SYNTH_URL_SQL = """
    (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'HTTPS://' END
     || CASE WHEN doc_id % 7 = 0 THEN 'WWW.' ELSE '' END
     || source || 'Site.COM'
     || CASE WHEN doc_id % 11 = 0 THEN ':443' ELSE '' END
     || '/Docs/' || CAST(doc_id % 50 AS VARCHAR)
     || CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END
     || CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed&id=' || CAST(doc_id % 10 AS VARCHAR)
             WHEN doc_id % 4 = 1 THEN '?id=' || CAST(doc_id % 10 AS VARCHAR) || '&utm_campaign=x'
             WHEN doc_id % 4 = 2 THEN '?utm_only=1' ELSE '' END
     || CASE WHEN doc_id % 5 = 0 THEN '#Sec' ELSE '' END)
"""


def _url_dedup_oracle() -> str:
    from cherry_spark.ext.web import normalize_url_sql

    norm = normalize_url_sql(_SYNTH_URL_SQL)
    return f"""
    WITH normed AS (
        SELECT doc_id, {norm} AS url_norm FROM documents
    ),
    canon AS (
        SELECT url_norm, CAST(MIN(doc_id) AS BIGINT) AS canonical_doc_id
        FROM normed GROUP BY 1
    )
    SELECT n.doc_id, n.url_norm, c.canonical_doc_id,
           CAST(CASE WHEN n.doc_id = c.canonical_doc_id THEN 1 ELSE 0 END
                AS INTEGER) AS is_canonical
    FROM normed n JOIN canon c USING (url_norm)
    """


@query(
    "url_dedup_canonical",
    oracle=_url_dedup_oracle(),
    doc="URL-level dedup (ext/web.py:url_dedup): normalize (fragment/"
    "case/port/www/tracking-param/trailing-slash rules, all RE2-safe "
    "scalar expressions) then keep the lowest-id doc per normalized "
    "URL. One min-agg + join back, no windows. The oracle replays the "
    "identical normalization chain in DuckDB.",
)
def url_dedup_canonical(spark, sf_dir):
    from cherry_spark.ext.web import url_dedup

    # parallelize measured a large LOSS here (1.11 -> 3.55 s median at
    # sf0.1) despite the heavy regex map — the extra exchange's cost
    # dominates; the window rewrite alone already halved the work
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", _synth_url_spark().alias("url")
    )
    out = url_dedup(docs)
    return out.select(
        "doc_id", "url_norm", "canonical_doc_id", "is_canonical"
    )


def _domain_stats_oracle() -> str:
    from cherry_spark.ext.web import normalize_url_sql, registered_domain_sql

    dom = registered_domain_sql(_SYNTH_URL_SQL)
    norm = normalize_url_sql(_SYNTH_URL_SQL)
    return f"""
    WITH base AS (
        SELECT {dom} AS domain, {norm} AS u, n_chars FROM documents
    ),
    per_url AS (
        SELECT domain, u, COUNT(*) AS n, SUM(n_chars) AS w
        FROM base GROUP BY 1, 2
    )
    SELECT domain, CAST(SUM(n) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_urls,
           CAST(SUM(w) AS BIGINT) AS total_n_chars
    FROM per_url GROUP BY 1
    """


@query(
    "domain_stats_report",
    oracle=_domain_stats_oracle(),
    doc="Per-registered-domain corpus stats (ext/web.py:domain_stats): "
    "doc count, distinct normalized URLs, total chars — the instrument "
    "behind per-domain caps and blocklists. Distinct via two-level "
    "agg (no Expand plan), naive two-label eTLD documented.",
)
def domain_stats_report(spark, sf_dir):
    from cherry_spark.ext.web import domain_stats

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", _synth_url_spark().alias("url")
    )
    return domain_stats(docs, weight_col="n_chars")


_SYNTH_HTML_SQL = """
    ('<html><head><title>' || source || '</title>'
     || '<style>p{margin:0}</style>'
     || '<script type="text/javascript">var t=1;</script></head>'
     || '<body><h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1>'
     || '<!-- id ' || CAST(doc_id AS VARCHAR) || ' -->'
     || '<p class="body">' || text
     || CASE WHEN doc_id % 3 = 0 THEN ' &amp; more &lt;tags&gt;' ELSE '' END
     || CASE WHEN doc_id % 5 = 0 THEN '&nbsp;&#39;q&#39;' ELSE '' END
     || '</p></body></html>')
"""


def _synth_html_spark():
    d = F.col("doc_id")
    return F.concat(
        F.lit("<html><head><title>"), F.col("source"), F.lit("</title>"),
        F.lit("<style>p{margin:0}</style>"),
        F.lit('<script type="text/javascript">var t=1;</script></head>'),
        F.lit("<body><h1>Doc "), d.cast("string"), F.lit("</h1>"),
        F.lit("<!-- id "), d.cast("string"), F.lit(" -->"),
        F.lit('<p class="body">'), F.col("text"),
        F.when(d % 3 == 0, F.lit(" &amp; more &lt;tags&gt;")).otherwise(F.lit("")),
        F.when(d % 5 == 0, F.lit("&nbsp;&#39;q&#39;")).otherwise(F.lit("")),
        F.lit("</p></body></html>"),
    )


def _html_oracle() -> str:
    from cherry_spark.ext.web import html_to_text_sql

    txt = html_to_text_sql(_SYNTH_HTML_SQL)
    return f"""
    SELECT doc_id, {txt} AS extracted,
           CAST(length({txt}) AS BIGINT) AS n_chars_extracted
    FROM documents
    """


@query(
    "html_extract_text",
    oracle=_html_oracle(),
    doc="HTML -> text content extraction (ext/web.py:html_to_text): "
    "script/style payload removal, comment/tag strip, predefined-"
    "entity decode (&amp; last, one level per pass), whitespace "
    "collapse — the C4/RefinedWeb first stage as a pure RE2-portable "
    "scalar chain; the fixture wraps each doc in a full HTML shell "
    "with planted entities. One scan, no UDF, no shuffle.",
)
def html_extract_text(spark, sf_dir):
    from cherry_spark.ext.web import html_to_text

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    extracted = html_to_text(_synth_html_spark())
    return docs.select(
        "doc_id",
        extracted.alias("extracted"),
        F.length(extracted).cast("long").alias("n_chars_extracted"),
    )


_EDGES_SQL = """
    edges AS (
        SELECT o_custkey % 80 AS src, o_orderkey % 100 AS dst
        FROM orders
    )
"""


def _pagerank_oracle() -> str:
    from cherry_spark.ext.graph import pagerank_oracle_sql

    body = pagerank_oracle_sql("edges", n_iters=5)
    # splice the edge synthesis CTE in front of the generated chain
    assert body.startswith("WITH ")
    return "WITH " + _EDGES_SQL.strip().rstrip() + ",\n" + body[len("WITH "):]


@query(
    "domain_pagerank",
    oracle=_pagerank_oracle(),
    doc="Integer-lane PageRank (ext/graph.py:pagerank) over a "
    "synthesized link graph — the link-centrality prior web-curation "
    "mixes feed on next to content quality. Fixed-point BIGINT "
    "arithmetic end to end (contribution split by integer div, exact "
    "rational damping, uniform dangling redistribution), so 5 "
    "iterations hash-match the oracle's unrolled CTE replay exactly — "
    "no tolerance verdict for an iterative float algorithm. Per "
    "iteration: one groupBy(dst) partial-agg sum + a broadcast 1-row "
    "dangling aggregate; plan depth bounded by per-round "
    "localCheckpoint (the CC invariant). Nodes 80-99 are dangling by "
    "construction (never a src).",
)
def domain_pagerank(spark, sf_dir):
    from cherry_spark.ext.graph import pagerank

    orders = load_table(spark, sf_dir, "orders", parallelize=True)
    edges = orders.select(
        (F.col("o_custkey") % 80).alias("src"),
        (F.col("o_orderkey") % 100).alias("dst"),
    )
    return pagerank(edges, n_iters=5).select("node", "rank_fp")


def _domain_cap_oracle() -> str:
    from cherry_spark.ext.web import registered_domain_sql

    dom = registered_domain_sql(_SYNTH_URL_SQL)
    return f"""
    WITH base AS (
        SELECT doc_id, {dom} AS domain, n_chars FROM documents
    ),
    ranked AS (
        SELECT doc_id, domain, n_chars,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY domain ORDER BY n_chars DESC, doc_id
               ) AS INTEGER) AS rk
        FROM base
    )
    SELECT doc_id, domain, CAST(n_chars AS BIGINT) AS n_chars, rk
    FROM ranked WHERE rk <= 5
    """


@query(
    "domain_cap_sample",
    oracle=_domain_cap_oracle(),
    doc="Per-domain document cap (ext/web.py:domain_cap) — the "
    "balancing step that stops a mega-domain from dominating the "
    "training mix: keep each registered domain's 5 best docs by "
    "(n_chars DESC, doc_id) — a total order, so the survivor set is "
    "deterministic and the oracle's bare window replay matches "
    "exactly. The engine side is the salted two-phase top-k (per "
    "(domain, salt) k-best via slice(array_sort(collect_list)), "
    "map-side combinable, then an exact window over <= cap*n_salt "
    "survivors) — a hot domain never lands in one task.",
)
def domain_cap_sample(spark, sf_dir):
    from cherry_spark.ext.web import domain_cap

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", _synth_url_spark().alias("url")
    )
    return domain_cap(docs, cap=5)


_BLOCKED = ["src3site.com", "src7site.com", "src12site.com"]


def _blocklist_oracle() -> str:
    from cherry_spark.ext.web import registered_domain_sql

    dom = registered_domain_sql(_SYNTH_URL_SQL)
    blocked = ", ".join(f"'{d}'" for d in _BLOCKED)
    return f"""
    SELECT doc_id, {dom} AS domain
    FROM documents
    WHERE {dom} NOT IN ({blocked})
    """


@query(
    "domain_blocklist_filter",
    oracle=_blocklist_oracle(),
    doc="Domain blocklist enforcement (ext/web.py:domain_filter): drop "
    "docs whose registered domain is blocklisted — broadcast "
    "anti-join (the blocklist is always small relative to the "
    "corpus), registered-domain extraction as the RE2-portable "
    "scalar chain. Survivors returned with their domain.",
)
def domain_blocklist_filter(spark, sf_dir):
    from cherry_spark.ext.web import domain_filter, registered_domain

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", _synth_url_spark().alias("url")
    )
    kept = domain_filter(docs, _BLOCKED)
    return kept.select(
        "doc_id", registered_domain(F.col("url")).alias("domain")
    )
