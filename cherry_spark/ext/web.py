"""URL / domain curation — the web-crawl half of training-data
hygiene (C4/RefinedWeb-style pipelines dedup by normalized URL and
cap/filter by registered domain before any content dedup runs).

Everything is native column expressions (no UDF), and every regex is
written to the RE2-compatible subset (no lookaround, no backreference
in pattern OR replacement) so the DuckDB oracles replay the identical
transformation — the same portability rule as the PII scrubber
(ext/text.py).

Normalization rules (documented contract, applied in this order):

1. strip the fragment (``#...``);
2. lowercase the scheme+host part only (paths stay case-sensitive);
3. drop a default port (``http://...:80``, ``https://...:443``);
4. drop a leading ``www.`` host label;
5. drop tracking query params (``utm_*``, ``fbclid``, ``gclid``),
   fixing up separators; a query string left empty loses its ``?``;
6. strip trailing ``/`` at the very end of the URL.

``url_domain`` / ``registered_domain`` extract the host and its last
two labels (naive eTLD — a real deployment would swap in the public
suffix list; the two-label rule is deterministic and dependency-free).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEME_HOST = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"
_TRACK = "(utm_[A-Za-z0-9_]*|fbclid|gclid)"


def normalize_url(url: Column) -> Column:
    """Canonical form of a URL per the module contract — one chain of
    scalar expressions, no UDF."""
    u = F.regexp_replace(url, "#.*$", "")  # 1. fragment
    sh = F.regexp_extract(u, _SCHEME_HOST, 0)
    rest = u.substr(F.length(sh) + 1, F.lit(1 << 30))
    sh = F.lower(sh)  # 2. scheme+host lowercase
    sh = F.when(  # 3. default ports
        sh.startswith("http://") & sh.endswith(":80"),
        sh.substr(F.lit(1), F.length(sh) - 3),
    ).when(
        sh.startswith("https://") & sh.endswith(":443"),
        sh.substr(F.lit(1), F.length(sh) - 4),
    ).otherwise(sh)
    sh = F.regexp_replace(sh, "://www\\.", "://")  # 4. www.
    # 5. tracking params: &-prefixed anywhere, then a ?-prefixed one
    #    followed by a kept param, then a lone ?-prefixed one at end
    rest = F.regexp_replace(rest, "&" + _TRACK + "=[^&#]*", "")
    rest = F.regexp_replace(rest, "\\?" + _TRACK + "=[^&#]*&", "?")
    rest = F.regexp_replace(rest, "\\?" + _TRACK + "=[^&#]*$", "")
    out = F.concat(sh, rest)
    return F.regexp_replace(out, "/+$", "")  # 6. trailing slash


def normalize_url_sql(expr: str) -> str:
    """DuckDB twin of :func:`normalize_url` over SQL expression
    ``expr`` — same steps, same RE2 patterns, 'g' flags to match
    Spark's replace-all semantics."""
    u = f"regexp_replace({expr}, '#.*$', '')"
    sh = f"regexp_extract({u}, '{_SCHEME_HOST}', 0)"
    rest = f"substr({u}, length({sh}) + 1)"
    shl = f"lower({sh})"
    shp = (
        f"CASE WHEN {shl} LIKE 'http://%' AND {shl} LIKE '%:80' "
        f"THEN substr({shl}, 1, length({shl}) - 3) "
        f"WHEN {shl} LIKE 'https://%' AND {shl} LIKE '%:443' "
        f"THEN substr({shl}, 1, length({shl}) - 4) ELSE {shl} END"
    )
    shw = f"regexp_replace({shp}, '://www\\.', '://')"
    r1 = f"regexp_replace({rest}, '&{_TRACK}=[^&#]*', '', 'g')"
    r2 = f"regexp_replace({r1}, '\\?{_TRACK}=[^&#]*&', '?', 'g')"
    r3 = f"regexp_replace({r2}, '\\?{_TRACK}=[^&#]*$', '', 'g')"
    return f"regexp_replace({shw} || {r3}, '/+$', '', 'g')"


def url_domain(url: Column) -> Column:
    """Lowercased host with any leading ``www.`` dropped (no ports)."""
    host = F.lower(
        F.regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)", 1)
    )
    return F.regexp_replace(host, "^www\\.", "")


def url_domain_sql(expr: str) -> str:
    host = (
        f"lower(regexp_extract({expr}, "
        f"'^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)', 1))"
    )
    return f"regexp_replace({host}, '^www\\.', '')"


def registered_domain(url: Column) -> Column:
    """Last two host labels (naive eTLD+1)."""
    return F.regexp_extract(url_domain(url), "([^.]+\\.[^.]+)$", 1)


def registered_domain_sql(expr: str) -> str:
    return f"regexp_extract({url_domain_sql(expr)}, '([^.]+\\.[^.]+)$', 1)"


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per input doc with its normalized URL and the canonical
    (lowest-id) doc holding that URL: ``url_norm``,
    ``canonical_doc_id``, ``is_canonical``.  Filter
    ``is_canonical = 1`` for the deduped corpus; keep all rows for the
    URL-level provenance map.

    Scale shape (r15, guide §2.4): ONE min-window partitioned by the
    normalized URL — one scan, one exchange, one sort, and the regex
    normalization chain evaluates exactly once per row. The previous
    agg + join-back form evaluated the chain FOUR times per row (both
    join branches re-projected it, and the inner join's implied
    isnotnull(url_norm) null filter inlined the whole chain again under
    each branch) and paid the aggregate's exchange plus a broadcast
    build on top of the join exchange. Null semantics preserved: the
    inner join dropped null-url_norm rows; url_norm is null iff the
    raw url is null (every normalization step is null-preserving and
    null-introducing only from null input), so the cheap pre-normalize
    ``url IS NOT NULL`` filter is exactly equivalent and keeps the
    regex chain out of the filter expression."""
    from pyspark.sql.window import Window

    normed = df.where(F.col(url_col).isNotNull()).withColumn(
        "url_norm", normalize_url(F.col(url_col))
    )
    w = Window.partitionBy("url_norm")
    return normed.withColumn(
        "canonical_doc_id", F.min(F.col(id_col).cast("long")).over(w)
    ).withColumn(
        "is_canonical",
        (F.col(id_col) == F.col("canonical_doc_id")).cast("int"),
    )


def domain_stats(
    df: DataFrame,
    url_col: str = "url",
    weight_col: str | None = None,
) -> DataFrame:
    """Per registered domain: ``n_docs``, ``n_urls`` (distinct
    normalized), and optional ``total_<weight>`` — the instrument
    behind per-domain caps and blocklist decisions. One scan, one
    grouped agg (distinct via two-level agg, no Expand)."""
    base = df.select(
        registered_domain(F.col(url_col)).alias("domain"),
        normalize_url(F.col(url_col)).alias("__u"),
        *([F.col(weight_col)] if weight_col else []),
    )
    per_url = base.groupBy("domain", "__u").agg(
        F.count(F.lit(1)).alias("__n"),
        *(
            [F.sum(weight_col).cast("long").alias("__w")]
            if weight_col
            else []
        ),
    )
    aggs = [
        F.sum("__n").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_urls"),
    ]
    if weight_col:
        aggs.append(F.sum("__w").cast("long").alias(f"total_{weight_col}"))
    return per_url.groupBy("domain").agg(*aggs)


def domain_filter(
    df: DataFrame,
    blocked_domains: DataFrame | list[str],
    url_col: str = "url",
) -> DataFrame:
    """Drop docs whose registered domain is blocklisted — broadcast
    anti-join (the blocklist is always small relative to the corpus)."""
    spark = df.sparkSession
    if isinstance(blocked_domains, list):
        blocked_domains = spark.createDataFrame(
            [(d,) for d in blocked_domains], "domain string"
        )
    withdom = df.withColumn("__dom", registered_domain(F.col(url_col)))
    return (
        withdom.join(
            F.broadcast(blocked_domains.select(F.col("domain").alias("__dom"))),
            "__dom",
            "left_anti",
        ).drop("__dom")
    )


def domain_cap(
    df: DataFrame,
    cap: int = 5,
    url_col: str = "url",
    id_col: str = "doc_id",
    quality_col: str = "n_chars",
    n_salt: int = 16,
) -> DataFrame:
    """Per-registered-domain document cap — the CommonCrawl-style
    balancing step that stops one mega-domain from dominating a
    training mix: keep each domain's ``cap`` best docs by
    (``quality_col`` DESC, ``id_col`` ASC — a total order, so the
    survivor set is deterministic).  Returns
    ``(id_col, domain, quality_col, rk)`` with ``rk`` in 1..cap.

    Scale shape: a bare ``row_number() OVER (PARTITION BY domain)``
    puts a mega-domain's every row into ONE task; instead the salted
    two-phase top-k (the ``jaccard_topk`` /  ``brute_force_topk``
    trick): per (domain, salt) keep the k best via
    ``slice(array_sort(collect_list(struct)))`` in pure JVM
    expressions — map-side combinable, a hot domain spreads over
    ``n_salt`` partial groups — then an exact window over
    <= cap * n_salt survivors per domain.  The salt is deterministic
    (``pmod(id, n_salt)``) so replays are stable."""
    base = df.select(
        F.col(id_col),
        registered_domain(F.col(url_col)).alias("domain"),
        F.col(quality_col),
        F.pmod(F.col(id_col), F.lit(n_salt)).alias("__salt"),
    )
    # ascending struct sort == (quality DESC, id ASC): negate the
    # quality lane (plain BIGINT — the DECIMAL unary-minus trap does
    # not apply at int64 scale)
    phase1 = (
        base.groupBy("domain", "__salt")
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            (-F.col(quality_col)).alias("negq"),
                            F.col(id_col).alias("id"),
                        )
                    )
                ),
                1,
                cap,
            ).alias("best")
        )
        .select("domain", F.explode("best").alias("b"))
        .select(
            "domain",
            F.col("b.id").alias(id_col),
            (-F.col("b.negq")).alias(quality_col),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("domain").orderBy(
        F.col(quality_col).desc(), F.col(id_col)
    )
    return (
        phase1.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= cap)
        .select(id_col, "domain", quality_col, "rk")
    )


_HTML_STEPS: list[tuple[str, str]] = [
    # script/style payloads go first (their CONTENT must vanish, not
    # just their tags); non-greedy [\s\S] spans newlines without the
    # dotall flag, (?i) is RE2-portable
    (r"(?i)<script[^>]*>[\s\S]*?</script>", " "),
    (r"(?i)<style[^>]*>[\s\S]*?</style>", " "),
    (r"<!--[\s\S]*?-->", " "),
    (r"<[^>]+>", " "),  # every remaining tag
    # entities: the five predefined + nbsp + decimal numerics; &amp;
    # decodes LAST so '&amp;lt;' yields '&lt;' not '<'
    (r"&nbsp;", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    (r"&amp;", "&"),
    (r"[ \t\r\n]+", " "),  # collapse whitespace
]


def html_to_text(html: Column) -> Column:
    """Plain text from an HTML payload — the content-extraction first
    stage of a web-corpus pipeline (C4/RefinedWeb shape), as a chain of
    RE2-portable scalar regexes: drop script/style WITH their payloads,
    drop comments and tags, decode the predefined entities (&amp;
    last, so double-escaped entities un-escape one level per pass like
    every standard extractor), collapse whitespace, trim.  No UDF; the
    DuckDB twin replays the identical chain."""
    out = html
    for pat, rep in _HTML_STEPS:
        out = F.regexp_replace(out, pat, rep)
    return F.trim(out)


def html_to_text_sql(expr: str) -> str:
    """DuckDB twin of :func:`html_to_text` ('g' flags mirror Spark's
    replace-all)."""
    out = expr
    for pat, rep in _HTML_STEPS:
        p = pat.replace("'", "''")
        r = rep.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{r}', 'g')"
    return f"trim({out})"
