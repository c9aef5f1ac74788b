"""Web-crawl ingest example: the round-8 curation family composed
end-to-end the way a crawl-to-corpus pipeline runs it —

  raw (url, html) crawl records
    -> HTML -> text extraction            (ext/web.py:html_to_text)
    -> URL normalization + URL-level dedup (keep canonical)
    -> domain blocklist filter             (broadcast anti-join)
    -> per-domain stats                    (cap/blocklist instrument)
    -> Bloom membership state over admitted URL hashes, probed by the
       NEXT crawl batch so re-crawled pages skip the pipeline entirely
       (ext/bloom.py — 0.5 MB of state per 50k URLs at 1% FP)

Everything before the Bloom build is scalar expressions on one scan;
the only shuffles are the URL min-agg and the domain rollup.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _synth_crawl(spark, sf_dir: str):
    """Deterministic (url, html) crawl records from the documents
    fixture — same synthesis family as the certified web queries."""
    from cherry_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    url = F.concat(
        F.when(d % 2 == 0, F.lit("https://")).otherwise(F.lit("HTTPS://")),
        F.when(d % 7 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.col("source"),
        F.lit("Site.COM/page/"),
        (d % 200).cast("string"),
        F.when(d % 4 == 0, F.lit("?utm_source=crawl")).otherwise(F.lit("")),
    )
    html = F.concat(
        F.lit("<html><body><h1>"),
        F.col("source"),
        F.lit("</h1><script>t()</script><p>"),
        F.col("text"),
        F.lit("</p></body></html>"),
    )
    return docs.select(
        "doc_id", url.alias("url"), html.alias("html"), "lang"
    )


def run(spark, sf_dir: str, blocked: list[str] | None = None) -> dict:
    from cherry_spark.ext.bloom import bloom_build, bloom_probe
    from cherry_spark.ext.web import (
        domain_filter,
        domain_stats,
        html_to_text,
        normalize_url,
        url_dedup,
    )

    crawl = _synth_crawl(spark, sf_dir)
    n_raw = crawl.count()

    extracted = crawl.withColumn("text", html_to_text(F.col("html"))).drop(
        "html"
    )
    deduped = url_dedup(extracted).filter(F.col("is_canonical") == 1)
    kept = domain_filter(deduped, blocked or [])
    # one fan-out point: stats + bloom + counts all consume `kept`
    kept = kept.localCheckpoint(eager=False)
    stats = domain_stats(kept, url_col="url", weight_col=None)

    m_bits, k = 1 << 20, 5
    seen = bloom_build(
        kept.select(F.col("url_norm").alias("key")), m_bits=m_bits, k_hashes=k
    ).localCheckpoint(eager=True)

    # the NEXT crawl batch: half re-crawls (same normalized URL), half
    # fresh pages — re-crawls must be flagged WITHOUT touching the
    # corpus (that is the point of the membership state)
    next_batch = crawl.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 0, normalize_url(F.col("url"))
        ).otherwise(
            F.concat(F.lit("https://fresh.example/"), F.col("doc_id").cast("string"))
        ).alias("key"),
    )
    probed = bloom_probe(
        next_batch, seen, key_col="key", m_bits=m_bits, k_hashes=k
    )
    n_skip = probed.filter(F.col("maybe_in_set") == 1).count()

    return {
        "n_raw": n_raw,
        "n_canonical": kept.count(),
        "domains": stats,
        "n_recrawls_skipped": n_skip,
    }


if __name__ == "__main__":
    from cherry_spark.session import get_spark

    spark = get_spark("web_ingest_example", cpus=8)
    out = run(spark, "/root/testdata/sf0.01", blocked=["src3site.com"])
    print(
        f"raw {out['n_raw']} -> canonical {out['n_canonical']}; "
        f"re-crawls skipped by bloom: {out['n_recrawls_skipped']}"
    )
    out["domains"].orderBy(F.desc("n_docs")).show(5, truncate=False)
