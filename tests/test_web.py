"""URL/domain curation (ext/web.py): normalization contract edge
cases, URL dedup, domain stats/filter."""

from __future__ import annotations

from pyspark.sql import functions as F

from cherry_spark.ext.web import (
    domain_filter,
    domain_stats,
    normalize_url,
    registered_domain,
    url_dedup,
    url_domain,
)


def _norm(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r["n"] for r in df.select(normalize_url(F.col("url")).alias("n")).collect()]


def test_normalize_url_contract(spark):
    cases = {
        # fragment stripped
        "https://a.com/x#frag": "https://a.com/x",
        # scheme+host lowered, PATH case preserved
        "HTTPS://A.Com/Path/X": "https://a.com/Path/X",
        # default ports dropped, non-default kept
        "http://a.com:80/x": "http://a.com/x",
        "https://a.com:443/x": "https://a.com/x",
        "https://a.com:8443/x": "https://a.com:8443/x",
        # www dropped
        "https://www.a.com/x": "https://a.com/x",
        # tracking params: mid, leading-with-kept, lone, consecutive
        "https://a.com/x?id=1&utm_source=f": "https://a.com/x?id=1",
        "https://a.com/x?utm_source=f&id=1": "https://a.com/x?id=1",
        "https://a.com/x?utm_source=f": "https://a.com/x",
        "https://a.com/x?a=1&utm_a=1&utm_b=2&b=2": "https://a.com/x?a=1&b=2",
        "https://a.com/x?gclid=z&fbclid=y": "https://a.com/x",
        # trailing slash stripped (also multiple)
        "https://a.com/x/": "https://a.com/x",
        "https://a.com///": "https://a.com",
        # everything at once
        "HTTP://WWW.A.com:80/P/q/?utm_c=1#f": "http://a.com/P/q",
    }
    got = _norm(spark, list(cases))
    assert got == list(cases.values())


def test_domain_extraction(spark):
    df = spark.createDataFrame(
        [("https://www.news.Example.COM:443/a",), ("http://single.io/b",)],
        "url string",
    )
    out = df.select(
        url_domain(F.col("url")).alias("h"),
        registered_domain(F.col("url")).alias("d"),
    ).collect()
    assert (out[0]["h"], out[0]["d"]) == ("news.example.com", "example.com")
    assert (out[1]["h"], out[1]["d"]) == ("single.io", "single.io")


def test_url_dedup_keeps_lowest_id(spark):
    rows = [
        (1, "https://a.com/x?utm_source=f"),
        (2, "HTTPS://A.com/x"),          # same after normalization
        (3, "https://a.com/y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["doc_id"]: r for r in url_dedup(df).collect()}
    assert out[1]["is_canonical"] == 1 and out[1]["canonical_doc_id"] == 1
    assert out[2]["is_canonical"] == 0 and out[2]["canonical_doc_id"] == 1
    assert out[3]["is_canonical"] == 1
    assert out[1]["url_norm"] == out[2]["url_norm"] == "https://a.com/x"


def test_domain_stats_and_filter(spark):
    rows = [
        (1, "https://a.com/x", 10),
        (2, "https://www.a.com/x/", 20),   # same normalized URL as 1
        (3, "https://b.org/z", 30),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, n_chars long")
    stats = {r["domain"]: r for r in domain_stats(df, weight_col="n_chars").collect()}
    assert stats["a.com"]["n_docs"] == 2
    assert stats["a.com"]["n_urls"] == 1  # distinct normalized
    assert stats["a.com"]["total_n_chars"] == 30
    assert stats["b.org"]["n_docs"] == 1

    kept = domain_filter(df, ["a.com"]).collect()
    assert [r["doc_id"] for r in kept] == [3]
    assert "(__dom" not in str(kept[0].asDict())  # helper column dropped


def test_html_to_text_contract(spark):
    from cherry_spark.ext.web import html_to_text

    cases = {
        # script/style payloads vanish, not just their tags
        "<p>a</p><script>var x='<b>keep out</b>';</script><p>b</p>": "a b",
        "<style media='x'>h1{color:red}</style>hi": "hi",
        # comments and tags
        "<!-- note -->x<br/>y<div class='z'>w</div>": "x y w",
        # entities; &amp; decodes LAST (one level per pass)
        "a &lt;b&gt; &quot;c&quot; &#39;d&#39; e&nbsp;f &amp;amp;": "a <b> \"c\" 'd' e f &amp;",
        # whitespace collapse + trim
        "  <p>\n a\t\tb </p>\n": "a b",
    }
    df = spark.createDataFrame([(h,) for h in cases], "html string")
    got = [
        r["t"]
        for r in df.select(html_to_text(F.col("html")).alias("t")).collect()
    ]
    assert got == list(cases.values())


def test_domain_cap_keeps_best_k_under_skew(spark):
    from cherry_spark.ext.web import domain_cap

    # one mega-domain (900 docs) + one small domain: the cap must keep
    # exactly the 3 highest-quality docs of each, ranked, regardless of
    # how the salt spread the hot domain's rows
    rows = [(i, f"https://big.com/p/{i}", (i * 37) % 1000) for i in range(900)]
    rows += [(1000 + i, f"https://small.org/p/{i}", i) for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, url string, n_chars long")
    got = {
        (r["domain"], r["rk"]): (r["doc_id"], r["n_chars"])
        for r in domain_cap(df, cap=3).collect()
    }
    assert len(got) == 6
    big = sorted(
        ((i * 37) % 1000, i) for i in range(900)
    )  # quality asc
    expect_big = sorted(
        [(-q, i) for q, i in big]
    )[:3]  # quality desc, id asc
    for rk, (negq, i) in enumerate(expect_big, start=1):
        assert got[("big.com", rk)] == (i, -negq)
    assert got[("small.org", 1)] == (1003, 3)
    assert got[("small.org", 3)] == (1001, 1)
