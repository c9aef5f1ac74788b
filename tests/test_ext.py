"""Structural tests for the extension operators (dedup / similarity /
text) — especially the xxhash64-based ones that have no DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from cherry_spark.ext.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash64,
)
from cherry_spark.ext.similarity import brute_force_topk, cosine_similarity, lsh_bucket


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = "the quick brown fox jumps over the lazy dog again and again tonight"
    other = "completely different words about spark query engines and parquet files"
    rows = [(0, base), (1, near), (2, other), (3, base)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_finds_planted_near_dups(spark):
    pairs = minhash_lsh_pairs(_docs(spark), jaccard_threshold=0.5).collect()
    found = {(r["id1"], r["id2"]) for r in pairs}
    assert (0, 3) in found  # exact duplicate pair
    assert (0, 1) in found or (1, 3) in found  # near-dup pair
    assert all(p[0] != 2 and p[1] != 2 for p in found)  # unrelated doc excluded
    for r in pairs:
        if (r["id1"], r["id2"]) == (0, 3):
            assert r["jaccard"] == 1.0


def test_short_and_empty_docs_dont_crash(spark):
    """Docs with < k tokens must yield empty shingle arrays, not a
    slice-start SparkRuntimeException (regression: sequence(1,0) is
    descending [1,0] and slice(toks, 0, k) throws)."""
    rows = [(0, ""), (1, "one"), (2, "two words"), (3, "exactly three tokens"),
            (4, "a proper document with plenty of tokens inside it")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from cherry_spark.ext.dedup import word_shingles

    sizes = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", F.size(word_shingles(F.col("text"))).alias("n")
        ).collect()
    }
    assert sizes[0] == 0 and sizes[1] == 0 and sizes[2] == 0
    assert sizes[3] == 1 and sizes[4] > 1
    # the full pipelines must also survive short docs
    assert minhash_lsh_pairs(docs).count() == 0
    assert ngram_jaccard_pairs(docs).count() == 0


def test_minhash_subset_of_exact(spark):
    docs = _docs(spark)
    lsh = {(r["id1"], r["id2"]) for r in minhash_lsh_pairs(docs, jaccard_threshold=0.5).collect()}
    exact = {
        (r["id1"], r["id2"]) for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert lsh <= exact  # verification guarantees precision


def test_word_shingles_matches_python_reference(spark):
    """The zip_with shingle assembly equals a pure-Python reference on
    100 seeded-random texts incl. edge cases (empty, 1..k-1 tokens,
    repeated tokens, multi-space runs)."""
    import random

    from cherry_spark.ext.dedup import word_shingles

    rng = random.Random(42)
    vocab = ["alpha", "beta", "gamma", "delta", "x", "yy"]
    texts = ["", " ", "one", "one two", "a  b   c", "t t t t t"]
    for _ in range(100):
        n = rng.randint(0, 12)
        sep = rng.choice([" ", "  "])
        texts.append(sep.join(rng.choice(vocab) for _ in range(n)))

    def ref(text, k=3):
        toks = [t for t in text.split() if t]
        out, seen = [], set()
        for i in range(len(toks) - k + 1):
            s = " ".join(toks[i : i + k])
            if s not in seen:
                seen.add(s)
                out.append(s)
        return out

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    got = {
        r["i"]: r["sh"]
        for r in df.select("i", word_shingles(F.col("text")).alias("sh")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == ref(t), (i, t)


def test_ngram_prefix_filter_identical_results(spark):
    """Prefix filtering is a pure candidate-pruning optimization: on a
    frequency-skewed corpus (a hot boilerplate shingle shared by every
    doc) the filtered and unfiltered runs return identical pairs AND
    identical jaccard values."""
    boiler = "terms of service apply to all content on this site"
    rows = []
    for i in range(12):
        rows.append((i, f"{boiler} article number {i} discusses topic {i % 3} deeply"))
    # planted near-dup pair sharing most shingles
    rows.append((100, "spark catalyst optimizer rewrites logical plans into physical plans"))
    rows.append((101, "spark catalyst optimizer rewrites logical plans into physical stages"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(threshold=0.3, max_bucket_size=10**6)
    plain = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, prefix_filter=False, **kw).collect()
    }
    filtered = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, prefix_filter=True, **kw).collect()
    }
    assert plain == filtered and (100, 101) in filtered


def test_degenerate_bucket_cap_drops_boilerplate_only(spark):
    """A clone class bigger than max_bucket_size (identical boilerplate
    collapsing many docs onto one band key / posting list) is dropped
    before its id array is collected; genuinely near-dup pairs outside
    the clone class are still found. Before the cap existed this corpus
    built a 600-element array in one task and fanned out ~180k pair
    structs from a single row per bucket."""
    boiler = "all rights reserved contact the webmaster for further information today"
    rows = [(i, boiler) for i in range(600)]
    rows.append((1000, "spark catalyst optimizer rewrites logical plans into physical plans"))
    rows.append((1001, "spark catalyst optimizer rewrites logical plans into physical stages"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    ng = {(r["id1"], r["id2"]) for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert ng == {(1000, 1001)}  # clone class capped away, real pair kept

    mh = {
        (r["id1"], r["id2"])
        for r in minhash_lsh_pairs(docs, jaccard_threshold=0.5).collect()
    }
    assert mh == {(1000, 1001)}


def test_doc_novelty_planted(spark):
    """d1 all-unique shingles -> novelty 1.0; d2/d3 identical -> every
    shingle shared -> 0.0; d4 half-shared with d2/d3; d5 too short ->
    0 shingles, NULL novelty."""
    from cherry_spark.ext.dedup import doc_novelty

    rows = [
        (1, "alpha beta gamma delta"),                   # 2 unique shingles
        (2, "the quick brown fox jumps"),
        (3, "the quick brown fox jumps"),                # clone of 2
        (4, "the quick brown cat sleeps now"),           # shares 1 of 4
        (5, "too short"),                                # no 3-shingles
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in doc_novelty(df).collect()}
    assert out[1]["novelty"] == 1.0 and out[1]["n_shingles"] == 2
    assert out[2]["novelty"] == 0.0 and out[3]["novelty"] == 0.0
    assert out[4]["n_shingles"] == 4 and out[4]["n_novel"] == 3
    assert out[4]["novelty"] == 0.75
    assert out[5]["n_shingles"] == 0 and out[5]["novelty"] is None


def test_lsh_recall_audit_accounts_for_cap_drops(spark):
    """Deterministic recall loss: a clone class bigger than the bucket
    cap is dropped by banding, so its C(n,2) ground-truth pairs are
    missed and the audit must report exactly that; with the cap lifted
    recall returns to 1.0 (identical texts always share every band)."""
    from cherry_spark.ext.dedup import lsh_recall_audit

    boiler = "identical boilerplate sentence repeated across corpus documents"
    rows = [(i, boiler) for i in range(30)]
    rows.append((1000, "spark catalyst optimizer rewrites logical plans into physical plans"))
    rows.append((1001, "spark catalyst optimizer rewrites logical plans into physical stages"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(jaccard_threshold=0.5, n_hashes=32, bands=8)
    capped = lsh_recall_audit(docs, max_bucket_size=5, **kw).collect()[0]
    assert capped["n_true"] == 30 * 29 // 2 + 1  # clone class + real pair
    assert capped["n_lsh"] == 1                  # only the real pair survives
    assert capped["n_missed"] == 30 * 29 // 2
    uncapped = lsh_recall_audit(docs, max_bucket_size=10**6, **kw).collect()[0]
    assert uncapped["n_missed"] == 0 and uncapped["recall"] == 1.0


def test_lsh_recall_audit_bounded_default_sample(spark):
    """r7 verdict item #9: the audit is sample-bounded BY DEFAULT (the
    exact side is all-pairs by contract — a bare 100 TB call must not
    explode).  The bound is a deterministic hash-ranked top-k: the
    bounded run must equal the unbounded run over the pre-filtered
    sample, and a bound >= corpus must equal the explicit unbounded
    form."""
    import pyspark.sql.functions as F
    from cherry_spark.ext.dedup import lsh_recall_audit

    rows = [
        (i, f"document number {i} shares a long common prefix of words here")
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(jaccard_threshold=0.5, n_hashes=32, bands=8, max_bucket_size=500)

    # default is bounded: signature accepts no-arg call and the default
    # is a finite int (not None)
    import inspect

    default = inspect.signature(lsh_recall_audit).parameters["max_docs"].default
    assert isinstance(default, int)

    k = 10
    bounded = lsh_recall_audit(docs, max_docs=k, **kw).collect()[0]
    rank = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    sample = docs.withColumn("r", rank).orderBy("r", "doc_id").limit(k).drop("r")
    replay = lsh_recall_audit(sample, max_docs=None, **kw).collect()[0]
    assert bounded.asDict() == replay.asDict()

    big = lsh_recall_audit(docs, max_docs=10**6, **kw).collect()[0]
    unbounded = lsh_recall_audit(docs, max_docs=None, **kw).collect()[0]
    assert big.asDict() == unbounded.asDict()


def test_delta_dedup_verdict_precedence(spark):
    """Planted batch: byte-identical text -> exact_dup (even though it
    is also J=1 near), paraphrase -> near_dup, fresh text -> unique."""
    from cherry_spark.ext.dedup import delta_dedup

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "spark catalyst optimizer rewrites logical plans into physical plans"),
            (3, "completely unrelated corpus text about database storage engines"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog tonight"),  # exact
            (11, "spark catalyst optimizer rewrites logical plans into physical stages"),  # near
            (12, "entirely novel document with no counterpart anywhere"),  # unique
        ],
        "doc_id long, text string",
    )
    for gen, fam in (
        ("minhash", "xxhash"),
        ("minhash", "md5"),  # portable certified family — same logic
        ("exact", "xxhash"),
    ):
        got = {
            r["id"]: r["verdict"]
            for r in delta_dedup(
                corpus,
                batch,
                jaccard_threshold=0.5,
                candidate_gen=gen,
                hash_family=fam,
            ).collect()
        }
        assert got == {10: "exact_dup", 11: "near_dup", 12: "unique"}, (gen, fam)


def test_minhash_lsh_precomputed_signatures(spark, tmp_path):
    """The stored-signature path (compute once at ingest, reuse per
    dedup run) returns exactly the default path's pairs + values."""
    from cherry_spark.ext.dedup import minhash_signatures
    from cherry_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    sig_path = str(tmp_path / "sigs")
    minhash_signatures(docs).write.parquet(sig_path)
    stored = spark.read.parquet(sig_path)

    inline = {tuple(r) for r in minhash_lsh_pairs(docs).collect()}
    reused = {
        tuple(r) for r in minhash_lsh_pairs(docs, signatures=stored).collect()
    }
    assert inline == reused and len(inline) > 0


def test_ngram_jaccard_precomputed_postings(spark, tmp_path):
    """The stored-postings path (tokenize+shingle once at ingest,
    reuse per query) returns exactly the inline path's pairs + values,
    in both index modes."""
    from cherry_spark.ext.dedup import ngram_jaccard_pairs, shingle_postings
    from cherry_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    p_path = str(tmp_path / "postings")
    shingle_postings(docs).write.parquet(p_path)
    stored = spark.read.parquet(p_path)

    for prefix in (False, True):
        inline = {
            tuple(r)
            for r in ngram_jaccard_pairs(
                docs, threshold=0.6, prefix_filter=prefix
            ).collect()
        }
        reused = {
            tuple(r)
            for r in ngram_jaccard_pairs(
                docs, threshold=0.6, prefix_filter=prefix, postings=stored
            ).collect()
        }
        assert inline == reused and len(inline) > 0, prefix


def test_df_carrying_postings_lanes_match_inline(spark, tmp_path):
    """The r15 df-carrying postings store (id, shingle, df): the
    pushed-down capped-profile lanes in ngram_jaccard_pairs (both
    index modes — full mode also reads bucket sizes off df) and
    jaccard_topk return exactly the inline paths' rows + values. A
    low cap (5) makes the hot-shingle drop load-bearing on the
    fixture corpus."""
    from pyspark.sql import functions as F

    from cherry_spark.ext.dedup import (
        jaccard_topk,
        ngram_jaccard_pairs,
        shingle_postings,
    )
    from cherry_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    p = shingle_postings(docs)
    dfreq = p.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    p_path = str(tmp_path / "postings_df")
    p.join(dfreq, "shingle").select("id", "shingle", "df").write.parquet(
        p_path
    )
    stored = spark.read.parquet(p_path)

    for prefix in (False, True):
        inline = {
            tuple(r)
            for r in ngram_jaccard_pairs(
                docs, threshold=0.6, prefix_filter=prefix, max_bucket_size=5
            ).collect()
        }
        via_df = {
            tuple(r)
            for r in ngram_jaccard_pairs(
                docs,
                threshold=0.6,
                prefix_filter=prefix,
                max_bucket_size=5,
                postings=stored,
            ).collect()
        }
        assert inline == via_df and len(inline) > 0, prefix

    q = docs.filter(F.col("doc_id").isin([0, 1, 2])).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    t_inline = {
        tuple(r)
        for r in jaccard_topk(docs, q, k=5, max_shingle_freq=5).collect()
    }
    t_df = {
        tuple(r)
        for r in jaccard_topk(
            None, q, k=5, max_shingle_freq=5, corpus_postings=stored
        ).collect()
    }
    assert t_inline == t_df and len(t_inline) > 0

    # minhash verification sets served from the same store (extra df
    # column ignored) == live tokenize+shingle verification
    from cherry_spark.ext.dedup import minhash_lsh_pairs

    m_inline = {
        tuple(r)
        for r in minhash_lsh_pairs(docs, jaccard_threshold=0.8).collect()
    }
    m_stored = {
        tuple(r)
        for r in minhash_lsh_pairs(
            docs, jaccard_threshold=0.8, corpus_postings=stored
        ).collect()
    }
    assert m_inline == m_stored and len(m_inline) > 0


def test_delta_dedup_stored_corpus_signatures(spark, tmp_path):
    """The incremental 100 TB shape: corpus signatures stored once at
    ingest and passed per batch — verdicts identical to the inline
    recompute."""
    from cherry_spark.ext.dedup import delta_dedup, minhash_signatures
    from cherry_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    b = docs.filter(F.col("doc_id") % 5 == 0)
    c = docs.filter(F.col("doc_id") % 5 != 0)
    sig_path = str(tmp_path / "corpus_sigs")
    minhash_signatures(c, n_hashes=32).write.parquet(sig_path)
    stored = spark.read.parquet(sig_path)
    kw = dict(jaccard_threshold=0.8, n_hashes=32, bands=8)
    inline = {tuple(r) for r in delta_dedup(c, b, **kw).collect()}
    reused = {
        tuple(r)
        for r in delta_dedup(c, b, corpus_signatures=stored, **kw).collect()
    }
    assert inline == reused and len(inline) > 0


def test_delta_dedup_portable_family_matches_xxhash_on_fixture(spark):
    """hash_family only changes the hash constants, never the banding
    logic: on the fixture corpus (banding recall 1 for both families at
    these parameters) the md5 and xxhash families return identical
    verdict tables."""
    from cherry_spark.ext.dedup import delta_dedup
    from cherry_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    b = docs.filter(F.col("doc_id") % 5 == 0)
    c = docs.filter(F.col("doc_id") % 5 != 0)
    kw = dict(jaccard_threshold=0.8, n_hashes=32, bands=8)
    xx = {tuple(r) for r in delta_dedup(c, b, hash_family="xxhash", **kw).collect()}
    md = {tuple(r) for r in delta_dedup(c, b, hash_family="md5", **kw).collect()}
    assert xx == md and len(xx) > 0


def test_delta_dedup_exact_mode_candidate_complete(spark):
    """The exact generator finds near-dups the capped minhash mode
    drops: a boilerplate clone class bigger than the corpus bucket cap
    makes banding discard the bucket (by design), while the inverted
    shingle index still classifies the batch doc as near_dup — the
    property that makes exact mode safe to gate against an all-pairs
    EXISTS oracle."""
    from cherry_spark.ext.dedup import delta_dedup

    boiler = "identical boilerplate sentence repeated across corpus documents"
    corpus = spark.createDataFrame(
        [(i, boiler) for i in range(20)], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(100, boiler + " x")], "doc_id long, text string"
    )
    kw = dict(jaccard_threshold=0.5, max_bucket_size=5)
    capped = {
        r["id"]: r["verdict"]
        for r in delta_dedup(corpus, batch, candidate_gen="minhash", **kw).collect()
    }
    exact = {
        r["id"]: r["verdict"]
        for r in delta_dedup(corpus, batch, candidate_gen="exact", **kw).collect()
    }
    assert capped == {100: "unique"}  # bucket of 20 > cap 5: dropped
    assert exact == {100: "near_dup"}  # candidate-complete

    from cherry_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    b = docs.filter(F.col("doc_id") % 5 == 0)
    c = docs.filter(F.col("doc_id") % 5 != 0)
    mh = {tuple(r) for r in delta_dedup(c, b).collect()}
    ex = {tuple(r) for r in delta_dedup(c, b, candidate_gen="exact").collect()}
    assert mh == ex  # fixture corpus: banding recall 1, modes agree


def test_band_bucket_stats_accounts_for_cap(spark):
    """A 40-doc boilerplate clone class collapses onto one band key per
    band; with cap 30 every band reports it capped, with the dropped
    pair volume 40*39/2, and the monitor itself never materializes the
    bucket."""
    from cherry_spark.ext.dedup import band_bucket_stats, posting_skew_stats

    rows = [(i, "identical boilerplate text repeated across many documents here") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    stats = band_bucket_stats(docs, bands=8, n_hashes=64, max_bucket_size=30).collect()
    assert len(stats) == 8  # one row per band
    for r in stats:
        assert r["n_buckets"] == 1 and r["max_bucket"] == 40
        assert r["n_capped"] == 1 and r["docs_in_capped"] == 40
        assert r["pairs_dropped"] == 40 * 39 // 2 and r["pairs_kept"] == 0

    ps = posting_skew_stats(docs, max_bucket_size=30).collect()
    assert len(ps) == 1
    assert ps[0]["max_bucket"] == 40 and ps[0]["pairs_dropped"] > 0


def test_ngram_cap_oracle_parity_on_clone_corpus(spark):
    """The driver-gate scenario the cap must survive: a corpus with a
    >cap clone class. BOTH engines measure the capped shingle profile,
    so the DuckDB oracle and Spark agree (previously the 'exact'
    oracle returned all C(600,2) clone pairs while Spark dropped
    them)."""
    import duckdb
    import pandas as pd

    from cherry_spark.catalog import REGISTRY
    import cherry_spark.queries  # noqa: F401

    boiler = "all rights reserved contact the webmaster for further information today"
    rows = [(i, boiler) for i in range(600)]
    rows.append((1000, "spark catalyst optimizer rewrites logical plans into physical plans"))
    rows.append((1001, "spark catalyst optimizer rewrites logical plans into physical stages"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id1"], r["id2"], round(r["jaccard"], 6))
        for r in ngram_jaccard_pairs(docs, threshold=0.6).collect()
    }

    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(rows, columns=["doc_id", "text"])
    )
    oracle = REGISTRY["ngram_jaccard_pairs"].oracle
    want = {
        (r[0], r[1], round(r[2], 6))
        for r in con.execute(oracle).fetchall()
    }
    # 9-token texts -> 7 shingles each, 6 shared: J = 6/(7+7-6)
    assert got == want == {(1000, 1001, 0.75)}


def test_bucket_cap_keep_vs_drop_semantics(spark):
    """With the cap above the clone-class size the in-class pairs come
    back (and verification still reports exact jaccard 1.0); below it
    they are dropped."""
    rows = [(i, "identical boilerplate text repeated across documents here") for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    dropped = ngram_jaccard_pairs(docs, threshold=0.5, max_bucket_size=4)
    assert dropped.count() == 0
    kept = ngram_jaccard_pairs(docs, threshold=0.5, max_bucket_size=100).collect()
    assert len(kept) == 8 * 7 // 2
    assert all(r["jaccard"] == 1.0 for r in kept)


def test_simhash_properties(spark):
    df = simhash64(_docs(spark))
    fps = {r["id"]: r["fingerprint"] for r in df.collect()}
    assert fps[0] == fps[3]  # identical text -> identical fingerprint
    ham_near = bin((fps[0] ^ fps[1]) & ((1 << 64) - 1)).count("1")
    ham_far = bin((fps[0] ^ fps[2]) & ((1 << 64) - 1)).count("1")
    assert ham_near < ham_far  # near-dup closer than unrelated


def test_blocked_pairs_exact_matches_allpairs(spark, sf_dir):
    """1-Bucket-Theta block decomposition returns exactly the all-pairs
    result (every pair lands in exactly one grid cell) and its plan has
    no nested-loop/cartesian join."""
    from cherry_spark.ext.similarity import blocked_pairs_exact, cosine_similarity
    from cherry_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 60)
    blocked = blocked_pairs_exact(emb, threshold=0.2, n_blocks=3)
    a = emb.select(F.col("vec_id").alias("id1"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id2"), F.col("embedding").alias("vb"))
    naive = (
        a.join(b, F.col("id1") < F.col("id2"))
        .select(
            "id1", "id2",
            F.round(cosine_similarity(F.col("va"), F.col("vb")), 6).alias("sim"),
        )
        .filter(F.col("sim") >= 0.2)
    )
    got = {(r["id1"], r["id2"], r["sim"]) for r in blocked.collect()}
    want = {(r["id1"], r["id2"], r["sim"]) for r in naive.collect()}
    assert got == want and len(want) > 0
    plan = blocked._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "a", 5), (2, "a", 9), (3, "b", 1)], "id long, k string, v long"
    )
    kept = exact_dedup(df, ["k"], order_by=[F.col("v").desc()]).collect()
    by_k = {r["k"]: r["id"] for r in kept}
    assert by_k == {"a": 2, "b": 3}
    assert exact_dedup(df, ["k"]).count() == 2


def test_cosine_similarity_known_values(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 0.0])],
        "a array<float>, b array<float>",
    )
    sims = [r["s"] for r in df.select(F.round(cosine_similarity(F.col("a"), F.col("b")), 6).alias("s")).collect()]
    assert sims[0] == 1.0 and sims[1] == 0.0 and abs(sims[2] - 0.707107) < 1e-6


def test_brute_force_topk_self_first(spark, sf_dir):
    from cherry_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 7).select(
        F.lit(7).alias("query_id"), F.col("embedding")
    )
    top = brute_force_topk(emb, q, k=3).orderBy(F.col("sim").desc()).collect()
    assert top[0]["vec_id"] == 7 and top[0]["sim"] == 1.0  # self is nearest
    assert len(top) == 3


def test_brute_force_topk_two_phase_differential(spark, sf_dir):
    """Two-phase partial top-k returns exactly what the old global
    window returned, including a zero-norm corpus vector (NULL sim —
    must sort LAST, not like a NaN that Spark would rank ABOVE every
    real similarity), and phase 1 must stay JVM-side (no Python
    worker in the plan — round-4 verdict item #4)."""
    from cherry_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(40)
    dim = len(emb.first()["embedding"])
    zero = spark.createDataFrame(
        [(99999, [0.0] * dim)], "vec_id long, embedding array<float>"
    ).select("vec_id", F.col("embedding").cast("array<float>").alias("embedding"))
    corpus = emb.select("vec_id", "embedding").unionByName(zero).repartition(7)
    q = emb.filter(F.col("vec_id").isin(3, 11)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    kw = dict(k=45)  # k > corpus so the NULL-sim row must appear
    new = {tuple(r) for r in brute_force_topk(corpus, q, **kw).collect()}
    old = {
        tuple(r)
        for r in brute_force_topk(corpus, q, two_phase=False, **kw).collect()
    }
    assert new == old
    assert any(r[2] is None for r in new)  # zero-norm row kept, sim NULL
    plan = brute_force_topk(corpus, q, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" in plan  # JVM partial phase really in the plan
    assert "MapInPandas" not in plan and "Python" not in plan


def test_brute_force_topk_nan_component_policy(spark):
    """A corpus vector with a NaN component gets sim NULL and sorts
    LAST in BOTH paths (Spark's native ordering would rank raw NaN
    FIRST — the normalization prevents a garbage vector from winning
    every query's top slot)."""
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.9, 0.1]),
        (3, [float("nan"), 1.0]),
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = spark.createDataFrame(
        [(7, [1.0, 0.0])], "query_id long, embedding array<float>"
    )
    for two_phase in (True, False):
        top = brute_force_topk(corpus, q, k=3, two_phase=two_phase).collect()
        by_rank = sorted(
            ((r["vec_id"], r["sim"]) for r in top),
            key=lambda t: (t[1] is None, -(t[1] or 0.0), t[0]),
        )
        assert by_rank[0] == (1, 1.0), (two_phase, by_rank)
        assert by_rank[-1] == (3, None), (two_phase, by_rank)


def test_lsh_bucket_deterministic(spark, sf_dir):
    from cherry_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    b1 = emb.select("vec_id", lsh_bucket(F.col("embedding"), 64, 8).alias("b")).collect()
    b2 = emb.select("vec_id", lsh_bucket(F.col("embedding"), 64, 8).alias("b")).collect()
    assert {r["vec_id"]: r["b"] for r in b1} == {r["vec_id"]: r["b"] for r in b2}


def test_lsh_bucket_store_serves_identical(spark, sf_dir):
    """ann_lsh_topk serves corpus buckets from a fingerprinted store
    (r10): bucketing is deterministic, so store-served search results
    equal the inline build exactly, and a second serve never
    rebuilds."""
    import os

    from cherry_spark.ext.similarity import lsh_bucket_topk
    from cherry_spark.queries.extensions import _ensure_lsh_buckets
    from cherry_spark.sources.tables import load_table

    store = _ensure_lsh_buckets(spark, sf_dir)
    marker = os.path.getmtime(f"{store}/_SUCCESS")
    emb = load_table(spark, sf_dir, "embeddings")
    qdf = emb.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    canon = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    served = canon(
        lsh_bucket_topk(
            None,
            qdf,
            dim=64,
            k=5,
            n_planes=8,
            bucketed=spark.read.parquet(store),
        )
    )
    inline = canon(lsh_bucket_topk(emb, qdf, dim=64, k=5, n_planes=8))
    assert served == inline and len(served) > 0
    assert os.path.getmtime(f"{store}/_SUCCESS") == marker  # no rebuild


def test_connected_components_chain_and_island(spark):
    from cherry_spark.ext.dedup import connected_components

    # chain 1-2-3 (not all-pairs: similarity is not transitive),
    # island {10, 11}, singleton edges absent entirely
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id1 long, id2 long"
    )
    got = {r["id"]: r["cluster_id"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_cluster_keep_best_picks_highest_quality(spark, sf_dir):
    """The keep-list has one row per multi-doc cluster; the kept doc has
    the max quality among its cluster's members (doc_id tiebreak)."""
    from cherry_spark.catalog import REGISTRY
    import cherry_spark.queries  # noqa: F401

    keep = REGISTRY["cluster_keep_best"].fn(spark, sf_dir).collect()
    clusters = REGISTRY["dedup_clusters"].fn(spark, sf_dir).collect()
    quality = {
        r["doc_id"]: r["quality"]
        for r in REGISTRY["quality_score"].fn(spark, sf_dir).collect()
    }
    members: dict = {}
    for r in clusters:
        members.setdefault(r["cluster_id"], []).append(r["doc_id"])
    assert len(keep) == len(members) > 0
    for r in keep:
        best = max(members[r["cluster_id"]], key=lambda d: (quality[d], -d))
        assert r["keep_doc_id"] == best
        assert r["best_quality"] == quality[best]
        assert r["n_members"] == len(members[r["cluster_id"]])


def test_connected_components_star_differential(spark):
    """large-star/small-star returns byte-identical labels to minlabel
    on a chain, a celebrity star, islands, an out-of-order cycle, and
    a reversed-orientation pair."""
    from cherry_spark.ext.dedup import connected_components

    edges = spark.createDataFrame(
        # chain 0-..-6, celebrity hub 100 with 15 spokes, island pair,
        # cycle with shuffled ids, reversed-order edge (id1 > id2)
        [(i, i + 1) for i in range(6)]
        + [(100, 200 + i) for i in range(15)]
        + [(300, 301)]
        + [(402, 401), (401, 403), (403, 402)]
        + [(999, 7)],
        "id1 long, id2 long",
    )
    minlabel = {
        (r["id"], r["cluster_id"])
        for r in connected_components(edges, algorithm="minlabel").collect()
    }
    star = {
        (r["id"], r["cluster_id"])
        for r in connected_components(edges, algorithm="star").collect()
    }
    assert star == minlabel
    assert (200, 100) in star and (403, 401) in star and (999, 7) in star

    import pytest as _pytest

    with _pytest.raises(ValueError):
        connected_components(edges, algorithm="bfs")


def test_connected_components_long_chain_converges(spark):
    from cherry_spark.ext.dedup import connected_components

    # a 12-node path needs several label-hop rounds (diameter halves
    # per round) — exercises the fixpoint loop, not just one pass
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id1 long, id2 long"
    )
    rows = connected_components(edges).collect()
    assert {r["cluster_id"] for r in rows} == {0}
    assert len(rows) == 13


def test_connected_components_warns_on_max_iter(spark):
    """Exhausting max_iter without a fixpoint must not be silent
    (round-4 ADVICE): a long chain with max_iter=1 cannot converge."""
    import warnings

    from cherry_spark.ext.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id1 long, id2 long"
    )
    for algo in ("minlabel", "star"):
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            connected_components(chain, max_iter=1, algorithm=algo).collect()
        assert any(
            issubclass(w.category, RuntimeWarning) and "max_iter" in str(w.message)
            for w in caught
        ), algo
    # and a converging run stays silent
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = connected_components(chain, max_iter=25).collect()
    assert not [w for w in caught if issubclass(w.category, RuntimeWarning)]
    assert {r["cluster_id"] for r in out} == {0}


def test_jaccard_topk_ranks_overlap(spark):
    """Planted corpus: the near-copy outranks the partial overlap;
    disjoint docs never appear; self-match tops at 1.0."""
    from pyspark.sql import functions as F

    from cherry_spark.ext.dedup import jaccard_topk

    base = "the quick brown fox jumps over the lazy dog tonight"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " again"),                      # near copy
            (3, "quick brown fox jumps over something else entirely now"),
            (4, "totally unrelated words with zero shared trigrams here"),
        ],
        ["doc_id", "text"],
    )
    q = docs.filter(F.col("doc_id") == 1).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    rows = sorted(
        ((r["query_id"], r["doc_id"], r["jaccard"]) for r in
         jaccard_topk(docs, q, k=4).collect()),
        key=lambda t: (-t[2], t[1]),
    )
    ids = [r[1] for r in rows]
    assert ids[0] == 1 and rows[0][2] == 1.0      # self
    assert ids[1] == 2                             # near copy second
    assert 3 in ids and 4 not in ids               # disjoint doc absent


def test_jaccard_topk_hot_shingle_cap(spark):
    """Planted boilerplate: a shingle shared by a 200-doc clone class
    would fan the candidate join toward query x corpus; with the cap
    it is dropped from BOTH posting sides before the shuffle, so the
    boilerplate docs contribute no candidates at all and real matches
    are ranked on the capped measure. An all-boilerplate query doc has
    an empty capped profile and returns no rows."""
    from pyspark.sql import functions as F

    from cherry_spark.ext.dedup import jaccard_topk

    boiler = "terms of service apply to all content on this site"
    rows = [(i, boiler) for i in range(200)]
    rows.append((1000, "spark catalyst optimizer rewrites logical plans into physical plans"))
    rows.append((1001, "spark catalyst optimizer rewrites logical plans into physical stages"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # query 1: real text; query 2: pure boilerplate (empty capped profile)
    q = spark.createDataFrame(
        [
            (1, "spark catalyst optimizer rewrites logical plans into physical plans"),
            (2, boiler),
        ],
        "query_id long, text string",
    )
    got = jaccard_topk(docs, q, k=3, max_shingle_freq=50).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["jaccard"]))
    # boilerplate query: every shingle hot -> no profile -> no rows
    assert 2 not in by_q
    # real query: only the two real docs are candidates (the 200-doc
    # clone class never enters the join), exact self-match first
    assert [d for d, _ in sorted(by_q[1], key=lambda t: -t[1])] == [1000, 1001]
    assert by_q[1][0][1] <= 1.0 and len(by_q[1]) == 2
    # uncapped run for contrast: the boilerplate query meets the clone class
    unc = jaccard_topk(docs, q, k=3, max_shingle_freq=10**6)
    assert unc.filter(F.col("query_id") == 2).count() == 3
