"""10x adversarial scale probes for the round-7 operators (round-7
verdict item #5): ``knn_graph``, ``budget_select_grouped``, and the
composed ``run_streaming_curation_gate``.

Same methodology as the round-4..7 probes (tools/scale_probe_*.py):
replica-clone the sf0.1 tables 10x so every doc/vector sits in a
10-clone class — the worst shape for candidate generation — then time
the operator and print hot-task evidence (per-partition max/median).

1. knn_graph: 20k vectors (10 replicas of the 2k sf0.1 embeddings,
   clone classes share the EXACT direction — every probe finds its 9
   clones plus cluster neighbors). Evidence: wall time, result
   partition skew, and IVF cluster-size skew (a collapsed clone space
   must not produce one hot centroid holding a clone class's volume).
2. budget_select_grouped: 50k docs, per-lang budget dict. The grouped
   mode's only window is partitioned BY GROUP — evidence is wall time
   plus the per-group admitted/cum_tokens roll-up (no global window
   anywhere, so 100x groups parallelize; the probe's 5 langs x 10k
   docs each is the worst case of FEW large groups).
3. run_streaming_curation_gate: 10 arrivals of 5k docs against the
   growing three-store state (text sigs + vectors + spent budget).
   Arrival composition is adversarial per gate: ~1/3 lexical clones of
   arrival-0 admissions (suffix-append near-dups), ~1/3 paraphrases
   (REVERSED word order — new shingles, so only the semantic store can
   catch them — carrying their base doc's exact embedding), ~1/3 novel
   (per-arrival re-tokened text + direction-perturbed embedding). The
   budget is sized to exhaust mid-stream so the over_budget frontier
   fires with all three stores live. Evidence: per-arrival wall time
   (flat-ish as the stores grow) + verdict counts per arrival.

Run: python tools/scale_probe_r7ops.py [sf_dir] [which]
  which in {knn, budget, gate, all} (default all)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def partition_skew(df) -> str:
    rows = (
        df.groupBy(F.spark_partition_id().alias("p"))
        .count()
        .select("count")
        .collect()
    )
    counts = sorted(r["count"] for r in rows)
    mx, med = counts[-1], counts[len(counts) // 2]
    return (
        f"{len(counts)} populated partitions, max {mx} / median {med} rows"
        f" = {mx / med if med else float('inf'):.2f}x"
    )


def probe_knn(spark, sf_dir: str, n_replicas: int = 10) -> None:
    from cherry_spark.ext.ivf import ivf_assign, ivf_centroids, knn_graph
    from cherry_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings", parallelize=True)
    offset = 1_000_000
    parts = [
        emb.select(
            (F.col("vec_id") + F.lit(i * offset)).alias("vec_id"),
            "embedding",
            "label",
        )
        for i in range(n_replicas)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big = big.repartition(32).localCheckpoint(eager=True)
    n = big.count()

    t0 = time.perf_counter()
    g = knn_graph(big, k=3, n_centroids=64, nprobe=2).localCheckpoint(eager=True)
    rows = g.count()
    t_graph = time.perf_counter() - t0

    # clone-collapse evidence: identical directions all land in ONE
    # centroid — the probe shows whether that produces a hot cluster
    cents = ivf_centroids(big, 64)
    sizes = sorted(
        r["n"]
        for r in ivf_assign(big, cents)
        .groupBy("centroid_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    mx, med = sizes[-1], sizes[len(sizes) // 2]
    clone_hits = g.filter(
        (F.col("query_id") % offset) == (F.col("vec_id") % offset)
    ).count()
    print(
        f"[knn_graph] {n} vectors ({n_replicas}-clone classes) -> "
        f"{rows} edges in {t_graph:.1f}s\n"
        f"  cluster sizes: max {mx} / median {med} = "
        f"{mx / med if med else float('inf'):.2f}x across {len(sizes)} centroids\n"
        f"  edges landing on same-class clones: {clone_hits}/{rows} "
        f"({clone_hits / rows:.1%}) — clone classes dominate as designed\n"
        f"  result skew: {partition_skew(g)}"
    )


def probe_budget_grouped(spark, sf_dir: str, n_replicas: int = 10) -> None:
    from cherry_spark.ext.budget import budget_select_grouped
    from cherry_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    offset = 1_000_000
    parts = [
        docs.select(
            (F.col("doc_id") + F.lit(i * offset)).alias("doc_id"),
            "lang",
            (F.col("n_chars") / 5).cast("long").alias("n_tokens"),
            (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
             .cast("double") / 65535.0).alias("quality"),
        )
        for i in range(n_replicas)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big = big.repartition(32).localCheckpoint(eager=True)
    n = big.count()
    langs = [r["lang"] for r in big.select("lang").distinct().collect()]
    per_lang_tokens = {
        r["lang"]: r["t"]
        for r in big.groupBy("lang").agg(F.sum("n_tokens").alias("t")).collect()
    }
    # ~10% budget for each lang except one starved and one unlisted
    budgets = {
        lang: int(per_lang_tokens[lang] * (0.01 if i == 0 else 0.10))
        for i, lang in enumerate(sorted(langs)[:-1])
    }
    t0 = time.perf_counter()
    sel = budget_select_grouped(
        big, budgets, "lang", default_budget=0
    ).localCheckpoint(eager=True)
    admitted = sel.count()
    t_sel = time.perf_counter() - t0
    roll = {
        r["lang"]: (r["n"], r["mx"])
        for r in sel.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"), F.max("cum_tokens").alias("mx"))
        .collect()
    }
    ok = all(
        roll[lang][1] <= budgets.get(lang, 0) for lang in roll
    ) and sorted(langs)[-1] not in roll  # unlisted lang got default 0
    print(
        f"[budget_select_grouped] {n} docs, {len(langs)} groups -> "
        f"{admitted} admitted in {t_sel:.1f}s (per-group frontiers "
        f"respected: {ok})\n"
        f"  per-group (admitted, cum<=budget): "
        + ", ".join(
            f"{lg}:{roll[lg][0]}/{budgets[lg]}" for lg in sorted(roll)
        )
    )


def probe_gate(spark, sf_dir: str, n_arrivals: int = 10, decon: bool = False) -> None:
    """Composed-gate probe; ``decon=True`` adds the round-8 stage-0
    decontamination: a 100-doc eval set drawn from the base corpus, so
    every arrival carries replica-lane clones of eval text — the
    worst case (every contaminated doc in every arrival). Prices the
    per-batch cost of the extra shingle+broadcast join and shows
    contaminated docs spending no budget."""
    from cherry_spark.streaming.continuous import run_streaming_curation_gate

    work = "/tmp/cherry_probe_r7gate"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    src = f"{work}/incoming"

    from cherry_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    # base rows: doc + its base embedding (vec_id = doc_id % 2000) +
    # derived quality/tokens
    base = (
        docs.withColumn("vec_id", F.col("doc_id") % 2000)
        .join(emb.select("vec_id", "embedding"), "vec_id")
        .select(
            "doc_id",
            "text",
            "embedding",
            (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
             .cast("double") / 65535.0).alias("quality"),
            (F.col("n_chars") / 5).cast("long").alias("n_tokens"),
        )
    ).localCheckpoint(eager=True)
    n_docs = base.count()
    tok0 = base.agg(F.sum("n_tokens")).collect()[0][0]
    offset = 1_000_000
    words = F.split(F.col("text"), " ")

    for i in range(n_arrivals):
        lane = F.col("doc_id") % 3
        if i == 0:
            text, vec = F.col("text"), F.col("embedding")
        else:
            text = (
                F.when(lane == 0, F.concat(F.col("text"), F.lit(f" replica{i}")))
                .when(
                    lane == 1,
                    F.concat(
                        F.concat_ws(" ", F.reverse(words)), F.lit(f" p{i}")
                    ),
                )
                .otherwise(
                    F.concat_ws(
                        " ",
                        F.transform(words, lambda x: F.concat(x, F.lit(f"_{i}"))),
                    )
                )
            )
            # lanes 0/1 keep the base embedding (lane 1 is the
            # paraphrase the semantic store must catch); lane 2 gets a
            # direction-perturbed vector (novel)
            vec = F.when(
                lane < 2, F.col("embedding")
            ).otherwise(
                F.transform(
                    F.col("embedding"),
                    lambda x, j: x
                    + F.sin((F.col("doc_id") % 97 + i) * (j + 1)) * 0.8,
                )
            )
        arrival = base.select(
            (F.col("doc_id") + F.lit(i * offset)).alias("doc_id"),
            text.alias("text"),
            vec.alias("embedding"),
            "quality",
            "n_tokens",
        )
        arrival.coalesce(1).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    stream_df = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = f"{work}/verdicts"
    batch_times: list[float] = []
    last = [time.perf_counter()]

    def sink(verdicts, batch_id):
        verdicts.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out)
        now = time.perf_counter()
        batch_times.append(now - last[0])
        last[0] = now

    # budget ~ 2.5 arrivals' worth of novel volume: arrival 0 admits
    # ~everything, later arrivals admit ~1/3 — exhaustion mid-stream
    budget = int(tok0 * 1.8)
    test_df = (
        base.filter(F.col("doc_id") % 50 == 0)
        .select((F.col("doc_id") + F.lit(500_000_000)).alias("doc_id"), "text")
        .localCheckpoint(eager=True)
        if decon
        else None
    )
    t0 = time.perf_counter()
    q = run_streaming_curation_gate(
        spark,
        stream_df,
        f"{work}/state",
        sink,
        f"{work}/ckpt",
        budget=budget,
        n_centroids=32,
        nprobe=2,
        jaccard_threshold=0.5,
        semantic_threshold=0.9,
        test_df=test_df,
    )
    q.awaitTermination(3600)
    total = time.perf_counter() - t0

    got = spark.read.parquet(out)
    per = {
        (r["batch_id"], r["verdict"]): r["n"]
        for r in got.groupBy("batch_id", "verdict")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_batches = max(b for b, _ in per) + 1
    lines = []
    for b in range(n_batches):
        vnames = ("admitted", "exact_dup", "near_dup", "semantic_dup",
                  "over_budget") + (("contaminated",) if decon else ())
        row = {v: per.get((b, v), 0) for v in vnames}
        lines.append(
            f"  arrival {b}: {row} in {batch_times[b]:.1f}s"
            if b < len(batch_times)
            else f"  arrival {b}: {row}"
        )
    spent = spark.read.parquet(f"{work}/state/spent").first()["spent"]
    print(
        f"[streaming gate{'+decon' if decon else ''}] "
        f"{n_arrivals} arrivals x {n_docs} docs, "
        f"budget {budget}: total {total:.1f}s\n" + "\n".join(lines) + "\n"
        f"  spent {spent} <= budget: {spent <= budget}; "
        f"per-batch seconds {[round(t, 1) for t in batch_times]}"
    )


def probe_bloom(spark, sf_dir: str, n_replicas: int = 10) -> None:
    """Round-8 op: 50k-key build + 50k-key mixed probe, sized for ~1%
    FP (m = 16·n bits, k = 5 — the textbook operating point)."""
    from cherry_spark.ext.bloom import bloom_build, bloom_probe
    from cherry_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    offset = 1_000_000
    parts = [
        docs.select(
            (F.col("doc_id") + F.lit(i * offset)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" r{i}")).alias("key"),
        )
        for i in range(n_replicas)
    ]
    corpus = parts[0]
    for p in parts[1:]:
        corpus = corpus.unionByName(p)
    corpus = corpus.repartition(32).localCheckpoint(eager=True)
    n = corpus.count()
    m_bits = 1 << 20  # 16x n at 50k keys, ~1% FP with k=5
    t0 = time.perf_counter()
    bloom = bloom_build(corpus, m_bits=m_bits, k_hashes=5).localCheckpoint(
        eager=True
    )
    words = bloom.count()
    t_build = time.perf_counter() - t0
    batch = corpus.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 0, F.col("key")
        ).otherwise(F.concat(F.lit("novel:"), F.col("doc_id").cast("string"))).alias("key"),
    )
    t0 = time.perf_counter()
    probed = bloom_probe(
        batch, bloom, m_bits=m_bits, k_hashes=5
    ).localCheckpoint(eager=True)
    res = {
        (r["t"], r["maybe_in_set"]): r["n"]
        for r in probed.withColumn("t", (F.col("doc_id") % 2 == 0).cast("int"))
        .groupBy("t", "maybe_in_set")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    t_probe = time.perf_counter() - t0
    fn = res.get((1, 0), 0)
    fp = res.get((0, 1), 0)
    novel = res.get((0, 0), 0) + fp
    print(
        f"[bloom] {n} keys -> {words} populated 32-bit words "
        f"({words * 16 / 1e6:.1f} MB state vs a corpus join) in "
        f"{t_build:.1f}s build; mixed {n}-key probe {t_probe:.1f}s: "
        f"false_negatives={fn} (must be 0), "
        f"false_positives={fp}/{novel} ({fp / max(novel, 1):.2%})"
    )


def probe_web(spark, sf_dir: str, n_replicas: int = 10) -> None:
    """Round-8 web family at 50k docs: HTML extraction (pure scalar
    scan), URL dedup (clone URLs collapse across replicas), domain
    stats."""
    from cherry_spark.ext.web import (
        domain_stats,
        html_to_text,
        url_dedup,
    )
    from cherry_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    offset = 1_000_000
    d = F.col("doc_id")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit("Site.COM/p/"),
        (d % 5000).cast("string"),
        F.when(d % 4 == 0, F.lit("?utm_source=x")).otherwise(F.lit("")),
    )
    html = F.concat(
        F.lit("<html><head><style>p{}</style></head><body><p>"),
        F.col("text"), F.lit("</p><script>t()</script></body></html>"),
    )
    parts = [
        docs.select(
            (d + F.lit(i * offset)).alias("doc_id"),
            url.alias("url"), html.alias("html"), "n_chars",
        )
        for i in range(n_replicas)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big = big.repartition(32).localCheckpoint(eager=True)
    n = big.count()

    t0 = time.perf_counter()
    extracted = big.withColumn("text", html_to_text(F.col("html")))
    n_ex = extracted.filter(F.length("text") > 0).count()
    t_html = time.perf_counter() - t0

    t0 = time.perf_counter()
    dd = url_dedup(big).localCheckpoint(eager=True)
    n_canon = dd.filter(F.col("is_canonical") == 1).count()
    t_dedup = time.perf_counter() - t0

    t0 = time.perf_counter()
    ds = domain_stats(big, weight_col="n_chars").localCheckpoint(eager=True)
    n_dom = ds.count()
    t_stats = time.perf_counter() - t0
    print(
        f"[web] {n} docs: html_to_text {t_html:.1f}s ({n_ex} non-empty), "
        f"url_dedup {t_dedup:.1f}s ({n_canon} canonical — each URL "
        f"cloned {n_replicas}x collapses), domain_stats {t_stats:.1f}s "
        f"({n_dom} domains)"
    )


def probe_bpe(spark, sf_dir: str, n_replicas: int = 10) -> None:
    """Round-8 BPE at 50k docs: the claim under test is corpus-size
    INDEPENDENCE after the first count pass — replica clones add rows
    but barely any word TYPES, so learn cost should approach the 1x
    cost, not 10x it."""
    from cherry_spark.ext.bpe import bpe_learn
    from cherry_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    offset = 1_000_000
    parts = [
        docs.select(
            (F.col("doc_id") + F.lit(i * offset)).alias("doc_id"), "text"
        )
        for i in range(n_replicas)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big = big.repartition(32).localCheckpoint(eager=True)
    n = big.count()

    t0 = time.perf_counter()
    m1 = bpe_learn(docs, n_merges=10)
    k1 = m1.count()
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    m10 = bpe_learn(big, n_merges=10)
    k10 = m10.count()
    t10 = time.perf_counter() - t0
    same = [
        (a["left"], a["right"]) for a in m1.orderBy("rank").collect()
    ] == [(b["left"], b["right"]) for b in m10.orderBy("rank").collect()]
    print(
        f"[bpe] learn 10 merges: 1x ({docs.count()} docs) {t1:.1f}s vs "
        f"{n_replicas}x ({n} docs) {t10:.1f}s = {t10 / t1:.2f}x cost for "
        f"{n_replicas}x data (word-TYPE table is the working set); "
        f"merge sequences identical across scales: {same} "
        f"({k1}/{k10} merges)"
    )


def probe_sketch(spark, sf_dir: str, n_replicas: int = 10) -> None:
    """Round-8-continuation CMS family at 10x: the state table must
    stay depth x width regardless of stream size (the sub-linear
    claim), the heavy-hitter scan must keep its no-false-negative
    guarantee under clone fan-out, and — because replica-cloning
    multiplies every key count uniformly — the 10x estimates must be
    EXACTLY 10x the 1x estimates (additivity demonstrated at scale,
    not asserted)."""
    from cherry_spark.ext.dedup import tokens_col
    from cherry_spark.ext.sketch import cms_build, cms_probe
    from cherry_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    toks1 = docs.select(F.explode(tokens_col(F.col("text"))).alias("token"))
    parts = [toks1 for _ in range(n_replicas)]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big = big.repartition(32).localCheckpoint(eager=True)
    n = big.count()

    t0 = time.perf_counter()
    cms10 = cms_build(big, "token", 4, 64).localCheckpoint(eager=True)
    n_cells = cms10.count()
    t_build = time.perf_counter() - t0

    cms1 = cms_build(toks1, "token", 4, 64)
    both = (
        cms1.withColumnsRenamed({"cnt": "cnt1"})
        .join(cms10.withColumnsRenamed({"cnt": "cnt10"}), ["depth", "bucket"])
    )
    n_off = both.filter(
        F.col("cnt10") != F.col("cnt1") * n_replicas
    ).count()

    t0 = time.perf_counter()
    counts = big.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("exact_n")
    )
    probed = cms_probe(counts, cms10, "token", 4, 64).localCheckpoint(
        eager=True
    )
    n_under = probed.filter(F.col("est_n") < F.col("exact_n")).count()
    t_probe = time.perf_counter() - t0

    print(
        f"[sketch] {n} tokens 10x: build {t_build:.1f}s ({n_cells} cells"
        f" — bounded by 4x64 regardless of scale), probe {t_probe:.1f}s"
        f" ({n_under} underestimates — must be 0), cells where "
        f"cnt10 != 10*cnt1: {n_off} (additivity at scale — must be 0)"
    )


def probe_bm25(spark, sf_dir: str, n_replicas: int = 10) -> None:
    """BM25 at 10x with adversarial clone collapse: every corpus doc
    (including each query doc) exists in a 10-clone class, so each
    query's candidate set and its top-k tie group are maximal.
    Evidence: wall time + scored-pair partition skew (the postings
    equi-join fans out linearly with replicas, never quadratically)."""
    from cherry_spark.ext.bm25 import bm25_topk
    from cherry_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    offset = 1_000_000
    parts = [
        docs.select(
            (F.col("doc_id") + F.lit(i * offset)).alias("doc_id"), "text"
        )
        for i in range(n_replicas)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big = big.repartition(32).localCheckpoint(eager=True)
    n = big.count()

    q = big.filter(F.col("doc_id").isin(0, 1, 2)).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    t0 = time.perf_counter()
    out = bm25_topk(big, q, k=5).localCheckpoint(eager=True)
    n_rows = out.count()
    t = time.perf_counter() - t0
    print(
        f"[bm25] {n} docs 10x corpus: top-5 for 3 queries {t:.1f}s "
        f"({n_rows} rows; every doc in a 10-clone class, ties broken "
        f"by id); result skew: {partition_skew(out)}"
    )


def probe_linkage(spark, sf_dir: str, n_replicas: int = 10) -> None:
    """Record linkage at 10x with the adversarial clone shape: every
    customer name replicated 10x under distinct ids, so each blocking
    block grows 10x and its candidate pairs 100x — linkage output is
    LEGITIMATELY quadratic in the clone factor (clones all match each
    other), which is exactly why the hot-block cap exists.  Evidence:
    wall time + pair count at the default cap, then the capped run
    (max_block below the inflated block size) proving the guard zeroes
    the degenerate blocks instead of melting down."""
    from cherry_spark.ext.linkage import blocked_linkage_pairs
    from cherry_spark.sources.tables import load_table

    cust = load_table(spark, sf_dir, "customer", parallelize=True)
    offset = 10_000_000
    parts = [
        cust.select(
            (F.col("c_custkey") + F.lit(i * offset)).alias("rec_id"),
            F.col("c_name").alias("name"),
            F.col("c_nationkey").alias("nat"),
            F.substring("c_name", 1, 16).alias("blk"),
        )
        for i in range(n_replicas)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big = big.repartition(32).localCheckpoint(eager=True)
    n = big.count()

    t0 = time.perf_counter()
    pairs = blocked_linkage_pairs(
        big, ["nat", "blk"], "rec_id", "name", max_dist=2, max_block=1000
    ).localCheckpoint(eager=True)
    n_pairs = pairs.count()
    t_full = time.perf_counter() - t0

    t0 = time.perf_counter()
    capped = blocked_linkage_pairs(
        big, ["nat", "blk"], "rec_id", "name", max_dist=2, max_block=50
    )
    n_capped = capped.count()
    t_cap = time.perf_counter() - t0
    print(
        f"[linkage] {n} records 10x clones: full {t_full:.1f}s "
        f"({n_pairs} pairs — quadratic in clones by construction, "
        f"skew: {partition_skew(pairs)}); cap=50 {t_cap:.1f}s "
        f"({n_capped} pairs — inflated blocks zeroed by the guard)"
    )


def probe_phrase(spark, sf_dir: str, n_replicas: int = 10) -> None:
    """Phrase search at 10x with the maximal-hot-term shape: the
    fixture vocabulary is ~31 tokens, so EVERY phrase term's posting
    list covers most of the corpus — the worst fan-out a positional
    index can see. The vote join is linear in replicas (one vote per
    matching (term, position) pair); the per-(phrase,doc,start)
    aggregate bounds everything downstream. Evidence: wall time,
    vote/result volumes, result partition skew."""
    from cherry_spark.ext.phrase import phrase_search_topk
    from cherry_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    offset = 1_000_000
    parts = [
        docs.select((F.col("doc_id") + F.lit(i * offset)).alias("doc_id"), "text")
        for i in range(n_replicas)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big = big.repartition(32).localCheckpoint(eager=True)
    n = big.count()
    phrases = spark.createDataFrame(
        [(0, "table table"), (1, "value fast merge"), (2, "scan query big")],
        "phrase_id long, phrase string",
    )
    t0 = time.perf_counter()
    out = phrase_search_topk(big, phrases, k=10).localCheckpoint(eager=True)
    n_rows = out.count()
    t = time.perf_counter() - t0
    print(
        f"[phrase] {n} docs 10x corpus, 3 phrases over a ~31-token "
        f"vocabulary (every term hot): top-10 in {t:.1f}s ({n_rows} "
        f"rows); result skew: {partition_skew(out)}"
    )


def probe_timeseries(spark, sf_dir: str, n_replicas: int = 10) -> None:
    """Resample+gapfill at 10x along the TIME axis (the dimension the
    grid explode actually scales with): each replica shifts the whole
    event stream by i x 32 days, so per-key spans — and the dense
    grids — grow ~10x while the per-bucket aggregate stays the same
    shape. Key = user_id (many medium series, the realistic shape).
    Evidence: wall time, grid size vs 1x, gap fraction, grid
    partition skew (per-key windows must stay balanced)."""
    from cherry_spark.ext.timeseries import resample_gapfill
    from cherry_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    parts = [
        ev.select(
            "user_id",
            (F.col("ts") + F.expr(f"INTERVAL {i * 32} DAYS")).alias("ts"),
            "value",
        )
        for i in range(n_replicas)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big = big.repartition(32).localCheckpoint(eager=True)
    n = big.count()

    t0 = time.perf_counter()
    g1 = resample_gapfill(ev, "user_id", "ts", "value", 3600)
    n1 = g1.count()
    t1 = time.perf_counter() - t0

    # On the local fixture the grid's compressed shuffle bytes sit
    # under AQE's 64 MB advisory size, so AQE coalesces the per-key
    # window's input to ONE partition and a single core sorts the
    # whole 11M-row grid (measured 16.5 s vs 6.7 s balanced). That is
    # a small-data artifact — at 100 TB the shuffle dwarfs the
    # advisory size and AQE keeps the parallelism — but the probe
    # disables coalescing so the evidence shows the operator's true
    # distributed shape.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        t0 = time.perf_counter()
        g10 = resample_gapfill(
            big, "user_id", "ts", "value", 3600
        ).localCheckpoint(eager=True)
        n10 = g10.count()
        gaps = g10.agg(F.sum("is_gap")).collect()[0][0]
        t10 = time.perf_counter() - t0
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    print(
        f"[timeseries] {n} events, time axis x10: 1x grid {n1} rows "
        f"{t1:.1f}s -> 10x grid {n10} rows {t10:.1f}s "
        f"({n10 / max(n1, 1):.1f}x rows, {gaps / n10:.0%} gap rows "
        f"filled); grid skew: {partition_skew(g10)}"
    )


def probe_versioning(spark, sf_dir: str, n_replicas: int = 10) -> None:
    """Snapshot diff at 10x: both sides 10x-cloned, v2 derived with
    the registered churn rules. The diff is one full-outer join on
    (id, hash, len) 40-byte rows — evidence that the cost is the
    hash-join shuffle, not text movement: wall time + per-class
    counts + result skew."""
    from cherry_spark.ext.versioning import corpus_diff_report
    from cherry_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    offset = 1_000_000
    parts = [
        docs.select((F.col("doc_id") + F.lit(i * offset)).alias("doc_id"), "text")
        for i in range(n_replicas)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big = big.repartition(32).localCheckpoint(eager=True)
    n = big.count()
    d = F.col("doc_id")
    v2 = (
        big.filter(d % 7 != 0)
        .select(
            "doc_id",
            F.when(d % 5 == 0, F.concat(F.col("text"), F.lit(" [v2]")))
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            big.filter(d % 13 == 0).select(
                (d + F.lit(100_000_000)).alias("doc_id"),
                F.concat(F.lit("new "), F.col("text")).alias("text"),
            )
        )
    )
    t0 = time.perf_counter()
    rpt = corpus_diff_report(big, v2).collect()
    t = time.perf_counter() - t0
    classes = {r.change_class: r.n_docs for r in rpt}
    print(f"[versioning] {n}-doc snapshot diff at 10x: {t:.1f}s, classes {classes}")


def probe_events(spark, sf_dir: str, n_replicas: int = 10) -> None:
    """Funnel + cohort at 10x along the USER axis (each replica is a
    distinct user population with identical journeys). The exactness
    invariant: every funnel stage count and every cohort cell must be
    EXACTLY 10x its 1x value — the operators are per-user aggregates,
    so a population clone scales counts linearly or the chain logic is
    broken. Evidence: wall times + the 10x-equality check."""
    from cherry_spark.ext.events import cohort_retention, funnel_conversion
    from cherry_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    )
    stages = ["view", "click", "purchase"]
    parts = [
        ev.select(
            (F.col("user_id") + F.lit(i * 10_000_000)).alias("user_id"),
            "ts",
            "event_type",
        )
        for i in range(n_replicas)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big = big.repartition(32).localCheckpoint(eager=True)
    n = big.count()

    t0 = time.perf_counter()
    f1 = {r.stage_idx: r.n_users for r in funnel_conversion(ev, stages).collect()}
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    f10 = {r.stage_idx: r.n_users for r in funnel_conversion(big, stages).collect()}
    t10 = time.perf_counter() - t0
    exact = all(f10[k] == 10 * v for k, v in f1.items())
    print(
        f"[events] funnel on {n} events: 1x {t1:.1f}s {f1} -> 10x "
        f"{t10:.1f}s {f10}; stage counts exactly 10x: {exact}"
    )

    t0 = time.perf_counter()
    c1 = {
        (r.cohort_s, r.week_offset): r.n_active
        for r in cohort_retention(ev).collect()
    }
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    c10 = {
        (r.cohort_s, r.week_offset): r.n_active
        for r in cohort_retention(big).collect()
    }
    t10 = time.perf_counter() - t0
    exact = set(c1) == set(c10) and all(c10[k] == 10 * v for k, v in c1.items())
    print(
        f"[events] cohort matrix: 1x {len(c1)} cells {t1:.1f}s -> 10x "
        f"{len(c10)} cells {t10:.1f}s; every cell exactly 10x: {exact}"
    )


def probe_anomaly_wsample(spark, sf_dir: str, n_replicas: int = 10) -> None:
    """Spike report + weighted sampling at 10x.

    Spike: clone every EVENT 10x in place — every bucket count c
    scales to 10c, so S scales 10x, N is unchanged, and both sides of
    the cleared-denominator test scale by exactly 100: the flag set
    must be IDENTICAL to 1x (scale-invariance of z). Weighted sample:
    10x distinct-id doc clones — total picks must still be EXACTLY m,
    and the per-item floor/ceil bracket holds by construction; wall
    time shows the two-phase prefix sum distributing."""
    from cherry_spark.ext.sampling import weighted_systematic_sample
    from cherry_spark.ext.timeseries import spike_report
    from cherry_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("event_type", "ts")
    rep = F.explode(F.sequence(F.lit(1), F.lit(n_replicas))).alias("_r")
    big = ev.select("event_type", "ts", rep).drop("_r")
    big = big.repartition(32).localCheckpoint(eager=True)
    n = big.count()

    t0 = time.perf_counter()
    s1 = {
        (r.key, r.bucket_s): (r.n_events, r.is_spike)
        for r in spike_report(ev, "event_type", "ts", 3600).collect()
    }
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    s10 = {
        (r.key, r.bucket_s): (r.n_events, r.is_spike)
        for r in spike_report(big, "event_type", "ts", 3600).collect()
    }
    t10 = time.perf_counter() - t0
    invariant = set(s1) == set(s10) and all(
        s10[k] == (10 * c, flag) for k, (c, flag) in s1.items()
    )
    n_spikes = sum(flag for _, flag in s1.values())
    print(
        f"[anomaly] spike_report on {n} events: 1x {len(s1)} buckets "
        f"({n_spikes} spikes) {t1:.1f}s -> 10x {t10:.1f}s; flags "
        f"scale-invariant and counts exactly 10x: {invariant}"
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    parts = [
        docs.select(
            (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"), "n_chars"
        )
        for i in range(n_replicas)
    ]
    bigd = parts[0]
    for p in parts[1:]:
        bigd = bigd.unionByName(p)
    bigd = bigd.repartition(32).localCheckpoint(eager=True)
    nd = bigd.count()
    m = 1000
    t0 = time.perf_counter()
    out = weighted_systematic_sample(bigd, "doc_id", "n_chars", m=m).collect()
    t = time.perf_counter() - t0
    total = sum(r.n_picks for r in out)
    print(
        f"[anomaly] weighted_sample on {nd} docs, m={m}: {t:.1f}s, "
        f"{len(out)} picked rows, total picks == m: {total == m}"
    )


def probe_maintainers(spark, sf_dir: str, n_arrivals: int = 10) -> None:
    """Per-batch cost curves for the round-8 streaming maintainers.

    Spike monitor: 10 arrivals x 100k events (1M total) — state is the
    per-(key, bucket) table, so per-batch cost must stay FLAT while
    the folded stream grows 10x. Weighted-sample maintainer: 10
    arrivals x 5k distinct-id docs — the re-draw runs over the
    (id, weight) store (50k rows by the end), so the curve may grow
    with the STORE (tiny rows) but never with text volume; exactly m
    picks after every fold."""
    import shutil

    from cherry_spark.sources.tables import load_table
    from cherry_spark.streaming.continuous import (
        run_streaming_spike_monitor,
        run_streaming_weighted_sample,
    )

    work = "/tmp/cherry_probe_maintainers"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)

    # --- spike monitor over replicated event arrivals ---
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts")
    src = f"{work}/ev_in"
    for i in range(n_arrivals):
        ev.coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.05)
    stream_df = (
        spark.readStream.schema("event_type string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    times: list[float] = []
    last = [time.perf_counter()]
    flags: list[int] = []

    def sink(report, batch_id):
        flags.append(report.agg(F.sum("is_spike")).first()[0])
        now = time.perf_counter()
        times.append(now - last[0])
        last[0] = now

    q = run_streaming_spike_monitor(
        spark, stream_df, f"{work}/ev_state", sink, f"{work}/ev_ckpt",
        key_col="event_type", ts_col="ts", width_s=3600,
    )
    q.awaitTermination(1800)
    print(
        f"[maintainers] spike monitor: {n_arrivals} x {ev.count()} events, "
        f"per-batch seconds {[round(t, 1) for t in times]} "
        f"(first->last {times[-1] / times[0]:.2f}x); "
        f"flag count stable under uniform growth: "
        f"{len(set(flags)) == 1} ({flags[0]} spikes)"
    )

    # --- weighted-sample maintainer over distinct-id doc arrivals ---
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    src2 = f"{work}/doc_in"
    for i in range(n_arrivals):
        docs.select(
            (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"), "n_chars"
        ).coalesce(1).write.mode("append").parquet(src2)
        time.sleep(1.05)
    stream2 = (
        spark.readStream.schema("doc_id long, n_chars long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src2)
    )
    times2: list[float] = []
    last2 = [time.perf_counter()]
    totals: list[int] = []

    def sink2(sample, batch_id):
        totals.append(sample.agg(F.sum("n_picks")).first()[0])
        now = time.perf_counter()
        times2.append(now - last2[0])
        last2[0] = now

    m = 500
    q2 = run_streaming_weighted_sample(
        spark, stream2, f"{work}/doc_state", sink2, f"{work}/doc_ckpt",
        id_col="doc_id", weight_col="n_chars", m=m,
    )
    q2.awaitTermination(1800)
    print(
        f"[maintainers] weighted sample: {n_arrivals} x {docs.count()} docs, "
        f"m={m}: per-batch seconds {[round(t, 1) for t in times2]} "
        f"(first->last {times2[-1] / times2[0]:.2f}x); "
        f"exactly m after every fold: {all(t == m for t in totals)}"
    )


def probe_substr(spark, sf_dir: str, n_replicas: int = 10) -> None:
    """repeated_substring_spans at 10x with the adversarial clone
    shape: every doc cloned 10x under distinct ids, so every gram's
    doc-frequency multiplies by 10 and every clone PAIR shares its
    full document as one span — span output grows quadratically in the
    clone factor BY SEMANTICS (clones really do share those runs),
    which is what the max_gram_df cap prices.  Evidence: wall time +
    span volume uncapped vs capped (cap below the inflated df zeroes
    the clone-saturated grams), result partition skew."""
    from cherry_spark.ext.substr import repeated_substring_spans
    from cherry_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    offset = 1_000_000
    parts = [
        docs.select((F.col("doc_id") + F.lit(i * offset)).alias("doc_id"), "text")
        for i in range(n_replicas)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big = big.repartition(32).localCheckpoint(eager=True)
    n = big.count()

    t0 = time.perf_counter()
    spans = repeated_substring_spans(big, min_len=8).localCheckpoint(eager=True)
    n_spans = spans.count()
    t_full = time.perf_counter() - t0

    t0 = time.perf_counter()
    capped = repeated_substring_spans(big, min_len=8, max_gram_df=n_replicas - 1)
    n_capped = capped.count()
    t_cap = time.perf_counter() - t0
    print(
        f"[substr] {n} docs 10x clones: uncapped {t_full:.1f}s "
        f"({n_spans} spans — quadratic in clones by semantics, skew: "
        f"{partition_skew(spans)}); cap=df<{n_replicas} {t_cap:.1f}s "
        f"({n_capped} spans — clone-saturated grams zeroed by the guard)"
    )


def probe_trained(spark, sf_dir: str, n_replicas: int = 10) -> None:
    """Classifier training at 10x with the EXACTNESS invariant: clone
    every labeled doc 10x and every aggregate scales uniformly —
    per-bucket mean labels unchanged, gradients and the N·lr_inv
    denominator both x10, and trunc((10g)/(10d)) == trunc(g/d) — so
    the trained WEIGHT TABLE must be bit-identical to the 1x run.
    Evidence: wall time for 8 GD rounds at 10x + weight-table equality
    (the invariant a distributed trainer must keep under data
    replication)."""
    from cherry_spark.ext.dedup import tokens_col
    from cherry_spark.ext.train import train_hashed_classifier
    from cherry_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    toks = tokens_col(F.col("text"))
    labeled = docs.select(
        "doc_id",
        "text",
        (
            F.size(F.filter(toks, lambda t: t == F.lit("spark"))) * 20
            >= F.size(toks)
        )
        .cast("long")
        .alias("label"),
    )
    offset = 1_000_000
    parts = [
        labeled.select(
            (F.col("doc_id") + F.lit(i * offset)).alias("doc_id"),
            "text",
            "label",
        )
        for i in range(n_replicas)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big = big.repartition(32).localCheckpoint(eager=True)
    n = big.count()

    w1 = {
        r["bucket"]: r["w"]
        for r in train_hashed_classifier(
            labeled, "label", n_iters=8, lr_inv=1
        ).collect()
    }
    t0 = time.perf_counter()
    w10 = {
        r["bucket"]: r["w"]
        for r in train_hashed_classifier(
            big, "label", n_iters=8, lr_inv=1
        ).collect()
    }
    t = time.perf_counter() - t0
    print(
        f"[trained] {n} labeled docs 10x clones: 8 GD rounds in {t:.1f}s; "
        f"weight table identical to 1x: {w10 == w1} "
        f"({len(w10)} buckets — clone-invariance of the fixed-point lane)"
    )


def main() -> None:
    from cherry_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    which = sys.argv[2] if len(sys.argv) > 2 else "all"
    spark = get_spark("r7ops_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    if which in ("knn", "all"):
        probe_knn(spark, sf_dir)
    if which in ("budget", "all"):
        probe_budget_grouped(spark, sf_dir)
    if which in ("gate", "all"):
        probe_gate(spark, sf_dir)
    if which == "gate_decon":
        probe_gate(spark, sf_dir, decon=True)
    if which == "maintainers":
        probe_maintainers(spark, sf_dir)
    if which in ("bloom", "all"):
        probe_bloom(spark, sf_dir)
    if which in ("web", "all"):
        probe_web(spark, sf_dir)
    if which in ("bpe", "all"):
        probe_bpe(spark, sf_dir)
    if which in ("sketch", "all"):
        probe_sketch(spark, sf_dir)
    if which in ("bm25", "all"):
        probe_bm25(spark, sf_dir)
    if which in ("linkage", "all"):
        probe_linkage(spark, sf_dir)
    if which in ("phrase", "all"):
        probe_phrase(spark, sf_dir)
    if which in ("timeseries", "all"):
        probe_timeseries(spark, sf_dir)
    if which in ("versioning", "all"):
        probe_versioning(spark, sf_dir)
    if which in ("events", "all"):
        probe_events(spark, sf_dir)
    if which in ("anomaly", "all"):
        probe_anomaly_wsample(spark, sf_dir)
    if which in ("substr", "all"):
        probe_substr(spark, sf_dir)
    if which in ("trained", "all"):
        probe_trained(spark, sf_dir)


if __name__ == "__main__":
    main()
