"""Streaming-gate scale probe: drive run_streaming_growing_dedup over
10 arrivals of 5,000 docs each (the 10x near-dup clone corpus from
scale_probe_curation, one replica per arrival) and record per-batch
wall time as the accumulated corpus grows 0 -> 45k docs.

What it demonstrates (the 100 TB ingestion shape):

- per-batch cost must grow SUBLINEARLY in the corpus: the batch
  classifies against stored corpus SIGNATURES (never re-shingles the
  corpus) through capped band buckets, so the per-batch join touches
  candidate buckets only;
- every arrival after the first is a full near-dup clone class of
  arrival 1's admissions — the adversarial case where every doc finds
  candidates and the verify join does maximal work;
- admission policy is "all" (the dedup-as-annotation mode): the corpus
  grows by the FULL batch every arrival, so by the last arrival each
  batch doc collides with every prior replica of its clone class —
  growing corpus AND maximal candidate fan-out at once (the capped
  band buckets are what keep this bounded).

Run: python tools/scale_probe_streaming.py [sf_dir] [n_arrivals]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def probe_span_gate(sf_dir: str, n_arrivals: int = 10) -> None:
    """run_streaming_span_gate's handle_batch body, serial-timed: 10
    arrivals of 5k docs against the growing admitted-postings store.
    Adversarial composition per arrival: the ODD half of each batch is
    its base doc + ONE novel token (overlap ≈ L/(L+1) > 0.5 →
    span_dup, postings never stored), the EVEN half is base + an
    equal-length per-arrival novel suffix (overlap exactly 0.5 → NOT >
    0.5 → admitted, store grows).  Every admitted doc carries its base
    text, so arrival i's doc d genuinely overlaps ALL i of its prior
    admitted versions — per-batch match volume grows linearly BY
    SEMANTICS (the clone classes really do share those runs); the
    evidence is that per-batch cost tracks the true match volume and
    verdict counts stay exact, with the store holding admitted docs
    only."""
    from cherry_spark.ext.substr import (
        _gram_postings,
        delta_repeated_spans,
        span_overlap_verdicts,
    )
    from cherry_spark.session import get_spark
    from cherry_spark.sources.tables import load_table

    work = "/tmp/cherry_probe_span_gate"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    state_dir = f"{work}/grams"

    spark = get_spark("span_gate_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    offset = 1_000_000
    times, hit_counts = [], []
    for i in range(n_arrivals):
        # novel suffix the same length as the doc (token-for-token):
        # md5-salted per (arrival, doc) so suffixes never collide
        toks = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
        suffix_full = F.concat_ws(
            " ",
            F.transform(
                toks,
                lambda t, j: F.md5(
                    F.concat(t, F.lit(f"|{i}|"), F.col("doc_id").cast("string"), j.cast("string"))
                ),
            ),
        )
        batch = docs.select(
            (F.col("doc_id") + F.lit(i * offset)).alias("doc_id"),
            F.when(
                F.col("doc_id") % 2 == 1,
                F.concat(F.col("text"), F.lit(f" odd{i}x")),
            )
            .otherwise(F.concat(F.col("text"), F.lit(" "), suffix_full))
            .alias("text"),
        ).localCheckpoint(eager=True)
        t0 = time.perf_counter()
        grams = _gram_postings(batch, 8, "doc_id", "text").localCheckpoint(
            eager=True
        )
        if os.path.isdir(state_dir):
            stored = spark.read.parquet(state_dir)
            spans = delta_repeated_spans(
                None, batch, 8, corpus_grams=stored, batch_grams=grams
            ).localCheckpoint(eager=True)
        else:
            spans = spark.createDataFrame(
                [],
                "doc_a long, doc_b long, start_a long, start_b long,"
                " span_len long",
            )
        n_spans = spans.count()
        verdicts = span_overlap_verdicts(batch, spans, 0.5).localCheckpoint(
            eager=True
        )
        counts = {
            r["verdict"]: r["n"]
            for r in verdicts.groupBy("verdict")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        admitted = verdicts.filter(F.col("verdict") != "span_dup").select(
            "doc_id"
        )
        grams.join(
            admitted.withColumnRenamed("doc_id", "__doc"), "__doc", "left_semi"
        ).write.mode("append").parquet(state_dir)
        dt = time.perf_counter() - t0
        times.append(dt)
        hit_counts.append(n_spans)
        print(f"arrival {i}: spans {n_spans} -> {counts} in {dt:.1f}s")
    stored_docs = (
        spark.read.parquet(state_dir).select("__doc").distinct().count()
    )
    print(
        f"[span_gate] per-batch seconds: {[round(t, 1) for t in times]}; "
        f"spans per batch: {hit_counts} (growing with TRUE clone-class "
        f"size); store holds {stored_docs} admitted docs "
        f"(rejected halves never folded)"
    )


def main() -> None:
    from cherry_spark.ext.dedup import delta_dedup, minhash_signatures
    from cherry_spark.sources.tables import load_table
    from cherry_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_arrivals = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    work = "/tmp/cherry_probe_streaming"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    corpus_dir = f"{work}/corpus"
    sig_dir = f"{work}/corpus_sigs"

    spark = get_spark("streaming_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    offset = 1_000_000

    # serial foreachBatch-equivalent loop (the gate's handle_batch body,
    # timed per batch; the Structured Streaming harness adds only
    # trigger scheduling around this)
    schema = "doc_id long, text string"
    times = []
    for i in range(n_arrivals):
        batch = docs.select(
            (F.col("doc_id") + F.lit(i * offset)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" replica{i}")).alias("text"),
        ).localCheckpoint(eager=True)
        t0 = time.perf_counter()
        corpus = (
            spark.read.schema(schema).parquet(corpus_dir)
            if os.path.isdir(corpus_dir)
            else spark.createDataFrame([], schema)
        )
        sigs = (
            spark.read.parquet(sig_dir) if os.path.isdir(sig_dir) else None
        )
        # sign the batch once; classification AND the store fold reuse
        # the same table (the r8 batch_signatures seam)
        batch_sigs = minhash_signatures(
            batch, "doc_id", "text", 128, 3, "xxhash"
        ).localCheckpoint(eager=True)
        verdicts = delta_dedup(
            corpus,
            batch,
            corpus_signatures=sigs,
            batch_signatures=batch_sigs,
            jaccard_threshold=0.5,
        ).localCheckpoint(eager=True)
        counts = {
            r["verdict"]: r["n"]
            for r in verdicts.groupBy("verdict")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        # admit="all": grow the corpus every arrival
        batch_sigs.write.mode("append").parquet(sig_dir)
        admitted = batch
        admitted.write.mode("append").parquet(corpus_dir)
        dt = time.perf_counter() - t0
        times.append(dt)
        corpus_n = spark.read.parquet(corpus_dir).count()
        print(f"arrival {i}: corpus now {corpus_n} -> {counts} in {dt:.1f}s")
    print(
        f"per-batch seconds: {[round(t, 1) for t in times]}\n"
        f"first {times[0]:.1f}s -> last {times[-1]:.1f}s with corpus 0 -> "
        f"{(n_arrivals - 1) * 5000} docs and per-doc candidate classes 0 -> "
        f"{n_arrivals - 1} (x{times[-1] / times[0]:.2f})"
    )


def probe_pair_graph(sf_dir: str, n_arrivals: int = 10) -> None:
    """run_streaming_pair_graph's fold (pair_graph_fold, the exact
    production body), serial-timed: n arrivals, each the FULL sf0.1
    documents table with shifted ids — so arrival i's doc d is an
    exact clone of every prior replica of d. Adversarial by
    construction: TRUE new-edge volume grows linearly per fold
    (5000*i clone edges at fold i, quadratic in total), every batch
    doc finds candidates, and every shingle's doc_freq grows by a
    full corpus per arrival. The cap is scaled with the replication
    factor (cap = 500 * n_arrivals): clone replication multiplies
    every doc_freq by exactly the arrival count, so the scaled cap
    reproduces the 1x measured profile at end state.

    Invariants checked: clone pairs are exact (J == 1.0), and their
    count after the run == 5000 * C(n, 2); per-fold new-pair counts
    are printed next to per-fold seconds so the reader can see cost
    tracking TRUE volume (the span-gate probe's framing).
    """
    from cherry_spark.session import get_spark
    from cherry_spark.sources.tables import load_table
    from cherry_spark.streaming.continuous import pair_graph_fold

    work = "/tmp/cherry_probe_pair_graph"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    state = f"{work}/graph"

    spark = get_spark("pair_graph_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents", parallelize=True).select(
        "doc_id", "text"
    )
    offset = 1_000_000
    times, new_pairs = [], []
    for i in range(n_arrivals):
        batch = docs.select(
            (F.col("doc_id") + F.lit(i * offset)).alias("doc_id"), "text"
        ).localCheckpoint(eager=True)
        t0 = time.perf_counter()
        summary = pair_graph_fold(
            spark,
            batch,
            state,
            threshold=0.8,
            max_bucket_size=500 * n_arrivals,
        )
        (r,) = summary.collect()
        dt = time.perf_counter() - t0
        times.append(dt)
        new_pairs.append(r["n_new_pairs"])
        print(f"arrival {i}: {r['n_new_pairs']} new edges in {dt:.1f}s")
    pairs = spark.read.parquet(f"{state}/pairs")
    n_docs = docs.count()
    n_clone = pairs.filter(F.col("jaccard") == 1.0).count()
    expect = n_docs * n_arrivals * (n_arrivals - 1) // 2
    total = pairs.count()
    print(
        f"[pair_graph] per-batch seconds: {[round(t, 1) for t in times]}; "
        f"new edges per batch: {new_pairs} (linear by semantics); "
        f"exact-clone edges {n_clone} (expected >= {expect}: "
        f"{'OK' if n_clone >= expect else 'MISMATCH'}); total edges {total}"
    )


def probe_bm25_index(sf_dir: str, n_arrivals: int = 10) -> None:
    """run_streaming_bm25_index's fold (bm25_index_fold, the exact
    production body), serial-timed: n arrivals, each the FULL sf0.1
    documents table with shifted ids. Per-fold cost must stay FLAT:
    tf/dl are batch-linear appends, and the dfreq/stats merges are
    vocab-bounded (the fixture vocabulary is shared across arrivals,
    so the stored dfreq table STOPS GROWING after arrival 1 — the
    shape that holds at 100 TB, where vocabulary grows sublinearly in
    corpus size). Exactness invariant: final stats equal
    (n_docs, total_len) of one arrival times n.
    """
    from cherry_spark.session import get_spark
    from cherry_spark.sources.tables import load_table
    from cherry_spark.streaming.continuous import bm25_index_fold

    work = "/tmp/cherry_probe_bm25_index"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    state = f"{work}/bm25"

    spark = get_spark("bm25_index_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents", parallelize=True).select(
        "doc_id", "text"
    )
    offset = 1_000_000
    times, stats_rows = [], []
    for i in range(n_arrivals):
        batch = docs.select(
            (F.col("doc_id") + F.lit(i * offset)).alias("doc_id"), "text"
        ).localCheckpoint(eager=True)
        t0 = time.perf_counter()
        (r,) = bm25_index_fold(spark, batch, state).collect()
        dt = time.perf_counter() - t0
        times.append(dt)
        stats_rows.append((r["n_docs"], r["total_len"]))
        print(f"arrival {i}: stats {stats_rows[-1]} in {dt:.1f}s")
    vocab = spark.read.parquet(f"{state}/dfreq").count()
    one = stats_rows[0]
    ok = stats_rows[-1] == (one[0] * n_arrivals, one[1] * n_arrivals)
    print(
        f"[bm25_index] per-batch seconds: {[round(t, 1) for t in times]}; "
        f"stored vocab {vocab} terms (bounded — identical across "
        f"arrivals); final stats {stats_rows[-1]} == {n_arrivals}x one "
        f"arrival: {'OK' if ok else 'MISMATCH'}"
    )


def probe_positional_index(sf_dir: str, n_arrivals: int = 10) -> None:
    """run_streaming_positional_index's fold body, serial-timed: n
    arrivals, each the FULL sf documents table with shifted ids.
    Purely additive store — per-fold cost must stay FLAT (one
    tokenize+posexplode per batch, batch-linear append, no merge
    tables at all). The runner's r10 self-compaction cadence
    (compact_every=8) is replicated, so the probe also demonstrates
    the file count staying bounded with no manual compaction.
    Exactness invariant: final posting count == n x one arrival's."""
    from cherry_spark.session import get_spark
    from cherry_spark.sources.tables import load_table
    from cherry_spark.streaming.continuous import (
        _self_compact,
        positional_index_fold,
    )
    from cherry_spark.writers.compact import _n_parquet_files

    work = "/tmp/cherry_probe_positional"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    state = f"{work}/pos"

    spark = get_spark("positional_index_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents", parallelize=True).select(
        "doc_id", "text"
    )
    offset = 1_000_000
    times, counts, file_counts = [], [], []
    for i in range(n_arrivals):
        batch = docs.select(
            (F.col("doc_id") + F.lit(i * offset)).alias("doc_id"), "text"
        ).localCheckpoint(eager=True)
        t0 = time.perf_counter()
        if i and i % 8 == 0:  # the runner's compact_every=8 hook
            _self_compact(spark, state, f"b{i}")
        (r,) = positional_index_fold(
            spark, batch, state, batch_key=f"b{i}"
        ).collect()
        n = r["n_postings"]
        dt = time.perf_counter() - t0
        times.append(dt)
        counts.append(n)
        file_counts.append(_n_parquet_files(state))
        print(f"arrival {i}: {n} postings in {dt:.1f}s "
              f"({file_counts[-1]} files)")
    total = spark.read.parquet(state).count()
    ok = total == counts[0] * n_arrivals
    print(
        f"[positional_index] per-batch seconds: "
        f"{[round(t, 1) for t in times]}; files per fold: {file_counts} "
        f"(self-compaction at fold 8 bounds growth); final postings "
        f"{total} == {n_arrivals}x one arrival: {'OK' if ok else 'MISMATCH'}"
    )


def probe_ivf_index(sf_dir: str, n_arrivals: int = 10) -> None:
    """run_streaming_ivf_index's fold (ivf_index_fold, the exact
    production body), serial-timed: the index is built ONCE on the
    base embeddings table (the corpus-version contract), then each
    arrival folds the full table with shifted ids through the
    fixed-centroid assignment join. Per-fold cost must stay FLAT: one
    broadcast of the tiny centroid table + a batch-linear partitioned
    append — nothing rescans the stored corpus. Self-compaction
    cadence replicated (hive-partition aware). Exactness invariant:
    the maintained corpus's (id, centroid_id) assignment is
    row-identical to assigning ALL vectors in one batch against the
    same centroids."""
    from cherry_spark.ext.ivf import ivf_assign, ivf_build_index
    from cherry_spark.session import get_spark
    from cherry_spark.sources.tables import load_table
    from cherry_spark.streaming.continuous import (
        _self_compact,
        ivf_index_fold,
    )
    from cherry_spark.writers.compact import _n_parquet_files

    work = "/tmp/cherry_probe_ivf_index"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    index_dir = f"{work}/ivf"

    spark = get_spark("ivf_index_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    vecs = load_table(spark, sf_dir, "embeddings", parallelize=True).select(
        "vec_id", "embedding"
    )
    ivf_build_index(vecs, index_dir, n_centroids=16)
    offset = 1_000_000
    times, file_counts = [], []
    for i in range(1, n_arrivals):
        batch = vecs.select(
            (F.col("vec_id") + F.lit(i * offset)).alias("vec_id"), "embedding"
        ).localCheckpoint(eager=True)
        t0 = time.perf_counter()
        if i % 8 == 0:  # the runner's compact_every=8 hook
            _self_compact(spark, index_dir, f"b{i}")
        (r,) = ivf_index_fold(
            spark, batch, index_dir, batch_key=f"b{i}"
        ).collect()
        dt = time.perf_counter() - t0
        times.append(dt)
        file_counts.append(_n_parquet_files(f"{index_dir}/corpus"))
        print(
            f"arrival {i}: {r['n_vectors']} vectors -> "
            f"{r['n_clusters_hit']} clusters in {dt:.1f}s "
            f"({file_counts[-1]} corpus files)"
        )
    corpus = spark.read.parquet(f"{index_dir}/corpus")
    centroids = spark.read.parquet(f"{index_dir}/centroids")
    all_vecs = corpus.select("vec_id", "embedding")
    oneshot = ivf_assign(all_vecs, centroids)
    mismatches = (
        corpus.select("vec_id", F.col("centroid_id").cast("long"))
        .exceptAll(
            oneshot.select("vec_id", F.col("centroid_id").cast("long"))
        )
        .count()
    )
    total = corpus.count()
    base = vecs.count()
    print(
        f"[ivf_index] per-batch seconds: {[round(t, 1) for t in times]}; "
        f"corpus files per fold: {file_counts} (self-compaction at fold 8 "
        f"bounds growth); corpus {total} == {n_arrivals}x base "
        f"{'OK' if total == base * n_arrivals else 'MISMATCH'}; maintained "
        f"assignment vs one-shot mismatches: {mismatches} "
        f"({'OK' if mismatches == 0 else 'MISMATCH'})"
    )


def probe_doc_store(sf_dir: str, n_arrivals: int = 10) -> None:
    """run_streaming_doc_store's fold (doc_store_fold, the exact
    production body) with the heaviest registered transform
    (minhash_signatures, 128 hashes), serial-timed: n arrivals of the
    full sf documents table with shifted ids. Each document is
    transformed ONCE per lifetime and appended — per-fold cost must
    stay FLAT regardless of how large the store has grown (the store
    is never read by the fold). Self-compaction cadence replicated.
    Exactness invariant: store rows == n x one arrival's signatures,
    one row per doc."""
    from cherry_spark.ext.dedup import minhash_signatures
    from cherry_spark.session import get_spark
    from cherry_spark.sources.tables import load_table
    from cherry_spark.streaming.continuous import _self_compact, doc_store_fold
    from cherry_spark.writers.compact import _n_parquet_files

    work = "/tmp/cherry_probe_doc_store"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    state = f"{work}/sigs"

    spark = get_spark("doc_store_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents", parallelize=True).select(
        "doc_id", "text"
    )
    transform = lambda df: minhash_signatures(  # noqa: E731
        df, "doc_id", "text", 128, 3, "xxhash"
    )
    offset = 1_000_000
    times, file_counts = [], []
    for i in range(n_arrivals):
        batch = docs.select(
            (F.col("doc_id") + F.lit(i * offset)).alias("doc_id"), "text"
        ).localCheckpoint(eager=True)
        t0 = time.perf_counter()
        if i and i % 8 == 0:  # the runner's compact_every=8 hook
            _self_compact(spark, state, f"b{i}")
        (r,) = doc_store_fold(
            spark, batch, state, transform, batch_key=f"b{i}"
        ).collect()
        dt = time.perf_counter() - t0
        times.append(dt)
        file_counts.append(_n_parquet_files(state))
        print(
            f"arrival {i}: {r['n_rows']} signature rows in {dt:.1f}s "
            f"({file_counts[-1]} files)"
        )
    total = spark.read.parquet(state).count()
    n_docs = docs.count()
    ok = total == n_docs * n_arrivals
    print(
        f"[doc_store] per-batch seconds: {[round(t, 1) for t in times]}; "
        f"files per fold: {file_counts} (self-compaction at fold 8 bounds "
        f"growth); store rows {total} == {n_arrivals}x {n_docs} docs: "
        f"{'OK' if ok else 'MISMATCH'}"
    )


def probe_count_store(sf_dir: str, n_arrivals: int = 10) -> None:
    """run_streaming_count_store's fold (count_store_fold, the exact
    production body) maintaining the bigram LM, serial-timed: n
    arrivals of the full sf documents table with shifted ids — each
    arrival contributes an IDENTICAL bigram profile, so the stored
    key set stops growing after arrival 1 (the 100 TB shape:
    vocabulary grows sublinearly in corpus) while every count scales
    exactly linearly. Per-fold cost is bounded by the store's key
    cardinality, not the corpus — it must stay FLAT. No compaction
    hook: the store is a swap table rewritten each fold (it never
    fragments). Exactness invariant: EVERY stored count == n x its
    one-arrival value (checked exhaustively, not sampled)."""
    from cherry_spark.ext.quality import bigram_counts
    from cherry_spark.session import get_spark
    from cherry_spark.sources.tables import load_table
    from cherry_spark.streaming.continuous import count_store_fold

    work = "/tmp/cherry_probe_count_store"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    state = f"{work}/bigrams"

    spark = get_spark("count_store_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents", parallelize=True).select(
        "doc_id", "text"
    )
    transform = lambda df: bigram_counts(df)  # noqa: E731
    offset = 1_000_000
    times, key_counts = [], []
    for i in range(n_arrivals):
        batch = docs.select(
            (F.col("doc_id") + F.lit(i * offset)).alias("doc_id"), "text"
        ).localCheckpoint(eager=True)
        t0 = time.perf_counter()
        (r,) = count_store_fold(
            spark, batch, state, transform, ["prev", "cur"]
        ).collect()
        dt = time.perf_counter() - t0
        times.append(dt)
        key_counts.append(r["n_keys"])
        print(f"arrival {i}: {r['n_keys']} keys in {dt:.1f}s")
    one = bigram_counts(docs)
    stored = spark.read.parquet(state)
    # full-outer comparison: a missing key, an extra key, and a wrong
    # count all contribute positively (a join-only check lets missing
    # keys cancel against mismatches)
    bad = (
        stored.join(
            one.withColumnRenamed("c2", "c_one"), ["prev", "cur"], "full"
        )
        .filter(
            F.col("c2").isNull()
            | F.col("c_one").isNull()
            | (F.col("c2") != F.col("c_one") * n_arrivals)
        )
        .count()
    )
    print(
        f"[count_store] per-batch seconds: {[round(t, 1) for t in times]}; "
        f"stored keys per fold: {key_counts} (bounded — identical after "
        f"arrival 1); every count == {n_arrivals}x one arrival: "
        f"{'OK' if bad == 0 else f'MISMATCH ({bad})'}"
    )


def probe_trained_gate(sf_dir: str, n_arrivals: int = 10) -> None:
    """run_streaming_trained_gate's fold (trained_gate_fold, the exact
    production body), serial-timed: n arrivals of the full sf
    documents table with shifted ids, refit_every=4 (refits at folds
    0, 4, 8) with the certified hyperparameters (256 buckets, 8 GD
    rounds). The 100 TB cost shape this demonstrates: SCORE folds are
    batch-linear (one broadcast model join) and must stay FLAT; REFIT
    folds pay one tokenize pass over the labeled corpus so far — the
    corpus-version cost, growing linearly by design and paid only at
    boundaries.

    Exactness invariant (independent derivation): the fixed-point
    trainer is invariant under exact k-fold corpus replication (init
    ysum/tcnt, per-doc residuals, gradient sums, and the div
    denominators all scale together), so the fold-8 refit — trained
    on 9 identical replicas — must be BIT-identical to training on
    ONE arrival."""
    from cherry_spark.ext.train import train_hashed_classifier
    from cherry_spark.queries.curation import _density_label_col
    from cherry_spark.session import get_spark
    from cherry_spark.sources.tables import load_table
    from cherry_spark.streaming.continuous import trained_gate_fold

    work = "/tmp/cherry_probe_trained_gate"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    state = f"{work}/model"

    spark = get_spark("trained_gate_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents", parallelize=True).select(
        "doc_id", "text"
    )
    label = _density_label_col()
    offset = 1_000_000
    times, kept = [], []
    for i in range(n_arrivals):
        batch = docs.select(
            (F.col("doc_id") + F.lit(i * offset)).alias("doc_id"), "text"
        ).localCheckpoint(eager=True)
        t0 = time.perf_counter()
        out = trained_gate_fold(
            spark,
            batch,
            state,
            label,
            i,
            refit_every=4,
            n_buckets=256,
            n_iters=8,
            lr_inv=1,
            batch_key=f"b{i}",
        )
        (r,) = (
            out.agg(
                F.sum("keep").alias("k"), F.max("model_version").alias("v")
            ).collect()
        )
        dt = time.perf_counter() - t0
        times.append(dt)
        kept.append(int(r["k"]))
        tag = "REFIT" if i % 4 == 0 else "score"
        print(f"arrival {i} ({tag}, model v{r['v']}): kept {r['k']} in {dt:.1f}s")
    stored = {
        w["bucket"]: w["w"]
        for w in spark.read.parquet(f"{state}/weights").collect()
    }
    one = docs.withColumn("__l", label.cast("long"))
    expect = {
        w["bucket"]: w["w"]
        for w in train_hashed_classifier(
            one, "__l", n_buckets=256, n_iters=8, lr_inv=1
        ).collect()
    }
    score_folds = [round(t, 1) for i, t in enumerate(times) if i % 4]
    refit_folds = [round(t, 1) for i, t in enumerate(times) if i % 4 == 0]
    print(
        f"[trained_gate] score-fold seconds: {score_folds} (FLAT — "
        f"broadcast model join, batch-linear); refit-fold seconds: "
        f"{refit_folds} (history under retain_docs: every arrival "
        f"trains); kept per fold: {kept} (constant — clone arrivals, "
        f"same model between boundaries); fold-8 weights (9 replicas "
        f"under the cap) == one-arrival training: "
        f"{'OK' if stored == expect else 'MISMATCH'}"
    )

    # phase 2 (r11, r10 verdict item #3): the BOUNDED refit. Cap the
    # training sample at one arrival's size so history outgrows it by
    # fold 1 — refit folds must go FLAT (each reads exactly
    # retain_docs rows) instead of growing with stream history, and
    # the stored weights must equal a from-scratch train over the
    # sample store (the refit corpus IS the sample, by construction).
    n_docs = docs.count()
    state2 = f"{work}/model_bounded"
    times2 = []
    for i in range(n_arrivals):
        batch = docs.select(
            (F.col("doc_id") + F.lit(i * offset)).alias("doc_id"), "text"
        ).localCheckpoint(eager=True)
        t0 = time.perf_counter()
        out = trained_gate_fold(
            spark,
            batch,
            state2,
            label,
            i,
            refit_every=4,
            n_buckets=256,
            n_iters=8,
            lr_inv=1,
            batch_key=f"b{i}",
            retain_docs=n_docs,
        )
        out.write.format("noop").mode("overwrite").save()
        times2.append(time.perf_counter() - t0)
    sample = spark.read.parquet(f"{state2}/train_sample")
    n_sample = sample.count()
    stored2 = {
        w["bucket"]: w["w"]
        for w in spark.read.parquet(f"{state2}/weights")
        .select("bucket", "w")
        .collect()
    }
    # the stored weights come from the LAST refit boundary (fold 8);
    # the live sample has since absorbed fold 9 — reconstruct the
    # fold-8 sample as the top-N over arrivals 0..8 only (ids are
    # disjoint per arrival, and the incremental merge == global top-N
    # over whatever has arrived)
    last_boundary = ((n_arrivals - 1) // 4) * 4
    hist8 = spark.read.parquet(f"{state2}/labeled").filter(
        F.col("doc_id") < (last_boundary + 1) * offset
    )
    sample8 = hist8.orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    ).limit(n_docs)
    expect2 = {
        w["bucket"]: w["w"]
        for w in train_hashed_classifier(
            sample8, "__lbl", n_buckets=256, n_iters=8, lr_inv=1
        ).collect()
    }
    refit2 = [round(t, 1) for i, t in enumerate(times2) if i % 4 == 0]
    score2 = [round(t, 1) for i, t in enumerate(times2) if i % 4]
    print(
        f"[trained_gate bounded retain_docs={n_docs}] refit-fold "
        f"seconds: {refit2} (FLAT — each trains on exactly the "
        f"{n_sample}-row sample regardless of the "
        f"{n_docs * n_arrivals}-row history); score-fold seconds: "
        f"{score2}; fold-{last_boundary} weights == from-scratch "
        f"train over the reconstructed fold-{last_boundary} sample: "
        f"{'OK' if stored2 == expect2 else 'MISMATCH'}"
    )


if __name__ == "__main__":
    _MODES = {
        "bm25_index": probe_bm25_index,
        "pair_graph": probe_pair_graph,
        "span_gate": probe_span_gate,
        "positional_index": probe_positional_index,
        "ivf_index": probe_ivf_index,
        "doc_store": probe_doc_store,
        "count_store": probe_count_store,
        "trained_gate": probe_trained_gate,
    }
    _mode = next((a for a in sys.argv[1:] if a in _MODES), None)
    # sf_dir = first positional arg that is NOT a mode name, so both
    # "probe.py sf_dir mode" and "probe.py mode" hit the default dir
    _sf = next(
        (a for a in sys.argv[1:] if a not in _MODES), "/root/testdata/sf0.1"
    )
    if _mode is not None:
        _MODES[_mode](_sf)
    else:
        main()
