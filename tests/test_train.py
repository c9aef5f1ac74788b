"""Distributed hashed-classifier training (ext/train.py): round-trip
quality on separable data, exact integer-lane differential against a
pure-Python replay, and the oracle twin's arithmetic."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from cherry_spark.writers.store import data_dir as dd

from cherry_spark.ext.train import (
    SCALE,
    train_hashed_classifier,
    train_then_gate,
    trained_classifier_gate,
)

# two disjoint vocabularies -> linearly separable with near-certain
# absence of bucket collisions at n_buckets=4096
POS_WORDS = ["alpha", "bravo", "charlie", "delta", "echo"]
NEG_WORDS = ["foxtrot", "golf", "hotel", "india", "juliet"]


def _docs(spark):
    rows = []
    for i in range(8):
        rows.append((i, " ".join(POS_WORDS[j % 5] for j in range(i, i + 6)), 1))
    for i in range(8):
        rows.append(
            (100 + i, " ".join(NEG_WORDS[j % 5] for j in range(i, i + 6)), 0)
        )
    return spark.createDataFrame(rows, "doc_id long, text string, label long")


def test_train_then_gate_separates_disjoint_vocab(spark):
    docs = _docs(spark)
    w = train_hashed_classifier(docs, "label", n_buckets=4096)
    out = trained_classifier_gate(docs, w, n_buckets=4096).collect()
    got = {r["doc_id"]: (r["keep"], r["score_micro"]) for r in out}
    assert len(got) == 16
    for i in range(8):
        assert got[i][0] == 1, f"pos doc {i}: {got[i]}"
        assert got[100 + i][0] == 0, f"neg doc {i}: {got[100 + i]}"
    # scores land at the label poles on separable data
    assert all(got[i][1] > 0.9 * SCALE for i in range(8))
    assert all(abs(got[100 + i][1]) < 0.1 * SCALE for i in range(8))


def _bucket_py(tok: str, n_buckets: int) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % n_buckets


def _tdiv(a: int, b: int) -> int:
    """Truncation-toward-zero integer division (Spark div, DuckDB //)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _train_py(rows, n_buckets, n_iters, lr_inv):
    """Pure-Python replay of the exact integer training lane."""
    toks = []  # (id, y, bucket)
    for doc_id, text, label in rows:
        for t in text.split():
            if t:
                toks.append((doc_id, SCALE * label, _bucket_py(t, n_buckets)))
    n_docs = len({i for i, _, _ in toks})
    den = n_docs * lr_inv
    ysum, tcnt = {}, {}
    for _, y, b in toks:
        ysum[b] = ysum.get(b, 0) + y
        tcnt[b] = tcnt.get(b, 0) + 1
    w = {b: _tdiv(ysum[b], tcnt[b]) for b in ysum}
    for _ in range(n_iters):
        wsum, n, yv = {}, {}, {}
        for i, y, b in toks:
            wsum[i] = wsum.get(i, 0) + w[b]
            n[i] = n.get(i, 0) + 1
            yv[i] = y
        resid = {i: _tdiv(wsum[i], n[i]) - yv[i] for i in wsum}
        grad = {}
        for i, _, b in toks:
            grad[b] = grad.get(b, 0) + _tdiv(resid[i], n[i])
        w = {b: w[b] - _tdiv(grad.get(b, 0), den) for b in w}
    return w


def test_weights_match_pure_python_replay(spark):
    """The full fixed-point lane — init, residuals, per-token gradient
    truncation, update division — must be bit-identical to the
    pure-Python reference (negative weights exercise the trunc-vs-floor
    division edge)."""
    rows = [
        (0, "alpha alpha bravo mixed", 1),
        (1, "alpha charlie mixed mixed", 1),
        (2, "foxtrot golf mixed", 0),
        (3, "foxtrot foxtrot golf golf mixed", 0),
        (4, "alpha foxtrot", 1),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, label long")
    for n_iters in (0, 1, 3):
        got = {
            r["bucket"]: r["w"]
            for r in train_hashed_classifier(
                docs, "label", n_buckets=64, n_iters=n_iters, lr_inv=2
            ).collect()
        }
        assert got == _train_py(rows, 64, n_iters, 2), f"n_iters={n_iters}"


def test_gate_unseen_buckets_weigh_zero(spark):
    train = spark.createDataFrame(
        [(0, "alpha bravo", 1), (1, "foxtrot golf", 0)],
        "doc_id long, text string, label long",
    )
    w = train_hashed_classifier(train, "label", n_buckets=4096)
    test = spark.createDataFrame(
        [(9, "zzz qqq www")], "doc_id long, text string"
    )
    (row,) = trained_classifier_gate(test, w, n_buckets=4096).collect()
    assert row["score_micro"] == 0 and row["keep"] == 0


def test_train_then_gate_on_fixture_accuracy(spark, sf_dir):
    """On the real documents fixture with the registered query's
    keyword-density label the trained gate must actually classify:
    class means separated and ≥85% train accuracy at the calibrated
    midpoint threshold (measured 95.6% at sf0.001)."""
    from cherry_spark.ext.dedup import tokens_col
    from cherry_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col(F.col("text"))
    label = (
        F.size(F.filter(toks, lambda t: t == F.lit("spark"))) * 20
        >= F.size(toks)
    )
    out = train_then_gate(docs, label, n_iters=8, lr_inv=1).cache()
    agg = {
        r["y"]: r["m"]
        for r in out.groupBy("y").agg(F.avg("score_micro").alias("m")).collect()
    }
    assert agg[1] > agg[0]
    acc = (
        out.select((F.col("keep") == F.col("y")).cast("int").alias("ok"))
        .agg(F.avg("ok"))
        .collect()[0][0]
    )
    assert acc >= 0.85, acc
    # the calibrated threshold is one constant, between the class means
    thrs = out.select("thr_micro").distinct().collect()
    assert len(thrs) == 1 and agg[0] < thrs[0][0] < agg[1]


def test_stored_weights_serve_bit_identical(spark, sf_dir):
    """The registered query serves the trained model from a
    fingerprinted store (train once per corpus version, score many).
    Stored ≡ retrained bit-for-bit — training is deterministic BIGINT
    arithmetic and the weight table is BIGINT, lossless through
    parquet — and a second serve never rebuilds."""
    import os

    from cherry_spark.queries.curation import (
        _density_label_col,
        _ensure_trained_weights,
        trained_quality_gate,
    )
    from cherry_spark.sources.tables import load_table

    store = _ensure_trained_weights(spark, sf_dir)
    marker = os.path.getmtime(f"{store}/_SUCCESS")
    served = trained_quality_gate(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    inline = train_then_gate(
        docs, _density_label_col(), n_buckets=256, n_iters=8, lr_inv=1
    )
    canon = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    assert canon(served) == canon(inline)
    assert os.path.getmtime(f"{store}/_SUCCESS") == marker


def test_streaming_trained_gate_refit_changes_admissions(spark, tmp_path):
    """r10 (r9 verdict item #7): the composed train-then-curate loop —
    the gate scores every batch with the CURRENT stored model and
    refits + hot-swaps at corpus-version boundaries. A probe doc that
    the bootstrap model admits must be REJECTED once the refit has
    absorbed three batches of contrary evidence, and the swapped
    store must equal a from-scratch retrain over all labeled
    arrivals."""
    import time

    from cherry_spark.streaming.continuous import run_streaming_trained_gate

    schema = "doc_id long, text string"
    # batch 0: 'alpha' co-occurs with the label token 'pos' -> the
    # bootstrap model weighs alpha's bucket at ~SCALE
    b0 = [(i, "alpha pos") for i in range(8)] + [
        (100 + i, "beta") for i in range(8)
    ]
    # batches 1-3: heavy contrary evidence — alpha WITHOUT pos
    contra = lambda base: [  # noqa: E731
        (base + i, "alpha") for i in range(16)
    ]
    probe_early = [(900, "alpha alpha alpha alpha")]  # scored by v0
    probe_late = [(901, "alpha alpha alpha alpha")]  # scored by v4
    arrivals = [
        b0,
        contra(200),
        contra(300),
        contra(400) + probe_early,
        probe_late,  # batch 4 = boundary: refit THEN score
    ]
    src = str(tmp_path / "in")
    for a in arrivals:
        spark.createDataFrame(a, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)

    seen: dict[int, tuple] = {}

    def sink(verdicts, batch_id):
        for r in verdicts.collect():
            seen[r["doc_id"]] = (r["keep"], r["model_version"])

    state = str(tmp_path / "state")
    q = run_streaming_trained_gate(
        spark,
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        state,
        sink,
        str(tmp_path / "ckpt"),
        label_expr=F.col("text").contains("pos"),
        refit_every=4,
        n_buckets=4096,
        n_iters=2,
        lr_inv=2,
    )
    q.awaitTermination(300)

    # same text, opposite admission across the model swap — and each
    # verdict names the model version that made it
    assert seen[900] == (1, 0), seen[900]
    assert seen[901] == (0, 4), seen[901]

    # the hot-swapped store == from-scratch retrain over ALL labeled
    # arrivals (probe docs included — they contain no 'pos' so they
    # are labeled 0 like the contra docs)
    all_rows = [(d, t, 1 if "pos" in t else 0) for a in arrivals for d, t in a]
    expect = {
        r["bucket"]: r["w"]
        for r in train_hashed_classifier(
            spark.createDataFrame(all_rows, "doc_id long, text string, y int"),
            "y",
            n_buckets=4096,
            n_iters=2,
            lr_inv=2,
        ).collect()
    }
    got = {
        r["bucket"]: r["w"]
        for r in spark.read.parquet(dd(f"{state}/weights")).collect()
    }
    assert got == expect


def test_streaming_trained_gate_torn_swap_serves_previous_full_model(
    spark, tmp_path
):
    """r10: a crash mid-hot-swap (old model parked, canonical dir
    missing) or mid-staging (half-written __tmp sibling) must never
    serve a half model — the next fold recovers the PREVIOUS full
    version and scores with it."""
    import os
    import shutil

    from cherry_spark.streaming.continuous import trained_gate_fold

    schema = "doc_id long, text string"
    b0 = spark.createDataFrame(
        [(i, "alpha pos") for i in range(8)]
        + [(100 + i, "beta") for i in range(8)],
        schema,
    )
    state = str(tmp_path / "state")
    weights_dir = f"{state}/weights"
    label = F.col("text").contains("pos")
    trained_gate_fold(spark, b0, state, label, 0, n_buckets=4096, n_iters=2)
    canon = lambda p: sorted(  # noqa: E731
        tuple(r) for r in spark.read.parquet(dd(p)).collect()
    )
    v0 = canon(weights_dir)

    # torn swap: canonical gone, old parked
    os.rename(weights_dir, f"{weights_dir}__old_deadbeef")
    probe = spark.createDataFrame([(900, "alpha alpha alpha")], schema)
    out = trained_gate_fold(
        spark, probe, state, label, 1, n_buckets=4096, n_iters=2
    ).collect()
    assert canon(weights_dir) == v0  # previous FULL model restored
    assert [(r["keep"], r["model_version"]) for r in out] == [(1, 0)]

    # half-staged new model left by a crash before the commit —
    # legacy __tmp sibling AND an r13 orphan version dir (staged,
    # never pointer-committed): both dropped, previous version serves
    src_part = next(
        f"{dd(weights_dir)}/{f}"
        for f in os.listdir(dd(weights_dir))
        if f.endswith(".parquet")
    )
    os.makedirs(f"{weights_dir}__tmp_deadbeef")
    shutil.copy(src_part, f"{weights_dir}__tmp_deadbeef/part-00000.parquet")
    os.makedirs(f"{weights_dir}/v-deadbeefcafe")
    shutil.copy(src_part, f"{weights_dir}/v-deadbeefcafe/part-00000.parquet")
    out2 = trained_gate_fold(
        spark,
        spark.createDataFrame([(901, "alpha alpha alpha")], schema),
        state,
        label,
        2,
        n_buckets=4096,
        n_iters=2,
    ).collect()
    assert not os.path.exists(f"{weights_dir}__tmp_deadbeef")
    assert not os.path.exists(f"{weights_dir}/v-deadbeefcafe")
    assert canon(weights_dir) == v0
    assert [(r["keep"], r["model_version"]) for r in out2] == [(1, 0)]


def _fold_batches(spark, state, label, batches, **kw):
    from cherry_spark.streaming.continuous import trained_gate_fold

    schema = "doc_id long, text string"
    for bid, rows in enumerate(batches):
        trained_gate_fold(
            spark,
            spark.createDataFrame(rows, schema),
            state,
            label,
            bid,
            **kw,
        )


def _canon(spark, path):
    return sorted(tuple(r) for r in spark.read.parquet(dd(path)).collect())


def test_trained_gate_sample_store_equals_global_topn(spark, tmp_path):
    """r11 (r10 verdict item #3): the bounded training sample is
    maintained INCREMENTALLY (O(sample + batch) per fold) but must
    equal the from-scratch global computation — the retain_docs
    smallest rows by (md5(id), id) over ALL labeled history."""
    state = str(tmp_path / "state")
    label = F.col("text").contains("pos")
    batches = [
        [(b * 100 + i, f"tok{b} {'pos' if i % 2 else 'neg'}") for i in range(12)]
        for b in range(4)
    ]
    _fold_batches(
        spark, state, label, batches,
        n_buckets=4096, n_iters=2, refit_every=2, retain_docs=10,
    )
    hist = spark.read.parquet(f"{state}/labeled")
    assert hist.count() == 48  # eviction definitely happened
    expect = _canon_rows(
        hist.orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id").limit(10)
    )
    got = _canon_rows(spark.read.parquet(dd(f"{state}/train_sample")))
    assert got == expect
    assert len(got) == 10


def _canon_rows(df):
    return sorted(tuple(r) for r in df.select("doc_id", "text", "__lbl").collect())


def test_trained_gate_bounded_refit_trains_on_sample_only(spark, tmp_path):
    """Once history exceeds retain_docs, the refit corpus IS the
    bounded sample: the swapped weights equal a from-scratch
    train_hashed_classifier over exactly the sample rows."""
    state = str(tmp_path / "state")
    label = F.col("text").contains("pos")
    batches = [
        [(b * 100 + i, f"w{b}x{i} {'pos' if i % 3 else 'neg'}") for i in range(8)]
        for b in range(5)
    ]
    # refit_every=1: the LAST fold's refit reads the final sample
    _fold_batches(
        spark, state, label, batches,
        n_buckets=4096, n_iters=2, refit_every=1, retain_docs=12,
    )
    sample = spark.read.parquet(dd(f"{state}/train_sample"))
    assert sample.count() == 12
    expect = {
        r["bucket"]: r["w"]
        for r in train_hashed_classifier(
            sample, "__lbl", n_buckets=4096, n_iters=2, lr_inv=1
        ).collect()
    }
    got = {
        r["bucket"]: r["w"]
        for r in spark.read.parquet(dd(f"{state}/weights"))
        .select("bucket", "w")
        .collect()
    }
    assert got == expect


def test_trained_gate_sample_replay_idempotent(spark, tmp_path):
    """A crash-replayed fold must leave the sample store IDENTICAL to
    a clean single delivery: the merge key marks an absorbed batch and
    the anti-join + re-merge maps back to the same top-N."""
    from cherry_spark.streaming.continuous import trained_gate_fold

    schema = "doc_id long, text string"
    state = str(tmp_path / "state")
    label = F.col("text").contains("pos")
    b0 = [(i, f"a{i} pos") for i in range(9)]
    b1 = [(100 + i, f"b{i} neg") for i in range(9)]
    trained_gate_fold(
        spark, spark.createDataFrame(b0, schema), state, label, 0,
        n_buckets=4096, retain_docs=6,
    )
    trained_gate_fold(
        spark, spark.createDataFrame(b1, schema), state, label, 1,
        n_buckets=4096, retain_docs=6,
    )
    clean = _canon_rows(spark.read.parquet(dd(f"{state}/train_sample")))
    # replay batch 1 (same data, same key): store must not change
    trained_gate_fold(
        spark, spark.createDataFrame(b1, schema), state, label, 1,
        n_buckets=4096, retain_docs=6,
    )
    assert _canon_rows(spark.read.parquet(dd(f"{state}/train_sample"))) == clean
    # and the labeled history did not duplicate the batch
    assert spark.read.parquet(f"{state}/labeled").count() == 18


def test_trained_gate_sample_skips_noop_merges(spark, tmp_path):
    """r11 fast path: once the sample is FULL, a batch whose every row
    ranks strictly above the stored (md5, id) boundary cannot change
    the top-N — the fold must skip the O(sample) rewrite (merge key
    stays at the last contributing batch) while a qualifying batch
    still merges."""
    import hashlib

    from cherry_spark.streaming.continuous import (
        _merge_key_of,
        trained_gate_fold,
    )

    schema = "doc_id long, text string"
    state = str(tmp_path / "state")
    label = F.col("text").contains("pos")
    sample_dir = f"{state}/train_sample"

    b0_ids = list(range(100))
    trained_gate_fold(
        spark,
        spark.createDataFrame([(i, f"t{i} pos") for i in b0_ids], schema),
        state,
        label,
        0,
        n_buckets=4096,
        retain_docs=8,
    )
    assert _merge_key_of(sample_dir) == "b0"
    kept = _canon(spark, sample_dir)
    boundary = max(
        hashlib.md5(str(r[0]).encode()).hexdigest() for r in kept
    )

    # a batch ranking entirely ABOVE the boundary: skipped
    hi_ids = [
        i for i in range(1000, 4000)
        if hashlib.md5(str(i).encode()).hexdigest() > boundary
    ][:20]
    assert len(hi_ids) == 20
    trained_gate_fold(
        spark,
        spark.createDataFrame([(i, f"t{i} pos") for i in hi_ids], schema),
        state,
        label,
        1,
        n_buckets=4096,
        retain_docs=8,
    )
    assert _merge_key_of(sample_dir) == "b0"  # untouched
    assert _canon(spark, sample_dir) == kept

    # a batch with one row UNDER the boundary: merges and evicts
    lo_id = next(
        i for i in range(10_000, 20_000)
        if hashlib.md5(str(i).encode()).hexdigest() < boundary
    )
    trained_gate_fold(
        spark,
        spark.createDataFrame([(lo_id, f"t{lo_id} pos")], schema),
        state,
        label,
        2,
        n_buckets=4096,
        retain_docs=8,
    )
    assert _merge_key_of(sample_dir) == "b2"
    rows = _canon(spark, sample_dir)
    assert len(rows) == 8 and any(r[0] == lo_id for r in rows)
    # the global-top-N invariant holds across skips and merges
    hist = spark.read.parquet(f"{state}/labeled")
    expect = _canon_rows(
        hist.orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id").limit(8)
    )
    assert _canon_rows(spark.read.parquet(dd(sample_dir))) == expect


def test_trained_gate_sample_dedupes_repeated_ids(spark, tmp_path):
    """r11 advice (low): the same id arriving in two batches must
    occupy ONE sample slot, first arrival winning — a repeated id
    must not double-weight its row in the refit, and a relabeled
    re-arrival must not displace the original.  The sample equals the
    global top-N over FIRST arrivals."""
    import hashlib

    state = str(tmp_path / "state")
    label = F.col("text").contains("pos")
    # batch 1 re-sends half of batch 0's ids RELABELED; batch 2 is
    # fresh, plus one within-batch duplicate id
    b0 = [(i, f"a{i} pos") for i in range(10)]
    b1 = [(i, f"a{i} neg RELABELED") for i in range(5)] + [
        (100 + i, f"b{i} neg") for i in range(5)
    ]
    b2 = [(200, "c0 pos"), (200, "c0dup neg"), (201, "c1 neg")]
    _fold_batches(
        spark, state, label, [b0, b1, b2],
        n_buckets=4096, n_iters=2, refit_every=2, retain_docs=8,
    )
    sample = spark.read.parquet(dd(f"{state}/train_sample"))
    got = _canon_rows(sample)
    assert len(got) == 8
    # distinct ids — no double slot
    ids = [r[0] for r in got]
    assert len(set(ids)) == len(ids)
    # equals the global top-8 over first arrivals: earliest BATCH
    # wins; within one batch (rows are unordered) the deterministic
    # (label, md5(text)) winner
    first = {}
    for rows in (b0, b1, b2):
        batch_first = {}
        for i, t in rows:
            cand = (i, t, int("pos" in t))
            cur = batch_first.get(i)
            if cur is None or (cand[2], hashlib.md5(cand[1].encode()).hexdigest()) < (
                cur[2], hashlib.md5(cur[1].encode()).hexdigest()
            ):
                batch_first[i] = cand
        for i, cand in batch_first.items():
            first.setdefault(i, cand)
    expect = sorted(
        first.values(),
        key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(), r[0]),
    )[:8]
    assert got == sorted(expect)
    # none of the surviving rows carry the relabeled content
    assert not any("RELABELED" in r[1] for r in got)

    # replay the last batch: idempotent with duplicates in play
    from cherry_spark.streaming.continuous import trained_gate_fold

    trained_gate_fold(
        spark,
        spark.createDataFrame(b2, "doc_id long, text string"),
        state,
        label,
        2,
        n_buckets=4096,
        n_iters=2,
        refit_every=2,
        retain_docs=8,
    )
    assert _canon_rows(spark.read.parquet(dd(f"{state}/train_sample"))) == got


def test_trained_gate_sample_follows_diverged_replay(spark, tmp_path):
    """r12 advice (low): a diverged crash replay (possible when the
    gate consumes a bus whose producer corrected the version via
    replace_if_last) must update the sample to follow the replay —
    like the keyed labeled store — WITHOUT displacing an earlier
    batch's first arrival.  Sample rows carry their admitting batch
    key (__src): on an own-key replay only the crashed attempt's own
    copies lose the per-id dedupe to the replay's rows."""
    from cherry_spark.streaming.continuous import trained_gate_fold

    schema = "doc_id long, text string"
    state = str(tmp_path / "state")
    label = F.col("text").contains("pos")
    sample_dir = f"{state}/train_sample"

    b0 = [(i, f"a{i} pos") for i in range(6)]
    # batch 1: fresh ids 100.. plus a REPEAT of id 2 (first arrival in
    # batch 0 must keep winning, even through the replay below)
    b1 = [(100 + i, f"b{i} neg") for i in range(4)] + [(2, "dup neg")]
    trained_gate_fold(
        spark, spark.createDataFrame(b0, schema), state, label, 0,
        n_buckets=4096, retain_docs=20,
    )
    trained_gate_fold(
        spark, spark.createDataFrame(b1, schema), state, label, 1,
        n_buckets=4096, retain_docs=20,
    )

    # diverged replay of batch 1: same ids, different text/labels
    b1_replay = [(100 + i, f"CORRECTED{i} pos") for i in range(4)] + [
        (2, "dup2 neg")
    ]
    trained_gate_fold(
        spark, spark.createDataFrame(b1_replay, schema), state, label, 1,
        n_buckets=4096, retain_docs=20,
    )

    sample = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(dd(f"{state}/train_sample")).collect()
    }
    # the replay's rows replaced the crashed attempt's copies
    for i in range(4):
        assert sample[100 + i] == f"CORRECTED{i} pos"
    # the batch-0 first arrival of id 2 still wins
    assert sample[2] == "a2 pos"
    # idempotence: replaying the SAME corrected batch again changes
    # nothing
    before = sorted(sample.items())
    trained_gate_fold(
        spark, spark.createDataFrame(b1_replay, schema), state, label, 1,
        n_buckets=4096, retain_docs=20,
    )
    after = sorted(
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(dd(f"{state}/train_sample")).collect()
    )
    assert after == before
