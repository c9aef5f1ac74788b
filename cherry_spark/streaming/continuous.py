"""Continuous ingestion: the reference's unbounded loop
(reference pipeline.py:110-126) in two Spark forms:

- :func:`run_continuous` — batch-driven loop over a replay/provider
  iterator with cursor-resume (exactly the reference's model: process a
  micro-batch, write anchor-last, repeat; resume = MAX(cursor) read
  back from the sink, reference examples/erc20_custom.py:41-50,90);
- :func:`run_structured_stream` — native Structured Streaming: a
  readStream source into foreachBatch, where each micro-batch runs the
  same step chain and writer; checkpointLocation supersedes the manual
  cursor when the source supports it.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cherry_spark.plans.config import Batch, Pipeline
from cherry_spark.plans.pipeline import process_steps


def read_resume_cursor(
    spark: SparkSession, anchor_path: str, cursor_col: str
) -> int | None:
    """MAX(cursor) from the anchor table's parquet output; None when the
    sink is empty/absent (fresh start)."""
    try:
        df = spark.read.parquet(anchor_path)
    except Exception:
        return None
    row = df.agg(F.max(cursor_col).alias("c")).first()
    return None if row is None or row["c"] is None else int(row["c"])


def run_continuous(
    spark: SparkSession,
    pipeline: Pipeline,
    batches: Iterator[Batch],
    on_batch=None,
) -> int:
    """Drain the batch iterator through steps + writer; returns the
    number of batches processed. ``on_batch(i, processed)`` is the
    progress hook (the reference logs min/max block per iteration,
    examples/erc20_custom.py:58-65)."""
    n = 0
    for raw in batches:
        if raw is None:
            break
        processed = process_steps(raw, pipeline.steps)
        if pipeline.writer is not None:
            pipeline.writer.push_data(processed)
        if on_batch is not None:
            on_batch(n, processed)
        n += 1
    return n


def run_structured_stream(
    spark: SparkSession,
    stream_df: DataFrame,
    pipeline: Pipeline,
    table_name: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Structured Streaming driver: each micro-batch becomes a
    single-table Batch run through the step chain, written anchor-last
    inside foreachBatch (so ordering semantics match the batch path).

    Returns the StreamingQuery; with availableNow the caller can
    ``awaitTermination()`` for a bounded drain (the reference's
    ``to_block`` case).
    """

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        processed = process_steps({table_name: batch_df}, pipeline.steps)
        if pipeline.writer is not None:
            pipeline.writer.push_data(processed)

    writer = stream_df.writeStream.foreachBatch(handle_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_streaming_delta_dedup(
    spark: SparkSession,
    stream_df: DataFrame,
    corpus: DataFrame,
    sink,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    **delta_kwargs,
):
    """Streaming ingestion gate: classify every arriving document
    micro-batch against a STATIC corpus via ``ext.dedup.delta_dedup``
    (exact md5 / minhash-band near-dup / unique) and hand the verdict
    table to ``sink(verdicts_df, batch_id)``.

    Why foreachBatch rather than a single streaming plan: the near-dup
    stage needs per-batch aggregations (signature min-aggregates,
    candidate distinct) that Structured Streaming would force into
    watermarked stateful mode; inside foreachBatch each micro-batch is
    a plain batch DataFrame, so the full batch operator — caps,
    verification joins and all — runs unchanged, while exactly-once
    bookkeeping stays with the checkpointed stream. The corpus side is
    static; on a real cluster persist() it (or precompute+store its
    signatures) so it isn't re-scanned per batch.
    """
    from cherry_spark.ext.dedup import delta_dedup

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        sink(delta_dedup(corpus, batch_df, **delta_kwargs), batch_id)

    writer = stream_df.writeStream.foreachBatch(handle_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_streaming_growing_dedup(
    spark: SparkSession,
    stream_df: DataFrame,
    corpus_dir: str,
    sink,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    admit: str = "unique",
    initial_corpus: DataFrame | None = None,
    trigger_available_now: bool = True,
    **delta_kwargs,
):
    """UNBOUNDED streaming ingestion dedup gate: the corpus GROWS as
    batches are admitted, so a document arriving in batch N+1 that
    duplicates a batch-N admission is caught (the static-corpus gate
    above cannot see it — round-4 verdict item #8).

    Per micro-batch (foreachBatch runs batches strictly serially):

    1. classify the batch against the accumulated corpus store with
       the full ``delta_dedup`` operator (exact md5 / near-dup /
       unique — same caps, same verification);
    2. hand the verdict table to ``sink(verdicts_df, batch_id)``;
    3. fold the admitted documents (``admit="unique"``: only novel
       docs become corpus; ``admit="all"``: every doc) into the
       corpus store for the NEXT batch.

    Why the state lives in a parquet store, not
    ``applyInPandasWithState``: the accumulated signature set grows
    without bound — executor-memory state is exactly what dies first
    at 100 TB, while a store-backed corpus scales with the sink, keeps
    exactly-once bookkeeping with the checkpointed stream, and
    survives restarts for free. Crash-replay (r10): admissions commit
    under per-batch run-epoch keys and the fold start drops the
    batch's own keyed rows, so a replay judges against exactly the
    pre-batch corpus and REPLACES its crashed attempt — the stores
    are exactly-once; the sink keeps foreachBatch's standard
    at-least-once delivery.

    In minhash mode the gate ALSO maintains a SIGNATURE store
    (``<corpus_dir>_sigs``): each batch classifies against the stored
    corpus signatures (``delta_dedup(corpus_signatures=...)``) and
    appends only the admitted docs' signatures — the accumulated
    corpus is shingled+hashed exactly ONCE per document at admission,
    never re-shingled per batch (the incremental cost that compounds
    as the corpus grows; the banding expression is deterministic, so
    the stored signatures are bit-identical to a recompute).
    """
    import os

    from cherry_spark.ext.dedup import delta_dedup, minhash_signatures

    use_sig_store = delta_kwargs.get("candidate_gen", "minhash") == "minhash"
    n_hashes = delta_kwargs.get("n_hashes", 128)
    shingle_k = delta_kwargs.get("shingle_k", 3)
    hash_family = delta_kwargs.get("hash_family", "xxhash")
    sig_dir = f"{corpus_dir.rstrip('/')}_sigs"
    sig_schema = "id long, " + ", ".join(f"h{i} long" for i in range(n_hashes))

    def signatures_of(df: DataFrame) -> DataFrame:
        return minhash_signatures(
            df, id_col, text_col, n_hashes, shingle_k, hash_family
        )

    if initial_corpus is not None:
        _overwrite_store(
            initial_corpus.select(F.col(id_col), F.col(text_col)), corpus_dir
        )
        if use_sig_store:
            _overwrite_store(signatures_of(initial_corpus), sig_dir)

    schema = f"{id_col} long, {text_col} string"

    def read_store(path: str, sch: str) -> DataFrame:
        if _store_has(path):
            return spark.read.schema(sch).parquet(_dd(path))
        return spark.createDataFrame([], sch)

    key_of = _epoch_keyer(checkpoint_dir)

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        key = key_of(batch_id)
        for d in (sig_dir, corpus_dir):
            _recover_store(d)  # drop stray staging dirs
            _drop_batch_files(d, key)  # replay judges pre-batch state
        corpus = read_store(corpus_dir, schema)
        sigs = read_store(sig_dir, sig_schema) if use_sig_store else None
        # sign the batch ONCE: the same signature table classifies the
        # batch (delta_dedup's banding side) and, filtered to the
        # admissions, folds into the store — previously the admitted
        # docs were shingled+hashed a second time for the fold
        batch_sigs = (
            signatures_of(batch_df).localCheckpoint(eager=True)
            if use_sig_store
            else None
        )
        verdicts = delta_dedup(
            corpus,
            batch_df,
            id_col=id_col,
            text_col=text_col,
            corpus_signatures=sigs,
            batch_signatures=batch_sigs,
            **delta_kwargs,
        )
        # one deterministic materialization: the verdicts drive BOTH
        # the sink and the admission append below
        verdicts = verdicts.localCheckpoint(eager=True)
        sink(verdicts, batch_id)
        admitted_ids = (
            verdicts
            if admit == "all"
            else verdicts.filter(F.col("verdict") == "unique")
        ).select(F.col("id").alias(id_col))
        admitted = batch_df.join(admitted_ids, id_col, "left_semi").select(
            F.col(id_col), F.col(text_col)
        )
        # keyed, transactional folds (r10): signatures commit BEFORE
        # the corpus text (a crash between them leaves sig-only
        # orphans, harmless — the reverse order would leave corpus
        # docs invisible to banding until the replay); a replayed
        # fold replaces its crashed attempt's rows
        staged = []
        if use_sig_store:
            # each admitted doc's signature row is REUSED from the
            # classification pass
            staged.append(
                _stage_append(
                    batch_sigs.join(
                        admitted_ids.select(F.col(id_col).alias("id")),
                        "id",
                        "left_semi",
                    ),
                    sig_dir,
                    key,
                )
            )
        staged.append(_stage_append(admitted, corpus_dir, key))
        _commit_stores(staged)

    writer = stream_df.writeStream.foreachBatch(handle_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_streaming_growing_semdedup(
    spark: SparkSession,
    stream_df: DataFrame,
    corpus_dir: str,
    sink,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.8,
    n_centroids: int = 16,
    nprobe: int = 2,
    admit: str = "unique",
    initial_corpus: DataFrame | None = None,
    reseed_factor: float = 4.0,
    trigger_available_now: bool = True,
):
    """The EMBEDDING-side twin of :func:`run_streaming_growing_dedup`:
    an unbounded ingestion gate that catches PARAPHRASE duplicates —
    a vector arriving in batch N+1 that is semantically near an
    admission from batch N is flagged ``semantic_dup`` (lexical gates
    cannot see it; round-6 verdict item #7).

    Per micro-batch (foreachBatch runs batches strictly serially):

    1. classify the batch against the persisted IVF-assigned corpus
       store with :func:`ext.semdedup.semantic_delta_dedup` (probe
       the stored centroids, one broadcast equi-join on centroid_id);
    2. hand the verdict table to ``sink(verdicts_df, batch_id)``;
    3. assign the admitted vectors to their nearest stored centroid
       ONCE and append (id, vector, centroid_id) to the corpus store
       — each admitted vector is embedded-space-indexed exactly once
       at admission, never re-assigned per batch.

    State layout: ``<corpus_dir>`` holds (id, vector, centroid_id)
    parquet; ``<corpus_dir>_centroids`` holds (centroid_id, centroid,
    built_n) where built_n is the corpus size when the centroids were
    (re)seeded. Centroids come from ``initial_corpus`` when given,
    else from the FIRST batch (bootstrap).

    Centroid staleness rule: when the corpus grows past
    ``reseed_factor × built_n``, the gate re-seeds — rebuilds the
    deterministic IVF centroids from the FULL corpus and re-assigns
    every stored vector (both stores are materialized via
    localCheckpoint before the in-place overwrite). Admission-time
    assignments are only as good as the centroids; without re-seeding,
    a drifting stream degrades candidate recall exactly like a stale
    LSH banding profile. Crash-replay (r10): same exactly-once store
    discipline as the text gate — keyed admissions, drop/anti-join of
    the batch's own rows on the judging side, and a merge marker on
    the reseed rewrite so a replay rebuilds the corpus from its own
    verdicts; the sink stays at-least-once.
    """
    import os

    from cherry_spark.ext.ivf import ivf_assign, ivf_centroids
    from cherry_spark.ext.semdedup import semantic_delta_dedup

    cent_dir = f"{corpus_dir.rstrip('/')}_centroids"

    store_exists = _store_has

    def centroid_rows(cents: DataFrame, built_n: int, reseed_key: str = ""):
        return cents.select(
            "centroid_id",
            "centroid",
            F.lit(int(built_n)).alias("built_n"),
            F.lit(reseed_key).alias("reseed_key"),
        )

    def write_centroids(cents: DataFrame, built_n: int) -> None:
        _overwrite_store(centroid_rows(cents, built_n), cent_dir)

    def assigned_of(vectors: DataFrame, cents: DataFrame) -> DataFrame:
        return ivf_assign(vectors, cents, id_col=id_col, vec_col=vec_col).join(
            vectors.select(id_col, vec_col), on=id_col
        ).select(id_col, vec_col, "centroid_id")

    if initial_corpus is not None:
        init = initial_corpus.select(F.col(id_col), F.col(vec_col))
        cents0 = ivf_centroids(init, n_centroids, id_col, vec_col).localCheckpoint(
            eager=True
        )
        # centroids BEFORE corpus (the sig-store write-order rule):
        # centroid-only state is harmless; corpus rows without
        # centroids would strand the gate in bootstrap
        write_centroids(cents0, init.count())
        _overwrite_store(assigned_of(init, cents0), corpus_dir)

    key_of = _epoch_keyer(checkpoint_dir)

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        key = key_of(batch_id)
        batch_df = batch_df.localCheckpoint(eager=True)
        _recover_store(cent_dir)
        _recover_store(corpus_dir)
        _drop_batch_files(corpus_dir, key)  # replay sees pre-batch state
        if store_exists(cent_dir):
            cent_rows = spark.read.parquet(_dd(cent_dir))
            cents = cent_rows.select("centroid_id", "centroid")
            built_n = cent_rows.agg(F.max("built_n")).collect()[0][0]
            # torn-reseed self-repair — see run_streaming_curation_gate
            if "reseed_key" in cent_rows.columns:
                rk = cent_rows.agg(F.max("reseed_key")).first()[0]
                if rk == key and _merge_key_of(corpus_dir) != key and (
                    store_exists(corpus_dir)
                ):
                    allv = (
                        spark.read.parquet(_dd(corpus_dir))
                        .select(id_col, vec_col)
                        .localCheckpoint(eager=True)
                    )
                    _overwrite_store(
                        assigned_of(allv, cents).localCheckpoint(eager=True),
                        corpus_dir,
                        merge_key=key,
                    )
        else:
            # bootstrap: seed the quantizer from the first batch
            cents = ivf_centroids(
                batch_df.select(F.col(id_col), F.col(vec_col)),
                n_centroids,
                id_col,
                vec_col,
            ).localCheckpoint(eager=True)
            built_n = batch_df.count()
            write_centroids(cents, built_n)
        corpus = (
            # minus the batch's own ids: after a crashed attempt's
            # RESEED baked the batch into the rewritten store, the
            # keyed-file drop above cannot restore the pre-batch view
            # — the anti-join can (no-op on a first delivery)
            spark.read.parquet(_dd(corpus_dir)).join(
                batch_df.select(F.col(id_col)).distinct(),
                id_col,
                "left_anti",
            )
            if store_exists(corpus_dir)
            else batch_df.select(id_col, vec_col)
            .withColumn("centroid_id", F.lit(0))
            .limit(0)
        )
        verdicts = semantic_delta_dedup(
            corpus,
            batch_df,
            cents,
            threshold=threshold,
            nprobe=nprobe,
            id_col=id_col,
            vec_col=vec_col,
        ).localCheckpoint(eager=True)
        sink(verdicts, batch_id)
        admitted_ids = (
            verdicts
            if admit == "all"
            else verdicts.filter(F.col("verdict") == "unique")
        ).select(F.col(id_col))
        admitted = batch_df.join(admitted_ids, on=id_col, how="left_semi").select(
            F.col(id_col), F.col(vec_col)
        )
        adm_assigned = assigned_of(admitted, cents)
        if _merge_key_of(corpus_dir) == key:
            # a crashed attempt's reseed anonymized its keyed rows —
            # rebuild = pre-batch view + THIS delivery's admissions
            _overwrite_store(
                corpus.unionByName(adm_assigned), corpus_dir, merge_key=key
            )
        else:
            _commit_stores(
                [_stage_append(adm_assigned, corpus_dir, key)]
            )
        # staleness rule: re-seed + re-assign when the corpus outgrew
        # the centroids it was indexed under
        total = spark.read.parquet(_dd(corpus_dir)).count()
        if built_n and total > reseed_factor * built_n and total >= n_centroids:
            full = spark.read.parquet(_dd(corpus_dir)).localCheckpoint(eager=True)
            new_cents = ivf_centroids(
                full.select(F.col(id_col), F.col(vec_col)),
                n_centroids,
                id_col,
                vec_col,
            ).localCheckpoint(eager=True)
            reassigned = assigned_of(
                full.select(id_col, vec_col), new_cents
            ).localCheckpoint(eager=True)
            # both swaps staged first, committed as adjacent renames;
            # reseed_key + the corpus merge key let a replay detect
            # and finish a torn pair, and the merge key also marks the
            # anonymizing rewrite (replay rebuilds from its verdicts)
            _commit_stores(
                [
                    _stage_store(
                        centroid_rows(new_cents, total, reseed_key=key),
                        cent_dir,
                    ),
                    _stage_store(reassigned, corpus_dir, merge_key=key),
                ]
            )

    writer = stream_df.writeStream.foreachBatch(handle_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_streaming_budget_gate(
    spark: SparkSession,
    stream_df: DataFrame,
    state_dir: str,
    sink,
    checkpoint_dir: str,
    budget: int,
    id_col: str = "doc_id",
    quality_col: str = "quality",
    token_col: str = "n_tokens",
    trigger_available_now: bool = True,
):
    """Streaming twin of ``ext/budget.py:budget_select`` — a GLOBAL
    token budget spent across an unbounded stream of candidate docs:
    each micro-batch's docs are admitted in (quality desc, id asc)
    order while previously-spent + batch-cumulative tokens stay
    <= budget; once the budget is exhausted every later arrival is
    rejected.

    Per micro-batch (foreachBatch runs batches strictly serially):

    1. read the spent-token total from the one-row state store;
    2. run the batch through ``budget_select`` with the REMAINING
       budget (so the admission order/semantics inside a batch are
       exactly the certified batch operator's);
    3. hand the full verdict table (``admitted`` 1/0 + ``cum_tokens``
       global running total for admitted rows) to
       ``sink(verdicts_df, batch_id)``;
    4. overwrite the state store with the new spent total.

    Contract: streamed admissions == serially folding batch_i through
    ``budget_select(batch_i, budget - spent_{i-1})`` (asserted in
    tests/test_writers_streaming.py). The state is ONE row — parquet-backed
    like the dedup gates (restart-safe, sink-paced) rather than
    executor-memory state. Crash-replay (r10): the state row carries
    (spent, prev) + a merge key, so a replayed batch re-judges under
    the budget its crashed attempt started from instead of
    double-counting the attempt's own tokens; the sink keeps
    foreachBatch's at-least-once delivery.
    """
    import os

    from cherry_spark.ext.budget import budget_select

    state_schema = "spent long, prev long"

    def read_spent(key: str) -> int:
        _recover_store(state_dir)
        if _store_has(state_dir):
            row = spark.read.schema(state_schema).parquet(_dd(state_dir)).first()
            if row is not None:
                committed = int(row["spent"])
                prev = (
                    int(row["prev"]) if row["prev"] is not None else committed
                )
                return prev if _merge_key_of(state_dir) == key else committed
        return 0

    key_of = _epoch_keyer(checkpoint_dir)

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        key = key_of(batch_id)
        spent = read_spent(key)
        remaining = max(budget - spent, 0)
        admitted = budget_select(
            batch_df,
            budget=remaining,
            quality_col=quality_col,
            token_col=token_col,
            id_col=id_col,
        ).select(
            F.col(id_col),
            # cum_tokens becomes the GLOBAL running total
            (F.col("cum_tokens") + F.lit(spent)).cast("long").alias("cum_tokens"),
        )
        verdicts = (
            batch_df.join(admitted, id_col, "left")
            .withColumn(
                "admitted", F.col("cum_tokens").isNotNull().cast("int")
            )
            .localCheckpoint(eager=True)
        )
        sink(verdicts, batch_id)
        new_spent = (
            verdicts.agg(F.max("cum_tokens")).first()[0] or spent
        )
        # crash-safe swap: a torn plain overwrite would reset spent
        # to 0 and the gate would over-admit past the global budget;
        # (spent, prev) + the merge key make the write replay-safe
        _overwrite_store(
            spark.createDataFrame([(int(new_spent), int(spent))], state_schema),
            state_dir,
            merge_key=key,
        )

    writer = stream_df.writeStream.foreachBatch(handle_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_streaming_curation_gate(
    spark: SparkSession,
    stream_df: DataFrame,
    state_dir: str,
    sink,
    checkpoint_dir: str,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_col: str = "embedding",
    quality_col: str = "quality",
    token_col: str = "n_tokens",
    semantic_threshold: float = 0.9,
    n_centroids: int = 16,
    nprobe: int = 2,
    reseed_factor: float = 4.0,
    trigger_available_now: bool = True,
    test_df: DataFrame | None = None,
    decon_shingle_k: int = 5,
    text_bus_dir: str | None = None,
    **delta_kwargs,
):
    """The COMPOSED ingestion gate: every micro-batch runs the full
    admission pipeline a training-data stream needs, cheapest filter
    first, budget last (so duplicate arrivals never spend budget):

    0. DECONTAMINATION (when ``test_df`` is given) — any doc sharing a
       word ``decon_shingle_k``-gram with the held-out set is rejected
       outright: it must never be admitted regardless of uniqueness or
       budget, so it runs first and rejected docs are not even signed.
       Eval postings build once into ``<state_dir>/eval_postings``
       (static eval set; restarts reuse);
    1. LEXICAL — ``delta_dedup`` against the accumulated text corpus
       (stored minhash signatures; exact_dup / near_dup rejected);
    2. SEMANTIC — ``semantic_delta_dedup`` of the lexical survivors
       against the accumulated vector store (IVF-assigned; paraphrase
       clones the lexical gate cannot see are rejected);
    3. BUDGET — ``budget_select`` of the remaining docs against the
       REMAINING global token budget (quality-ordered prefix within
       the batch; once the budget is spent, later arrivals reject).

    ``sink(verdicts_df, batch_id)`` receives one row per batch doc:
    ``verdict`` in (contaminated, exact_dup, near_dup, semantic_dup,
    over_budget, admitted) and ``cum_tokens`` (global running total, admitted rows
    only). Admitted docs fold into all three stores for the NEXT
    batch — signatures before text, centroids before vectors (the
    established crash-ordering rules), each doc shingled/hashed/
    IVF-assigned exactly once at admission. Centroids bootstrap from
    the first batch and re-seed when the vector corpus outgrows
    ``reseed_factor ×`` the seed-time size, like the semantic gate.

    State layout under ``state_dir``: ``text/`` (id, text),
    ``text_sigs/`` (minhash signatures), ``vecs/`` (id, vector,
    centroid_id), ``centroids/``, ``spent/`` (one row).
    Crash-replay (r10): the STORES are exactly-once — admissions
    commit under per-batch keys (a replayed fold replaces its crashed
    attempt), the batch's own rows are dropped/anti-joined out of the
    judging side so replay sees the pre-batch corpus, and the spent
    counter carries (spent, prev) + a merge key so a replay re-judges
    under the budget the attempt started from.  The SINK keeps
    standard foreachBatch at-least-once delivery; after a reseed-
    boundary crash the replay's verdicts may legitimately differ
    (centroids moved) and the stores follow the delivered verdicts.

    ``text_bus_dir`` (r11): mirror each batch's admitted (id, text)
    rows onto a MANIFEST-LOG BUS (writers/manifest_bus.py) alongside
    the raw ``text/`` store.  Downstream index maintainers that
    consume the bus through the ``cherry_bus`` DataSource survive bus
    compaction (offsets are manifest versions, not file names) — the
    raw ``text/`` dir cannot be compacted while a file-source stream
    reads it (the store-as-bus caveat).  The mirror is exactly-once
    under replay: a replayed batch whose key is already the NEWEST
    manifest entry retracts it and re-appends the replay's rows
    (``on_replay="replace_if_last"``), so after a reseed-boundary
    crash the bus follows the replayed verdicts exactly like the
    keyed stores do instead of keeping the crashed attempt's
    admissions."""
    import os

    from cherry_spark.ext.budget import budget_select
    from cherry_spark.ext.dedup import delta_dedup, minhash_signatures, shingle_postings
    from cherry_spark.ext.ivf import ivf_assign, ivf_centroids
    from cherry_spark.ext.semdedup import semantic_delta_dedup

    eval_dir = os.path.join(state_dir, "eval_postings")
    text_dir = os.path.join(state_dir, "text")
    sig_dir = os.path.join(state_dir, "text_sigs")
    vec_dir = os.path.join(state_dir, "vecs")
    cent_dir = os.path.join(state_dir, "centroids")
    spent_dir = os.path.join(state_dir, "spent")

    n_hashes = delta_kwargs.get("n_hashes", 128)
    shingle_k = delta_kwargs.get("shingle_k", 3)
    hash_family = delta_kwargs.get("hash_family", "xxhash")
    text_schema = f"{id_col} long, {text_col} string"
    sig_schema = "id long, " + ", ".join(f"h{i} long" for i in range(n_hashes))

    def store(path: str, sch: str | None = None) -> DataFrame | None:
        if _store_has(path):
            r = spark.read
            return (r.schema(sch) if sch else r).parquet(_dd(path))
        return None

    def signatures_of(df: DataFrame) -> DataFrame:
        return minhash_signatures(
            df, id_col, text_col, n_hashes, shingle_k, hash_family
        )

    if test_df is not None and store(eval_dir) is None:
        _overwrite_store(
            shingle_postings(test_df, id_col, text_col, decon_shingle_k).select(
                F.col("id").alias("test_id"), "shingle"
            ),
            eval_dir,
        )

    key_of = _epoch_keyer(checkpoint_dir)

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        key = key_of(batch_id)
        batch_df = batch_df.localCheckpoint(eager=True)
        # repair any torn swap from a crash mid-_overwrite_store — the
        # swapped stores here are centroids, the assigned vector
        # corpus, and the spent counter
        for _swapped in (cent_dir, vec_dir, spent_dir):
            _recover_store(_swapped)
        # crash-replay discipline (r10): drop this batch's own keyed
        # appends from a crashed attempt so the gates judge against
        # exactly the pre-batch corpus (sigs/text/vecs are committed
        # under per-batch keys below; after a RESEED rewrote the vec
        # store the batch rows are anonymous — the semantic gate's
        # anti-join and the vec store's merge marker cover that case)
        for _appended in (sig_dir, text_dir, vec_dir):
            _drop_batch_files(_appended, key)

        # 0. decontamination gate — rejected docs never reach the
        # signing/dedup/budget stages and never touch a store
        if test_df is not None:
            bp = shingle_postings(batch_df, id_col, text_col, decon_shingle_k)
            contaminated = (
                bp.join(F.broadcast(spark.read.parquet(_dd(eval_dir))), "shingle")
                .select(F.col("id").alias(id_col))
                .distinct()
                .localCheckpoint(eager=True)
            )
            # clean_batch is a multi-consumer fan-out point (signing,
            # both dedup gates, budget, the store folds all read it) —
            # materialize ONCE or every reference re-runs the anti-join
            # (the CLAUDE.md fan-out invariant; measured at the 10x
            # probe: 368 -> ~210 s total without/with this checkpoint)
            clean_batch = batch_df.join(
                contaminated, id_col, "left_anti"
            ).localCheckpoint(eager=True)
        else:
            contaminated = None
            clean_batch = batch_df

        # 1. lexical gate — the batch is signed ONCE; the same table
        # classifies (banding side) and later folds the admitted rows
        # into the signature store
        corpus = store(text_dir, text_schema)
        if corpus is None:
            corpus = spark.createDataFrame([], text_schema)
        sigs = store(sig_dir, sig_schema)
        batch_sigs = signatures_of(clean_batch).localCheckpoint(eager=True)
        lex = delta_dedup(
            corpus,
            clean_batch,
            id_col=id_col,
            text_col=text_col,
            corpus_signatures=sigs,
            batch_signatures=batch_sigs,
            **delta_kwargs,
        ).select(F.col("id").alias(id_col), "verdict")
        lex = lex.localCheckpoint(eager=True)
        lex_ok = clean_batch.join(
            lex.filter(F.col("verdict") == "unique").select(id_col),
            id_col,
            "left_semi",
        )

        # 2. semantic gate (bootstrap centroids from the first batch)
        cent_rows = store(cent_dir)
        if cent_rows is None:
            cents = ivf_centroids(
                batch_df.select(F.col(id_col), F.col(vec_col)),
                n_centroids,
                id_col,
                vec_col,
            ).localCheckpoint(eager=True)
            built_n = batch_df.count()
            _overwrite_store(
                cents.select(
                    "centroid_id",
                    "centroid",
                    F.lit(int(built_n)).alias("built_n"),
                    F.lit("").alias("reseed_key"),
                ),
                cent_dir,
            )
        else:
            cents = cent_rows.select("centroid_id", "centroid")
            built_n = cent_rows.agg(F.max("built_n")).first()[0]
            # torn-reseed self-repair (r10 review): the reseed commits
            # the centroid and vector swaps adjacently, but a crash
            # between the two renames leaves NEW centroids over
            # OLD-assigned vectors — mismatched spaces that would
            # silently degrade candidate recall forever. The centroid
            # table's reseed_key names the batch that reseeded; if the
            # vec store never received its paired swap, finish it here
            # deterministically before anything is judged.
            if "reseed_key" in cent_rows.columns:
                rk = cent_rows.agg(F.max("reseed_key")).first()[0]
                if rk == key and _merge_key_of(vec_dir) != key:
                    allv = store(vec_dir)
                    if allv is not None:
                        allv = allv.select(
                            "vec_id", F.col(vec_col)
                        ).localCheckpoint(eager=True)
                        repaired = (
                            ivf_assign(
                                allv, cents, id_col="vec_id", vec_col=vec_col
                            )
                            .join(allv, "vec_id")
                            .select("vec_id", vec_col, "centroid_id")
                            .localCheckpoint(eager=True)
                        )
                        _overwrite_store(repaired, vec_dir, merge_key=key)
        vecs = store(vec_dir)
        if vecs is None:
            vecs = (
                clean_batch.select(F.col(id_col).alias("vec_id"), F.col(vec_col))
                .withColumn("centroid_id", F.lit(0))
                .limit(0)
            )
        else:
            # judge against the store MINUS this batch's own ids (the
            # span-gate discipline): after a crashed attempt whose
            # RESEED baked the batch into the rewritten store, the
            # keyed-file drop above cannot restore the pre-batch view
            # — this anti-join can (no-op on a first delivery under
            # the unseen-ids contract)
            vecs = vecs.join(
                batch_df.select(F.col(id_col).alias("vec_id")).distinct(),
                "vec_id",
                "left_anti",
            )
        sem = semantic_delta_dedup(
            vecs,
            lex_ok.select(F.col(id_col).alias("vec_id"), F.col(vec_col)),
            cents,
            threshold=semantic_threshold,
            nprobe=nprobe,
        ).select(F.col("vec_id").alias(id_col), F.col("verdict").alias("sem_verdict"))
        sem = sem.localCheckpoint(eager=True)
        sem_ok = lex_ok.join(
            sem.filter(F.col("sem_verdict") == "unique").select(id_col),
            id_col,
            "left_semi",
        )

        # 3. budget gate against the remaining global budget. The
        # spent store carries (spent, prev) + a _merge_key: a replayed
        # batch that finds its own key starts from PREV — the crashed
        # attempt's own tokens must not shrink the budget it re-judges
        # under (double-counting permanently stole budget, r10)
        spent_row = store(spent_dir, "spent long, prev long")
        if spent_row is not None:
            r0 = spent_row.first()
            committed = int(r0["spent"])
            prev = int(r0["prev"]) if r0["prev"] is not None else committed
        else:
            committed, prev = 0, 0
        spent = prev if _merge_key_of(spent_dir) == key else committed
        admitted = budget_select(
            sem_ok,
            budget=max(budget - spent, 0),
            quality_col=quality_col,
            token_col=token_col,
            id_col=id_col,
        ).select(
            F.col(id_col),
            (F.col("cum_tokens") + F.lit(spent)).cast("long").alias("cum_tokens"),
        )

        # verdict precedence: contamination > lexical > semantic > budget
        base = batch_df.select(id_col, quality_col, token_col)
        if contaminated is not None:
            base = base.join(
                contaminated.withColumn("_contam", F.lit(1)), id_col, "left"
            )
        else:
            base = base.withColumn("_contam", F.lit(None).cast("int"))
        verdicts = (
            base.join(lex, id_col, "left")
            .join(sem, id_col, "left")
            .join(admitted, id_col, "left")
            .select(
                id_col,
                quality_col,
                token_col,
                F.when(F.col("_contam").isNotNull(), F.lit("contaminated"))
                .when(F.col("verdict") != "unique", F.col("verdict"))
                .when(F.col("sem_verdict") == "semantic_dup", F.lit("semantic_dup"))
                .when(F.col("cum_tokens").isNotNull(), F.lit("admitted"))
                .otherwise(F.lit("over_budget"))
                .alias("verdict"),
                "cum_tokens",
            )
            .localCheckpoint(eager=True)
        )
        sink(verdicts, batch_id)

        # fold admissions into the stores for the NEXT batch
        adm_ids = verdicts.filter(F.col("verdict") == "admitted").select(id_col)
        adm = batch_df.join(adm_ids, id_col, "left_semi").localCheckpoint(eager=True)
        adm_vecs = adm.select(F.col(id_col).alias("vec_id"), F.col(vec_col))
        adm_assigned = (
            ivf_assign(adm_vecs, cents, id_col="vec_id", vec_col=vec_col)
            .join(adm_vecs, "vec_id")
            .select("vec_id", vec_col, "centroid_id")
        )
        # keyed, transactional store folds (r10): a replayed fold
        # REPLACES its crashed attempt's rows instead of duplicating
        # them — signatures before text, centroids before vectors (the
        # established crash-ordering) preserved by the commit order
        staged = [
            _stage_append(
                batch_sigs.join(
                    adm_ids.select(F.col(id_col).alias("id")),
                    "id",
                    "left_semi",
                ),
                sig_dir,
                key,
            ),
            _stage_append(adm.select(F.col(id_col), F.col(text_col)), text_dir, key),
        ]
        if _merge_key_of(vec_dir) == key:
            # a crashed attempt's RESEED baked its admissions into the
            # rewritten store anonymously; the stores must follow THIS
            # delivery's verdicts (they can differ once centroids
            # moved), so rebuild = pre-batch view + these admissions
            staged.append(
                _stage_store(
                    vecs.unionByName(adm_assigned),
                    vec_dir,
                    merge_key=key,
                )
            )
        else:
            staged.append(_stage_append(adm_assigned, vec_dir, key))
        _commit_stores(staged)
        if text_bus_dir is not None:
            from cherry_spark.writers.manifest_bus import bus_append

            # replace_if_last (r11 advice): a crash between this append
            # and the checkpoint commit replays the batch, and at a
            # reseed boundary the replayed verdicts can legitimately
            # differ — the keyed stores follow the replay, so the bus
            # mirror must too, or downstream indexes diverge from the
            # stores.  The crashed entry is necessarily the newest
            # (single writer, uncommitted checkpoint), so the retract
            # window is exact; see bus_append's docstring for the
            # consumer-already-past-it residual (at-least-once sinks).
            bus_append(
                adm.select(F.col(id_col), F.col(text_col)),
                text_bus_dir,
                key,
                on_replay="replace_if_last",
            )
        new_spent = verdicts.agg(F.max("cum_tokens")).first()[0]
        if new_spent is not None:
            # crash-safe: a torn plain overwrite reset spent to 0 and
            # the gate over-admitted past the global budget; (spent,
            # prev) + the merge key make the write replay-idempotent
            _overwrite_store(
                spark.createDataFrame(
                    [(int(new_spent), int(spent))], "spent long, prev long"
                ),
                spent_dir,
                merge_key=key,
            )
        elif _merge_key_of(spent_dir) == key:
            # replay with ZERO admissions after a crashed attempt that
            # DID commit spent: without a rewrite the crashed attempt's
            # inflated (spent, prev) row would stand forever, silently
            # stealing budget — the exact class the (spent, prev) +
            # merge-key scheme retires. The store must follow the
            # delivered verdicts: nothing admitted ⇒ spent stays at the
            # pre-batch basis.
            _overwrite_store(
                spark.createDataFrame(
                    [(int(spent), int(spent))], "spent long, prev long"
                ),
                spent_dir,
                merge_key=key,
            )

        # centroid staleness: re-seed + re-assign when the vector
        # corpus outgrows the seed-time size
        cur = store(vec_dir)
        if cur is not None:
            n_now = cur.count()
            if built_n and n_now > reseed_factor * built_n:
                allv = cur.select("vec_id", vec_col).localCheckpoint(eager=True)
                new_cents = ivf_centroids(
                    allv, n_centroids, "vec_id", vec_col
                ).localCheckpoint(eager=True)
                reassigned = (
                    ivf_assign(allv, new_cents, id_col="vec_id", vec_col=vec_col)
                    .join(allv, "vec_id")
                    .select("vec_id", vec_col, "centroid_id")
                    .localCheckpoint(eager=True)
                )
                # BOTH swaps staged first, committed as adjacent
                # renames (r10 review — a Spark job between them was a
                # wide torn window); reseed_key + the vec merge key
                # let a replay detect and finish a torn pair, and
                # the vec merge key also marks that this batch's keyed
                # rows were anonymized (replay rebuilds from verdicts)
                _commit_stores(
                    [
                        _stage_store(
                            new_cents.select(
                                "centroid_id",
                                "centroid",
                                F.lit(int(n_now)).alias("built_n"),
                                F.lit(key).alias("reseed_key"),
                            ),
                            cent_dir,
                        ),
                        _stage_store(reassigned, vec_dir, merge_key=key),
                    ]
                )

    writer = stream_df.writeStream.foreachBatch(handle_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_streaming_rollup(
    spark: SparkSession,
    stream_df: DataFrame,
    state_dir: str,
    sink,
    checkpoint_dir: str,
    keys: list[str],
    metrics: list[str],
    trigger_available_now: bool = True,
):
    """Incrementally maintained grouped rollup — the corpus-stats
    companion to the admission gates: per ``keys`` group, running
    ``n_rows`` plus ``sum_/min_/max_`` of every ``metrics`` column,
    folded batch by batch into a parquet state store.

    The mergeable-partials shape (the reason this scales): each batch
    pays ONE partial aggregation over the batch plus one merge
    aggregation over (stored partials ∪ batch partials) — the state is
    |distinct keys|-sized, never corpus-sized, and counts/sums merge
    by sum, mins by min, maxes by max (all algebraic, map-side
    combinable). A 100 TB corpus's running per-language/per-domain
    stats therefore cost each batch O(batch + keys), not a rescan.

    ``sink(rollup_df, batch_id)`` receives the refreshed FULL rollup
    after each fold (one row per key seen so far). The merged state is
    materialized (localCheckpoint) before the store overwrite so the
    store never reads its own partially-written output. Same replay
    caveat as the other gates: a crash between sink and state write
    re-folds the batch on replay — pair with an idempotent sink, or
    dedupe on batch_id downstream.
    """
    import os

    def agg_exprs():
        exprs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
        for m in metrics:
            exprs += [
                F.sum(m).cast("long").alias(f"sum_{m}"),
                F.min(m).cast("long").alias(f"min_{m}"),
                F.max(m).cast("long").alias(f"max_{m}"),
            ]
        return exprs

    def merge_exprs():
        exprs = [F.sum("n_rows").cast("long").alias("n_rows")]
        for m in metrics:
            exprs += [
                F.sum(f"sum_{m}").cast("long").alias(f"sum_{m}"),
                F.min(f"min_{m}").cast("long").alias(f"min_{m}"),
                F.max(f"max_{m}").cast("long").alias(f"max_{m}"),
            ]
        return exprs

    key_of = _epoch_keyer(checkpoint_dir)

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        _merged_fold(
            spark,
            state_dir,
            key_of(batch_id),
            lambda: batch_df.groupBy(*keys).agg(*agg_exprs()),
            lambda stored, p: stored.unionByName(p)
            .groupBy(*keys)
            .agg(*merge_exprs()),
            sink,
            batch_id,
        )

    writer = stream_df.writeStream.foreachBatch(handle_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_streaming_cms(
    spark: SparkSession,
    stream_df: DataFrame,
    state_dir: str,
    sink,
    checkpoint_dir: str,
    key_col: str = "token",
    depth: int = 4,
    width: int = 64,
    trigger_available_now: bool = True,
):
    """Incrementally maintained Count-Min sketch — the sub-linear
    sibling of :func:`run_streaming_rollup` for when the key domain
    itself is unbounded (URLs, user ids, shingles): the state is a
    constant ``depth x width`` counter table, NOT |distinct keys|.

    Because the sketch is additive (ext/sketch.py:cms_merge), each
    batch pays one bounded-cardinality build over the batch plus a
    cell-wise sum with the stored cells — the fold is exact, so the
    streamed sketch equals a from-scratch build over everything seen
    (tests/test_sketch.py asserts bit-equality), and any downstream
    heavy-hitter threshold gate keeps its no-false-negative guarantee
    mid-stream.  ``sink(cms_df, batch_id)`` receives the refreshed
    cell table after each fold.  Same replay caveat as the other
    gates: a crash between sink and state write re-folds the batch on
    replay — pair with an idempotent sink.
    """
    import os

    from cherry_spark.ext.sketch import cms_build, cms_merge

    key_of = _epoch_keyer(checkpoint_dir)

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        _merged_fold(
            spark,
            state_dir,
            key_of(batch_id),
            lambda: cms_build(batch_df, key_col, depth, width),
            cms_merge,
            sink,
            batch_id,
        )

    writer = stream_df.writeStream.foreachBatch(handle_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_streaming_mg(
    spark: SparkSession,
    stream_df: DataFrame,
    state_dir: str,
    sink,
    checkpoint_dir: str,
    key_col: str = "token",
    k: int = 64,
    trigger_available_now: bool = True,
):
    """Incrementally maintained Misra-Gries top-k summary — the
    "which keys are hot so far" companion to :func:`run_streaming_cms`
    (which answers point frequency queries).  State is a <= k-row
    (key, weight) table; each batch pays one bounded-memory MG pass
    over the batch plus a KB-sized mergeable-summaries combine with
    the stored summary.  Error bounds ADD across folds, so the stored
    summary always satisfies ``count - N_seen/(k+1) <= w <= count``
    and every key with ``count*(k+1) > N_seen`` is present
    (tests/test_sketch.py certifies the bound after the fold).
    ``sink(summary_df, batch_id)`` receives the refreshed summary.
    Same replay caveat as the other gates: pair with an idempotent
    sink.
    """
    import os

    from cherry_spark.ext.sketch import mg_merge, mg_summary

    key_of = _epoch_keyer(checkpoint_dir)

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        _merged_fold(
            spark,
            state_dir,
            key_of(batch_id),
            lambda: mg_summary(batch_df, key_col, k=k),
            lambda stored, p: mg_merge(stored, p, key_col=key_col, k=k),
            sink,
            batch_id,
        )

    writer = stream_df.writeStream.foreachBatch(handle_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_streaming_spike_monitor(
    spark: SparkSession,
    stream_df: DataFrame,
    state_dir: str,
    sink,
    checkpoint_dir: str,
    key_col: str = "event_type",
    ts_col: str = "ts",
    width_s: int = 3600,
    z_threshold: int = 3,
    trigger_available_now: bool = True,
):
    """Streaming twin of ext/timeseries.py:spike_report — an
    incrementally maintained per-(key, bucket) count store with the
    identical integer-exact z-test recomputed after each fold.

    Mergeable shape (the same reason run_streaming_rollup scales):
    bucket counts merge by SUM, so each batch pays one grouped count
    over the batch plus one merge over (stored ∪ batch partials).
    State is |keys × observed buckets|-sized — bounded by time span /
    width per key, never by event volume — and the verdict stage runs
    over that bucket table, so re-flagging after every batch is cheap
    by construction (the batch operator's own scale argument).

    Because counts merge exactly and the verdict is pure integer
    algebra over the merged counts, the streamed report after batch k
    EQUALS the batch spike_report over the concatenation of batches
    1..k — no approximation, no late-data caveat beyond bucket
    placement itself (an event always lands in its timestamp's
    bucket, however late it arrives: count-based spikes tolerate
    out-of-order delivery by construction).

    ``sink(report_df, batch_id)`` receives the refreshed FULL flag
    report after each fold. Crash-replay caveat as the sibling gates:
    state write is materialized (localCheckpoint) before overwrite;
    a crash between sink and state write re-folds on replay — pair
    with an idempotent sink.
    """
    import os

    from cherry_spark.ext.timeseries import (
        spike_flags_from_buckets,
        time_bucket_s,
    )

    key_of = _epoch_keyer(checkpoint_dir)

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        _merged_fold(
            spark,
            state_dir,
            key_of(batch_id),
            lambda: batch_df.groupBy(
                F.col(key_col).alias("key"),
                time_bucket_s(F.col(ts_col), width_s).alias("bucket_s"),
            ).agg(F.count("*").cast("long").alias("n_events")),
            lambda stored, p: stored.unionByName(p)
            .groupBy("key", "bucket_s")
            .agg(F.sum("n_events").cast("long").alias("n_events")),
            sink,
            batch_id,
            serve_fn=lambda st: spike_flags_from_buckets(st, z_threshold),
        )

    writer = stream_df.writeStream.foreachBatch(handle_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_streaming_weighted_sample(
    spark: SparkSession,
    stream_df: DataFrame,
    state_dir: str,
    sink,
    checkpoint_dir: str,
    id_col: str,
    weight_col: str,
    m: int,
    salt: str = "",
    trigger_available_now: bool = True,
):
    """Maintain the EXACT m-pick weighted sample of a growing corpus.

    Streaming twin of ext/sampling.py:weighted_systematic_sample —
    the "keep a fixed-size quality-weighted sample of everything
    we've ever ingested" primitive. Each batch folds its (id, weight)
    pairs into a parquet state store (duplicate ids keep the max
    weight — idempotent under arrival replay), then re-draws the
    systematic sample OVER THE STORE.

    Why re-drawing per fold is cheap and exact: the sample is a pure
    function of the (id, weight) SET — the md5 line order never
    depends on arrival order — so the streamed sample after batch k
    EQUALS the batch operator over batches 1..k, with exactly m total
    picks at every point in time (no reservoir variance, no decaying
    approximation). The state is two scalar columns per distinct id —
    at 100 TB of documents that is GB-scale id/weight pairs, and the
    re-draw's only non-map stage is the 256-bucket two-phase prefix
    sum over that store, never the corpus text.

    ``sink(sample_df, batch_id)`` receives the refreshed sample
    (id, weight, n_picks). Crash-replay caveat as the sibling gates.
    """
    import os

    from cherry_spark.ext.sampling import weighted_systematic_sample

    key_of = _epoch_keyer(checkpoint_dir)

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        _merged_fold(
            spark,
            state_dir,
            key_of(batch_id),
            lambda: batch_df.groupBy(id_col).agg(
                F.max(weight_col).cast("long").alias("_w")
            ),
            lambda stored, p: stored.unionByName(p)
            .groupBy(id_col)
            .agg(F.max("_w").cast("long").alias("_w")),
            sink,
            batch_id,
            serve_fn=lambda st: weighted_systematic_sample(
                st, id_col, "_w", m=m, salt=salt
            ),
        )

    writer = stream_df.writeStream.foreachBatch(handle_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_streaming_decontamination_gate(
    spark: SparkSession,
    stream_df: DataFrame,
    test_df: DataFrame,
    eval_store_dir: str,
    sink,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 5,
    min_shared: int = 1,
    trigger_available_now: bool = True,
):
    """Block eval-set contamination AT INGESTION — the admission-gate
    twin of ext/dedup.py:contamination_overlap, completing the gate
    family (lexical dedup / semantic dedup / budget / decontamination).

    Dedup gates protect corpus uniqueness; this gate protects the
    EVALS: a training document sharing any word ``shingle_k``-gram
    with a held-out document is flagged before it ever lands in the
    corpus (after training it is too late — the benchmark number is
    already contaminated).

    Scale shape: the eval set is STATIC, so its shingle postings are
    built ONCE into ``eval_store_dir`` (first call builds, later runs
    and restarts reuse) — each micro-batch then pays only its own
    tokenize+shingle plus one equi-join against the stored eval
    postings (eval postings are tiny relative to any training stream;
    Catalyst broadcasts them). Per-batch cost is O(batch), flat in
    both stream length and eval-set age, and the gate never rescans
    admitted documents — contamination is a property of (doc, eval)
    alone, unlike near-dup, so there is no growing-corpus state at
    all.

    ``sink(verdicts_df, batch_id)`` receives one row per batch doc:
    (id, verdict 'contaminated'|'clean', n_shared_shingles,
    n_test_docs — zeros for clean docs).
    """
    import os

    from cherry_spark.ext.dedup import shingle_postings

    if not _store_has(eval_store_dir):
        _overwrite_store(
            shingle_postings(test_df, id_col, text_col, shingle_k).select(
                F.col("id").alias("test_id"), "shingle"
            ),
            eval_store_dir,
        )

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        te = spark.read.parquet(_dd(eval_store_dir))
        bp = shingle_postings(batch_df, id_col, text_col, shingle_k)
        hits = (
            bp.join(F.broadcast(te), on="shingle")
            .groupBy(F.col("id").alias(id_col))
            .agg(
                F.countDistinct("shingle").alias("n_shared_shingles"),
                F.countDistinct("test_id").alias("n_test_docs"),
            )
            .filter(F.col("n_shared_shingles") >= int(min_shared))
        )
        verdicts = (
            batch_df.select(id_col)
            .join(hits, on=id_col, how="left")
            .select(
                id_col,
                F.when(F.col("n_shared_shingles").isNotNull(), "contaminated")
                .otherwise("clean")
                .alias("verdict"),
                F.coalesce("n_shared_shingles", F.lit(0))
                .cast("long")
                .alias("n_shared_shingles"),
                F.coalesce("n_test_docs", F.lit(0))
                .cast("long")
                .alias("n_test_docs"),
            )
        )
        sink(verdicts, batch_id)

    writer = stream_df.writeStream.foreachBatch(handle_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_streaming_span_gate(
    spark: SparkSession,
    stream_df: DataFrame,
    state_dir: str,
    sink,
    checkpoint_dir: str,
    min_len: int = 8,
    overlap_frac: float = 0.5,
    doc_col: str = "doc_id",
    text_col: str = "text",
    trigger_available_now: bool = True,
    compact_every: int = 8,
    compact_target_bytes: int = 128 * 1024 * 1024,
):
    """Streaming ExactSubstr admission gate (r9): each micro-batch is
    span-matched against the GRAM POSTING STORE of everything admitted
    so far (`ext/substr.delta_repeated_spans` with the stored-postings
    seam), classified by `span_overlap_verdicts` (``span_dup`` when
    the merged overlap union covers more than ``overlap_frac`` of the
    doc), and ONLY non-span_dup docs fold their postings into the
    store — a rejected doc's grams never enter the state, so a later
    clone of a rejected doc is judged against the ORIGINAL admitted
    content (the composed-curation-gate precedence discipline).

    State = the admitted corpus's posting table (linear in admitted
    tokens, one deterministic per-batch file set per fold — each fold
    writes ONLY the batch's postings, never rewrites history; the
    100 TB analogue is a date-partitioned posting store).  Each batch
    pays: one batch tokenize+hash pass, one equi-join against the
    store, one bounded interval rollup.  ``sink(verdicts_df,
    batch_id)`` sees (doc, n_tokens, n_overlap_tokens, n_spans,
    verdict) per batch row.

    Crash-replay contract (r10, per the r9 advice): the store append
    runs BEFORE sink, so a crash between them replays a batch whose
    own grams are already stored.  Replay is idempotent anyway:
    (a) the stored-grams side is anti-joined against the batch's own
    doc ids before span matching, so the replayed batch is judged
    against exactly the pre-append store (under the unseen-ids
    ingestion contract that anti-join is a no-op on a first
    delivery); (b) the fold commits through
    :func:`_stage_append`/:func:`_commit_stores` under deterministic
    per-batch file names, so a replayed append REPLACES the crashed
    attempt instead of duplicating posting rows (duplicates would
    corrupt the gaps-and-islands run reconstruction for later
    batches).  The only residual is the standard foreachBatch
    at-least-once sink delivery — pair with an idempotent sink or
    dedupe on batch_id downstream.  Self-compacts the posting store
    every ``compact_every`` folds (r10; 0 = off).
    """
    import os

    from pyspark.sql.types import LongType, StructField, StructType

    from cherry_spark.ext.substr import (
        _gram_postings,
        delta_repeated_spans,
        span_overlap_verdicts,
    )

    key_of = _epoch_keyer(checkpoint_dir)

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        key = key_of(batch_id)
        if compact_every and batch_id and batch_id % compact_every == 0:
            _self_compact(spark, state_dir, key, compact_target_bytes)
        batch_df = batch_df.localCheckpoint(eager=True)
        _recover_store(state_dir)  # drop stray staging dirs FIRST so
        # they can't count as state below
        # have_state must see real data files, not just the _SUCCESS
        # marker a gram-less first fold can leave behind
        # (read.parquet on _SUCCESS-only dirs throws schema-inference
        # errors)
        have_state = _store_has(state_dir, recursive=True)
        grams = _gram_postings(
            batch_df, min_len, doc_col, text_col
        ).localCheckpoint(eager=True)  # ONE tokenize+hash per batch:
        # spans, verdicts, and the store fold all reuse this seam
        if have_state:
            # self-anti-join: judge the batch against the store MINUS
            # its own doc ids, so a crash-replayed batch (grams already
            # appended) cannot self-match at diag 0 and get every doc
            # wrongly verdicted span_dup
            stored = spark.read.parquet(_dd(state_dir)).join(
                batch_df.select(F.col(doc_col).alias("__doc")).distinct(),
                "__doc",
                "left_anti",
            )
            spans = delta_repeated_spans(
                None,
                batch_df,
                min_len,
                doc_col,
                text_col,
                corpus_grams=stored,
                batch_grams=grams,
            )
        else:
            id_type = batch_df.schema[doc_col].dataType
            spans = spark.createDataFrame(
                [],
                StructType(
                    [
                        StructField("doc_a", id_type),
                        StructField("doc_b", id_type),
                        StructField("start_a", LongType()),
                        StructField("start_b", LongType()),
                        StructField("span_len", LongType()),
                    ]
                ),
            )
        verdicts = span_overlap_verdicts(
            batch_df, spans, overlap_frac, doc_col, text_col
        ).localCheckpoint(eager=True)
        admitted = verdicts.filter(F.col("verdict") != "span_dup").select(
            F.col(doc_col)
        )
        admitted_grams = grams.join(
            admitted.withColumnRenamed(doc_col, "__doc"), "__doc", "left_semi"
        )
        _commit_stores([_stage_append(admitted_grams, state_dir, key)])
        sink(verdicts, batch_id)

    writer = stream_df.writeStream.foreachBatch(handle_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_streaming_bm25_index(
    spark: SparkSession,
    stream_df: DataFrame,
    state_dir: str,
    sink,
    checkpoint_dir: str,
    doc_col: str = "doc_id",
    text_col: str = "text",
    trigger_available_now: bool = True,
    compact_every: int = 8,
    compact_target_bytes: int = 128 * 1024 * 1024,
):
    """Incrementally maintained BM25 inverted index (r9): each
    micro-batch of NEW documents folds into the same four-table store
    layout ``ext/bm25.bm25_build_index`` writes — so a search job
    serves ``bm25_topk(index_dir=state_dir)`` against an
    always-fresh index, and after EVERY fold the store is bit-equal
    to a from-scratch build over all documents seen (the
    run_streaming_rollup mergeable-partials contract applied to a
    search index):

    - ``tf`` (doc, term, tf) and ``dl`` (doc, length): rows for new
      docs only — partition-APPENDED, history never rewritten;
    - ``dfreq`` (term, df): additive for disjoint doc sets — one
      vocab-bounded merge aggregate per fold, rewritten;
    - ``stats`` (1 row): additive counters, rewritten.

    ``sink(stats_df, batch_id)`` sees the refreshed 1-row corpus
    stats after each fold.  Batches must carry documents with UNSEEN
    ids (the ingestion contract — dedup gates run upstream).
    Crash-replay: tf/dl commit under deterministic per-batch names in
    the same :func:`_commit_stores` transaction as the merge swaps
    (r10) — replay replaces rather than duplicates them — and the
    dfreq/stats merge swaps carry per-table ``_merge_key`` markers,
    so a replayed fold never double-merges either table (exactly-once
    at every crash point).  Every ``compact_every`` folds the maintainer
    self-compacts its state at fold START via :func:`_self_compact`
    (r10) — set ``compact_every=0`` to opt out."""

    key_of = _epoch_keyer(checkpoint_dir)

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        key = key_of(batch_id)
        if compact_every and batch_id and batch_id % compact_every == 0:
            _self_compact(spark, state_dir, key, compact_target_bytes)
        sink(
            bm25_index_fold(
                spark,
                batch_df,
                state_dir,
                doc_col,
                text_col,
                batch_key=key,
            ),
            batch_id,
        )

    writer = stream_df.writeStream.foreachBatch(handle_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _dd(path: str) -> str:
    """Resolve a store root to the dir its parquet actually lives in
    (writers/store.py ``data_dir``): the live version dir for
    pointer-versioned stores, the root itself for flat ones.  EVERY
    read of a store table goes through this — reading the root of a
    versioned store sees nothing."""
    from cherry_spark.writers import store

    return store.data_dir(path)


def _store_has(path: str, recursive: bool | None = None) -> bool:
    """Whether the store at ``path`` currently serves any parquet.
    ``recursive`` defaults by layout: versioned stores walk the live
    version (it may be hive-partitioned), flat roots list shallowly
    (writers/store.py:has_parquet)."""
    from cherry_spark.writers import store

    return store.has_parquet(path, recursive=recursive)


def _store_ready(path: str) -> bool:
    """Whether the store at ``path`` has a fully-committed state
    (live pointer, or legacy flat ``_SUCCESS``)."""
    from cherry_spark.writers import store

    return store.ready(path)


def _overwrite_store(
    df: DataFrame, path: str, merge_key: str | None = None
) -> None:
    """Crash-safe overwrite of a merge-table store: write the new
    state as an IMMUTABLE version directory FIRST, then publish it
    with one put-if-absent pointer commit (writers/store.py, r13 —
    the manifest-bus commit shape applied to stores; a plain
    ``mode("overwrite")`` deletes the old files before writing, so a
    crash mid-write silently resets the store to empty and the next
    fold's readiness check treats that as a fresh start: total state
    loss, review r9).

    There is NO torn state: a crash before the pointer commit leaves
    an invisible orphan version (swept at the next fold start), a
    crash after it leaves the new version fully live.  A crash AFTER
    the commit double-merges the replayed batch UNLESS the caller
    records a ``merge_key`` — with it, a replayed fold sees its own
    key in the committed store and skips the re-merge (see
    :func:`_stage_store`), making the merge-table maintainers
    exactly-once under replay."""
    _commit_stores([_stage_store(df, path, merge_key=merge_key)])


def _stage_store(df: DataFrame, path: str, merge_key: str | None = None) -> tuple:
    """Phase 1 of the crash-safe overwrite: fully write the
    replacement into a fresh version dir under the store root.
    Returns a staged entry for :func:`_commit_stores`.

    ``merge_key`` (r10 review): for MERGE tables, record the batch key
    in a ``_merge_key`` sidecar INSIDE the staged version dir — it
    becomes visible atomically with the pointer commit (and is
    invisible to parquet readers: underscore-prefixed files are
    ignored), so a replayed fold can detect that the stored table
    ALREADY absorbed its batch and skip the re-merge.  This retires
    the old 'one batch's counts in one merge table' replay residual:
    each merge table independently knows whether it counted the
    batch, so a crash at ANY point between multi-table commits
    replays to exactly-once."""
    import os

    from cherry_spark.writers import store

    vdir = store.stage_version_dir(path)
    df.write.mode("overwrite").parquet(vdir)
    if merge_key is not None:
        with open(os.path.join(vdir, "_merge_key"), "w") as fh:
            fh.write(merge_key)
    return ("version", vdir, path)


def _merged_fold(
    spark: SparkSession,
    state_dir: str,
    key: str,
    partial_fn,
    merge_fn,
    sink,
    batch_id: int,
    serve_fn=None,
) -> None:
    """Shared body of the merge-state monitors (rollup / CMS /
    Misra-Gries / spike monitor / weighted sample): recover the
    store, short-circuit a replay whose batch is already merged (its
    ``_merge_key`` is in the committed store — serve it, never
    re-merge), else merge ONE batch partial into the stored state and
    swap with the marker.  ``partial_fn() -> DataFrame``;
    ``merge_fn(stored, partial) -> DataFrame``; ``serve_fn(state)``
    shapes what the sink sees (default: the merged state itself).
    One place to change the replay discipline instead of five."""
    import os

    serve = serve_fn or (lambda df: df)
    _recover_store(state_dir)
    if _merge_key_of(state_dir) == key:  # replay: already merged
        sink(serve(spark.read.parquet(_dd(state_dir))), batch_id)
        return
    partial = partial_fn()
    if _store_has(state_dir):
        merged = merge_fn(spark.read.parquet(_dd(state_dir)), partial)
    else:
        merged = partial
    merged = merged.localCheckpoint(eager=True)
    # crash-safe swap (review r9): never delete the only copy of
    # accumulated state before its replacement is fully written
    _overwrite_store(merged, state_dir, merge_key=key)
    sink(serve(merged), batch_id)


def _merge_key_of(path: str) -> str | None:
    """The ``_merge_key`` recorded by the last committed version of
    the merge table at ``path`` (None: no marker — pre-r10 store,
    ingest build, or a compaction that predates marker
    preservation)."""
    import os

    from cherry_spark.writers import store

    try:
        with open(os.path.join(store.data_dir(path), "_merge_key")) as fh:
            return fh.read()
    except OSError:
        return None


def _stage_append(df: DataFrame, path: str, key: str) -> tuple:
    """Phase 1 for an APPEND-only table (r10, per the r9 advice on the
    bm25 tf/dl appends): fully write the batch's rows to a temp
    sibling; :func:`_commit_stores` then moves the part files into the
    canonical dir under DETERMINISTIC ``{key}-NNNNN.parquet`` names,
    deleting any same-key files first — so a crash-replayed fold
    REPLACES its own previous partial append instead of
    blind-appending a duplicate copy.  ``key`` must be unique per
    fold, stable across replays, AND distinct across runs that share
    the state dir — the runners build it as
    ``{_run_epoch(checkpoint_dir)}-b{batch_id}`` so a fresh
    checkpoint's restarted batch ids can never collide with (and
    delete) kept history.  Works for flat tables and hive-partitioned
    ones (the relative subdirs are preserved on the move)."""
    import uuid

    tmp = f"{path}__tmp_{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(tmp)
    return ("append", tmp, path, key)


def _commit_append(tmp: str, path: str, key: str) -> None:
    import os

    from cherry_spark.writers import fs, store

    # a table a compaction has converted to the versioned layout keeps
    # receiving appends INSIDE its live version dir (readers resolve
    # the same dir); a flat table keeps the flat fast path — either
    # way each committed file is one deterministic-name atomic PUT
    dest_root = store.data_dir(path)
    fs.ensure_dir(dest_root)
    # drop a crashed previous attempt's files for this key (recursive:
    # hive-partitioned tables keep per-partition subdirs)
    _drop_batch_files(path, key)
    moved = 0
    for root, _dirs, files in os.walk(tmp):
        rel = os.path.relpath(root, tmp)
        dest = dest_root if rel == "." else os.path.join(dest_root, rel)
        parts = sorted(f for f in files if f.endswith(".parquet"))
        if parts:
            fs.ensure_dir(dest)
        for p in parts:
            fs.move_file(
                os.path.join(root, p),
                os.path.join(dest, f"{key}-{moved:05d}.parquet"),
            )
            moved += 1
    open(os.path.join(dest_root, "_SUCCESS"), "a").close()
    fs.remove_tree(tmp)


def _commit_stores(staged: list[tuple]) -> None:
    """Phase 2: commit every staged table in one tight commit loop —
    for multi-table folds (bm25's tf+dl+dfreq+stats) ALL replacements
    are fully written before ANY table's live state changes,
    shrinking the cross-table torn window from a Spark write to
    adjacent pointer commits.  Append-staged tables
    (:func:`_stage_append`) commit by moving part files to
    deterministic per-batch names (atomic single-object PUTs) —
    idempotent under replay at ANY crash point, so they carry no
    residual at all.  Merge tables staged WITH a ``merge_key`` are
    likewise exactly-once (r10, retiring the r9 'one batch's counts
    in one merge table' residual): the key rides the committed
    version dir itself, so after a crash between two merge tables'
    pointer commits the replay finds its own key in the earlier
    table (reads it as-is, no double-merge) and not in the later
    (merges normally) — per-table commit markers, without a
    log-structured format.  The only versions still staged WITHOUT a
    merge_key are the CENTROID stores (bootstrap is deterministic
    from the same batch; the reseed pair commits adjacently with the
    vec version and tears are self-repaired at the replay's fold
    start)."""
    from cherry_spark.writers import store

    for entry in staged:
        if entry[0] == "append":
            _, tmp, path, key = entry
            _commit_append(tmp, path, key)
            continue
        _, vdir, path = entry
        store.commit_version(path, vdir)


def _recover_store(path: str) -> None:
    """Fold-start cleanup of the store root at ``path``: sweep orphan
    / superseded version dirs and stale pointers (writers/store.py —
    a crash can only leave invisible orphans, never a torn state),
    plus the legacy swap protocol's strays for state dirs written by
    pre-r13 code: a canonical dir parked under ``__old`` with no
    replacement is restored (that IS the pre-fold state the replay
    wants), and ``__tmp``/``__compact`` siblings are dropped."""
    import glob
    import os

    from cherry_spark.writers import fs, store

    olds = sorted(glob.glob(f"{path}__old_*"), key=os.path.getmtime)
    if not os.path.exists(path) and olds:
        fs.move_dir(olds.pop(), path)
    for stray in (
        olds + glob.glob(f"{path}__tmp_*") + glob.glob(f"{path}__compact_*")
    ):
        fs.remove_tree(stray)
    store.sweep(path)


def _drop_batch_files(state_dir: str, key: str) -> None:
    """Delete a crashed attempt's committed files for ``key`` (any
    depth).  Two callers, same reason: a replayed fold must see
    exactly the pre-batch store — :func:`pair_graph_fold` reads its
    own append tables, so leftover rows from the crashed attempt
    would corrupt the recomputation; and :func:`_self_compact` must
    never fold them into anonymous part files the replay's
    delete-same-key pass can no longer find.

    EXACT ``{key}-NNNNN.parquet`` shape, not a ``{key}-*`` prefix
    (r12, the bus_append fix applied one layer down): '-' is legal in
    keys, and while the epoch keyer's ``{hex}-b{N}`` shape cannot
    prefix-collide, the gates accept caller-supplied batch keys — a
    key that is a proper prefix of a hyphenated sibling ('run' vs
    'run-1') must never delete the sibling's committed history."""
    import glob
    import os
    import re

    from cherry_spark.writers import fs

    own = re.compile(re.escape(key) + r"-\d{5,}\.parquet")
    for f in glob.glob(
        os.path.join(state_dir, "**", f"{key}-*.parquet"), recursive=True
    ):
        if own.fullmatch(os.path.basename(f)):
            fs.remove(f)


def _run_epoch(checkpoint_dir: str) -> str:
    """Per-checkpoint namespace for batch keys (r10 review): foreachBatch
    batch ids restart at 0 when a stream starts over with a FRESH
    checkpoint dir — without a namespace, the new run's
    delete-same-key commits (and :func:`_self_compact`'s crashed-
    attempt sweep) would silently DESTROY the old run's committed
    ``b0-*`` history in a kept state dir (the pre-r10 plain appends
    at worst duplicated).  Structured Streaming persists a stable
    query id in ``{checkpoint_dir}/metadata`` when the query starts —
    before the first batch runs — so a prefix of it namespaces keys
    stably across RESTARTS of the same checkpoint (replays keep
    replacing their own attempt) and uniquely across fresh
    checkpoints (a new run can never collide with kept history)."""
    import json
    import os

    meta = os.path.join(checkpoint_dir, "metadata")
    local = meta[len("file:"):] if meta.startswith("file:") else meta
    try:
        with open(local) as fh:
            qid = str(json.load(fh).get("id", ""))
    except (OSError, ValueError):
        qid = ""
    if not qid:
        # remote checkpoint scheme (s3://, hdfs://): read the one-line
        # metadata file through Spark itself — works for any
        # filesystem the checkpoint works for, so the query id stays
        # the namespace (a PATH hash would collide when a checkpoint
        # is deleted and recreated at the same path — exactly the
        # cross-run history destruction this function prevents)
        try:
            from pyspark.sql import SparkSession

            spark = SparkSession.getActiveSession()
            row = spark.read.text(meta).first() if spark else None
            qid = str(json.loads(row["value"]).get("id", "")) if row else ""
        except Exception:
            qid = ""
    tok = "".join(c for c in qid if c in "0123456789abcdef")[:8]
    if not tok:
        # last resort: a checkpoint-path hash — stable per checkpoint,
        # distinct across dirs; caveat: delete-and-recreate at the
        # SAME path reuses the epoch (both readers above must fail for
        # this to be reachable), which re-enables the delete-same-key
        # history destruction this function exists to prevent — so the
        # degradation must be LOUD, not silent
        import hashlib
        import warnings

        warnings.warn(
            "cherry_spark: no streaming query id readable at "
            f"{checkpoint_dir}/metadata — falling back to a "
            "checkpoint-PATH hash for the batch-key epoch. A checkpoint "
            "deleted and recreated at this path will REUSE the epoch "
            "and can overwrite kept store history; use a fresh "
            "checkpoint path per run if this warning appears.",
            RuntimeWarning,
            stacklevel=2,
        )
        tok = hashlib.md5(checkpoint_dir.encode()).hexdigest()[:8]
    return tok


def _epoch_keyer(checkpoint_dir: str):
    """Per-runner batch-key factory: memoizes :func:`_run_epoch` (the
    checkpoint metadata exists once the query has started, i.e. by
    the first foreachBatch call) and formats the namespaced key.  The
    runners MUST build keys through this — a bare ``b{batch_id}`` key
    reintroduces the fresh-checkpoint history-destruction bug."""
    box: list[str] = []

    def key_of(batch_id: int) -> str:
        if not box:
            box.append(_run_epoch(checkpoint_dir))
        return f"{box[0]}-b{int(batch_id)}"

    return key_of


def _self_compact(
    spark: SparkSession,
    state_dir: str,
    current_key: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Fold-START self-compaction hook for the streaming maintainers
    (r10, r9 verdict item #6): bounds the one-file-set-per-fold
    fragmentation without ever waiting for a manual quiesce.  The
    maintainers call it every ``compact_every`` folds from inside
    their foreachBatch bodies — foreachBatch executes serially, so
    the between-folds requirement of ``compact_state_dir`` holds by
    construction.

    Crash-safety argument — the hook runs BEFORE the current batch
    writes anything, at which point every file in the store belongs
    either to a fully-committed earlier batch (its checkpoint commit
    is what triggered this fold id) or to a crashed attempt of THE
    CURRENT batch.  Step 1 sweeps crash leftovers at ANY depth —
    orphan version dirs at table roots plus the legacy swap
    protocol's ``__old``/``__compact`` siblings, which can sit one
    level below the table root (pre-r13 partitioned-table swaps)
    where the fold's own ``_recover_store(table)`` never looks.
    Step 2 deletes the current batch's ``{current_key}-*`` crashed-
    attempt files outright: compacting them would fold their rows
    into anonymous part files the replay's delete-same-key pass can
    no longer find — a permanent duplicate — and the replayed fold
    rewrites them anyway (on a first delivery the glob matches
    nothing).  Step 3 compacts table-by-table; a crash mid-compaction
    leaves untouched tables valid and the in-flight table either
    pre-swap (temp dropped next time) or torn (repaired next time) —
    never lost, which the crash-during-compaction test exercises."""
    import glob
    import os
    import re

    _recover_store(state_dir)  # the state dir may ITSELF be the table
    if not os.path.isdir(state_dir):
        return {}
    strays = [
        s
        for pat in ("*__old_*", "*__compact_*", "*__tmp_*")
        for s in glob.glob(os.path.join(state_dir, "**", pat), recursive=True)
    ]  # __tmp_ included so a crashed staging dir can't be listed as a
    # table by compact_state_dir below
    canon = {
        re.sub(r"__(old|tmp|compact)_[0-9a-f]+$", "", s)
        for s in strays
        if os.path.isdir(s)
    }
    for c in sorted(canon):
        _recover_store(c)
    _drop_batch_files(state_dir, current_key)
    from cherry_spark.writers.compact import compact_state_dir

    return compact_state_dir(spark, state_dir, target_file_bytes)


def bm25_index_fold(
    spark: SparkSession,
    batch_df: DataFrame,
    state_dir: str,
    doc_col: str = "doc_id",
    text_col: str = "text",
    batch_key: str | None = None,
) -> DataFrame:
    """One :func:`run_streaming_bm25_index` fold, callable directly
    (the probe/batch seam — the maintainer's foreachBatch body IS this
    function).  Returns the refreshed 1-row corpus stats.

    ``batch_key`` (r10, per the r9 advice): when set (the streaming
    maintainer passes the foreachBatch batch id), the tf/dl appends
    are staged into the SAME :func:`_commit_stores` transaction as the
    dfreq/stats swaps and committed under deterministic per-batch file
    names — a crash anywhere in the fold followed by replay can no
    longer leave duplicate tf/dl rows (which would double the scoring
    join and double tf).  Without it (one-shot ingest builds, no
    replay concept) the appends stay plain Spark appends."""
    import os

    from cherry_spark.ext.bm25 import _index_tables

    tf, dl, dfreq, stats = _index_tables(batch_df, doc_col, text_col)
    tf = tf.localCheckpoint(eager=True)
    dl = dl.localCheckpoint(eager=True)
    _recover_store(f"{state_dir}/tf")
    _recover_store(f"{state_dir}/dl")
    _recover_store(f"{state_dir}/dfreq")
    _recover_store(f"{state_dir}/stats")
    have = _store_ready(f"{state_dir}/stats")
    # per-table replay detection (r10 review): a table whose committed
    # _merge_key equals this batch's key ALREADY absorbed the batch in
    # a crashed attempt — read it as-is and skip both the re-merge and
    # the rewrite. Each merge table decides independently, so a crash
    # between the two swaps still replays to exactly-once in both.
    dfreq_done = batch_key is not None and (
        _merge_key_of(f"{state_dir}/dfreq") == batch_key
    )
    stats_done = batch_key is not None and (
        _merge_key_of(f"{state_dir}/stats") == batch_key
    )
    if have:
        if dfreq_done:
            dfreq = spark.read.parquet(_dd(f"{state_dir}/dfreq"))
        else:
            old_df = spark.read.parquet(_dd(f"{state_dir}/dfreq"))
            dfreq = (
                old_df.unionByName(dfreq)
                .groupBy("term")
                .agg(F.sum("df").cast("long").alias("df"))
            )
        if stats_done:
            stats = spark.read.parquet(_dd(f"{state_dir}/stats"))
        else:
            old_st = spark.read.parquet(_dd(f"{state_dir}/stats"))
            stats = (
                old_st.unionByName(stats)
                .agg(
                    F.sum("n_docs").cast("long").alias("n_docs"),
                    F.sum("total_len").cast("long").alias("total_len"),
                )
            )
    # stats is consumed AFTER the swap (returned to the sink) — keep it
    # materialized; dfreq is referenced once by its staging write, which
    # reads the OLD canonical dir and writes a temp sibling (no
    # self-overwrite), so its old checkpoint was pure overhead
    stats = stats.localCheckpoint(eager=True)
    if batch_key is None:
        tf.write.mode("append").parquet(_dd(f"{state_dir}/tf"))
        dl.write.mode("append").parquet(_dd(f"{state_dir}/dl"))
        appends = []
    else:
        appends = [
            _stage_append(tf, f"{state_dir}/tf", batch_key),
            _stage_append(dl, f"{state_dir}/dl", batch_key),
        ]
    swaps = []
    if not dfreq_done:
        swaps.append(
            _stage_store(dfreq, f"{state_dir}/dfreq", merge_key=batch_key)
        )
    if not stats_done:
        swaps.append(
            _stage_store(stats, f"{state_dir}/stats", merge_key=batch_key)
        )
    # everything fully written before any canonical dir changes
    _commit_stores(appends + swaps)
    return stats


def run_streaming_positional_index(
    spark: SparkSession,
    stream_df: DataFrame,
    state_dir: str,
    sink,
    checkpoint_dir: str,
    doc_col: str = "doc_id",
    text_col: str = "text",
    trigger_available_now: bool = True,
    compact_every: int = 8,
    compact_target_bytes: int = 128 * 1024 * 1024,
):
    """Incrementally maintained positional inverted index (r9): each
    micro-batch of NEW documents appends its ``(doc_id, pos, term)``
    posting rows to the store ``phrase_search_topk(postings=...)``
    serves, so exact-phrase search stays fresh under ingestion — the
    ``run_streaming_bm25_index`` contract for the retrieval family's
    positional lane.

    Positions are per-document, so the index is PURELY additive for
    disjoint doc sets: one tokenize+posexplode per document per
    lifetime, partition-APPENDED (history never rewritten — the 100 TB
    analogue is a date-partitioned posting store), no merge tables at
    all, and after every fold the store is row-identical to a
    from-scratch ``positional_postings`` build over all documents seen.

    ``sink(summary_df, batch_id)`` sees a 1-row (n_docs, n_postings)
    summary of the batch just folded.  Batches must carry documents
    with UNSEEN ids (the ingestion contract — dedup gates run
    upstream); same crash-replay caveat as the sibling maintainers.
    Self-compacts every ``compact_every`` folds (r10; 0 = off).
    """
    key_of = _epoch_keyer(checkpoint_dir)

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        key = key_of(batch_id)
        if compact_every and batch_id and batch_id % compact_every == 0:
            _self_compact(spark, state_dir, key, compact_target_bytes)
        sink(
            positional_index_fold(
                spark, batch_df, state_dir, doc_col, text_col, batch_key=key
            ),
            batch_id,
        )

    writer = stream_df.writeStream.foreachBatch(handle_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def positional_index_fold(
    spark: SparkSession,
    batch_df: DataFrame,
    state_dir: str,
    doc_col: str = "doc_id",
    text_col: str = "text",
    batch_key: str | None = None,
) -> DataFrame:
    """One :func:`run_streaming_positional_index` fold, callable
    directly (the probe/batch seam).  Returns the 1-row
    (n_docs, n_postings) summary.  ``batch_key``: see
    :func:`bm25_index_fold`."""
    from cherry_spark.ext.phrase import positional_postings

    rows = positional_postings(batch_df, doc_col, text_col).localCheckpoint(
        eager=True
    )
    _recover_store(state_dir)
    if batch_key is None:
        rows.write.mode("append").parquet(state_dir)
    else:
        _commit_stores([_stage_append(rows, state_dir, batch_key)])
    return rows.agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_postings"),
    )


def run_streaming_pair_graph(
    spark: SparkSession,
    stream_df: DataFrame,
    state_dir: str,
    sink,
    checkpoint_dir: str,
    doc_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.6,
    max_bucket_size: int = 500,
    trigger_available_now: bool = True,
    compact_every: int = 8,
    compact_target_bytes: int = 128 * 1024 * 1024,
):
    """Incrementally maintained EXACT-Jaccard near-dup pair graph (r9):
    each micro-batch of NEW documents is pair-matched against
    everything seen so far and the resulting ``(id1, id2, jaccard)``
    edges append to the same table the cluster consumers (min-label /
    star connected components, keep-best) iterate — so dedup clusters
    stay fresh under ingestion without ever re-running the corpus×
    corpus pair job (``ngram_jaccard_pairs`` is the from-scratch twin;
    ``delta_dedup`` is the minhash-banded sibling that judges a batch
    without growing a graph).

    State tables under ``state_dir``:

    - ``postings`` (id, shingle): per-doc distinct shingles, appended —
      one tokenize+shingle per document per lifetime;
    - ``dfreq`` (shingle, df): additive merge per fold (disjoint doc
      sets — the ``run_streaming_bm25_index`` dfreq contract), so the
      hot-shingle cap never needs a corpus recount;
    - ``sizes`` (id, n_total): per-doc distinct-shingle totals,
      appended once at the doc's fold;
    - ``pairs`` (id1, id2, jaccard): edges ≥ threshold, appended.

    Per fold, corpus-wide access is RESTRICTED: the probe join touches
    stored postings only on the batch's shingles, and the hot-size
    correction only on the (tiny by construction) over-cap shingle
    list — at 100 TB the posting store is partitioned by shingle hash
    and both probes partition-prune; nothing re-shingles old docs.

    Semantics are FOLD-TIME (the span-gate contract): every pair is
    judged under the capped profile (doc_freq ≤ ``max_bucket_size``)
    measured over the corpus AS OF its fold. Document frequencies only
    grow, so a shingle that later crosses the cap does not retro-edit
    edges already emitted; on corpora where no shingle crosses the cap
    mid-stream the graph is row-identical to the from-scratch build
    after every fold (tested). ``sink(summary_df, batch_id)`` sees a
    1-row (n_docs, n_new_pairs) summary. Batches must carry UNSEEN doc
    ids; same crash-replay caveat as the sibling maintainers.
    Self-compacts every ``compact_every`` folds (r10; 0 = off).
    """
    key_of = _epoch_keyer(checkpoint_dir)

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        key = key_of(batch_id)
        if compact_every and batch_id and batch_id % compact_every == 0:
            _self_compact(spark, state_dir, key, compact_target_bytes)
        summary = pair_graph_fold(
            spark,
            batch_df,
            state_dir,
            doc_col=doc_col,
            text_col=text_col,
            shingle_k=shingle_k,
            threshold=threshold,
            max_bucket_size=max_bucket_size,
            batch_key=key,
        )
        sink(summary, batch_id)

    writer = stream_df.writeStream.foreachBatch(handle_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def pair_graph_fold(
    spark: SparkSession,
    batch_df: DataFrame,
    state_dir: str,
    doc_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.6,
    max_bucket_size: int = 500,
    batch_key: str | None = None,
) -> DataFrame:
    """One :func:`run_streaming_pair_graph` fold, callable directly
    (the probe/batch seam — the maintainer's foreachBatch body IS this
    function).  Returns the 1-row (n_docs, n_new_pairs) summary.
    ``batch_key``: see :func:`bm25_index_fold` — with it, the
    postings/sizes/pairs appends commit idempotently in the same
    transaction as the dfreq swap, and the fold FIRST deletes its own
    key's files from a crashed prior attempt: unlike the write-only
    maintainers this fold READS postings/sizes, so leftover batch rows
    would double every batch doc's stored shingles (inflating hot_hits
    and collapsing n_sh) and duplicate its size rows — the replay must
    see exactly the pre-batch store (r10 review).  The dfreq merge
    swap carries a ``_merge_key`` marker: a replay that finds its own
    key reads the already-merged dfreq as-is, reproducing the SAME
    capped profile the crashed attempt used — exactly-once here
    too."""
    import os

    from cherry_spark.ext.dedup import shingle_postings

    bpost = shingle_postings(
        batch_df, doc_col, text_col, shingle_k
    ).localCheckpoint(eager=True)
    for t in ("postings", "sizes", "pairs"):
        _recover_store(f"{state_dir}/{t}")
    if batch_key is not None:
        for t in ("postings", "sizes", "pairs"):
            _drop_batch_files(f"{state_dir}/{t}", batch_key)
    bsizes = bpost.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_total")
    )
    bdfreq = bpost.groupBy("shingle").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    _recover_store(f"{state_dir}/dfreq")
    have = _store_ready(f"{state_dir}/dfreq")
    # replay detection (r10 review): if the committed dfreq already
    # carries this batch's key, the crashed attempt merged it — read
    # as-is so the replay reproduces the SAME capped profile (a
    # re-merge would double the batch's dfs, potentially flipping
    # shingles across the hot cap and committing DIFFERENT pairs
    # under the same key than the attempt did)
    dfreq_done = batch_key is not None and (
        _merge_key_of(f"{state_dir}/dfreq") == batch_key
    )
    if have:
        if dfreq_done:
            dfreq = spark.read.parquet(_dd(f"{state_dir}/dfreq"))
        else:
            old = spark.read.parquet(_dd(f"{state_dir}/dfreq"))
            dfreq = (
                old.unionByName(bdfreq)
                .groupBy("shingle")
                .agg(F.sum("df").cast("long").alias("df"))
            )
    else:
        dfreq = bdfreq
    dfreq = dfreq.localCheckpoint(eager=True)
    hot = F.broadcast(
        dfreq.filter(F.col("df") > max_bucket_size).select("shingle")
    )

    if have:
        # schema-pinned reads: after the crashed-attempt drop above, a
        # replayed FIRST batch leaves these dirs with only a _SUCCESS
        # marker — schema inference would throw, the pinned schema
        # reads them as empty (bpost/bsizes ARE the store schemas)
        stored_post = spark.read.schema(bpost.schema).parquet(
            _dd(f"{state_dir}/postings")
        )
        all_post = stored_post.unionByName(bpost)
        all_sizes = spark.read.schema(bsizes.schema).parquet(
            _dd(f"{state_dir}/sizes")
        ).unionByName(bsizes)
    else:
        all_post = bpost
        all_sizes = bsizes
    capped_b = bpost.join(hot, "shingle", "left_anti")
    # probe restricted to batch shingles by the equi-join itself
    capped_all = all_post.join(hot, "shingle", "left_anti")
    cand = (
        capped_b.select(F.col("id").alias("bid"), "shingle")
        .join(capped_all.select(F.col("id").alias("oid"), "shingle"), "shingle")
        .where(F.col("bid") != F.col("oid"))
        .select(
            F.least("bid", "oid").alias("id1"),
            F.greatest("bid", "oid").alias("id2"),
            "shingle",
        )
        .distinct()  # collapses the both-in-batch double count
    )
    shared = cand.groupBy("id1", "id2").agg(F.count(F.lit(1)).alias("c"))
    # capped size NOW = stored total − hits on the current hot list
    hot_hits = (
        all_post.join(hot, "shingle")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_hot"))
    )
    n_sh = (
        all_sizes.join(hot_hits, "id", "left")
        .select(
            "id",
            (F.col("n_total") - F.coalesce(F.col("n_hot"), F.lit(0))).alias(
                "n_sh"
            ),
        )
    )
    pairs = (
        shared.join(n_sh.withColumnsRenamed({"id": "id1", "n_sh": "n1"}), "id1")
        .join(n_sh.withColumnsRenamed({"id": "id2", "n_sh": "n2"}), "id2")
        .withColumn(
            "jaccard",
            F.col("c").cast("double")
            / (F.col("n1") + F.col("n2") - F.col("c")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
        .localCheckpoint(eager=True)
    )
    if batch_key is None:
        bpost.write.mode("append").parquet(_dd(f"{state_dir}/postings"))
        bsizes.write.mode("append").parquet(_dd(f"{state_dir}/sizes"))
        _overwrite_store(dfreq, f"{state_dir}/dfreq")
        pairs.write.mode("append").parquet(_dd(f"{state_dir}/pairs"))
    else:
        # bsizes/pairs are projections of checkpointed frames; bpost is
        # checkpointed — staging writes re-derive them cheaply
        _commit_stores(
            [
                _stage_append(bpost, f"{state_dir}/postings", batch_key),
                _stage_append(bsizes, f"{state_dir}/sizes", batch_key),
                _stage_append(pairs, f"{state_dir}/pairs", batch_key),
            ]
            + (
                []  # dfreq already post-batch: no rewrite on replay
                if dfreq_done
                else [
                    _stage_store(
                        dfreq, f"{state_dir}/dfreq", merge_key=batch_key
                    )
                ]
            )
        )
    summary = bpost.select("id").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    ).crossJoin(
        F.broadcast(
            pairs.agg(F.count(F.lit(1)).cast("long").alias("n_new_pairs"))
        )
    )
    return summary


def ivf_index_fold(
    spark: SparkSession,
    batch_vectors: DataFrame,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    batch_key: str | None = None,
) -> DataFrame:
    """One :func:`run_streaming_ivf_index` fold: assign a batch of NEW
    vectors to the FIXED stored centroids and append them to the
    partitioned corpus. Returns a 1-row (n_vectors, n_clusters_hit)
    summary.  ``batch_key``: see :func:`bm25_index_fold` — with it the
    partitioned append commits idempotently under replay (the staged
    hive subdirs are preserved on the per-file move).

    When the index carries a PROBES table (r14, the v3
    ``ivf_build_index`` layout) and its ``_centroids_v`` marker
    matches the live centroids — always true here, this maintainer
    never retrains centroids — the batch's probe ranks append in the
    SAME commit loop, so ``knn_graph(index_dir=...)`` keeps serving
    stored probes with no union gap as the corpus grows.  Probe ranks
    against fixed centroids are deterministic per vector, so the
    maintained table stays row-identical to a build-time table over
    everything streamed (tested)."""
    from cherry_spark.ext.ivf import _probe_rank_table, ivf_assign, probes_meta
    from cherry_spark.writers import store as _st

    centroids = spark.read.parquet(_dd(f"{index_dir}/centroids"))
    assigned = batch_vectors.join(
        ivf_assign(batch_vectors, centroids, id_col, vec_col), on=id_col
    ).localCheckpoint(eager=True)
    # same co-location as ivf_build_index: one file per touched
    # partition dir per fold, not (tasks x clusters)
    co_located = assigned.repartition("centroid_id")

    probes_root = f"{index_dir}/probes"
    probe_rows = None
    meta = probes_meta(index_dir)
    if meta is not None:
        _pdir, max_rank = meta
        probe_rows = (
            _probe_rank_table(
                batch_vectors.select(
                    F.col(id_col).alias("query_id"), F.col(vec_col)
                ),
                centroids,
                max_rank,
                vec_col,
                "query_id",
            )
            .select("query_id", "centroid_id", "proberank")
            .repartition("proberank")
        )

    if batch_key is None:
        co_located.write.partitionBy("centroid_id").mode("append").parquet(
            _dd(f"{index_dir}/corpus")
        )
        if probe_rows is not None:
            probe_rows.write.partitionBy("proberank").mode("append").parquet(
                _st.data_dir(probes_root)
            )
    else:
        import uuid as _uuid

        _recover_store(f"{index_dir}/corpus")  # BEFORE staging: the
        # stray sweep would delete a fresh __tmp dir
        tmp = f"{index_dir}/corpus__tmp_{_uuid.uuid4().hex[:8]}"
        co_located.write.partitionBy("centroid_id").mode(
            "overwrite"
        ).parquet(tmp)
        staged = [("append", tmp, f"{index_dir}/corpus", batch_key)]
        if probe_rows is not None:
            _recover_store(probes_root)
            ptmp = f"{probes_root}__tmp_{_uuid.uuid4().hex[:8]}"
            probe_rows.write.partitionBy("proberank").mode(
                "overwrite"
            ).parquet(ptmp)
            staged.append(("append", ptmp, probes_root, batch_key))
        _commit_stores(staged)
    return assigned.agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.countDistinct("centroid_id").cast("long").alias("n_clusters_hit"),
    )


def run_streaming_ivf_index(
    spark: SparkSession,
    stream_df: DataFrame,
    index_dir: str,
    sink,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    trigger_available_now: bool = True,
    compact_every: int = 8,
    compact_target_bytes: int = 128 * 1024 * 1024,
):
    """Incrementally maintained IVF ANN index (r9): each micro-batch of
    NEW embeddings is assigned to the index's EXISTING centroids (one
    broadcast of the tiny centroid table per fold — the coarse
    quantizer is corpus state learned at ``ivf_build_index`` time and
    retrained only at corpus-version boundaries, the production IVF
    contract) and appended into the centroid-partitioned corpus that
    ``ivf_search`` / ``knn_graph(index_dir=...)`` probe — so ANN search
    stays fresh under ingestion and still reads only nprobe partitions.

    Assignment is deterministic given centroids, so after every fold
    the maintained corpus is ROW-IDENTICAL to assigning all vectors
    seen so far against the same centroids in one batch (tested).
    Partition dirs gain one file per touched fold — the maintainer
    self-compacts every ``compact_every`` folds (r10, hive-partition
    aware via :func:`_self_compact`; 0 = off; never compact a dir a
    downstream stream consumes as a file source — see
    ``compact_state_dir``'s store-as-bus warning). The index must
    exist (``ivf_build_index`` on the first corpus version); batches
    must carry UNSEEN ids; same crash-replay caveat as the sibling
    maintainers.
    """

    key_of = _epoch_keyer(checkpoint_dir)

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        key = key_of(batch_id)
        if compact_every and batch_id and batch_id % compact_every == 0:
            _self_compact(spark, index_dir, key, compact_target_bytes)
        sink(
            ivf_index_fold(
                spark,
                batch_df,
                index_dir,
                id_col,
                vec_col,
                batch_key=key,
            ),
            batch_id,
        )

    writer = stream_df.writeStream.foreachBatch(handle_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def doc_store_fold(
    spark: SparkSession,
    batch_df: DataFrame,
    state_dir: str,
    transform,
    batch_key: str | None = None,
) -> DataFrame:
    """One :func:`run_streaming_doc_store` fold: append
    ``transform(batch_df)`` to the store. Returns a 1-row (n_rows)
    summary.  ``batch_key``: see :func:`bm25_index_fold` — with it the
    append commits idempotently under replay."""
    rows = transform(batch_df).localCheckpoint(eager=True)
    if batch_key is None:
        rows.write.mode("append").parquet(_dd(state_dir))
    else:
        _recover_store(state_dir)
        _commit_stores([_stage_append(rows, state_dir, batch_key)])
    return rows.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))


def run_streaming_doc_store(
    spark: SparkSession,
    stream_df: DataFrame,
    state_dir: str,
    transform,
    sink,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    compact_every: int = 8,
    compact_target_bytes: int = 128 * 1024 * 1024,
):
    """Generic incrementally-maintained PER-DOCUMENT derived store
    (r9): ``transform`` is any deterministic per-document batch
    function — ``minhash_signatures``, ``simhash64``,
    ``shingle_postings`` — and each micro-batch's derived rows append
    to the store the batch queries serve from
    (``minhash_lsh_dedup(signatures=...)``,
    ``ngram_jaccard_pairs(postings=...)``, …).

    Because the transform is per-document and deterministic, the
    store is ROW-IDENTICAL to a from-scratch build over everything
    streamed after every fold — no merge tables, history never
    rewritten, each document transformed once per lifetime. This is
    the same contract the specialized maintainers
    (positional/bm25/pair-graph/ivf) implement for their multi-table
    states; per-doc single-table stores need no specialization.
    Batches must carry UNSEEN doc ids; self-compacts every
    ``compact_every`` folds (r10; 0 = off; never enable when a
    downstream stream reads the store as a file source — see
    ``compact_state_dir``'s store-as-bus warning); same
    crash-replay caveat as the siblings.
    """

    key_of = _epoch_keyer(checkpoint_dir)

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        key = key_of(batch_id)
        if compact_every and batch_id and batch_id % compact_every == 0:
            _self_compact(spark, state_dir, key, compact_target_bytes)
        sink(
            doc_store_fold(
                spark,
                batch_df,
                state_dir,
                transform,
                batch_key=key,
            ),
            batch_id,
        )

    writer = stream_df.writeStream.foreachBatch(handle_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def count_store_fold(
    spark: SparkSession,
    batch_df: DataFrame,
    state_dir: str,
    transform,
    key_cols: list[str],
    batch_key: str | None = None,
) -> DataFrame:
    """One :func:`run_streaming_count_store` fold: merge
    ``transform(batch_df)`` into the store by summing every non-key
    column per key. Returns the 1-row (n_keys) summary of the merged
    store.  ``batch_key`` (r10 review): with it the merge is
    replay-idempotent — a store whose committed ``_merge_key`` equals
    the key already absorbed the batch and is served as-is."""
    import os

    _recover_store(state_dir)
    if batch_key is not None and _merge_key_of(state_dir) == batch_key:
        merged = spark.read.parquet(_dd(state_dir))
        return merged.agg(F.count(F.lit(1)).cast("long").alias("n_keys"))
    new = transform(batch_df)
    val_cols = [c for c in new.columns if c not in key_cols]
    if _store_ready(state_dir):
        new = spark.read.parquet(_dd(state_dir)).unionByName(new)
    merged = new.groupBy(*key_cols).agg(
        *[F.sum(c).cast("long").alias(c) for c in val_cols]
    )
    # materialize the merge BEFORE overwriting its own input
    merged = merged.localCheckpoint(eager=True)
    _overwrite_store(merged, state_dir, merge_key=batch_key)
    return merged.agg(F.count(F.lit(1)).cast("long").alias("n_keys"))


def run_streaming_count_store(
    spark: SparkSession,
    stream_df: DataFrame,
    state_dir: str,
    transform,
    key_cols: list[str],
    sink,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Generic incrementally-maintained ADDITIVE count store (r9): the
    merge sibling of :func:`run_streaming_doc_store` for derived
    tables whose values are sums over disjoint document sets — bigram
    LM counts (``ext.quality.bigram_counts``, keys [prev, cur]),
    unigram/token frequency tables, any (keys…, counts…) aggregate.
    Each fold merges ``transform(batch)`` into the store with ONE
    bounded-cardinality groupBy (the ``run_streaming_bm25_index``
    dfreq contract generalized), so e.g. ``bigram_logprob(counts=…)``
    always scores against the up-to-date LM.

    Counts over disjoint batches add exactly, so after every fold the
    store equals the from-scratch aggregate over everything streamed
    (tested bit-for-bit — BIGINT counts, lossless through parquet).
    Per-fold cost is bounded by the store's KEY CARDINALITY (vocab²
    observed for bigrams — sublinear in corpus), not the corpus.
    Batches must carry UNSEEN docs; same crash-replay caveat as the
    sibling maintainers.
    """

    key_of = _epoch_keyer(checkpoint_dir)

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        sink(
            count_store_fold(
                spark,
                batch_df,
                state_dir,
                transform,
                key_cols,
                batch_key=key_of(batch_id),
            ),
            batch_id,
        )

    writer = stream_df.writeStream.foreachBatch(handle_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def trained_gate_fold(
    spark: SparkSession,
    batch_df: DataFrame,
    state_dir: str,
    label_expr,
    batch_id: int,
    refit_every: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    n_iters: int = 8,
    lr_inv: int = 1,
    threshold_micro: int | None = None,
    batch_key: str | None = None,
    retain_docs: int = 50_000,
) -> DataFrame:
    """One :func:`run_streaming_trained_gate` fold, callable directly
    (the probe/test seam).  Returns the batch verdicts
    (id, n_tokens, score_micro, keep, model_version).

    ``batch_key`` defaults to the bare ``b{batch_id}`` — safe ONLY
    against a state dir this run exclusively owns (a fresh tmp dir,
    the probe/test seam).  Against a KEPT state dir the bare key
    collides with a previous run's restarted batch ids and the
    delete-same-key commit would destroy its labeled history — any
    caller sharing a state dir across runs MUST pass an
    epoch-namespaced key, as the runner does (see :func:`_run_epoch`).

    ``retain_docs`` bounds the refit input (r10 verdict "what's
    wrong" #2 — the refit was O(total labeled history) every
    ``refit_every`` folds, quadratic cumulative work on an unbounded
    stream): a deterministic fixed-size sample — the ``retain_docs``
    smallest rows by ``(md5(id), id)`` over all DISTINCT labeled ids,
    first arrival wins (r11 advice: a repeated id must not double-
    weight the refit) — is maintained incrementally in the
    ``train_sample/`` store at O(sample + batch) per fold, and the
    refit reads ONLY it.  The incremental merge is exactly the global
    top-N (once an id leaves the sample no later arrival can re-admit
    it — rank is a pure function of id — and surviving rows are a
    superset of the final sample) and is idempotent under crash
    replay because the per-id dedupe prefers stored rows.  Histories
    at or under ``retain_docs`` distinct ids train on every distinct
    arrival — identical to the unbounded behavior."""
    import os

    from cherry_spark.ext.train import (
        SCALE,
        train_hashed_classifier,
        trained_classifier_gate,
    )

    labeled_dir = f"{state_dir}/labeled"
    sample_dir = f"{state_dir}/train_sample"
    weights_dir = f"{state_dir}/weights"

    batch_df = batch_df.localCheckpoint(eager=True)
    _recover_store(labeled_dir)
    _recover_store(sample_dir)
    _recover_store(weights_dir)  # a torn hot-swap recovers to the
    # PREVIOUS full model — a reader can never observe half a model
    # (the _overwrite_store stage/commit contract)

    # 1. label the arrivals and fold them into the training corpus
    # (idempotent per-batch append — a crash-replayed fold replaces
    # its own rows, so the refit corpus never double-counts a batch)
    labeled = batch_df.select(
        F.col(id_col),
        F.col(text_col),
        label_expr.cast("long").alias("__lbl"),
    ).localCheckpoint(eager=True)
    key = batch_key if batch_key is not None else f"b{int(batch_id)}"
    _commit_stores([_stage_append(labeled, labeled_dir, key)])

    # 1b. fold the batch into the bounded training sample (see the
    # ``retain_docs`` docstring): rank ascending by (md5(id), id) —
    # deterministic, order-free — and keep the first ``retain_docs``
    # DISTINCT ids, first-arrival-wins (r11 advice: a repeated id must
    # not occupy two slots and double-weight its row in the refit —
    # the test_properties lemma models arrivals as a SET of ids, and
    # the implementation now matches it).  Stored rows take priority
    # over the batch's in the per-id dedupe, which makes the merge
    # IDEMPOTENT under crash replay with no anti-join: re-merging an
    # already-absorbed batch reproduces the committed sample exactly
    # (absorbed ids lose the dedupe to their stored copy; ids the
    # crashed merge evicted rank above the boundary — rank is a pure
    # function of id — and evict again).  Sample-level dedupe equals
    # the lemma's all-history dedupe because both copies of an id
    # share one rank: an id whose first arrival was evicted can never
    # re-enter through a later copy.
    rank = F.md5(F.col(id_col).cast("string"))
    stored_sample = None
    if _store_ready(sample_dir):
        stored_sample = spark.read.parquet(_dd(sample_dir))
    skip_merge = False
    if stored_sample is not None and _merge_key_of(sample_dir) != key:
        # steady-state fast path: once the sample is FULL, a batch with
        # no row ranking at or under the stored boundary cannot change
        # the top-N — skip the O(sample) rewrite entirely (the store's
        # merge key stays at the last CONTRIBUTING batch, which replay
        # handles identically: a replayed skipped fold re-derives the
        # skip).  As the corpus outgrows retain_docs the boundary
        # tightens and almost every fold takes this path.
        head = stored_sample.agg(
            F.count(F.lit(1)).alias("n"), F.max(rank).alias("mx")
        ).first()
        if head["n"] >= int(retain_docs):
            skip_merge = (
                labeled.filter(rank <= head["mx"]).limit(1).count() == 0
            )
    if not skip_merge:
        from pyspark.sql import Window

        # Per-id priority (r12 advice refines the r11 rule): each
        # sample row records the batch key that admitted it (__src).
        # The dedupe prefers (0) stored rows from OTHER batches — true
        # first arrivals, the cross-batch first-arrival-wins lemma —
        # then (1) this batch's rows, then (2) stored rows from THIS
        # key: a crashed attempt's own copies.  On a clean delivery
        # class (2) is empty and this is exactly stored-first; on an
        # own-key replay the replay's rows beat only the crashed
        # attempt's copies, so a DIVERGED replay (possible when the
        # source is a bus whose producer corrected the version via
        # replace_if_last) updates the sample to follow the replay —
        # like the keyed labeled store and the bus mirror — without
        # ever displacing an earlier batch's first arrival.  Samples
        # written before __src existed read as NULL = "other batch".
        stored_pri = (
            F.when(F.col("__src") == F.lit(key), F.lit(2)).otherwise(
                F.lit(0)
            )
            if stored_sample is not None and "__src" in stored_sample.columns
            else F.lit(0)
        )
        batch_cand = labeled.withColumn("__src", F.lit(key)).withColumn(
            "__pri", F.lit(1)
        )
        if stored_sample is not None:
            stored_cand = stored_sample
            if "__src" not in stored_cand.columns:
                stored_cand = stored_cand.withColumn(
                    "__src", F.lit(None).cast("string")
                )
            cand = stored_cand.withColumn("__pri", stored_pri).unionByName(
                batch_cand
            )
        else:
            cand = batch_cand
        # one row per id: priority class first, then a deterministic
        # winner among same-class duplicates (label, then text)
        dedup_w = Window.partitionBy(id_col).orderBy(
            "__pri", "__lbl", F.md5(F.col(text_col))
        )
        new_sample = (
            cand.withColumn("__rn", F.row_number().over(dedup_w))
            .filter(F.col("__rn") == 1)
            .drop("__pri", "__rn")
            .orderBy(rank, F.col(id_col))
            .limit(int(retain_docs))
            .localCheckpoint(eager=True)
        )
        _overwrite_store(new_sample, sample_dir, merge_key=key)

    # 2. corpus-version boundary: refit from the bounded training
    # sample (== all labeled arrivals while history fits retain_docs),
    # CALIBRATE the keep threshold at the class-mean midpoint (the
    # train_then_gate calibration, pure BIGINT) unless a fixed
    # ``threshold_micro`` was given, and hot-swap model + threshold
    # together (crash-safe swap; serving reads either the old or the
    # new FULL (model, threshold) pair, never a mixture). batch 0 is
    # the bootstrap version.
    if batch_id % refit_every == 0 or not _store_ready(weights_dir):
        corpus = spark.read.parquet(_dd(sample_dir))
        w = train_hashed_classifier(
            corpus, "__lbl", id_col, text_col, n_buckets, n_iters, lr_inv
        ).localCheckpoint(eager=True)
        if threshold_micro is None:
            cal = (
                trained_classifier_gate(corpus, w, id_col, text_col, n_buckets)
                .join(
                    corpus.select(
                        F.col(id_col), F.col("__lbl").cast("int").alias("y")
                    ),
                    id_col,
                )
                .agg(
                    F.sum(
                        F.when(F.col("y") == 1, F.col("score_micro"))
                    ).alias("s1"),
                    F.sum(F.when(F.col("y") == 1, 1).otherwise(0))
                    .cast("long")
                    .alias("n1"),
                    F.sum(
                        F.when(F.col("y") == 0, F.col("score_micro"))
                    ).alias("s0"),
                    F.sum(F.when(F.col("y") == 0, 1).otherwise(0))
                    .cast("long")
                    .alias("n0"),
                )
                .first()
            )
            def _tdiv(a: int, b: int) -> int:
                # truncation toward zero — Spark's `div` (scores can
                # be negative, Python // floors)
                q = abs(a) // abs(b)
                return q if (a >= 0) == (b >= 0) else -q

            thr = (
                _tdiv(
                    _tdiv(cal["s1"], cal["n1"]) + _tdiv(cal["s0"], cal["n0"]),
                    2,
                )
                if cal["n1"] and cal["n0"]
                else SCALE // 2  # one-class corpus: no midpoint exists
            )
        else:
            thr = int(threshold_micro)
        _overwrite_store(
            w.withColumn("model_version", F.lit(int(batch_id)))
            .withColumn("thr_micro", F.lit(int(thr)).cast("long")),
            weights_dir,
        )

    # 3. score the batch with the CURRENT stored (model, threshold)
    # pair (between boundaries that is the last version — train once
    # per corpus version, score many)
    wrow = spark.read.parquet(_dd(weights_dir))
    head = wrow.agg(
        F.max("model_version").alias("v"), F.max("thr_micro").alias("t")
    ).first()
    version = head["v"]
    scored = trained_classifier_gate(
        batch_df,
        wrow.select("bucket", "w"),
        id_col,
        text_col,
        n_buckets,
        threshold_micro=int(head["t"]),
    )
    # pin the verdicts NOW: the plan reads the weights dir, which a
    # later boundary fold renames — a sink that defers evaluation must
    # not race the hot-swap
    return scored.withColumn(
        "model_version", F.lit(int(version)).cast("long")
    ).localCheckpoint(eager=True)


def run_streaming_trained_gate(
    spark: SparkSession,
    stream_df: DataFrame,
    state_dir: str,
    sink,
    checkpoint_dir: str,
    label_expr,
    refit_every: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    n_iters: int = 8,
    lr_inv: int = 1,
    threshold_micro: int | None = None,
    trigger_available_now: bool = True,
    compact_every: int = 8,
    compact_target_bytes: int = 128 * 1024 * 1024,
    retain_docs: int = 50_000,
):
    """TRAIN-THEN-CURATE composition (r10, r9 verdict item #7): a
    streaming quality-admission gate whose model is PERIODICALLY
    REFIT from the freshly labeled arrivals and hot-swapped at
    corpus-version boundaries — the closed loop between
    ``ext/train.train_hashed_classifier`` (the certified fixed-point
    BIGINT trainer behind ``trained_quality_gate``) and the streaming
    admission discipline of the curation gate.

    Per fold: (1) the batch is labeled by ``label_expr`` (the same
    boolean labeling recipe the ``_ensure_trained_weights``
    fingerprint rides) and appended to the ``labeled/`` training
    corpus under per-batch file names (replay-idempotent) and merged
    into the BOUNDED ``train_sample/`` store — the ``retain_docs``
    smallest rows by (md5(id), id) over all arrivals, a deterministic
    fixed-size sample maintained at O(sample + batch) per fold (r11:
    retires the O(history) refit); (2) every
    ``refit_every`` folds — a corpus-version boundary — the model
    retrains on the bounded sample (== every labeled arrival while
    history fits ``retain_docs``), the keep threshold is
    recalibrated at the class-mean midpoint over the training corpus
    (``train_then_gate``'s calibration; pass ``threshold_micro`` to
    pin it instead), and the (model, threshold) pair hot-swaps the
    ``weights/`` store via the crash-safe stage/commit rename pair,
    so a concurrent or later reader sees either the previous full
    model or the new full model, NEVER a mixture (a torn swap
    recovers to the previous version at the next fold's
    ``_recover_store``); (3) the
    batch is scored by the CURRENT stored model
    (``trained_classifier_gate`` — broadcast model join, batch-linear)
    and ``sink(verdicts_df, batch_id)`` receives (id, n_tokens,
    score_micro, keep, model_version) — ``model_version`` is the
    boundary batch id, so downstream consumers can attribute every
    admission decision to the exact model that made it.

    100 TB shape: training cost is paid once per corpus version and
    BOUNDED by ``retain_docs`` (one tokenize pass over the fixed-size
    sample + per-round broadcast-join aggregates — see ext/train.py's
    overflow/scale docstring), scoring is one broadcast join per
    batch, and the model table is n_buckets rows — every per-fold cost
    is flat in stream history.  Compose with :func:`run_streaming_curation_gate` by feeding
    the gate's keep=1 survivors (or score_micro as its quality column)
    — examples/curate_index_pipeline.py wires the full loop.
    Self-compacts the labeled corpus every ``compact_every`` folds
    (r10; 0 = off; the weights and train_sample tables are single
    swaps and never fragment).

    Retention policy: ``labeled/`` keeps EVERY labeled arrival by
    design — it is the auditable training-corpus record (what did
    model version V train on? — answerable from the sample's
    deterministic (md5, id) rule over the history), and nothing on
    the serving path reads it (the refit reads only the bounded
    sample), so its growth costs bytes, not latency.  Self-compaction
    bounds its FILE count; when bytes matter, archive or truncate it
    externally — the gate never needs rows that have already passed
    through the sample merge."""

    key_of = _epoch_keyer(checkpoint_dir)

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        key = key_of(batch_id)
        if compact_every and batch_id and batch_id % compact_every == 0:
            _self_compact(spark, state_dir, key, compact_target_bytes)
        sink(
            trained_gate_fold(
                spark,
                batch_df,
                state_dir,
                label_expr,
                int(batch_id),
                refit_every,
                id_col,
                text_col,
                n_buckets,
                n_iters,
                lr_inv,
                threshold_micro,
                batch_key=key,
                retain_docs=retain_docs,
            ),
            batch_id,
        )

    writer = stream_df.writeStream.foreachBatch(handle_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
