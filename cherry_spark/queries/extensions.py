"""Extension operator queries (SURVEY §2.10): dedup, similarity search,
text analysis on the documents/embeddings fixtures.

Oracle notes: every operator here has an exact DuckDB twin except the
IVF search (approximate by construction, prebuilt-index probe). The
hash-family tricks that make that possible: simhash uses md5 limbs
(portable), minhash-LSH is compared against the exact-Jaccard ground
truth its verify stage recomputes, and hyperplane-LSH oracles are
GENERATED from the same plane constants with fold-order-exact
unrolled dots.

Cross-engine float rule: cosine similarities are ROUND(·, 6) in both
engines — the dot-product fold order differs between engines, so raw
doubles can differ in the last ulp.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cherry_spark.catalog import query
from cherry_spark.ext.dedup import (
    connected_components,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash64,
)
from cherry_spark.ext.ivf import ivf_topk_oracle_sql, knn_graph_oracle_sql
from cherry_spark.ext.quantize import quantized_rerank_oracle_sql
from cherry_spark.ext.similarity import brute_force_topk, lsh_bucket_topk
from cherry_spark.ext.text import (
    LANG_STOPWORDS,
    doc_fingerprint,
    language_id,
    quality_score,
    text_stats_columns,
    token_count,
)
from cherry_spark.sources.tables import load_table

_TOKS = "list_filter(string_split(text, ' '), t -> t != '')"


@query(
    "text_stats",
    oracle=f"""
    SELECT doc_id,
           length(text) AS n_chars,
           len({_TOKS}) AS n_words,
           round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
                 / length(text), 6) AS alpha_ratio,
           round(list_sum(list_transform({_TOKS}, t -> length(t)))::DOUBLE
                 / greatest(len({_TOKS}), 1), 6) AS avg_word_len
    FROM documents
    """,
    doc="Per-document text statistics (length/word/alpha ratios) — "
    "native regexp+array exprs, one scan.",
)
def text_stats(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    stats = text_stats_columns(F.col("text"))
    return docs.select(
        "doc_id",
        stats["n_chars"].alias("n_chars"),
        stats["n_words"].alias("n_words"),
        stats["alpha_ratio"].alias("alpha_ratio"),
        stats["avg_word_len"].alias("avg_word_len"),
    )


@query(
    "token_count",
    oracle="""
    SELECT lang,
           CAST(SUM(len(regexp_extract_all(text, '[A-Za-z0-9]+'))) AS BIGINT)
               AS total_tokens,
           COUNT(*) AS n_docs
    FROM documents
    GROUP BY lang
    """,
    doc="Token counting (alnum-run regexp proxy for BPE) aggregated per "
    "language label.",
)
def token_count_query(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.sum(token_count(F.col("text"))).alias("total_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )


def _lang_hits_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
    return f"len(list_filter({_TOKS}, t -> list_contains([{words}], t)))"


@query(
    "lang_id",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang AS label,
               {_lang_hits_sql('de')} AS h_de,
               {_lang_hits_sql('en')} AS h_en,
               {_lang_hits_sql('es')} AS h_es,
               {_lang_hits_sql('fr')} AS h_fr,
               {_lang_hits_sql('zh')} AS h_zh
        FROM documents
    )
    SELECT doc_id, label,
           CASE
             WHEN greatest(h_de, h_en, h_es, h_fr, h_zh) = 0 THEN 'und'
             WHEN h_de = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'de'
             WHEN h_en = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'en'
             WHEN h_es = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'es'
             WHEN h_fr = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'fr'
             ELSE 'zh'
           END AS predicted
    FROM scored
    """,
    doc="Language-ID heuristic: stopword-hit argmax with alphabetical "
    "tiebreak (lexicons in ext/text.py).",
)
def lang_id(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("lang").alias("label"),
        language_id(F.col("text")).alias("predicted"),
    )


@query(
    "doc_fingerprint",
    oracle=f"""
    SELECT doc_id,
           CAST(CASE WHEN len({_TOKS}) > 0 THEN
             list_sum(list_transform({_TOKS},
                 (t, i) -> i::BIGINT * (31 * length(t) + ascii(t))))
             % 1000000007
           ELSE 0 END AS BIGINT) AS fingerprint
    FROM documents
    """,
    doc="Order-sensitive rolling document fingerprint: position-weighted "
    "word-hash sum mod p (DuckDB list lambdas are 1-based, matching the "
    "Spark sequence(1, n) form).",
)
def doc_fingerprint_query(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", doc_fingerprint(F.col("text")).alias("fingerprint"))


@query(
    "quality_score",
    oracle=f"""
    SELECT doc_id,
           round(
             0.4 * least(len({_TOKS})::DOUBLE / 64.0, 1.0)
           + 0.4 * round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
                         / length(text), 6)
           + 0.2 * least(
               (len(list_filter({_TOKS},
                    t -> list_contains(['the','and','of','to','data'], t)))::DOUBLE
                / greatest(len({_TOKS}), 1)) * 5.0, 1.0)
           , 6) AS quality
    FROM documents
    """,
    doc="Heuristic quality score (length + alpha-ratio + stopword terms, "
    "C4/Gopher-rule family shape).",
)
def quality_score_query(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", quality_score(F.col("text")).alias("quality"))


@query(
    "exact_dedup_docs",
    oracle="""
    SELECT lang, source, doc_id, n_chars
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY lang, source ORDER BY n_chars DESC, doc_id
        ) AS rn
        FROM documents
    ) WHERE rn = 1
    """,
    doc="Exact dedup keep-best: one row per (lang, source) keeping the "
    "longest doc — row_number window, single shuffle on the dedup key.",
)
def exact_dedup_docs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(
        docs, ["lang", "source"], order_by=[F.col("n_chars").desc(), F.col("doc_id")]
    ).select("lang", "source", "doc_id", "n_chars")


@query(
    "ngram_jaccard_pairs",
    oracle="""
    WITH raw AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(greatest(len(list_filter(string_split(text,' '), t -> t != '')) - 2, 0)),
                   i -> concat_ws(' ',
                        list_filter(string_split(text,' '), t -> t != '')[i+1],
                        list_filter(string_split(text,' '), t -> t != '')[i+2],
                        list_filter(string_split(text,' '), t -> t != '')[i+3])
               )) AS sh
        FROM documents
    ),
    posting AS (SELECT doc_id, s FROM raw, UNNEST(sh) AS u(s)),
    keepable AS (SELECT s FROM posting GROUP BY s HAVING COUNT(*) <= 500),
    docs AS (
        SELECT p.doc_id, list(p.s) AS sh
        FROM posting p JOIN keepable k USING (s)
        GROUP BY p.doc_id
    )
    SELECT a.doc_id AS id1, b.doc_id AS id2,
           len(list_intersect(a.sh, b.sh))::DOUBLE
             / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
    FROM docs a JOIN docs b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
          / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.6
    """,
    doc="EXACT n-gram Jaccard near-dup pairs over the FULL corpus (the "
    "round-1 doc_id%5 subset happened to exclude every planted near-dup "
    "pair, making the driver check vacuous — 25 pairs at sf0.01 now). "
    "Both engines measure Jaccard over the capped shingle profile "
    "(doc_freq <= 500; boilerplate shingles carry no near-dup signal), "
    "so the match holds on clone-class corpora too. Spark uses the "
    "scalable inverted-shingle-index plan (explode + equi-join + "
    "count, never n²); the oracle cross-joins the same profile "
    "directly — same result, which is the point: the distributed plan "
    "is a pure optimization.",
)
def ngram_jaccard_pairs_query(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    postings = spark.read.parquet(_ensure_shingle_postings(spark, sf_dir))
    return ngram_jaccard_pairs(docs, threshold=0.6, postings=postings)


@query(
    "minhash_lsh_dedup",
    oracle="""
    WITH docs AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(greatest(len(list_filter(string_split(text,' '), t -> t != '')) - 2, 0)),
                   i -> concat_ws(' ',
                        list_filter(string_split(text,' '), t -> t != '')[i+1],
                        list_filter(string_split(text,' '), t -> t != '')[i+2],
                        list_filter(string_split(text,' '), t -> t != '')[i+3])
               )) AS sh
        FROM documents
    )
    SELECT a.doc_id AS id1, b.doc_id AS id2,
           len(list_intersect(a.sh, b.sh))::DOUBLE
             / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
    FROM docs a JOIN docs b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
          / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8
    """,
    doc="MinHash(128) + 32-band LSH candidates over the FULL corpus, "
    "verified with exact shingle Jaccard >= 0.8. The oracle is the "
    "ground truth itself — ALL pairs with exact Jaccard >= 0.8 via a "
    "plain cross join: because the LSH stage only prunes candidates "
    "and the verify stage recomputes exact Jaccard, the outputs are "
    "equal whenever banding recall is 1, which holds deterministically "
    "on this corpus (checked: identical 25 pairs + values at sf0.01). "
    "At 1-(1-J^4)^32, a true pair at J=0.8 is missed with p < 1e-7. "
    "The Spark side remains the scalable plan: banded equi-join "
    "candidates, never n² — served from a fingerprinted stored "
    "signature table (computed once per corpus version, the "
    "_ensure_ivf_index precedent: signatures are corpus state built "
    "at ingest, not per-dedup-run work; test_ext.py certifies "
    "stored ≡ inline).",
)
def minhash_lsh_dedup(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    sigs = spark.read.parquet(_ensure_minhash_signatures(spark, sf_dir))
    # verification shingle sets served from the posting store too
    # (r15): with both stores the query's only live text pass is gone
    # — candidates from stored signatures, verification sets from
    # stored postings, values bit-identical (full profile either way)
    posts = spark.read.parquet(_ensure_shingle_postings(spark, sf_dir))
    return minhash_lsh_pairs(
        docs, jaccard_threshold=0.8, signatures=sigs, corpus_postings=posts
    )


def _fingerprinted_store_dir(
    sf_dir: str, source: str, name: str, epoch: str
) -> str:
    """The ONE definition of the store fingerprint contract (was
    copy-pasted across doc/ivf/delta/bm25 ensures — review r9):
    key = sha1(epoch | source path | size | mtime_ns), dir under the
    system temp dir. An in-place rewrite of the source gets a NEW
    store (no stale serve); runs over different corpus versions never
    race on a directory; ``epoch`` is bumped on arithmetic/layout
    changes so stale pre-change stores never serve."""
    import hashlib
    import os
    import tempfile

    src = os.path.join(os.path.abspath(sf_dir), f"{source}.parquet")
    stamp = f"{epoch}|{src}"
    if os.path.exists(src):
        st = os.stat(src)
        stamp = f"{epoch}|{src}|{st.st_size}|{st.st_mtime_ns}"
    key = hashlib.sha1(stamp.encode()).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"cherry_{name}_{key}")


def _ensure_doc_store(spark, sf_dir, name: str, epoch: str, build) -> str:
    """Build-once fingerprinted derived-table store over the sf_dir's
    documents — the ``_ensure_ivf_index`` pattern applied to the dedup
    family: signatures/postings/fingerprints are corpus state computed
    at ingest (``delta_dedup`` and the streaming gate already treat
    them that way), so the per-run cost of a static dedup query is the
    pair/bucket job only. Fingerprint/staleness contract:
    :func:`_fingerprinted_store_dir`. ``build(docs) -> DataFrame``
    produces the stored table."""
    import os

    from cherry_spark.writers import store

    store_dir = _fingerprinted_store_dir(sf_dir, "documents", name, epoch)
    # readiness = a committed pointer (r13, writers/store.py — or the
    # legacy flat _SUCCESS): an interrupted build leaves an invisible
    # orphan version and gets rebuilt, never served; concurrent
    # builders race benignly (identical content per the fingerprint)
    if not store.ready(store_dir):
        docs = load_table(spark, sf_dir, "documents", parallelize=True)
        store.publish(build(docs), store_dir)
    return store.data_dir(store_dir)


def _ensure_minhash_signatures(spark, sf_dir) -> str:
    """MinHash(128) signature store ("v2" = linear portable-family
    epoch)."""
    from cherry_spark.ext.dedup import minhash_signatures

    return _ensure_doc_store(spark, sf_dir, "minhash", "v2", minhash_signatures)


def _ensure_shingle_postings(spark, sf_dir) -> str:
    """Distinct 3-gram shingle posting store (id, shingle, df) — serves
    every shingle-set consumer (exact-Jaccard pairs, clustering,
    keep-best) so the corpus is tokenized+shingled once per corpus
    version, not once per query. ``df`` (v2, r15) is the per-shingle
    document frequency, attached with one rollup+join at BUILD time:
    postings are distinct (id, shingle), so any consumer's capped
    profile (doc_freq <= cap, any cap) becomes a pushed-down scan
    predicate instead of a query-time doc-freq aggregate + broadcast
    anti-join (see ngram_jaccard_pairs / jaccard_topk df lanes)."""
    from cherry_spark.ext.dedup import shingle_postings

    def build(d):
        p = shingle_postings(d)
        dfreq = p.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        return p.join(dfreq, "shingle").select("id", "shingle", "df")

    return _ensure_doc_store(spark, sf_dir, "postings", "v2", build)


def _ensure_positional_postings(spark, sf_dir) -> str:
    """Positional posting store (doc_id, pos, term) for exact-phrase
    search — tokenize+posexplode once per corpus version (r9; the
    _ensure_shingle_postings contract at position granularity)."""
    from cherry_spark.ext.phrase import positional_postings

    return _ensure_doc_store(
        spark, sf_dir, "pospostings", "v1", lambda d: positional_postings(d)
    )


def _ensure_jaccard_pairs(spark, sf_dir, threshold: float = 0.6) -> str:
    """Exact-Jaccard pair-graph store (id1, id2, jaccard) at the given
    threshold, derived from the shingle-posting store — the pair table
    every cluster consumer (min-label CC, star CC, keep-best) iterates
    over. Production pipelines persist exactly this artifact between
    pair generation and clustering; serving it store-backed makes a
    cluster query's per-run cost the CC iterations, not a recompute of
    the candidate join (the pair query itself, ngram_jaccard_pairs,
    still measures pair generation live). Threshold is part of the
    store name so different profiles never share state."""
    from cherry_spark.ext.dedup import ngram_jaccard_pairs

    def build(docs):
        postings = spark.read.parquet(_ensure_shingle_postings(spark, sf_dir))
        return ngram_jaccard_pairs(docs, threshold=threshold, postings=postings)

    return _ensure_doc_store(
        spark, sf_dir, f"jacpairs{int(round(threshold * 100))}", "v1", build
    )


def _ensure_simhash_fingerprints(spark, sf_dir) -> str:
    """64-bit SimHash fingerprint store (id, fingerprint)."""
    from cherry_spark.ext.dedup import simhash64

    return _ensure_doc_store(spark, sf_dir, "simhash", "v1", simhash64)


# shared recursive-CTE prefix: exact-Jaccard pair graph -> transitive
# closure -> (doc_id, cluster_id = min member) labels. The keepable
# filter mirrors the operator's capped profile (doc_freq <= 500 — see
# ext/dedup.py:ngram_jaccard_pairs), so the oracle agrees with Spark
# on clone-class corpora too.
_CLUSTER_LABELS_CTE = """
    WITH RECURSIVE raw AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(greatest(len(list_filter(string_split(text,' '), t -> t != '')) - 2, 0)),
                   i -> concat_ws(' ',
                        list_filter(string_split(text,' '), t -> t != '')[i+1],
                        list_filter(string_split(text,' '), t -> t != '')[i+2],
                        list_filter(string_split(text,' '), t -> t != '')[i+3])
               )) AS sh
        FROM documents
    ),
    posting AS (SELECT doc_id, s FROM raw, UNNEST(sh) AS u(s)),
    keepable AS (SELECT s FROM posting GROUP BY s HAVING COUNT(*) <= 500),
    docs AS (
        SELECT p.doc_id, list(p.s) AS sh
        FROM posting p JOIN keepable k USING (s)
        GROUP BY p.doc_id
    ),
    pairs AS (
        SELECT a.doc_id AS id1, b.doc_id AS id2
        FROM docs a JOIN docs b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
              / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.6
    ),
    edges AS (
        SELECT id1 AS s, id2 AS d FROM pairs
        UNION
        SELECT id2 AS s, id1 AS d FROM pairs
    ),
    reach(node, r) AS (
        SELECT s, s FROM edges
        UNION
        SELECT e.s, r.r FROM edges e JOIN reach r ON e.d = r.node
    ),
    labels AS (
        SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node
    )
    """

_DEDUP_CLUSTERS_ORACLE = (
    _CLUSTER_LABELS_CTE
    + """
    SELECT l.doc_id, l.cluster_id, CAST(c.n AS BIGINT) AS cluster_size
    FROM labels l
    JOIN (SELECT cluster_id, count(*) AS n FROM labels GROUP BY cluster_id) c
      USING (cluster_id)
    """
)


@query(
    "dedup_clusters",
    oracle=_DEDUP_CLUSTERS_ORACLE,
    doc="Duplicate-cluster formation: connected components over the "
    "exact-Jaccard near-dup pair graph (cluster_id = smallest member "
    "id, plus cluster size) — the step that turns pairwise matches "
    "into keep-one-per-group decisions when similarity is not "
    "transitive. Spark runs driver-coordinated min-label propagation "
    "(two shuffles per round, rounds = label-hop diameter, convergence "
    "probed by an aggregate — never a data collect); the oracle is a "
    "DuckDB recursive-CTE transitive closure over the same pairs. "
    "Genuinely iterative, so this is the one query family where a "
    "declarative single plan can't express the operator.",
)
def dedup_clusters(spark, sf_dir):
    return _dedup_clusters(spark, sf_dir, "minlabel")


@query(
    "dedup_clusters_star",
    oracle=_DEDUP_CLUSTERS_ORACLE,
    doc="Same duplicate-cluster output computed by the alternating "
    "large-star/small-star edge rewrites (Kiveris et al., SoCC 2014) "
    "instead of min-label propagation: every round re-hangs only the "
    "strictly-larger neighbors of each node onto its local minimum, so "
    "celebrity-node degree splits across rounds instead of "
    "concentrating behind one hot label key — the variant to prefer "
    "when components are huge or degree heavy-tailed. Hash-compared "
    "against the identical recursive-CTE oracle as dedup_clusters, so "
    "the two Spark algorithms are certified equivalent by the driver "
    "itself (ext/dedup.py:_cc_two_phase_star).",
)
def dedup_clusters_star(spark, sf_dir):
    return _dedup_clusters(spark, sf_dir, "star")


def _dedup_clusters(spark, sf_dir, algorithm):
    pairs = spark.read.parquet(_ensure_jaccard_pairs(spark, sf_dir, threshold=0.6))
    cc = connected_components(pairs, algorithm=algorithm)
    sizes = cc.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return cc.join(sizes, "cluster_id").select(
        F.col("id").alias("doc_id"), "cluster_id", "cluster_size"
    )


@query(
    "cluster_keep_best",
    oracle=_CLUSTER_LABELS_CTE
    + f""",
    q AS (
        SELECT doc_id,
               round(
                 0.4 * least(len({_TOKS})::DOUBLE / 64.0, 1.0)
               + 0.4 * round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
                             / length(text), 6)
               + 0.2 * least(
                   (len(list_filter({_TOKS},
                        t -> list_contains(['the','and','of','to','data'], t)))::DOUBLE
                    / greatest(len({_TOKS}), 1)) * 5.0, 1.0)
               , 6) AS quality
        FROM documents
    ),
    ranked AS (
        SELECT l.cluster_id, l.doc_id, q.quality,
               ROW_NUMBER() OVER (
                   PARTITION BY l.cluster_id
                   ORDER BY q.quality DESC, l.doc_id
               ) AS rn,
               COUNT(*) OVER (PARTITION BY l.cluster_id) AS n
        FROM labels l JOIN q USING (doc_id)
    )
    SELECT cluster_id, doc_id AS keep_doc_id,
           CAST(n AS BIGINT) AS n_members, quality AS best_quality
    FROM ranked WHERE rn = 1
    """,
    doc="Canonical-document selection: after near-dup clustering, keep "
    "exactly one representative per duplicate cluster — the "
    "highest-quality member (C4/Gopher-style heuristic score, doc_id "
    "tiebreak). This is the decision step a dedup pipeline actually "
    "ships: pairs -> clusters -> keep list. The per-cluster window "
    "ranks only cluster members (cluster-size-bounded partitions, "
    "never corpus-bounded), and the quality score is one scan's worth "
    "of column expressions joined onto the labels.",
)
def cluster_keep_best(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    pairs = spark.read.parquet(_ensure_jaccard_pairs(spark, sf_dir, threshold=0.6))
    cc = connected_components(pairs)
    q = docs.select("doc_id", quality_score(F.col("text")).alias("quality"))
    joined = cc.select(F.col("id").alias("doc_id"), "cluster_id").join(q, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality").desc(), F.col("doc_id")
    )
    wn = Window.partitionBy("cluster_id")
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .withColumn("n_members", F.count(F.lit(1)).over(wn))
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("keep_doc_id"),
            F.col("n_members").cast("long").alias("n_members"),
            F.col("quality").alias("best_quality"),
        )
    )


@query(
    "embedding_quantize_audit",
    oracle="""
    WITH pe AS (
        -- embedding IS NOT NULL keeps parity with Spark's posexplode,
        -- which silently drops null-array rows
        SELECT vec_id, g.i, embedding[g.i]::DOUBLE AS v
        FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS g(i)
        WHERE embedding IS NOT NULL
    ),
    stats AS (SELECT i, min(v) AS mn, max(v) AS mx FROM pe GROUP BY i),
    e AS (
        SELECT pe.vec_id,
               CASE WHEN s.mx > s.mn
                    THEN CAST(round((pe.v - s.mn)/(s.mx - s.mn)*255, 0) AS INT)
                    ELSE 0 END AS qv,
               abs(pe.v - ((CAST(CASE WHEN s.mx > s.mn
                    THEN CAST(round((pe.v - s.mn)/(s.mx - s.mn)*255, 0) AS INT)
                    ELSE 0 END AS DOUBLE)/255)*(s.mx - s.mn) + s.mn)) AS err
        FROM pe JOIN stats s USING (i)
    )
    SELECT vec_id,
           CAST(sum(qv) AS BIGINT) AS qsum,
           round(CAST(sum(CAST(round(err*1000000000.0, 0) AS BIGINT)) AS DOUBLE)
                 / count(*) / 1000000000.0, 6) AS mean_abs_err,
           round(max(err), 6) AS max_abs_err
    FROM e GROUP BY vec_id
    """,
    doc="Int8 scalar quantization of the embedding corpus with a "
    "per-vector reconstruction audit (exact integer code checksum, "
    "mean/max |v - dequant(quant(v))|) — the 4x vector-compression "
    "step before ANN indexing at scale. Per-dimension [min,max] is a "
    "64-row aggregate broadcast back over the corpus; the error mean "
    "is summed in integer nano-units so both engines aggregate "
    "exactly (double fold order differs between engines). "
    "ext/quantize.py.",
)
def embedding_quantize_audit(spark, sf_dir):
    from cherry_spark.ext.quantize import quantize_audit

    emb = load_table(spark, sf_dir, "embeddings")
    return quantize_audit(emb)


def _simhash_oracle() -> str:
    from cherry_spark.ext.dedup import simhash_oracle_sql

    return f"""
    WITH fp AS ({simhash_oracle_sql()})
    SELECT fingerprint, CAST(count(*) AS BIGINT) AS bucket_size,
           min(id) AS keep_doc_id
    FROM fp GROUP BY fingerprint
    """


@query(
    "simhash_dedup",
    oracle=_simhash_oracle(),
    doc="64-bit SimHash fingerprints + bucket sizes (near-dup texts "
    "collide or differ in few bits; compare via bit_count(a^b)). The "
    "md5-limb hash family makes the fingerprint recomputable verbatim "
    "in DuckDB — the oracle SQL is GENERATED by the same module "
    "(ext/dedup.py:simhash_oracle_sql), so engines cannot drift.",
)
def simhash_dedup(spark, sf_dir):
    # served from the fingerprinted store (minhash precedent): the
    # shingle+md5-limb+64-agg fingerprint job runs once per corpus
    # version; the per-run work is one groupBy over (id, fingerprint)
    fp = spark.read.parquet(_ensure_simhash_fingerprints(spark, sf_dir))
    return (
        fp.groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("bucket_size"), F.min("id").alias("keep_doc_id"))
        .filter(F.col("bucket_size") >= 1)
    )


@query(
    "cosine_topk",
    oracle="""
    WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
    scored AS (
        SELECT e.vec_id,
               round(
                 (SELECT SUM(e.embedding[i+1]::DOUBLE * q.qvec[i+1]::DOUBLE)
                  FROM UNNEST(range(64)) AS r(i))
                 / (sqrt((SELECT SUM(e.embedding[i+1]::DOUBLE * e.embedding[i+1]::DOUBLE)
                          FROM UNNEST(range(64)) AS r(i)))
                  * sqrt((SELECT SUM(q.qvec[i+1]::DOUBLE * q.qvec[i+1]::DOUBLE)
                          FROM UNNEST(range(64)) AS r(i))))
               , 6) AS sim
        FROM embeddings e, q
    )
    SELECT vec_id, sim FROM scored ORDER BY sim DESC, vec_id LIMIT 10
    """,
    doc="Brute-force cosine top-k vs the vec_id=0 query vector — "
    "broadcast single-row query side, one corpus pass, TakeOrdered.",
)
def cosine_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    qdf = emb.filter(F.col("vec_id") == 0).select(
        F.lit(0).alias("query_id"), F.col("embedding")
    )
    return brute_force_topk(emb, qdf, k=10).select("vec_id", "sim")


@query(
    "embed_neardup_pairs",
    oracle="""
    WITH sub AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 = 0),
    pairs AS (
        SELECT a.vec_id AS id1, b.vec_id AS id2,
               round(
                 (SELECT SUM(a.embedding[i+1]::DOUBLE * b.embedding[i+1]::DOUBLE)
                  FROM UNNEST(range(64)) AS r(i))
                 / (sqrt((SELECT SUM(a.embedding[i+1]::DOUBLE * a.embedding[i+1]::DOUBLE)
                          FROM UNNEST(range(64)) AS r(i)))
                  * sqrt((SELECT SUM(b.embedding[i+1]::DOUBLE * b.embedding[i+1]::DOUBLE)
                          FROM UNNEST(range(64)) AS r(i))))
               , 6) AS sim
        FROM sub a JOIN sub b ON a.vec_id < b.vec_id
    )
    SELECT id1, id2, sim FROM pairs WHERE sim >= 0.3
    """,
    doc="Embedding-cosine near-duplicate pairs — EXACT result via "
    "1-Bucket-Theta block-grid decomposition (ext/similarity.py:"
    "blocked_pairs_exact): rows fan out to grid cells by narrow "
    "explode, the n² compare arrives as a composite-key equi-join "
    "on (b1, b2), never a nested-loop theta join. The oracle is the "
    "plain all-pairs ground truth, so the match proves the blocked "
    "plan is a pure physical optimization.",
)
def embed_neardup_pairs(spark, sf_dir):
    from cherry_spark.ext.similarity import blocked_pairs_exact

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 5 == 0)
    return blocked_pairs_exact(emb, threshold=0.3, n_blocks=4)


def _jaccard_topk_oracle() -> str:
    from cherry_spark.ext.dedup import jaccard_topk_oracle_sql

    return jaccard_topk_oracle_sql(k=5, query_ids=[0, 1, 2], max_shingle_freq=5)


@query(
    "jaccard_topk",
    # all-pairs list_intersect ground truth over the CAPPED profile:
    # the match certifies the inverted-index + broadcast-anti-join +
    # salted-partial plan as a physical optimization. Cap=5 here
    # (operator default 500) so the gate corpus actually exercises the
    # hot-shingle drop: 29 shingles exceed df 5 at sf0.01.
    oracle=_jaccard_topk_oracle(),
    doc="Text similarity SEARCH (lexical counterpart of cosine_topk): "
    "top-k most Jaccard-similar corpus docs per query doc over "
    "distinct 3-gram shingle sets, measured on the capped profile "
    "(corpus doc_freq <= cap, modeled identically in the oracle) — "
    "hot boilerplate shingles are dropped from both posting sides "
    "via a broadcast anti-join BEFORE the candidate shuffle, so a "
    "'terms of service' shingle can no longer fan the candidate join "
    "toward query x corpus; then the same salted two-phase JVM top-k "
    "as brute_force_topk (ext/dedup.py:jaccard_topk).",
)
def jaccard_topk_q(spark, sf_dir):
    from cherry_spark.ext.dedup import jaccard_topk

    # parallelize: the cap's doc-freq rollup + the candidate join are
    # both map-heavy pre-shuffle stages over the single-row-group
    # fixture scan — measured 2.48 -> 1.63 s warm at sf0.1
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    q = docs.filter(F.col("doc_id").isin(0, 1, 2)).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    # corpus postings served from the shared fingerprinted store (the
    # ngram family's _ensure_shingle_postings; identical rows, so the
    # capped profile and every count are unchanged — oracle-verified)
    cp = spark.read.parquet(_ensure_shingle_postings(spark, sf_dir))
    return jaccard_topk(None, q, k=5, max_shingle_freq=5, corpus_postings=cp)


def _mmr_oracle() -> str:
    from cherry_spark.ext.mmr import mmr_topk_oracle_sql

    return mmr_topk_oracle_sql(
        dim=64, k=5, n_candidates=20, lam=0.7, query_ids=[0, 1, 2]
    )


@query(
    "mmr_diverse_topk",
    # recursive-CTE generated oracle replays the greedy trajectory
    # step by step; all sims ROUND(·,6), λ/(1−λ) literals generated
    # from the same Python floats, lowest-id tie-breaks — bit-exact
    oracle=_mmr_oracle(),
    doc="MMR-diversified top-k retrieval (Carbonell & Goldstein "
    "1998): two-phase exact top-N candidates (scale path), then a "
    "per-query greedy λ·relevance − (1−λ)·redundancy re-rank over "
    "the bounded candidate set in an applyInPandas cogroup "
    "(ext/mmr.py:mmr_topk) — the de-duplicated retrieval head for "
    "RAG / eval-set selection.",
)
def mmr_diverse_topk(spark, sf_dir):
    from cherry_spark.ext.mmr import mmr_topk

    emb = load_table(spark, sf_dir, "embeddings")
    qdf = emb.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    return mmr_topk(emb, qdf, k=5, n_candidates=20, lam=0.7)


def _ensure_ivf_index(spark, sf_dir) -> str:
    """Build-once fingerprinted IVF index dir for the sf_dir's
    embeddings (n_centroids=16 — the certified parameters shared by
    ann_ivf_topk and semantic_dedup).

    Fingerprint = path + size + mtime of the source parquet: an
    in-place rewrite of the corpus gets a NEW index dir (no stale
    serve), and runs over different corpus versions never race on the
    same directory (ADVICE r2). "v3" = index layout version, bumped
    when the layout gained the persisted probes table (r14 — a v2
    index would silently live-score probes forever); "v2" was the
    id-ordered centroid fold."""
    from cherry_spark.ext.ivf import ivf_build_index, ivf_index_exists

    index_dir = _fingerprinted_store_dir(sf_dir, "embeddings", "ivf", "v3")
    if not ivf_index_exists(index_dir):
        ivf_build_index(
            load_table(spark, sf_dir, "embeddings"), index_dir, n_centroids=16
        )
    return index_dir


def _ensure_lsh_buckets(spark, sf_dir) -> str:
    """Fingerprinted LSH bucket store over the embeddings table (r10):
    ``(vec_id, embedding, __bucket)`` with the registered query's
    plane family (dim=64, n_planes=8 ride the epoch).  Bucket sign
    bits are deterministic given the sha256-derived plane constants,
    so stored ≡ inline bucketing bit-for-bit; serving skips the
    per-run 8-plane × 64-dim fold over every corpus row (the
    `_ensure_minhash_signatures` contract applied to the
    hyperplane-LSH ANN lane)."""
    from cherry_spark.ext.similarity import lsh_bucket
    from cherry_spark.writers import store

    store_dir = _fingerprinted_store_dir(
        sf_dir, "embeddings", "lshb", "v1|d64|p8"
    )
    if not store.ready(store_dir):
        emb = load_table(spark, sf_dir, "embeddings", parallelize=True)
        store.publish(
            emb.select(
                "vec_id",
                "embedding",
                lsh_bucket(F.col("embedding"), 64, 8).alias("__bucket"),
            ),
            store_dir,
        )
    return store.data_dir(store_dir)



def _ensure_quant_stats(spark, sf_dir) -> str:
    """Per-dimension (i, mn, mx) quantization stats store over the
    embeddings table (r15): the 64-row dim table every int8 encode /
    decode shares, computed once per corpus version instead of one
    full scan+explode+aggregate pass per query run."""
    from cherry_spark.ext.quantize import dim_stats_table
    from cherry_spark.writers import store

    store_dir = _fingerprinted_store_dir(sf_dir, "embeddings", "qstats", "v1")
    if not store.ready(store_dir):
        emb = load_table(spark, sf_dir, "embeddings", parallelize=True)
        store.publish(dim_stats_table(emb), store_dir)
    return store.data_dir(store_dir)


def _ensure_quant_codes(spark, sf_dir) -> str:
    """int8 code-table store (vec_id, qvec) over the embeddings table
    (r15) — the materialized form of quantized_rerank_topk's own
    contract ("stage 1 scans only the quantized code table"): codes
    are corpus state quantized once per corpus version against the
    stored stats, by the SAME ``_codes`` expression the live search
    path runs (stored ≡ live bit-for-bit, pinned by test)."""
    from cherry_spark.ext.quantize import codes_against
    from cherry_spark.writers import store

    store_dir = _fingerprinted_store_dir(sf_dir, "embeddings", "qcodes", "v1")
    if not store.ready(store_dir):
        stats = spark.read.parquet(_ensure_quant_stats(spark, sf_dir))
        emb = load_table(spark, sf_dir, "embeddings", parallelize=True)
        store.publish(codes_against(emb, stats), store_dir)
    return store.data_dir(store_dir)


def _semdedup_oracle() -> str:
    from cherry_spark.ext.semdedup import semantic_dedup_oracle_sql

    return semantic_dedup_oracle_sql(dim=64, threshold=0.3, n_centroids=16)


@query(
    "semantic_dedup",
    # generated oracle: shared deterministic-IVF CTEs (bit-exact by
    # the ann_ivf_topk certification) + lower-id EXISTS probe on the
    # ROUND(·,6) cosine — both engines compare the rounded value, so a
    # last-ulp fold divergence cannot flip a verdict
    oracle=_semdedup_oracle(),
    doc="SemDeDup semantic deduplication (Abbas et al. 2023): cluster "
    "embeddings with the deterministic IVF coarse quantizer, then "
    "pairwise-compare ONLY within clusters (Σ|cluster|², never N²) "
    "and drop vectors ≥ threshold-similar to a lower-id cluster-mate. "
    "The corpus self-join runs behind one repartition(centroid_id) "
    "barrier, so the assign pipeline executes once, not per side "
    "(ext/semdedup.py:semantic_dedup).",
)
def semantic_dedup_q(spark, sf_dir):
    from cherry_spark.ext.semdedup import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    # prebuilt assignment from the shared fingerprinted index (same
    # 16-centroid parameters as ann_ivf_topk; test_ivf.py certifies
    # prebuilt ≡ inline) — the per-run cost is the within-cluster
    # pairwise join only, not 6 index-build corpus passes
    from cherry_spark.writers import store as _vstore

    assigned = spark.read.parquet(
        _vstore.data_dir(f"{_ensure_ivf_index(spark, sf_dir)}/corpus")
    ).select("vec_id", "centroid_id")
    return semantic_dedup(emb, threshold=0.3, n_centroids=16, assigned=assigned)


def _semdedup_stats_oracle() -> str:
    from cherry_spark.ext.semdedup import semdedup_cluster_stats_oracle_sql

    return semdedup_cluster_stats_oracle_sql(dim=64, n_centroids=16, max_cluster_size=30)


@query(
    "semdedup_cluster_stats",
    # generated oracle: shared deterministic-IVF CTEs + the same cap
    # rollup posting_skew_stats certifies. Cap=30 here (operator
    # default 500) so the fixture exercises both branches: 11 of 16
    # clusters capped at sf0.01.
    oracle=_semdedup_stats_oracle(),
    doc="Degenerate-cluster monitor for semantic_dedup (the "
    "posting_skew_stats pattern on IVF cluster sizes): n_clusters, "
    "largest cluster, and the within-cluster pair volume a "
    "max_cluster_size cap keeps vs drops. Aggregate-only — sizes, "
    "never members — so the monitor is immune to the degenerate "
    "clusters it measures; pairs_dropped rising means the corpus is "
    "collapsing into few centroids (raise n_centroids or pre-strip "
    "exact dups). ext/semdedup.py:semdedup_cluster_stats.",
)
def semdedup_cluster_stats_q(spark, sf_dir):
    from cherry_spark.ext.semdedup import semdedup_cluster_stats

    emb = load_table(spark, sf_dir, "embeddings")
    from cherry_spark.writers import store as _vstore

    assigned = spark.read.parquet(
        _vstore.data_dir(f"{_ensure_ivf_index(spark, sf_dir)}/corpus")
    ).select("vec_id", "centroid_id")
    return semdedup_cluster_stats(
        emb, n_centroids=16, max_cluster_size=30, assigned=assigned
    )


@query(
    "ann_ivf_topk",
    # The index is fully deterministic (lowest-id seeds, one Lloyd pass
    # with an id-ordered fold, fixed tie-breaks), so the whole
    # build+probe pipeline is reproducible in DuckDB — generated SQL
    # from the same constants, same unrolled IEEE fold technique that
    # certified ann_lsh_topk (ext/ivf.py:ivf_topk_oracle_sql).
    oracle=ivf_topk_oracle_sql(
        dim=64, n_centroids=16, nprobe=4, k=5, query_ids=[0, 1, 2]
    ),
    doc="IVF approximate NN against a PREBUILT inverted-file index: "
    "the corpus is written partitioned by nearest-centroid id ONCE "
    "(ivf_build_index), and each query probes only the nprobe nearest "
    "clusters via a broadcast join that drives partition pruning "
    "(ext/ivf.py:ivf_search). Index build per lookup — the round-1 "
    "shape — is a full corpus rewrite per query at scale.",
)
def ann_ivf_topk(spark, sf_dir):
    from cherry_spark.ext.ivf import ivf_search

    emb = load_table(spark, sf_dir, "embeddings")
    index_dir = _ensure_ivf_index(spark, sf_dir)
    qdf = emb.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    return ivf_search(spark, index_dir, qdf, k=5, nprobe=4)


@query(
    "quantized_rerank_topk",
    # generated beside the implementation (ext/quantize.py:
    # quantized_rerank_oracle_sql): the oracle replays stats ->
    # quantize -> dequantize -> unrolled-IEEE proxy cosine ->
    # rerank-cut -> exact rounded rerank, so the candidate buffer and
    # the final ranking are BOTH in the certified contract.
    oracle=quantized_rerank_oracle_sql(
        dim=64, k=5, rerank=20, query_ids=[0, 1, 2]
    ),
    doc="Two-stage int8 ANN — the 100 TB read path: stage 1 scans only "
    "the quantized code table (4x less IO/memory bandwidth than "
    "float32) and keeps the top-rerank candidates per query by "
    "dequantized-cosine proxy via the salted two-phase JVM top-k; "
    "stage 2 joins candidates back to the float vectors and ranks the "
    "final top-k by EXACT cosine, so quantization error can only cost "
    "recall, never corrupt a reported similarity. Queries are "
    "quantized with the corpus's per-dimension stats (one 64-row "
    "collect). ext/quantize.py:quantized_rerank_topk.",
)
def quantized_rerank_topk_q(spark, sf_dir):
    from cherry_spark.ext.quantize import quantized_rerank_topk

    emb = load_table(spark, sf_dir, "embeddings")
    qdf = emb.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    # stage-1 inputs served from the fingerprinted quantization stores
    # (r15): the live stats pass and the corpus code build move to
    # ingest; the query-side quantize, proxy ranking and exact rerank
    # still compute live from the parquet inputs every run
    stats = spark.read.parquet(_ensure_quant_stats(spark, sf_dir))
    qcodes = spark.read.parquet(_ensure_quant_codes(spark, sf_dir))
    return quantized_rerank_topk(
        emb, qdf, k=5, rerank=20, corpus_codes=qcodes, stats=stats
    )


_SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}
_SPLIT_SALT = "cherry"


def _split_oracle() -> str:
    from cherry_spark.ext.sampling import split_case_sql

    case = split_case_sql("doc_id", _SPLITS, _SPLIT_SALT)
    return f"""
    SELECT doc_id, {case} AS split
    FROM documents
    """


@query(
    "deterministic_split",
    oracle=_split_oracle(),
    doc="Deterministic train/val/test assignment keyed on "
    "md5(doc_id || salt) — a pure function of the row key, so no "
    "repartition, rescale or re-run can move a row across splits "
    "(df.sample() is seeded per-partition and leaks rows between "
    "train and eval whenever the input layout changes). The oracle "
    "CASE expression is generated by the same module "
    "(ext/sampling.py:split_case_sql), so the two engines cannot "
    "drift.",
)
def deterministic_split(spark, sf_dir):
    from cherry_spark.ext.sampling import hash_split

    docs = load_table(spark, sf_dir, "documents")
    return hash_split(docs, "doc_id", _SPLITS, salt=_SPLIT_SALT).select(
        "doc_id", "split"
    )


@query(
    "token_freq_topn",
    oracle=f"""
    SELECT t AS token, COUNT(*) AS n
    FROM documents, UNNEST({_TOKS}) AS u(t)
    GROUP BY t
    ORDER BY n DESC, token
    LIMIT 20
    """,
    doc="Corpus-level token frequency head (Zipf curve / vocabulary "
    "audit): explode whitespace tokens, one hash-aggregate shuffle on "
    "the token, TakeOrderedAndProject top-20 — the map-side partial "
    "count makes the shuffle O(distinct tokens), not O(corpus).",
)
def token_freq_topn(spark, sf_dir):
    from cherry_spark.ext.dedup import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens_col(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(20)
    )


@query(
    "semantic_lexical_agreement",
    oracle=f"""
    WITH sub AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 = 0),
    pairs AS (
        -- zero-norm guard mirrors blocked_pairs_exact: Spark emits
        -- NULL sim there (and drops the pair); an unguarded 0/0 here
        -- is NaN, which DuckDB orders ABOVE the threshold
        SELECT a.vec_id AS id1, b.vec_id AS id2,
               CASE WHEN (SELECT SUM(a.embedding[i+1]::DOUBLE * a.embedding[i+1]::DOUBLE)
                          FROM UNNEST(range(64)) AS r(i)) > 0
                     AND (SELECT SUM(b.embedding[i+1]::DOUBLE * b.embedding[i+1]::DOUBLE)
                          FROM UNNEST(range(64)) AS r(i)) > 0
               THEN round(
                 (SELECT SUM(a.embedding[i+1]::DOUBLE * b.embedding[i+1]::DOUBLE)
                  FROM UNNEST(range(64)) AS r(i))
                 / (sqrt((SELECT SUM(a.embedding[i+1]::DOUBLE * a.embedding[i+1]::DOUBLE)
                          FROM UNNEST(range(64)) AS r(i)))
                  * sqrt((SELECT SUM(b.embedding[i+1]::DOUBLE * b.embedding[i+1]::DOUBLE)
                          FROM UNNEST(range(64)) AS r(i))))
               , 6) END AS sim
        FROM sub a JOIN sub b ON a.vec_id < b.vec_id
    ),
    sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(greatest(len({_TOKS}) - 2, 0)),
                   i -> concat_ws(' ', {_TOKS}[i+1], {_TOKS}[i+2], {_TOKS}[i+3])
               )) AS s
        FROM documents WHERE doc_id % 5 = 0
    )
    SELECT p.id1, p.id2, p.sim,
           CASE WHEN len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) > 0
                THEN len(list_intersect(a.s, b.s))::DOUBLE
                     / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
           END AS jaccard,
           (CASE WHEN len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) > 0
                 THEN len(list_intersect(a.s, b.s))::DOUBLE
                      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
            END) >= 0.6 AS lexical_caught
    FROM pairs p
    JOIN sh a ON a.doc_id = p.id1
    JOIN sh b ON b.doc_id = p.id2
    WHERE p.sim >= 0.3
    """,
    doc="Semantic-vs-lexical dedup agreement audit: embedding-cosine "
    "near-dup pairs (exact block-grid theta join over the doc_id ≡ "
    "vec_id subset) annotated with the same pair's exact shingle "
    "Jaccard and whether lexical dedup at t=0.6 would have caught it "
    "— the calibration table that tells a curator where semantic "
    "dedup adds recall over MinHash. Joins the documents and "
    "embeddings modalities in one plan; shingle sets are map-side "
    "arrays, the pair set is cosine-pruned first.",
)
def semantic_lexical_agreement(spark, sf_dir):
    from cherry_spark.ext.dedup import word_shingles
    from cherry_spark.ext.similarity import blocked_pairs_exact

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 5 == 0)
    sem = blocked_pairs_exact(emb, threshold=0.3, n_blocks=4)
    sh = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 5 == 0)
        .select("doc_id", word_shingles(F.col("text")).alias("s"))
    )
    joined = sem.join(
        sh.withColumnsRenamed({"doc_id": "id1", "s": "sh1"}), "id1"
    ).join(sh.withColumnsRenamed({"doc_id": "id2", "s": "sh2"}), "id2")
    c = F.size(F.array_intersect("sh1", "sh2"))
    denom = F.size("sh1") + F.size("sh2") - c
    jac = F.when(denom > 0, c.cast("double") / denom)
    return joined.select(
        "id1",
        "id2",
        "sim",
        jac.alias("jaccard"),
        (jac >= 0.6).alias("lexical_caught"),
    )


@query(
    "label_centroid_profile",
    oracle="""
    WITH pe AS (
        SELECT label, g.i AS dim_i, embedding[g.i]::DOUBLE AS v
        FROM embeddings, generate_series(1, 64) AS g(i)
        WHERE embedding IS NOT NULL
    )
    SELECT label, CAST(dim_i AS INT) AS dim_i,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(CAST(SUM(CAST(round(v*1000000000.0, 0) AS BIGINT)) AS DOUBLE)
                 / COUNT(*) / 1000000000.0, 6) AS mean_v,
           round(MIN(v), 6) AS min_v,
           round(MAX(v), 6) AS max_v
    FROM pe GROUP BY label, dim_i
    """,
    doc="Per-label embedding centroid profile: exact per-dimension "
    "mean/min/max for every class label — the per-group vector "
    "aggregation that underlies k-means/IVF training, class-centroid "
    "classifiers, and embedding-drift monitoring. One explode + one "
    "hash aggregate (map-side partials absorb the fan-out); means "
    "aggregate in integer nano-units so both engines fold exactly.",
)
def label_centroid_profile(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    pe = emb.select(
        "label", F.posexplode("embedding").alias("i", "vf")
    ).select("label", (F.col("i") + 1).alias("dim_i"), F.col("vf").cast("double").alias("v"))
    return pe.groupBy("label", "dim_i").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(
            F.sum(F.round(F.col("v") * 1e9, 0).cast("long")).cast("double")
            / F.count(F.lit(1))
            / 1e9,
            6,
        ).alias("mean_v"),
        F.round(F.min("v"), 6).alias("min_v"),
        F.round(F.max("v"), 6).alias("max_v"),
    ).select("label", F.col("dim_i").cast("int").alias("dim_i"), "n", "mean_v", "min_v", "max_v")


@query(
    "corpus_report",
    oracle=f"""
    WITH q AS (
        SELECT doc_id, lang, text,
               CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT)
                   AS n_tokens,
               round(
                 0.4 * least(len({_TOKS})::DOUBLE / 64.0, 1.0)
               + 0.4 * round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
                             / length(text), 6)
               + 0.2 * least(
                   (len(list_filter({_TOKS},
                        t -> list_contains(['the','and','of','to','data'], t)))::DOUBLE
                    / greatest(len({_TOKS}), 1)) * 5.0, 1.0)
               , 6) AS quality
        FROM documents
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           round(CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*), 6) AS mean_doc_tokens,
           round(CAST(SUM(CAST(round(quality * 1000000.0, 0) AS BIGINT)) AS DOUBLE)
                 / COUNT(*) / 1000000.0, 6) AS mean_quality,
           CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT) AS exact_dup_docs
    FROM q
    """,
    doc="One-row corpus dashboard: doc/language counts, token volume, "
    "mean document length, mean quality, and the exact-duplicate "
    "surplus (n_docs - distinct text hashes) — the summary a curator "
    "reads before deciding pipeline thresholds. All aggregates are "
    "engine-exact: counts and token sums are integers, and mean "
    "quality is summed in integer micro-units (quality is already "
    "ROUND(·,6)) because a double sum's fold order differs between "
    "engines. One scan, one aggregate.",
)
def corpus_report(spark, sf_dir):
    from cherry_spark.ext.text import quality_score, token_count

    docs = load_table(spark, sf_dir, "documents")
    q = docs.select(
        "lang",
        F.md5("text").alias("h"),
        token_count(F.col("text")).cast("long").alias("n_tokens"),
        quality_score(F.col("text")).alias("quality"),
    )
    return q.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.round(
            F.sum("n_tokens").cast("double") / F.count(F.lit(1)), 6
        ).alias("mean_doc_tokens"),
        F.round(
            F.sum(F.round(F.col("quality") * 1e6, 0).cast("long")).cast("double")
            / F.count(F.lit(1))
            / 1e6,
            6,
        ).alias("mean_quality"),
        (F.count(F.lit(1)) - F.countDistinct("h")).cast("long").alias("exact_dup_docs"),
    )


@query(
    "delta_dedup_verdicts",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id, text,
               list_distinct(list_transform(
                   range(greatest(len({_TOKS}) - 2, 0)),
                   i -> concat_ws(' ', {_TOKS}[i+1], {_TOKS}[i+2], {_TOKS}[i+3])
               )) AS sh
        FROM documents
    ),
    batch AS (SELECT * FROM docs WHERE doc_id % 5 = 0),
    corpus AS (SELECT * FROM docs WHERE doc_id % 5 != 0)
    SELECT b.doc_id AS id,
           CASE WHEN EXISTS (SELECT 1 FROM corpus c
                             WHERE md5(c.text) = md5(b.text))
                THEN 'exact_dup'
                WHEN EXISTS (SELECT 1 FROM corpus c
                             WHERE len(list_intersect(b.sh, c.sh))::DOUBLE
                                   / (len(b.sh) + len(c.sh)
                                      - len(list_intersect(b.sh, c.sh))) >= 0.8)
                THEN 'near_dup'
                ELSE 'unique' END AS verdict
    FROM batch b
    """,
    doc="Incremental ingestion dedup: every incoming-batch document "
    "(doc_id%5=0 plays the batch) classified against the existing "
    "corpus as exact_dup (md5 semi-join), near_dup, or unique. "
    "Certified in candidate-COMPLETE mode (inverted shingle-index "
    "probe batch x corpus, Jaccard from shared-posting counts) so the "
    "verdicts equal the oracle's all-pairs EXISTS ground truth on ANY "
    "fixture — the minhash-banding mode under this exact oracle was a "
    "fragile gate (round-4 ADVICE): banding recall < 1 or a capped "
    "bucket would turn the row red while behaving as designed. The "
    "minhash scale path stays covered by test_ext.py differential "
    "tests. ext/dedup.py:delta_dedup.",
)
def delta_dedup_verdicts(spark, sf_dir):
    from cherry_spark.ext.dedup import delta_dedup

    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    return delta_dedup(corpus, batch, candidate_gen="exact")


def _delta_minhash_oracle() -> str:
    from cherry_spark.ext.dedup import delta_dedup_minhash_oracle_sql

    return delta_dedup_minhash_oracle_sql(
        n_hashes=32, bands=8, jaccard_threshold=0.8, max_bucket_size=1
    )


@query(
    "delta_dedup_minhash_verdicts",
    # generated oracle models the SCALE PATH itself — portable md5
    # minhash signatures, band keys, the corpus-bucket cap, and the
    # batch x corpus candidate join — so banding recall < 1 and capped
    # buckets are part of the certified contract, not threats to it.
    # cap=1 here (operator default 500): the sf0.01 corpus' largest
    # band bucket is 2, and the cap drops exactly one candidate pair
    # (12 near_dups survive vs 13 uncapped), exercising both branches.
    oracle=_delta_minhash_oracle(),
    doc="Incremental ingestion dedup, minhash-banding mode — the 100 TB "
    "production path (corpus signatures precomputable, batch x corpus "
    "band-key join only, degenerate corpus buckets capped before the "
    "probe). Certified with hash_family='md5': signatures are min over "
    "shingles of the linear family (a_i*x + b_i) mod 2^31-1 over the "
    "60-bit md5 base, band keys md5 of the comma-joined row minima — "
    "both recomputable bit-for-bit in DuckDB (pure BIGINT arithmetic "
    "+ the simhash portable-limb trick), so the "
    "oracle replays banding + cap + verify exactly. The candidate-"
    "COMPLETE twin (delta_dedup_verdicts) stays certified against the "
    "all-pairs EXISTS ground truth. ext/dedup.py:delta_dedup.",
)
def delta_dedup_minhash_verdicts(spark, sf_dir):
    from cherry_spark.ext.dedup import delta_dedup

    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    # corpus signatures served from a fingerprinted store — the
    # incremental premise itself (signatures are ingest-time corpus
    # state; only the batch side is hashed per run). Stored ≡ inline
    # is differential-tested in test_ext.py.
    sigs = spark.read.parquet(_ensure_delta_corpus_sigs(spark, sf_dir))
    return delta_dedup(
        corpus,
        batch,
        jaccard_threshold=0.8,
        n_hashes=32,
        bands=8,
        max_bucket_size=1,
        candidate_gen="minhash",
        hash_family="md5",
        corpus_signatures=sigs,
    )


def _ensure_delta_corpus_sigs(spark, sf_dir) -> str:
    """Build-once fingerprinted portable-family signature store for the
    delta-dedup corpus slice (doc_id % 5 != 0, n_hashes=32, md5 family
    — the certified parameters). Same staleness contract as
    `_ensure_minhash_signatures`; "v1" = linear-family epoch."""
    from cherry_spark.ext.dedup import minhash_signatures
    from cherry_spark.writers import store

    sig_dir = _fingerprinted_store_dir(
        sf_dir, "documents", "deltasig", "v1|delta32md5"
    )
    if not store.ready(sig_dir):
        docs = load_table(spark, sf_dir, "documents", parallelize=True)
        corpus = docs.filter(F.col("doc_id") % 5 != 0)
        store.publish(
            minhash_signatures(corpus, n_hashes=32, hash_family="md5"),
            sig_dir,
        )
    return store.data_dir(sig_dir)


@query(
    "posting_skew_stats",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(greatest(len({_TOKS}) - 2, 0)),
                   i -> concat_ws(' ', {_TOKS}[i+1], {_TOKS}[i+2], {_TOKS}[i+3])
               )) AS sh
        FROM documents
    ),
    p AS (SELECT doc_id, s FROM docs, UNNEST(sh) AS u(s)),
    sizes AS (SELECT s, COUNT(*) AS n FROM p GROUP BY s),
    nz AS (SELECT n FROM sizes WHERE n > 1)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(MAX(n) AS BIGINT) AS max_bucket,
           CAST(COALESCE(SUM(CASE WHEN n > 3 THEN 1 ELSE 0 END), 0) AS BIGINT)
               AS n_capped,
           CAST(COALESCE(SUM(CASE WHEN n > 3 THEN n ELSE 0 END), 0) AS BIGINT)
               AS docs_in_capped,
           CAST(COALESCE(SUM(CASE WHEN n > 3 THEN n*(n-1)//2 ELSE 0 END), 0)
                AS BIGINT) AS pairs_dropped,
           CAST(COALESCE(SUM(CASE WHEN n <= 3 THEN n*(n-1)//2 ELSE 0 END), 0)
                AS BIGINT) AS pairs_kept
    FROM nz
    """,
    doc="Skew monitoring for the near-dup candidate caps: corpus-level "
    "posting-list size stats (collision buckets, largest list, and the "
    "candidate-pair volume a cap would keep vs drop). Aggregate-only — "
    "bucket SIZES, never members — so the monitor is immune to the "
    "degenerate buckets it measures. Cap=3 here (operator default 500) "
    "so the fixture corpus exercises both branches: 615 capped buckets "
    "at sf0.01. ext/dedup.py:posting_skew_stats; the minhash-band twin "
    "is band_bucket_stats (xxhash64 band keys aren't recomputable in "
    "DuckDB, so that one is rows-only).",
)
def posting_skew_stats_query(spark, sf_dir):
    from cherry_spark.ext.dedup import posting_skew_stats

    docs = load_table(spark, sf_dir, "documents")
    return posting_skew_stats(docs, max_bucket_size=3)


def _band_stats_oracle() -> str:
    from cherry_spark.ext.dedup import band_bucket_stats_oracle_sql

    # cap=2 (operator default 500): the fixture's largest portable-band
    # bucket is 3, so cap=2 exercises both rollup branches
    return band_bucket_stats_oracle_sql(n_hashes=32, bands=8, max_bucket_size=2)


@query(
    "band_bucket_stats",
    # round 6: the portable md5 minhash family (certified by
    # delta_dedup_minhash_verdicts) makes the band keys recomputable
    # in DuckDB — this query was rows-only through round 5, the last
    # dedup-family query without an oracle.
    oracle=_band_stats_oracle(),
    doc="Per-band monitoring twin of minhash_lsh_pairs' bucket cap: "
    "collision buckets, largest bucket, capped volume per band. "
    "Certified with hash_family='md5' (shared portable-banding CTEs "
    "with the delta-dedup minhash oracle); production jobs use the "
    "xxhash64 family — identical banding logic, cheaper hashes. The "
    "exact-oracle sibling is posting_skew_stats, and the unit test "
    "plants a boilerplate clone class and checks the dropped-pair "
    "accounting. ext/dedup.py:band_bucket_stats.",
)
def band_bucket_stats_query(spark, sf_dir):
    from cherry_spark.ext.dedup import band_bucket_stats

    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    return band_bucket_stats(
        docs, n_hashes=32, bands=8, max_bucket_size=2, hash_family="md5"
    )


def _doc_novelty_oracle() -> str:
    from cherry_spark.ext.dedup import doc_novelty_oracle_sql

    return doc_novelty_oracle_sql(shingle_k=3)


@query(
    "doc_novelty",
    oracle=_doc_novelty_oracle(),
    doc="Corpus-novelty score per document: fraction of its distinct "
    "3-gram shingles that occur in NO other document — the inverse "
    "signal of the boilerplate/dup family, used to prioritize novel "
    "content in a training mix. Tokenize-once postings, one "
    "O(distinct-shingle) doc-freq agg, one equi-join back, one "
    "groupBy(id); integer-exact counts, IEEE-exact final division "
    "(ext/dedup.py:doc_novelty).",
)
def doc_novelty_query(spark, sf_dir):
    from cherry_spark.ext.dedup import doc_novelty

    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    return doc_novelty(docs)


def _lsh_recall_oracle() -> str:
    from cherry_spark.ext.dedup import lsh_recall_audit_oracle_sql

    return lsh_recall_audit_oracle_sql(
        jaccard_threshold=0.8, n_hashes=32, bands=8, max_bucket_size=500
    )


@query(
    "lsh_recall_audit",
    # generated oracle replays the full portable banding pipeline AND
    # the all-pairs ground truth, so the recall measurement itself is
    # hash-certified — not just the two pipelines it compares
    oracle=_lsh_recall_oracle(),
    doc="Banding-recall audit (measure, don't guess): one row of "
    "(n_true, n_lsh, n_missed, recall) comparing exact-Jaccard ground "
    "truth at the threshold vs the banded minhash pipeline's output "
    "with the same caps — the tuning instrument to run on a corpus "
    "sample before committing (n_hashes, bands, cap) to a 100 TB "
    "dedup; the 1-(1-J^r)^b formula assumes uniform hashing, this "
    "measures the real thing including cap-dropped buckets. LSH "
    "output ⊆ ground truth by construction (same verify measure), so "
    "the audit is two counts, no pair join. "
    "ext/dedup.py:lsh_recall_audit.",
)
def lsh_recall_audit_query(spark, sf_dir):
    from cherry_spark.ext.dedup import lsh_recall_audit

    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    # max_docs=None is the EXPLICIT unbounded form: the oracle replays
    # the full corpus and the sf fixture is already sample-sized.  The
    # production default bounds the audit to a deterministic
    # hash-ranked 10k-doc sample (r7 verdict item #9).
    return lsh_recall_audit(
        docs, jaccard_threshold=0.8, n_hashes=32, bands=8,
        max_bucket_size=500, max_docs=None,
    )


@query(
    "tfidf_top_terms",
    oracle=f"""
    WITH tf AS (
        SELECT doc_id, t AS term, COUNT(*) AS tf
        FROM documents, UNNEST({_TOKS}) AS u(t)
        GROUP BY doc_id, t
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               round(tf.tf * (ln((n.n_docs + 1.0) / (dfreq.df + 1.0)) + 1.0), 6)
                   AS tfidf
        FROM tf JOIN dfreq USING (term) CROSS JOIN n
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY doc_id ORDER BY tfidf DESC, term
        ) AS rn FROM scored
    )
    SELECT doc_id, term, tfidf FROM ranked WHERE rn <= 3
    """,
    doc="Per-document top-3 TF-IDF terms (smoothed idf "
    "ln((N+1)/(df+1))+1, sklearn's smoothing) — the keyword/topic "
    "profile step of a corpus analysis pipeline. One tf aggregate, a "
    "df aggregate over it, N as a broadcast 1-row aggregate, then a "
    "doc-bounded ranking window. TRIAGE NOTE: both engines round the "
    "score to 6 digits AND rank on the rounded value, so a 1-ulp ln() "
    "divergence between libm implementations could in principle flip "
    "a row; bit-exact on the shipped fixtures — if this row ever goes "
    "red after a fixture regeneration, compare ln outputs before "
    "suspecting the plan.",
)
def tfidf_top_terms(spark, sf_dir):
    from cherry_spark.ext.dedup import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0))
                    + 1.0
                ),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tfidf")
    )


@query(
    "decontaminate_overlap",
    oracle="""
    WITH sh AS (
        SELECT doc_id, source,
               list_distinct(list_transform(
                   range(greatest(len(list_filter(string_split(text,' '), t -> t != '')) - 3, 0)),
                   i -> concat_ws(' ',
                        list_filter(string_split(text,' '), t -> t != '')[i+1],
                        list_filter(string_split(text,' '), t -> t != '')[i+2],
                        list_filter(string_split(text,' '), t -> t != '')[i+3],
                        list_filter(string_split(text,' '), t -> t != '')[i+4])
               )) AS sh
        FROM documents
    ),
    hits AS (
        SELECT a.doc_id AS doc_id, b.doc_id AS test_id,
               unnest(list_intersect(a.sh, b.sh)) AS shingle
        FROM sh a JOIN sh b
          ON a.source != 'src0' AND b.source = 'src0'
    )
    SELECT doc_id,
           COUNT(DISTINCT shingle) AS n_shared_shingles,
           COUNT(DISTINCT test_id) AS n_test_docs
    FROM hits GROUP BY doc_id
    """,
    doc="Train/eval decontamination: training docs (source != 'src0') "
    "sharing any word 4-shingle with a held-out doc (source = 'src0'). "
    "Spark runs the inverted-index shape (tokenize-once postings, one "
    "shingle equi-join — broadcastable eval side at scale, never "
    "doc×doc); the oracle is the all-pairs list_intersect ground "
    "truth, so the match proves the indexed plan exact "
    "(ext/dedup.py:contamination_overlap).",
)
def decontaminate_overlap(spark, sf_dir):
    from cherry_spark.ext.dedup import contamination_overlap

    docs = load_table(spark, sf_dir, "documents")
    return contamination_overlap(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        shingle_k=4,
    )


def _substr_oracle() -> str:
    from cherry_spark.ext.substr import repeated_substring_spans_oracle_sql

    return repeated_substring_spans_oracle_sql(min_len=8)


@query(
    "repeated_substring_spans",
    oracle=_substr_oracle(),
    doc="ExactSubstr span dedup (Lee et al. 2022, distributed "
    "formulation — ext/substr.py): every MAXIMAL cross-doc token run "
    ">= 8 tokens at any alignment. Stride-1 8-gram postings (linear "
    "in corpus tokens) self-joined on the md5 gram, then one "
    "gaps-and-islands window per (pair, diagonal) merges aligned "
    "hits back into maximal spans — the suffix-array result without "
    "a suffix array. Pure hash/integer lane; the oracle replays "
    "postings, diagonals, and islands exactly.",
)
def repeated_substring_spans_q(spark, sf_dir):
    from cherry_spark.ext.substr import repeated_substring_spans

    # parallelize: the tokenize + per-position md5 gram pipeline is a
    # map-heavy pre-shuffle stage over the single-row-group fixture
    # scan — without the repartition it runs on 1 core of 32, TWICE
    # (once per self-join side; the sides stay canonically identical,
    # so AQE exchange reuse still executes the pipeline once)
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    return repeated_substring_spans(docs, min_len=8)


def _lsh_topk_oracle() -> str:
    from cherry_spark.ext.similarity import lsh_topk_oracle_sql

    return lsh_topk_oracle_sql(dim=64, n_planes=8, k=5, query_ids=[0, 1, 2])


@query(
    "ann_lsh_topk",
    oracle=_lsh_topk_oracle(),
    doc="Approximate NN: random-hyperplane LSH bucket join then exact "
    "cosine within the bucket — the scale path for similarity search. "
    "The oracle SQL is GENERATED from the same sha256-derived plane "
    "constants; Spark's left-fold dot is reproduced as an unrolled "
    "left-associative sum, so bucket sign bits match bit-for-bit "
    "(ext/similarity.py:lsh_topk_oracle_sql). Corpus buckets serve "
    "from a fingerprinted store (r10 — bucket once per corpus "
    "version, search many; stored ≡ inline, test_similarity). BASIS "
    "NOTE: timings before r10 include the corpus bucket fold per "
    "run; from now they measure the serve path.",
)
def ann_lsh_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    qdf = emb.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    bucketed = spark.read.parquet(_ensure_lsh_buckets(spark, sf_dir))
    return lsh_bucket_topk(
        None, qdf, dim=64, k=5, n_planes=8, bucketed=bucketed
    )


@query(
    "knn_graph",
    oracle=knn_graph_oracle_sql(dim=64, n_centroids=16, nprobe=2, k=3),
    doc="Corpus-wide approximate k-NN GRAPH through the IVF index "
    "(ext/ivf.py:knn_graph): every vector's 3 nearest neighbors, self "
    "excluded — the artifact semantic clustering and graph-based "
    "dedup diagnostics consume. Unlike ann_ivf_topk (tiny broadcast "
    "query set) the query side IS the corpus, so the candidate join "
    "is a plain shuffle equi-join on centroid_id — cost "
    "sum(|cluster| * probe-degree), never N². Oracle replays the "
    "deterministic index + probe + exclusion + rank bit-exactly (same "
    "technique as ann_ivf_topk).",
)
def knn_graph_query(spark, sf_dir):
    from cherry_spark.ext.ivf import knn_graph

    emb = load_table(spark, sf_dir, "embeddings")
    # served from the shared prebuilt index (same n_centroids=16 store
    # ann_ivf_topk probes; the index is deterministic so output is
    # identical to an inline build — differential-tested in test_ivf)
    return knn_graph(
        emb, k=3, n_centroids=16, nprobe=2, index_dir=_ensure_ivf_index(spark, sf_dir)
    )


def _ensure_bm25_index(spark, sf_dir) -> str:
    """Fingerprinted prebuilt BM25 index for the sf_dir's documents
    table — the `_ensure_ivf_index` contract (source path + size +
    mtime key under the system temp dir; 'v1' = index layout version).
    Built once per corpus version; every bm25/hybrid serve run then
    skips the corpus tokenize + aggregations (basis note: bm25_topk
    timings before r9 included the index build per run)."""
    from cherry_spark.ext.bm25 import bm25_build_index, bm25_index_exists

    index_dir = _fingerprinted_store_dir(sf_dir, "documents", "bm25", "v1")
    if not bm25_index_exists(index_dir):
        bm25_build_index(
            load_table(spark, sf_dir, "documents", parallelize=True), index_dir
        )
    return index_dir



def _bm25_oracle() -> str:
    from cherry_spark.ext.bm25 import bm25_topk_oracle_sql

    return bm25_topk_oracle_sql(k=5, query_ids=[0, 1, 2])


@query(
    "bm25_topk",
    oracle=_bm25_oracle(),
    doc="BM25 ranked retrieval (ext/bm25.py): top-5 corpus docs per "
    "query doc via the inverted token index — tf/df/doclen hash aggs, "
    "corpus stats as a broadcast 1-row aggregate, candidates from the "
    "postings equi-join (a query only meets docs sharing a term), "
    "salted two-phase top-k. The score lane is FIXED-POINT: per-term "
    "contributions floor to BIGINT micro-units before the order-free "
    "integer sum, so an engine-aggregated double never reaches the "
    "hash compare (the domain_pagerank trick applied to retrieval). "
    "TRIAGE NOTE: a 1-ulp ln() divergence could in principle flip one "
    "floor() at an exact boundary; bit-exact on shipped fixtures.",
)
def bm25_topk_q(spark, sf_dir):
    from cherry_spark.ext.bm25 import bm25_topk

    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    q = docs.filter(F.col("doc_id").isin(0, 1, 2)).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    # served from the prebuilt fingerprinted index (identical results:
    # the index is exact BIGINTs, lossless through parquet —
    # differential-tested in test_bm25.py)
    return bm25_topk(None, q, k=5, index_dir=_ensure_bm25_index(spark, sf_dir))


_DENSE_DOT = (
    "(SELECT SUM(e.embedding[i+1]::DOUBLE * q.embedding[i+1]::DOUBLE)"
    " FROM UNNEST(range(64)) AS r(i))"
)
_DENSE_NORM_E = (
    "sqrt((SELECT SUM(e.embedding[i+1]::DOUBLE * e.embedding[i+1]::DOUBLE)"
    " FROM UNNEST(range(64)) AS r(i)))"
)
_DENSE_NORM_Q = (
    "sqrt((SELECT SUM(q.embedding[i+1]::DOUBLE * q.embedding[i+1]::DOUBLE)"
    " FROM UNNEST(range(64)) AS r(i)))"
)


def _hybrid_oracle() -> str:
    from cherry_spark.ext.bm25 import bm25_topk_oracle_sql
    from cherry_spark.ext.hybrid import rrf_fuse_sql

    bm25 = bm25_topk_oracle_sql(k=10, query_ids=[0, 1, 2])
    fuse = rrf_fuse_sql("lex", "den", k=5, c=60)
    return f"""
    WITH lex AS (
        SELECT query_id, doc_id,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY score_fp DESC, doc_id
               ) AS INTEGER) AS rank
        FROM ({bm25})
    ),
    den_scored AS (
        SELECT q.vec_id AS query_id, e.vec_id AS doc_id,
               round({_DENSE_DOT} / ({_DENSE_NORM_E} * {_DENSE_NORM_Q}), 6)
                   AS sim
        FROM embeddings e,
             (SELECT vec_id, embedding FROM embeddings
              WHERE vec_id IN (0, 1, 2)) q
    ),
    den AS (
        SELECT query_id, doc_id, CAST(rn AS INTEGER) AS rank FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY sim DESC, doc_id
            ) AS rn FROM den_scored
        ) WHERE rn <= 10
    )
    {fuse}
    """


@query(
    "hybrid_rrf_topk",
    oracle=_hybrid_oracle(),
    doc="Hybrid retrieval (ext/hybrid.py): reciprocal-rank fusion of "
    "the BM25 lexical top-10 and the dense cosine top-10 per query "
    "(doc ids and vec ids share the fixture id space). Rank-based "
    "fusion keeps the whole lane exact: ranks are small integers, the "
    "fused score is SCALE//(c+rank) integer division summed as "
    "BIGINT — no float aggregation near the hash compare. The fusion "
    "itself touches only the 2k retrieved rows per query; the corpus "
    "passes live inside the retrievers with their own scale "
    "contracts (postings equi-join / salted two-phase top-k).",
)
def hybrid_rrf_topk(spark, sf_dir):
    from pyspark.sql import Window

    from cherry_spark.ext.bm25 import bm25_topk
    from cherry_spark.ext.hybrid import rrf_fuse
    from cherry_spark.ext.similarity import brute_force_topk

    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    qdocs = docs.filter(F.col("doc_id").isin(0, 1, 2)).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    lex = bm25_topk(
        docs, qdocs, k=10, index_dir=_ensure_bm25_index(spark, sf_dir)
    )
    wl = Window.partitionBy("query_id").orderBy(
        F.col("score_fp").desc(), F.col("doc_id")
    )
    lexr = lex.select(
        "query_id", "doc_id", F.row_number().over(wl).cast("int").alias("rank")
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qemb = emb.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    den = brute_force_topk(emb, qemb, k=10)
    wd = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("vec_id")
    )
    denr = den.select(
        "query_id",
        F.col("vec_id").alias("doc_id"),
        F.row_number().over(wd).cast("int").alias("rank"),
    )
    return rrf_fuse(lexr, denr, k=5, c=60)


_LEAK_SPLITS = {"train": 0.8, "heldout": 0.2}
_LEAK_SALT = "leakage"


def _leakage_split_oracle() -> str:
    from cherry_spark.ext.sampling import split_case_sql

    case = split_case_sql(
        "COALESCE(l.cluster_id, d.doc_id)", _LEAK_SPLITS, salt=_LEAK_SALT
    )
    return (
        _CLUSTER_LABELS_CTE
        + f"""
    SELECT d.doc_id,
           CAST(COALESCE(l.cluster_id, d.doc_id) AS BIGINT) AS group_id,
           {case} AS split,
           CAST(CASE WHEN l.cluster_id IS NOT NULL THEN 1 ELSE 0 END
                AS INTEGER) AS is_clustered
    FROM documents d LEFT JOIN labels l USING (doc_id)
    """
    )


@query(
    "leakage_safe_split",
    oracle=_leakage_split_oracle(),
    doc="Leakage-safe train/heldout split: near-duplicate CLUSTERS "
    "co-travel across the split boundary — a doc's split key is its "
    "connected-component label (from the stored exact-Jaccard pair "
    "graph), so two near-identical docs can never land on opposite "
    "sides and leak eval content into training. Singletons key on "
    "their own id. Composition of certified parts: CC over the "
    "threshold-keyed pair store + the deterministic md5 hash_split "
    "(repartition-stable, engine-portable); membership in a cluster "
    "is itself the is_clustered audit column.",
)
def leakage_safe_split(spark, sf_dir):
    from cherry_spark.ext.sampling import hash_split

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    pairs = spark.read.parquet(
        _ensure_jaccard_pairs(spark, sf_dir, threshold=0.6)
    )
    cc = connected_components(pairs).withColumnsRenamed({"id": "doc_id"})
    grouped = docs.join(cc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("cluster_id", "doc_id").cast("long").alias("group_id"),
        F.col("cluster_id").isNotNull().cast("int").alias("is_clustered"),
    )
    out = hash_split(grouped, "group_id", _LEAK_SPLITS, salt=_LEAK_SALT)
    return out.select("doc_id", "group_id", "split", "is_clustered")


_PMI_MIN_COUNT = 5


@query(
    "collocation_pmi_topn",
    oracle=f"""
    WITH toks AS (
        SELECT t FROM documents, UNNEST({_TOKS}) AS u(t)
    ),
    uni AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY 1),
    n_uni AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uni),
    bi AS (
        SELECT bg, CAST(COUNT(*) AS BIGINT) AS c FROM (
            SELECT bg FROM documents, UNNEST(list_transform(
                range(greatest(len({_TOKS}) - 1, 0)),
                i -> concat_ws(' ', {_TOKS}[i+1], {_TOKS}[i+2])
            )) AS u(bg)
        ) GROUP BY 1
    ),
    m_bi AS (SELECT CAST(SUM(c) AS BIGINT) AS m FROM bi),
    scored AS (
        SELECT b.bg AS bigram, b.c AS n_pair,
               round(ln((CAST(b.c AS DOUBLE) * n.n * n.n)
                        / (CAST(m.m AS DOUBLE) * u1.c * u2.c)), 6) AS pmi
        FROM bi b
        JOIN uni u1 ON u1.t = string_split(b.bg, ' ')[1]
        JOIN uni u2 ON u2.t = string_split(b.bg, ' ')[2]
        CROSS JOIN n_uni n CROSS JOIN m_bi m
        WHERE b.c >= {_PMI_MIN_COUNT}
    )
    SELECT bigram, n_pair, pmi FROM scored
    ORDER BY pmi DESC, bigram LIMIT 20
    """,
    doc="Collocation mining: top-20 adjacent-token bigrams by "
    "pointwise mutual information (min pair count 5) — the "
    "multiword-expression/phrase-boundary instrument of a corpus "
    "analysis stack. Counts are exact integer aggregates; PMI is a "
    "pure SCALAR double on those integers with the expression order "
    "written identically in both engines and rounded to 6 digits "
    "before the rank (the tfidf_top_terms convention, same ln() "
    "TRIAGE NOTE). Shape: one bigram hash agg + one unigram hash agg "
    "+ two broadcast unigram joins + 1-row totals; nothing "
    "corpus x corpus.",
)
def collocation_pmi_topn(spark, sf_dir):
    from cherry_spark.ext.dedup import tokens_col, word_shingles_raw

    docs = load_table(spark, sf_dir, "documents")
    uni = (
        docs.select(F.explode(tokens_col(F.col("text"))).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    n_uni = uni.agg(F.sum("c").cast("long").alias("n"))
    bi = (
        docs.select(
            F.explode(word_shingles_raw(F.col("text"), 2)).alias("bigram")
        )
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
    )
    m_bi = bi.agg(F.sum("n_pair").cast("long").alias("m"))
    u1 = uni.withColumnsRenamed({"t": "__w1", "c": "__c1"})
    u2 = uni.withColumnsRenamed({"t": "__w2", "c": "__c2"})
    scored = (
        bi.where(F.col("n_pair") >= _PMI_MIN_COUNT)
        .withColumn("__w1", F.split("bigram", " ")[0])
        .withColumn("__w2", F.split("bigram", " ")[1])
        .join(F.broadcast(u1), "__w1")
        .join(F.broadcast(u2), "__w2")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(m_bi))
        .select(
            "bigram",
            "n_pair",
            F.round(
                F.log(
                    (F.col("n_pair").cast("double") * F.col("n") * F.col("n"))
                    / (F.col("m").cast("double") * F.col("__c1") * F.col("__c2"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.col("pmi").desc(), "bigram").limit(20)


_PHRASES = [
    (0, "table table"),
    (1, "value fast merge"),
    (2, "scan query big"),
    (3, "the data window"),
]


def _phrase_oracle() -> str:
    from cherry_spark.ext.phrase import phrase_search_topk_oracle_sql

    return phrase_search_topk_oracle_sql(_PHRASES, k=10)


@query(
    "phrase_search_topk",
    oracle=_phrase_oracle(),
    doc="Exact-phrase search over a positional inverted index "
    "(ext/phrase.py): the quoted-query lane next to bm25_topk (bag of "
    "words) and jaccard_topk (set overlap). A phrase of ANY length m "
    "is ONE broadcast join + ONE aggregate — phrase term i at posting "
    "position p votes for start p-i, and exactly-m votes is a "
    "complete occurrence (positions unique per doc) — never m-1 "
    "self-joins. Overlapping occurrences counted; salted two-phase "
    "top-k per phrase. All-integer lane, hash-exact oracle.",
)
def phrase_search_topk_q(spark, sf_dir):
    from cherry_spark.ext.phrase import phrase_search_topk

    phrases = spark.createDataFrame(_PHRASES, "phrase_id long, phrase string")
    # positional postings served from a fingerprinted store (exact
    # integer/string rows — lossless; differential-tested)
    postings = spark.read.parquet(_ensure_positional_postings(spark, sf_dir))
    return phrase_search_topk(None, phrases, k=10, postings=postings)


_HN_POSITIVES = [(q, v) for q in (0, 1, 2) for v in (q, q + 100, q + 200)]


def _hard_negatives_oracle() -> str:
    values = ", ".join(f"({q}, {v})" for q, v in _HN_POSITIVES)
    return f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS qvec FROM embeddings
        WHERE vec_id IN (0, 1, 2)
    ),
    positives(query_id, vec_id) AS (VALUES {values}),
    scored AS (
        SELECT q.query_id, e.vec_id,
               round(
                 (SELECT SUM(e.embedding[i+1]::DOUBLE * q.qvec[i+1]::DOUBLE)
                  FROM UNNEST(range(64)) AS r(i))
                 / (sqrt((SELECT SUM(e.embedding[i+1]::DOUBLE * e.embedding[i+1]::DOUBLE)
                          FROM UNNEST(range(64)) AS r(i)))
                  * sqrt((SELECT SUM(q.qvec[i+1]::DOUBLE * q.qvec[i+1]::DOUBLE)
                          FROM UNNEST(range(64)) AS r(i))))
               , 6) AS sim
        FROM embeddings e, q
    ),
    negs AS (
        SELECT s.query_id, s.vec_id, s.sim
        FROM scored s
        WHERE s.sim < 0.9 AND s.vec_id <> s.query_id
          AND NOT EXISTS (SELECT 1 FROM positives p
                          WHERE p.query_id = s.query_id
                            AND p.vec_id = s.vec_id)
    ),
    ranked AS (
        SELECT query_id, vec_id, sim,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, vec_id) AS rn
        FROM negs
    )
    SELECT query_id, vec_id, sim FROM ranked WHERE rn <= 5
    """


@query(
    "hard_negatives_topk",
    oracle=_hard_negatives_oracle(),
    doc="Hard-negative mining for contrastive training "
    "(ext/similarity.py:hard_negatives_topk): per anchor, the 5 most "
    "similar vectors that may legally be negatives — sim strictly "
    "below the 0.9 near-dup ceiling (the false-negative trap: an "
    "unlabeled near-duplicate used as a negative pushes apart true "
    "positives), anchor excluded, labeled positives removed by "
    "broadcast anti-join. Ceiling applies map-side BEFORE the top-k "
    "shuffle; salted two-phase top-k after.",
)
def hard_negatives_topk_q(spark, sf_dir):
    from cherry_spark.ext.similarity import hard_negatives_topk

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    pos = spark.createDataFrame(_HN_POSITIVES, "query_id long, vec_id long")
    return hard_negatives_topk(emb, q, k=5, neardup_ceiling=0.9, positives=pos)
