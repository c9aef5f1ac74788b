"""Portable Count-Min sketch over token/key streams.

The reference engine has no frequency-sketch operator (its compute
surface stops at the relational steps, ``/root/reference/src`` —
sketching is delegated to user callbacks); this module extends the
training-data toolkit the same way the Bloom gate does
(ext/bloom.py): a sub-linear frequency structure a 100 TB pipeline
needs for heavy-hitter detection (hot domains, boilerplate tokens,
abusive user keys) without a corpus-sized aggregation state.

Why a Count-Min sketch scales:

- the state is a ``depth x width`` BIGINT counter table (KBs) — never
  O(distinct keys);
- the build is ONE explode + ONE groupBy whose key cardinality is
  bounded by ``depth * width``, so the shuffle is constant-size no
  matter how large the corpus (map-side partial counts do the heavy
  lifting);
- sketches are ADDITIVE: cell-wise sum of two sketches equals the
  sketch of the concatenated streams, which makes the structure a
  mergeable streaming-state fold (streaming/continuous.py:
  run_streaming_cms) and embarrassingly partition-parallel;
- the probe is a broadcast join of the tiny cell table followed by a
  ``MIN`` over ``depth`` rows per key — estimates NEVER underestimate
  (every cell the key touches counts every occurrence of the key,
  plus non-negative collision noise), which is the property the
  heavy-hitter gate certifies: a threshold scan over estimates has
  no false negatives, and false positives fall through to an exact
  per-candidate count.

Portability (the oracle story): the same md5-base + fixed linear
family as the minhash oracle lane (ext/dedup.py:
_portable_hash_constants) — one md5 per key for a 60-bit base
(Spark ``conv(substr(md5,1,15),16,10)`` == DuckDB
``('0x'||substr(md5,1,15))::BIGINT``), then ``depth`` buckets via
``((a_i*x + b_i) mod p) mod width`` — pure BIGINT arithmetic both
engines execute identically (products < 2^62, ANSI-safe), so the
DuckDB oracles replay the SKETCH ITSELF bit-for-bit, not a tolerance
band.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cherry_spark.ext.dedup import _PORTABLE_P, _portable_hash_constants

_P = _PORTABLE_P


def _base_x(key: Column) -> Column:
    """60-bit md5 base reduced mod p — the portable-family base hash."""
    return F.pmod(
        F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long"),
        F.lit(_P),
    )


def _base_x_sql(key_expr: str) -> str:
    return f"(('0x' || substr(md5({key_expr}), 1, 15))::BIGINT % {_P})"


def _bucket_array(key: Column, depth: int, width: int) -> Column:
    """Array of ``depth`` bucket ids for one key.

    The md5 base is bound as a transform-lambda VARIABLE so it is
    evaluated ONCE per row — an ``F.array(...)`` built directly over
    the base expression would re-evaluate the md5 per element after
    CollapseProject inlining (the per-ELEMENT trap, CLAUDE.md /
    ext/dedup.py:_stride_chunks).
    """
    consts = _portable_hash_constants(depth)
    return F.flatten(
        F.transform(
            F.array(_base_x(key)),
            lambda x: F.array(
                *[
                    F.pmod(
                        F.pmod(F.lit(a) * x + F.lit(b), F.lit(_P)),
                        F.lit(width),
                    ).cast("int")
                    for a, b in consts
                ]
            ),
        )
    )


def cms_build(
    df: DataFrame,
    key_col: str = "token",
    depth: int = 4,
    width: int = 64,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch: one row per touched cell.

    Returns ``(depth INT, bucket INT, cnt BIGINT)`` — at most
    ``depth * width`` rows regardless of input size. One explode +
    one bounded-cardinality hash aggregate (map-side combine makes
    the shuffle O(depth*width), not O(stream)).

    ``weight_col``: build from PRE-AGGREGATED (key, weight) rows
    instead of one row per occurrence — ``cnt`` becomes
    ``sum(weight)``, which is integer-identical to counting the
    occurrences (every occurrence of a key lands in the same cell per
    depth), while hashing each distinct key ONCE instead of once per
    occurrence (r15, guide §2.3: aggregate before you shuffle). A
    caller that already has exact counts in hand gets the sketch for
    one distinct-key pass.
    """
    if weight_col is not None:
        cells = df.select(
            F.posexplode(_bucket_array(F.col(key_col), depth, width)).alias(
                "depth", "bucket"
            ),
            F.col(weight_col).alias("__w"),
        )
        return cells.groupBy("depth", "bucket").agg(
            F.sum("__w").cast("long").alias("cnt")
        )
    cells = df.select(
        F.posexplode(_bucket_array(F.col(key_col), depth, width)).alias(
            "depth", "bucket"
        )
    )
    return cells.groupBy("depth", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum — the additive merge that makes CMS a streaming
    state fold: ``cms_merge(build(A), build(B)) == build(A ++ B)``
    exactly (tests/test_sketch.py asserts bit-equality)."""
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy("depth", "bucket").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def cms_probe(
    probe_df: DataFrame,
    cms_df: DataFrame,
    key_col: str = "token",
    depth: int = 4,
    width: int = 64,
    out_col: str = "est_n",
) -> DataFrame:
    """Estimate each probe key's stream frequency.

    ``probe_df`` must be unique on ``key_col``.  Shape: posexplode the
    ``depth`` buckets, broadcast-join the tiny cell table, MIN over
    the ``depth`` looked-up counters (missing cell => 0: the key never
    occurred).  Returns ``probe_df``'s columns plus ``out_col``
    (BIGINT, always >= the true count).
    """
    exploded = probe_df.select(
        key_col,
        F.posexplode(_bucket_array(F.col(key_col), depth, width)).alias(
            "depth", "bucket"
        ),
    )
    est = (
        exploded.join(F.broadcast(cms_df), ["depth", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias(out_col))
    )
    return probe_df.join(est, key_col)


def cms_build_sql(
    key_expr: str, from_clause: str, depth: int = 4, width: int = 64
) -> str:
    """DuckDB twin of :func:`cms_build` — one SELECT producing
    ``(depth, bucket, cnt)``, spliced as a CTE body by the queries."""
    consts = _portable_hash_constants(depth)
    x = _base_x_sql(key_expr)
    branches = "\n        UNION ALL ".join(
        f"SELECT {i} AS depth, (({a} * {x} + {b}) % {_P}) % {width} AS bucket "
        f"FROM {from_clause}"
        for i, (a, b) in enumerate(consts)
    )
    return (
        "SELECT depth, CAST(bucket AS INTEGER) AS bucket, "
        "CAST(COUNT(*) AS BIGINT) AS cnt FROM (\n        "
        f"{branches}\n    ) GROUP BY 1, 2"
    )


def cms_probe_sql(
    key_expr: str,
    key_out: str,
    from_clause: str,
    cells_cte: str,
    depth: int = 4,
    width: int = 64,
    out_col: str = "est_n",
) -> str:
    """DuckDB twin of :func:`cms_probe`: ``key_expr`` evaluated over
    ``from_clause`` rows (unique keys), returns ``(key_out, out_col)``."""
    consts = _portable_hash_constants(depth)
    x = _base_x_sql(key_expr)
    branches = "\n        UNION ALL ".join(
        f"SELECT {key_expr} AS {key_out}, {i} AS depth, "
        f"(({a} * {x} + {b}) % {_P}) % {width} AS bucket FROM {from_clause}"
        for i, (a, b) in enumerate(consts)
    )
    return (
        f"SELECT {key_out}, CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS {out_col} "
        f"FROM (\n        {branches}\n    ) pr "
        f"LEFT JOIN {cells_cte} c USING (depth, bucket) GROUP BY {key_out}"
    )


def mg_summary(
    df: DataFrame,
    key_col: str = "token",
    k: int = 64,
) -> DataFrame:
    """Misra-Gries frequent-items summary: ``(key_col, w)`` with at
    most ``k`` rows — the bounded-memory top-k companion to the CMS
    (CMS answers "how often is THIS key", MG answers "which keys are
    frequent" without enumerating the key domain).

    Shape: each partition runs classic MG over its rows inside ONE
    mapInPandas pass (k counters; on overflow decrement all — O(k)
    amortized against the k inserts that filled them), emitting a
    <= k-row summary; the partition summaries merge by the Agarwal/
    Cormode/Huang mergeable-summaries rule — sum weights per key,
    subtract the (k+1)-th largest merged weight, drop non-positives.
    The merge window runs over <= n_partitions * k rows (KBs), never
    the stream.

    Guarantee (what the verdict query certifies): for every key,
    ``true_count - N/(k+1) <= w <= true_count`` — so any key with
    ``count * (k+1) > N`` MUST survive.  The summary CONTENT is
    partition-order dependent (like any MG); only the bound is
    deterministic, which is why the driver query certifies the bound,
    not the weights.

    The pandas lane is deliberately closure-only (no module refs), so
    it pickles standalone and runs on executors from any cwd.
    """
    import pandas as pd  # noqa: F401  (imported for type clarity)

    def run_mg(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for t in pdf["__k"]:
                if t in counters:
                    counters[t] += 1
                elif len(counters) < k:
                    counters[t] = 1
                else:
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame(
            {"__k": list(counters.keys()), "w": list(counters.values())}
        )

    partials = df.select(F.col(key_col).alias("__k")).mapInPandas(
        run_mg, "__k string, w long"
    )
    return mg_merge(
        partials.select(F.col("__k").alias(key_col), "w"), key_col=key_col, k=k
    )


def mg_merge(*summaries: DataFrame, key_col: str = "token", k: int = 64) -> DataFrame:
    """Mergeable-summaries combine (Agarwal/Cormode/Huang): sum
    weights per key across the input summaries, subtract the
    (k+1)-th largest merged weight, drop non-positives — the error
    bounds ADD, so folding batch summaries into a stored summary
    (streaming/continuous.py:run_streaming_mg) keeps the global
    ``count - N_total/(k+1) <= w <= count`` guarantee.  Inputs are
    <= k-row tables, so the ranking window is KB-sized by
    construction."""
    merged = summaries[0].select(F.col(key_col).alias("__k"), "w")
    for s in summaries[1:]:
        merged = merged.unionByName(s.select(F.col(key_col).alias("__k"), "w"))
    summed = merged.groupBy("__k").agg(F.sum("w").cast("long").alias("w"))
    from pyspark.sql import Window

    ranked = summed.withColumn(
        "__rn",
        F.row_number().over(
            Window.orderBy(F.col("w").desc(), F.col("__k"))
        ),
    )
    thr = ranked.agg(
        F.max(F.when(F.col("__rn") == k + 1, F.col("w")).otherwise(0))
        .cast("long")
        .alias("__thr")
    )
    return (
        ranked.crossJoin(F.broadcast(thr))
        .withColumn("w", F.col("w") - F.col("__thr"))
        .where(F.col("w") > 0)
        .select(F.col("__k").alias(key_col), "w")
    )
