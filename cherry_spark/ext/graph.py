"""Link-graph analytics for web curation — PageRank over an
integer-arithmetic lane so every iteration is bit-exact across
engines.

Why it's here: production web-corpus pipelines weight domains by link
centrality (a PageRank/harmonic-centrality prior feeds the quality
mix next to the content-based classifiers); the repo already has the
connected-components half of graph tooling (ext/dedup.py), this adds
the importance half.

Why INTEGER arithmetic: float PageRank sums are reduction-order
dependent, so a DuckDB oracle can never hash-match a Spark shuffle
sum.  Ranks here are fixed-point integers (``SCALE`` = 10^12 units of
probability mass).  Every operation — contribution split (integer
``div`` by out-degree, truncating the same way in both engines), the
damping multiply-then-divide, the dangling-mass redistribution — is
pure BIGINT, so k iterations produce IDENTICAL numbers everywhere and
the op certifies with an exact oracle (k unrolled CTEs) instead of a
tolerance verdict.  Total mass drifts below 1.0 only by the bounded
truncation loss (< n_nodes + 1 units per iteration), which is part of
the deterministic contract, not noise.

Scale shape per iteration: one ``groupBy(dst)`` sum of edge
contributions (map-side combinable) + a broadcast 1-row dangling-mass
aggregate; ranks re-derived per round reference the previous round
ONCE and are ``localCheckpoint``ed — the iterative-algorithm plan
discipline (CLAUDE.md; same as connected_components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12  # fixed-point units per 1.0 of rank mass


def pagerank(
    edges: DataFrame,
    n_iters: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, rank_fp) after ``n_iters`` synchronous iterations —
    ``rank_fp`` is the fixed-point BIGINT rank (divide by ``SCALE``
    for the probability).  The damping factor is the exact rational
    ``damping_num/damping_den`` so both engines compute the identical
    integer products.

    Nodes are every distinct src or dst.  Dangling nodes' mass is
    redistributed uniformly (integer div, truncation loss stays with
    the system's deterministic contract)."""
    src = F.col(src_col).cast("long")
    dst = F.col(dst_col).cast("long")
    e = edges.select(src.alias("src"), dst.alias("dst")).distinct()
    # lazy checkpoints (r15): Dataset.localCheckpoint truncates the
    # LOGICAL plan immediately either way (the returned frame wraps a
    # LogicalRDD over the marked RDD), so eager=False keeps the
    # plan-depth invariant while deferring materialization — the
    # nodes.count() below forces e and nodes in one job instead of
    # two blocking checkpoint jobs.
    e = e.localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # deg is STATIC across rounds: join it onto the node set ONCE and
    # carry it inside the ranks frame, instead of re-joining outdeg
    # every iteration (r15 — one broadcast join per round removed)
    nd = (
        nodes.join(outdeg, nodes["node"] == outdeg["src"], "left")
        .select("node", "deg")
        .localCheckpoint(eager=False)
    )

    base = int(SCALE * (damping_den - damping_num) // damping_den) // n
    ranks = nd.withColumn("rank_fp", F.lit(SCALE // n).cast("long"))
    for _ in range(n_iters):
        # each node splits its mass over its out-edges: integer div —
        # identical truncation in Spark (`div`) and DuckDB (`//`)
        contrib = (
            ranks.filter(F.col("deg").isNotNull())
            .join(e, F.col("node") == F.col("src"))
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_fp div deg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").cast("long").alias("in_mass"))
        )
        # dangling mass: one scalar, redistributed uniformly
        dangling = (
            ranks.filter(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("rank_fp"), F.lit(0)).cast("long").alias("dm"))
        )
        share = F.expr(f"dm div {n}")
        ranks = (
            nd.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling.select(share.alias("dshare"))))
            .select(
                "node",
                "deg",
                (
                    F.lit(base)
                    + F.expr(
                        f"(({damping_num} * (coalesce(in_mass, 0) + dshare))"
                        f" div {damping_den})"
                    )
                ).cast("long").alias("rank_fp"),
            )
            # eager=False: same logical-plan truncation per round, but
            # the five rounds materialize inside the consumer's single
            # action instead of five blocking driver jobs (r15 A/B:
            # 3.13 -> see OPTIMIZATION_r15.md)
            .localCheckpoint(eager=False)
        )
    return ranks.select("node", "rank_fp")


def pagerank_oracle_sql(
    edges_cte: str,
    n_iters: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
) -> str:
    """DuckDB twin: ``edges_cte`` must be the NAME of a CTE/view with
    (src BIGINT, dst BIGINT).  Returns the full SELECT replaying
    :func:`pagerank` with k unrolled iteration CTEs — every integer
    identical."""
    pre = f"""
    e AS (SELECT DISTINCT CAST(src AS BIGINT) AS src,
                          CAST(dst AS BIGINT) AS dst FROM {edges_cte}),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    outdeg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY 1),
    r0 AS (SELECT node, CAST({SCALE} // n AS BIGINT) AS rank_fp
           FROM nodes, nn)
    """
    steps = []
    for i in range(n_iters):
        prev, cur = f"r{i}", f"r{i + 1}"
        steps.append(f"""
    wd{i} AS (SELECT r.node, r.rank_fp, o.deg
              FROM {prev} r LEFT JOIN outdeg o ON o.src = r.node),
    contrib{i} AS (
        SELECT e.dst AS node,
               CAST(SUM(w.rank_fp // w.deg) AS BIGINT) AS in_mass
        FROM wd{i} w JOIN e ON e.src = w.node
        WHERE w.deg IS NOT NULL
        GROUP BY 1
    ),
    dang{i} AS (
        SELECT CAST(COALESCE(SUM(rank_fp), 0) AS BIGINT) AS dm
        FROM wd{i} WHERE deg IS NULL
    ),
    {cur} AS (
        SELECT nodes.node,
               CAST((({SCALE} * ({damping_den} - {damping_num})
                      // {damping_den}) // nn.n)
                    + (({damping_num} * (COALESCE(c.in_mass, 0)
                                         + (d.dm // nn.n)))
                       // {damping_den}) AS BIGINT) AS rank_fp
        FROM nodes
        LEFT JOIN contrib{i} c USING (node)
        CROSS JOIN dang{i} d CROSS JOIN nn
    )""")
    return (
        "WITH " + pre + "," + ",".join(steps)
        + f"\n    SELECT node, rank_fp FROM r{n_iters}"
    )
