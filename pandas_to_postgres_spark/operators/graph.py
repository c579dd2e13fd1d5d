"""Join-based PageRank: iterative message passing on the DataFrame API.

The missing algorithm class between the aggregation tier and the
connected-components closure (operators/cluster.py): ITERATIVE graph
computation where each round is relational — rank vector ⋈ edges on src,
re-aggregate on dst. That is exactly how Pregel-style systems express
PageRank as joins, and it is the scale-correct Spark shape: the edge list
is the big, immutable side (partition once, reuse every round); the rank
vector is |V| rows and is the only thing that moves.

Determinism / oracle parity: per-edge contributions are computed in
double (IEEE multiply/divide are exactly reproducible across engines) and
summed through DECIMAL — the same exact-partial-sum trick as
functions/agg.dsum — so the result is independent of partition count,
merge order, and engine. The DuckDB twin is the SAME formula with the
iterations unrolled as CTEs (`pagerank_oracle_sql`).

Simplified PageRank (no dangling-mass redistribution): nodes without
out-edges absorb rank; identical convention on both engines. Use the
damping term only as a comparison of relative centrality, not a
probability distribution, when the graph has sinks.

Scale: each iteration is ONE shuffle of |V| rank rows to the edge
partitioning plus one dst aggregation (map-side combined). The edge frame
never re-shuffles after its first hash partitioning. Rank frames are
localCheckpoint()ed per round so the plan stays O(1) in iterations
(lineage-cut lesson from operators/cluster.py). For vertex counts small
enough to broadcast (dimension-like graphs), AQE turns the rank⋈edges
join into a broadcast join and the per-iteration shuffle disappears
entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the grid-round rule is load-bearing for every oracle in this repo —
# one shared definition (functions/agg.grid_round), not per-module copies
from pandas_to_postgres_spark.functions.agg import grid_round as _grid_round

#: decimal type for exact, order-independent contribution sums. Scale 12
#: keeps the double→decimal cast inside the regime where Spark's
#: shortest-repr rounding and DuckDB's binary-value rounding agree (same
#: rationale as DECIMAL(18,6) in functions/agg.py, with headroom for
#: rank*probability products < 1).
_DEC = "decimal(28,12)"


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    damping: float = 0.85,
    iterations: int = 4,
    out_digits: int = 10,
) -> DataFrame:
    """(node, rank) after ``iterations`` rounds of weighted PageRank over
    a directed edge list with positive integer-ish weights.

    r_{t+1}(v) = (1-d)/N + d * Σ_{u→v} r_t(u) * w(u,v)/outw(u)

    The transition probability w/outw is one IEEE division (bit-identical
    across engines); per-edge contributions r*p go through DECIMAL partial
    sums so the aggregate is exact and partitioning-invariant. Output rank
    is grid-rounded to ``out_digits``.
    """
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), F.col(weight).alias("w")
    )
    outw = e.groupBy("src").agg(F.sum("w").alias("ow"))
    trans = (
        e.join(outw, "src")
        .select(
            "src",
            "dst",
            (F.col("w").cast("double") / F.col("ow").cast("double")).alias("p"),
        )
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    base = (1.0 - damping) / n
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(iterations):
        contrib = (
            ranks.join(trans, ranks.node == trans.src)
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") * F.col("p")).cast(_DEC).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * F.coalesce(F.col("s").cast("double"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)  # O(1) plan per round
        )
    return ranks.select("node", _grid_round(F.col("rank"), out_digits).alias("rank"))


def pagerank_oracle_sql(
    edges_cte: str,
    damping: float = 0.85,
    iterations: int = 4,
    out_digits: int = 10,
) -> str:
    """DuckDB twin with the iterations unrolled as CTEs. ``edges_cte`` is
    a SELECT producing (src, dst, w). Mirrors :func:`pagerank` term for
    term: same IEEE transition probabilities, same DECIMAL contribution
    sums, same grid rounding."""
    # every damping-factor use is CAST(... AS DOUBLE) so DuckDB's DECIMAL
    # literal arithmetic can't diverge from the Python-double math the
    # Spark side bakes into its literals
    d = f"CAST({damping!r} AS DOUBLE)"
    p10 = f"1e{out_digits}"
    parts = [
        f"WITH edges AS ({edges_cte})",
        "outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY src)",
        "trans AS (SELECT e.src, e.dst,"
        " CAST(e.w AS DOUBLE) / CAST(o.ow AS DOUBLE) AS p"
        " FROM edges e JOIN outw o ON e.src = o.src)",
        "nodes AS (SELECT DISTINCT src AS node FROM edges"
        " UNION SELECT DISTINCT dst FROM edges)",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        "r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / n AS rank FROM nodes, nn)",
    ]
    prev = "r0"
    for i in range(1, iterations + 1):
        parts.append(
            f"c{i} AS (SELECT t.dst AS node,"
            f" sum(CAST(r.rank * t.p AS DECIMAL(28,12))) AS s"
            f" FROM {prev} r JOIN trans t ON r.node = t.src GROUP BY t.dst)"
        )
        parts.append(
            f"r{i} AS (SELECT b.node,"
            f" (CAST(1.0 AS DOUBLE) - {d}) / b.n"
            f" + {d} * coalesce(CAST(c{i}.s AS DOUBLE), 0.0) AS rank"
            f" FROM (SELECT node, n FROM nodes, nn) b"
            f" LEFT JOIN c{i} ON b.node = c{i}.node)"
        )
        prev = f"r{i}"
    body = ",\n".join(parts)
    return (
        f"{body}\n"
        f"SELECT node, floor(rank * {p10} + 0.5) / {p10} AS rank FROM {prev}"
    )


def kcore_peel(
    edges: DataFrame,
    k: int,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, degree) after ``rounds`` of k-core peeling: each round
    drops every vertex whose degree within the surviving subgraph is
    below ``k`` (Matula & Beck 1983). Run with ``rounds`` high enough to
    reach the fixpoint and this IS the k-core; a FIXED round count makes
    the operator's output a pure function of the input, so the DuckDB
    oracle can unroll the identical rounds (the same pinned-iteration
    trick as pagerank/Lloyd) — :func:`kcore` below runs to convergence
    for in-engine use.

    Scale: each round is one degree aggregation over surviving edges +
    two semi-joins filtering the edge list; edges only ever SHRINK, and
    each round's survivor frame is lineage-cut so the plan stays O(1)
    in round count.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    for _ in range(rounds):
        deg = (
            e.select(F.col("u").alias("n"))
            .unionByName(e.select(F.col("v").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        alive = deg.filter(F.col("d") >= k).select("n").localCheckpoint(
            eager=True
        )
        e = (
            e.join(alive, e.u == alive.n, "left_semi")
            .join(alive, F.col("v") == alive.n, "left_semi")
            .localCheckpoint(eager=True)
        )
    return (
        e.select(F.col("u").alias("n"))
        .unionByName(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("degree"))
        .filter(F.col("degree") >= k)
        .select(F.col("n").alias("node"), "degree")
    )


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 50,
) -> DataFrame:
    """k-core to the fixpoint: peel until no vertex falls below ``k``
    (raises if not converged within ``max_rounds`` — real graphs peel in
    a handful of rounds; the bound is a runaway guard)."""
    prev = None
    for rounds in range(1, max_rounds + 1):
        out = kcore_peel(edges, k, rounds, src, dst)
        n = out.count()
        if prev is not None and n == prev:
            return out
        prev = n
    raise RuntimeError(f"k-core did not converge within {max_rounds} rounds")


def bfs_hops(
    edges: DataFrame,
    source: DataFrame,
    rounds: int,
    src: str = "u",
    dst: str = "v",
) -> DataFrame:
    """(node, hop) BFS distances from ``source`` (a 1-row (node) frame)
    after ``rounds`` frontier expansions over an UNDIRECTED edge list —
    the reachability / shortest-hops primitive (5th of the graph family
    after connected components, PageRank, triangles, k-core). A FIXED
    round count makes the output a pure function of the input so the
    DuckDB oracle unrolls identical rounds (pinned-iteration trick);
    run with ``rounds`` >= diameter and this IS the full BFS.

    Scale: textbook frontier BFS, not dist-set re-expansion — each round
    joins ONLY the newly discovered frontier against the edge list
    (frontier ⋈ edges, then an anti-join against settled nodes), so
    per-round work is frontier-degree-sized; settled/frontier frames are
    lineage-cut per round, keeping the plan O(1) in round count. The
    edge list partitions once on ``u`` and every round's join reuses it.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(
            edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    dist = source.select(
        F.col(source.columns[0]).alias("node"), F.lit(0).alias("hop")
    ).localCheckpoint(eager=True)
    frontier = dist
    for r in range(1, rounds + 1):
        cand = (
            frontier.join(e, frontier.node == e.u)
            .select(F.col("v").alias("node"))
            .distinct()
        )
        new = (
            cand.join(dist, "node", "left_anti")
            .select("node", F.lit(r).alias("hop"))
            .localCheckpoint(eager=True)
        )
        dist = dist.unionByName(new).localCheckpoint(eager=True)
        frontier = new
    return dist
