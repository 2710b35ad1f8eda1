"""Link-graph authority scoring: integer-arithmetic PageRank.

Extends the reference's static DomainAuthorityScorer dim table
(functions/scorers.py:110; reference deep_crawling/scorers.py KeywordR./
Domain-authority scorers) with the graph-derived authority signal a
100 TB crawl actually wants for frontier prioritization.

Why INTEGER arithmetic: float PageRank sums are association-order
dependent, so two runs (or two engines) disagree in the last ulps and
no exact oracle is possible. Scaling ranks to 10^12 and folding with
BIGINT sum + integer division makes every iteration exactly
reproducible in any engine — same trick as the engine's decimal-exact
TPC-H aggregates. Dangling-node mass is dropped (documented variant;
ranks then need no global normalization job per iteration).

Scale posture: each iteration is one shuffle (groupBy dst) over the
edge list joined to the current ranks; out-degrees are joined onto the
edges ONCE before the loop. The iteration count is fixed and small, so
the whole loop compiles to a single statically-bounded plan — for
unbounded loops (connected components, ops/dedup.py:234) the engine
uses the persisted-loop pattern instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAGERANK_R0 = 10 ** 12      # initial rank, scaled integer
PAGERANK_DAMP_NUM = 85      # damping 0.85 as a ratio
PAGERANK_DAMP_DEN = 100


def pagerank_int(nodes: DataFrame, edges: DataFrame, n_iter: int = 8,
                 r0: int = PAGERANK_R0) -> DataFrame:
    """nodes(node: long), edges(src: long, dst: long) ->
    (node, rank_scaled) after ``n_iter`` synchronous iterations.

    rank_scaled is the integer-scaled PageRank: r_{k+1}(v) =
    base + (85 * sum_{u->v} (r_k(u) div deg(u))) div 100 with
    base = r0*15 div 100. BIGINT-exact, order-independent.
    """
    base = r0 * (PAGERANK_DAMP_DEN - PAGERANK_DAMP_NUM) // PAGERANK_DAMP_DEN
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    # degree is loop-invariant: join it onto the edges once, and persist
    # the joined relation — otherwise every iteration's plan re-reads the
    # edge source and re-runs the degree aggregation + join, so the k-th
    # iteration pays k copies of the invariant work and lineage depth
    # grows with n_iter (at 10^10 edges that is the difference between
    # one edge shuffle per iteration and k of them)
    ed = edges.join(deg, "src").persist()
    ranks = nodes.select("node", F.lit(r0).cast("long").alias("r"))
    for _ in range(n_iter):
        incoming = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select("dst", F.expr("r div deg").alias("contrib"))
            .groupBy("dst").agg(F.sum("contrib").alias("s"))
        )
        ranks = (
            nodes.join(incoming, nodes["node"] == incoming["dst"], "left")
            .select(
                "node",
                (F.lit(base) + F.expr(
                    f"({PAGERANK_DAMP_NUM} * coalesce(s, 0L)) "
                    f"div {PAGERANK_DAMP_DEN}"
                )).cast("long").alias("r"),
            )
        )
    return ranks.select("node", F.col("r").alias("rank_scaled"))
