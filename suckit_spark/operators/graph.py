"""Link-graph analytics over crawl output (engine extension).

A 100 TB crawl's discovery log IS a web graph, and the standard curation
signal computed over it is PageRank (Brin & Page 1998) — used by
Common-Crawl-style pipelines to weight/filter documents by centrality before
training. The reference (a single-site mirroring CLI) has no counterpart;
this is a Spark-first addition over the same BSP-join dataflow as the crawl
loop itself.

Determinism: ranks are **fixed-point integers** (scaled longs, truncating
division), not doubles. Floating-point PageRank is order-sensitive under
parallel summation (double addition does not associate), so a shuffled
``sum`` can differ run-to-run and engine-to-engine; 64-bit integer sums are
exact and order-free, which makes the operator bit-reproducible on any
cluster size and lets the DuckDB oracle in ``__spark_entry__.py`` hash-match
it. The scaled recurrence is

    R'(v) = (scale * (den - num)) // den
            + sum over in-edges (u,v) of  (num * R(u)) // (den * outdeg(u))

with ``num/den`` the damping factor (default 85/100) and ``R0 = scale``.
Truncation error per term is < 1 ulp of the fixed-point grid (1/scale);
with the default ``scale=10^12`` that is far below any ranking-relevant
difference. Dangling mass (nodes with no out-edges) is dropped, the common
simplification.

Overflow bound: total mass starts at ``n * scale`` and never grows (each
iteration replaces it with ``n*base + damping*flowed ≤`` the previous
total), so every rank — and every partial sum inside the non-ANSI ``SUM``,
whose terms are all non-negative — stays below ``n * scale``. The exactness
claim therefore requires ``n_nodes * scale < 2**63``; past it, Spark's
long sum wraps SILENTLY. ``pagerank_fixed_point`` enforces the bound with
one ``count`` job up front (skippable via ``check_overflow=False`` when the
caller already knows n); at the 10^10-node design point pass
``scale <= 10**8``.

Scale shape: per iteration one equi-join of edges against the rank table
(both hash-partitioned on the join key — co-partitioned at 1000 executors)
and one map-side-combinable integer sum. No collect, no window, no
per-row Python. ``iters`` is fixed (no driver-side convergence read) so the
whole run is ``iters`` shuffles deep; callers doing many iterations should
pass ``checkpoint_every`` to keep lineage flat.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def pagerank_fixed_point(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**12,
    checkpoint_every: int | None = None,
    check_overflow: bool = True,
) -> DataFrame:
    """PageRank over ``edges`` with exact integer arithmetic.

    Returns ``(node, rank)`` where ``rank`` is the scaled long described in
    the module docstring (divide by ``scale`` for the conventional value).
    The node set is every endpoint of every edge. ``check_overflow`` guards
    the ``n_nodes * scale < 2**63`` mass bound (module docstring) with one
    count job; disable it only when the caller has already sized ``scale``
    to its graph.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct())
    if check_overflow:
        n_nodes = nodes.count()
        if n_nodes * scale >= 2**63:
            raise ValueError(
                f"pagerank_fixed_point: n_nodes*scale = {n_nodes}*{scale} "
                f">= 2**63 — long sums would wrap silently; lower `scale` "
                f"(max exact: {2**63 // max(n_nodes, 1)})")
    deg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    base = (scale * (damping_den - damping_num)) // damping_den

    ranks = nodes.withColumn("rank", F.lit(scale).cast("long"))
    for i in range(iters):
        contrib = (
            e.join(ranks, e.src == ranks.node)
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                # integer (truncating) division — both engines agree exactly
                F.expr(f"({damping_num} * rank) div ({damping_den} * outdeg)")
                .alias("c"),
            )
            .groupBy("node").agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (F.lit(base) + F.coalesce(F.col("inflow"), F.lit(0)))
                .cast("long").alias("rank"),
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
