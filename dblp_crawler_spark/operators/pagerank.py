"""Integer-exact PageRank — link-centrality frontier prioritization.

The reference prioritizes its frontier by venue rank and year
(dblp_crawler/graph.py filter/priority hooks); a web-scale frontier
additionally orders hosts/pages by link centrality (PageRank-ordered
crawling, Cho/Garcia-Molina/Page 1998; OPIC, Abiteboul 2003). This
module provides that as a batch operator over an edge list, designed
so the result is BIT-IDENTICAL in any engine:

  * rank mass is a 64-bit integer (initial mass ``r0`` per node);
  * each node's contribution to an out-neighbor is ``r div odeg``
    (floor division — exact, and a SUM of integers is
    order-independent, unlike float PR which can't be hash-compared
    across engines or even across partitionings);
  * damping is the exact rational ``damp_num/damp_den`` applied as
    ``(damp_num * m) div damp_den``;
  * floor remainders simply evaporate (deterministically), as does
    dangling-node mass — PageRank is scale-invariant, so evaporation
    changes absolute mass, not the induced priority order we crawl by.

Scale shape: per iteration ONE equi-join of the (src, dst, odeg)
edge table against current ranks + ONE hash aggregation (map-side
partials) + ONE left join back to the node set — all keyed by node
id, nothing all-pairs. Out-degree is attached to the edge table once
up front so the loop never recomputes it. Lineage is truncated per
round with localCheckpoint (same discipline as
``dedup.connected_components``; on a cluster: a reliable checkpoint
dir or an intermediate table), so the plan stays O(1) per round.

Overflow headroom: with r0 = 10^12 the damped sum stays below
``damp_num * N * r0`` — int64-safe past N = 10^5 nodes; shrink r0
(or shard the graph) beyond that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

R0_DEFAULT = 10**12


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    r0: int = R0_DEFAULT,
    damp_num: int = 85,
    damp_den: int = 100,
) -> DataFrame:
    """Fixed-iteration integer PageRank over a directed edge list.

    Multi-edges count with multiplicity; self-loops are legal. Nodes
    appearing only as destinations still receive rank (they are in
    the node set); nodes with no out-edges contribute nothing.

    Returns (id, rank_int) — one row per distinct endpoint, exact.
    """
    nodes = (
        edges.select(F.col(src).alias("id"))
        .union(edges.select(F.col(dst).alias("id")))
        .distinct()
        .localCheckpoint()
    )
    odeg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("odeg"))
    e = (
        edges.join(odeg, src)
        .select(F.col(src).alias("esrc"), F.col(dst).alias("edst"), "odeg")
        .localCheckpoint()
    )
    base = (r0 * (damp_den - damp_num)) // damp_den
    rank = nodes.select("id", F.lit(r0).cast("long").alias("r")).localCheckpoint()
    for _ in range(iters):
        contrib = (
            e.join(rank.select(F.col("id").alias("esrc"), "r"), "esrc")
            .select(F.col("edst").alias("id"), F.expr("r div odeg").alias("share"))
            .groupBy("id")
            .agg(F.sum("share").alias("m"))
        )
        rank = (
            nodes.join(contrib, "id", "left")
            .select(
                "id",
                (
                    F.lit(base)
                    + F.expr(f"({damp_num} * coalesce(m, CAST(0 AS BIGINT))) div {damp_den}")
                )
                .cast("long")
                .alias("r"),
            )
            .localCheckpoint()
        )
    return rank.select("id", F.col("r").alias("rank_int"))


def pagerank_py(edge_list, iters=5, r0=R0_DEFAULT, damp_num=85, damp_den=100):
    """Pure-Python reference of :func:`pagerank` (same integer
    arithmetic), used by tests as the ground truth."""
    nodes = sorted({u for u, _ in edge_list} | {v for _, v in edge_list})
    odeg: dict = {}
    for u, _ in edge_list:
        odeg[u] = odeg.get(u, 0) + 1
    base = (r0 * (damp_den - damp_num)) // damp_den
    rank = {n: r0 for n in nodes}
    for _ in range(iters):
        m = {n: 0 for n in nodes}
        for u, v in edge_list:
            m[v] += rank[u] // odeg[u]
        rank = {n: base + (damp_num * m[n]) // damp_den for n in nodes}
    return rank


def trustrank(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "id",
    iters: int = 4,
    r0: int = R0_DEFAULT,
    damp_num: int = 85,
    damp_den: int = 100,
) -> DataFrame:
    """Integer-exact TrustRank (Gyöngyi/Garcia-Molina/Pedersen 2004):
    PageRank whose teleport mass lands ONLY on a trusted seed set, so
    trust flows outward along links and pages reachable only from
    untrusted regions score 0 — the spam-demotion signal a frontier
    combines with :func:`pagerank` (global importance) and HITS.

    Same arithmetic discipline as :func:`pagerank` (int64 mass,
    ``r div odeg`` contributions, exact rational damping, floor
    remainders evaporate), so results are bit-identical in any
    engine. Difference: the per-round additive base
    ``(r0 * (1-d))`` and the initial mass ``r0`` are gated on seed
    membership (non-seeds start at 0 and receive only propagated
    mass). Seeds not present in the edge list are ignored — trust
    can only flow along edges.

    Scale shape per iteration is pagerank's: ONE node-keyed
    equi-join + ONE hash agg + ONE left join back to the node set,
    lineage truncated per round. The seed flag is computed once and
    rides the checkpointed node table.
    """
    nodes = (
        edges.select(F.col(src).alias("id"))
        .union(edges.select(F.col(dst).alias("id")))
        .distinct()
        .join(
            seeds.select(F.col(seed_col).alias("id"), F.lit(1).alias("is_seed")),
            "id",
            "left",
        )
        .select("id", F.coalesce("is_seed", F.lit(0)).alias("is_seed"))
        .localCheckpoint()
    )
    odeg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("odeg"))
    e = (
        edges.join(odeg, src)
        .select(F.col(src).alias("esrc"), F.col(dst).alias("edst"), "odeg")
        .localCheckpoint()
    )
    base = (r0 * (damp_den - damp_num)) // damp_den
    rank = nodes.select(
        "id", "is_seed", (F.col("is_seed") * F.lit(r0)).cast("long").alias("r")
    ).localCheckpoint()
    for _ in range(iters):
        contrib = (
            e.join(rank.select(F.col("id").alias("esrc"), "r"), "esrc")
            .select(F.col("edst").alias("id"), F.expr("r div odeg").alias("share"))
            .groupBy("id")
            .agg(F.sum("share").alias("m"))
        )
        rank = (
            nodes.join(contrib, "id", "left")
            .select(
                "id",
                "is_seed",
                (
                    (F.col("is_seed") * F.lit(base)).cast("long")
                    + F.expr(f"({damp_num} * coalesce(m, CAST(0 AS BIGINT))) div {damp_den}")
                )
                .cast("long")
                .alias("r"),
            )
            .localCheckpoint()
        )
    return rank.select("id", F.col("r").alias("trust_int"))


def trustrank_py(edge_list, seed_ids, iters=4, r0=R0_DEFAULT, damp_num=85, damp_den=100):
    """Pure-Python reference of :func:`trustrank` (same integer
    arithmetic), used by tests as the ground truth."""
    nodes = sorted({u for u, _ in edge_list} | {v for _, v in edge_list})
    seeds = {n for n in nodes if n in set(seed_ids)}
    odeg: dict = {}
    for u, _ in edge_list:
        odeg[u] = odeg.get(u, 0) + 1
    base = (r0 * (damp_den - damp_num)) // damp_den
    rank = {n: (r0 if n in seeds else 0) for n in nodes}
    for _ in range(iters):
        m = {n: 0 for n in nodes}
        for u, v in edge_list:
            m[v] += rank[u] // odeg[u]
        rank = {
            n: (base if n in seeds else 0) + (damp_num * m[n]) // damp_den
            for n in nodes
        }
    return rank


def pagerank_weighted(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    iters: int = 4,
    r0: int = 10**9,
    damp_num: int = 85,
    damp_den: int = 100,
) -> DataFrame:
    """Integer-exact PageRank over a WEIGHTED edge list — the host-
    graph form: a crawl prioritizes hosts, and projecting the page
    graph to hosts collapses parallel links into one edge with a
    count weight (10^10 page edges → ~10^7 host edges; running the
    unweighted operator on the page graph would shuffle 1000× the
    rows every iteration for the same answer).

    Share arithmetic: node u sends ``(r * w) div sw`` along each
    out-edge, sw = u's total out-weight — exact, order-independent,
    bit-identical in any engine. Overflow bound: r * w must stay
    below 2^63; with the default r0 = 10^9 the damped rank stays
    ~O(r0 * N / 1), leaving headroom for weights up to ~10^9/N-ish —
    shrink r0 (or pre-normalize weights) for heavier graphs; the
    default is safe for host graphs up to ~10^5 hosts with
    million-scale link counts.

    Scale shape identical to :func:`pagerank`: per iteration one
    equi-join + one hash agg + one left join, all node-keyed,
    lineage checkpointed per round.
    """
    nodes = (
        edges.select(F.col(src).alias("id"))
        .union(edges.select(F.col(dst).alias("id")))
        .distinct()
        .localCheckpoint()
    )
    sw = edges.groupBy(src).agg(F.sum(weight).alias("sw"))
    e = (
        edges.join(sw, src)
        .select(F.col(src).alias("esrc"), F.col(dst).alias("edst"),
                F.col(weight).alias("ew"), "sw")
        .localCheckpoint()
    )
    base = (r0 * (damp_den - damp_num)) // damp_den
    rank = nodes.select("id", F.lit(r0).cast("long").alias("r")).localCheckpoint()
    for _ in range(iters):
        contrib = (
            e.join(rank.select(F.col("id").alias("esrc"), "r"), "esrc")
            .select(F.col("edst").alias("id"), F.expr("(r * ew) div sw").alias("share"))
            .groupBy("id")
            .agg(F.sum("share").alias("m"))
        )
        rank = (
            nodes.join(contrib, "id", "left")
            .select(
                "id",
                (
                    F.lit(base)
                    + F.expr(f"({damp_num} * coalesce(m, CAST(0 AS BIGINT))) div {damp_den}")
                )
                .cast("long")
                .alias("r"),
            )
            .localCheckpoint()
        )
    return rank.select("id", F.col("r").alias("rank_int"))


def pagerank_weighted_py(edge_list, iters=4, r0=10**9, damp_num=85, damp_den=100):
    """Pure-Python reference of :func:`pagerank_weighted`
    (edge_list: (src, dst, w) triples), used by tests."""
    nodes = sorted({u for u, _, _ in edge_list} | {v for _, v, _ in edge_list})
    sw: dict = {}
    for u, _, w in edge_list:
        sw[u] = sw.get(u, 0) + w
    base = (r0 * (damp_den - damp_num)) // damp_den
    rank = {n: r0 for n in nodes}
    for _ in range(iters):
        m = {n: 0 for n in nodes}
        for u, v, w in edge_list:
            m[v] += (rank[u] * w) // sw[u]
        rank = {n: base + (damp_num * m[n]) // damp_den for n in nodes}
    return rank
