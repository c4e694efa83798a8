"""Integer-exact HITS (hubs & authorities) — the link-analysis
complement to PageRank for crawl prioritization.

PageRank scores global importance; HITS (Kleinberg 1999) separates
HUB quality (pages whose out-links find good content — ideal frontier
*seeds*) from AUTHORITY quality (pages many good hubs point at —
ideal fetch *targets*). A crawl scheduler wants both: expand from
high-hub pages, prioritize high-authority URLs. The reference's
single-host crawl needs neither (its priority is venue rank/year —
dblp_crawler/graph.py hooks); a web-scale frontier does.

Engine-portable by the same discipline as ``pagerank``: all score
mass is int64. The mutual-reinforcement update is

    auth_raw(v) = sum over edges (u,v) of hub(u)
    hub_raw(u)  = sum over edges (u,v) of auth(v)

and the per-round normalization — which classic HITS does in L2,
purely to stop the geometric blow-up; ANY norm yields the same
ranking — is done here in L-infinity with DIVIDE-FIRST fixed-point
quantization:

    q = max(1, (max_raw + SCALE - 1) div SCALE)     # ceil(max/SCALE)
    score = raw div q                               # in [0, SCALE]

Dividing raw by ceil(max/SCALE) instead of computing
(SCALE*raw) div max keeps every intermediate <= the raw sums
themselves — no overflow for ANY in-degree (raw <= SCALE * indeg <
2^63 for indeg < 9.2e12), where the multiply-first form would
overflow past indeg ~ 9.2e6. Floor quantization to SCALE levels is
deterministic and identical in every engine.

Scale shape per half-iteration: ONE node-keyed equi-join of the edge
table against current scores + ONE hash aggregation (map-side
partials) + a 1-row max broadcast + ONE left join back to the node
set. Nothing all-pairs; lineage truncated per round with
localCheckpoint (cluster: reliable checkpoint dir), so the plan stays
O(1) per round — the ``connected_components``/``pagerank``
discipline. Multi-edges count with multiplicity (a page linking
twice endorses twice), matching ``pagerank``; dedup upstream for
simple-graph semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HITS_SCALE = 10**6


def _half_round(e: DataFrame, prev: DataFrame, join_key: str, group_key: str,
                scale: int) -> DataFrame:
    """One HITS half-iteration: sum `prev` scores over edges into
    `group_key` endpoints, then L-infinity fixed-point normalize
    (sc = m div ceil(max(m)/scale), divide-first — module docstring).

    ONE Spark job: the raw sums are eagerly checkpointed (lineage
    truncation, the connected_components discipline) with the max
    riding that same job as an Observation, so `q` folds back in as a
    driver-side literal — no second scan, no broadcast-subquery job
    per round. Only nodes that RECEIVED mass appear — absent rows are
    implicit zeros, which contribute nothing to the next round's sums
    (the final output left-joins the node set once)."""
    from pyspark.sql import Observation

    obs = Observation()
    raw = (
        e.join(prev.select(F.col("id").alias(join_key), "sc"), join_key)
        .groupBy(F.col(group_key).alias("id"))
        .agg(F.sum("sc").alias("m"))
        .observe(obs, F.max("m").alias("mx"))
        .localCheckpoint()  # eager: runs the job, fills the Observation
    )
    mx = obs.get["mx"] or 0
    q = max(1, (mx + scale - 1) // scale)
    return raw.select("id", F.expr(f"m div {q}").cast("long").alias("sc"))


def hits(edges: DataFrame, src: str = "src", dst: str = "dst",
         iters: int = 3, scale: int = HITS_SCALE) -> DataFrame:
    """Fixed-iteration integer HITS over a directed edge list.

    Returns (id, auth_int, hub_int) — one row per distinct endpoint,
    scores in [0, `scale`], bit-identical in any engine. Iteration i
    computes authorities from round-(i-1) hubs, then hubs from the
    NEW authorities (the standard in-place ordering — authorities
    converge one half-step ahead).
    """
    nodes = (
        edges.select(F.col(src).alias("id"))
        .union(edges.select(F.col(dst).alias("id")))
        .distinct()
        .localCheckpoint()
    )
    e = edges.select(F.col(src).alias("esrc"), F.col(dst).alias("edst")).localCheckpoint()
    hub = nodes.select("id", F.lit(int(scale)).cast("long").alias("sc"))
    auth = None
    for _ in range(int(iters)):
        auth = _half_round(e, hub, "esrc", "edst", scale)
        hub = _half_round(e, auth, "edst", "esrc", scale)
    return (
        nodes
        .join(auth.select("id", F.col("sc").alias("auth_int")), "id", "left")
        .join(hub.select("id", F.col("sc").alias("hub_int")), "id", "left")
        .select(
            "id",
            F.coalesce("auth_int", F.lit(0).cast("long")).alias("auth_int"),
            F.coalesce("hub_int", F.lit(0).cast("long")).alias("hub_int"),
        )
    )


def hits_py(edge_list, iters: int = 3, scale: int = HITS_SCALE):
    """Pure-Python reference of :func:`hits` (identical integer
    arithmetic), used by tests as ground truth."""
    nodes = sorted({u for u, _ in edge_list} | {v for _, v in edge_list})
    hub = {n: scale for n in nodes}
    auth = {n: 0 for n in nodes}

    def norm(raw):
        mx = max(raw.values(), default=0)
        q = max(1, (mx + scale - 1) // scale)
        return {n: raw.get(n, 0) // q for n in nodes}

    for _ in range(iters):
        a_raw: dict = {}
        for u, v in edge_list:
            a_raw[v] = a_raw.get(v, 0) + hub[u]
        auth = norm(a_raw)
        h_raw: dict = {}
        for u, v in edge_list:
            h_raw[u] = h_raw.get(u, 0) + auth[v]
        hub = norm(h_raw)
    return {n: (auth[n], hub[n]) for n in nodes}


def link_reciprocity(edges: DataFrame, src: str = "src",
                     dst: str = "dst") -> DataFrame:
    """Per-source reciprocal-link ratio — the classic link-farm
    signal (mutual-admiration rings trade links both ways; organic
    citation graphs are overwhelmingly one-directional). For each
    source node over the DISTINCT directed edge set: how many of its
    out-links are returned by an opposite edge.

    Plan shape: dedup the edge set, then ONE self-equi-join on the
    swapped key pair (dst,src)=(src,dst) — hash-partitioned both
    sides, no broadcast assumption (the edge set is the big table) —
    and a per-source count aggregate. recip_pct is exact-integer
    division rounded to 2.

    Output: (src, n_out, n_recip, recip_pct).
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")) \
             .filter(F.col("s") != F.col("d")).distinct()
    rev = e.select(F.col("d").alias("s"), F.col("s").alias("d"))
    marked = e.join(rev.withColumn("__r", F.lit(1)), ["s", "d"], "left")
    return (
        marked.groupBy(F.col("s").alias("src"))
        .agg(
            F.count("*").alias("n_out"),
            F.sum(F.coalesce(F.col("__r"), F.lit(0))).alias("n_recip"),
        )
        .select(
            "src",
            F.col("n_out").cast("long").alias("n_out"),
            F.col("n_recip").cast("long").alias("n_recip"),
            F.round(F.col("n_recip") * 100.0 / F.col("n_out"), 2).alias("recip_pct"),
        )
    )


def link_reciprocity_sql(edges: str, src: str = "src", dst: str = "dst") -> str:
    """DuckDB replay of :func:`link_reciprocity` — same distinct
    edge set, same swapped self-join."""
    return f"""
        WITH lr_e AS (
          SELECT DISTINCT {src} AS s, {dst} AS d FROM {edges} WHERE {src} <> {dst}
        ), lr_m AS (
          SELECT e.s, e.d,
                 CASE WHEN r.s IS NOT NULL THEN 1 ELSE 0 END AS rec
          FROM lr_e e LEFT JOIN lr_e r ON r.s = e.d AND r.d = e.s
        )
        SELECT s AS src, CAST(COUNT(*) AS BIGINT) AS n_out,
               CAST(SUM(rec) AS BIGINT) AS n_recip,
               ROUND(SUM(rec) * 100.0 / COUNT(*), 2) AS recip_pct
        FROM lr_m GROUP BY s
    """


def triangle_counts(edges: DataFrame, src: str = "src",
                    dst: str = "dst") -> DataFrame:
    """Per-node triangle participation + local clustering over the
    undirected link graph — the community-vs-link-farm texture
    signal (organic site neighborhoods close triangles; generated
    spam constellations are locally tree-like, and a host whose
    neighborhood never closes a triangle earns frontier suspicion).

    Algorithm is the compact-forward / node-iterator++ shape
    (Schank-Wagner; Suri-Vassilvitskii's MapReduce variant): orient
    every undirected edge from the (degree, node)-smaller endpoint
    to the larger, so each node's OUT-degree is O(sqrt(m)) on any
    graph — the orientation is what keeps the wedge join from
    exploding on hot hosts (a 10^6-degree hub generates wedges only
    as the CLOSING side, never as the pivot). Then ONE self-join
    builds wedges a->b->c and ONE more equi-join closes them against
    the oriented edge set; every triangle is produced exactly once
    (a < b < c in the total order). All equi-joins, no broadcast
    assumption; per-node counts via explode + one hash agg.

    Output: (node, degree, n_triangles, clustering) for every node
    of the undirected graph; clustering = 2T / deg(deg-1), NULL for
    degree < 2 (undefined, not zero)."""
    lo = F.least(F.col(src), F.col(dst))
    hi = F.greatest(F.col(src), F.col(dst))
    und = (
        edges.filter(F.col(src) != F.col(dst))
        .select(lo.alias("a"), hi.alias("b"))
        .distinct()
    )
    deg = (
        und.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node").agg(F.count("*").alias("degree"))
    )
    d = und.join(deg.withColumnsRenamed({"node": "a", "degree": "da"}), "a") \
           .join(deg.withColumnsRenamed({"node": "b", "degree": "db"}), "b")
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    oriented = d.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    )
    e1 = oriented.withColumnsRenamed({"u": "x", "v": "y"})
    e2 = oriented.withColumnsRenamed({"u": "y", "v": "z"})
    wedges = e1.join(e2, "y").filter(F.col("x") != F.col("z"))
    tri = wedges.join(
        oriented.withColumnsRenamed({"u": "x", "v": "z"}), ["x", "z"]
    )
    per_node = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node").agg(F.count("*").alias("n_triangles"))
    )
    out = deg.join(per_node, "node", "left").select(
        "node", "degree",
        F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long")
         .alias("n_triangles"),
    )
    clustering = F.when(
        F.col("degree") >= 2,
        F.round(F.col("n_triangles") * 2.0
                / (F.col("degree") * (F.col("degree") - 1)), 4),
    )
    return out.withColumn("clustering", clustering)


def triangle_counts_sql(edges: str, src: str = "src",
                        dst: str = "dst") -> str:
    """DuckDB replay of :func:`triangle_counts` — same orientation,
    same wedge-close joins."""
    return f"""
        WITH tc_und AS (
          SELECT DISTINCT least({src}, {dst}) AS a, greatest({src}, {dst}) AS b
          FROM {edges} WHERE {src} <> {dst}
        ), tc_deg AS (
          SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
            SELECT a AS node FROM tc_und
            UNION ALL SELECT b AS node FROM tc_und
          ) GROUP BY node
        ), tc_or AS (
          SELECT CASE WHEN da.degree < db.degree
                        OR (da.degree = db.degree AND u.a < u.b)
                      THEN u.a ELSE u.b END AS u,
                 CASE WHEN da.degree < db.degree
                        OR (da.degree = db.degree AND u.a < u.b)
                      THEN u.b ELSE u.a END AS v
          FROM tc_und u
          JOIN tc_deg da ON da.node = u.a
          JOIN tc_deg db ON db.node = u.b
        ), tc_tri AS (
          SELECT e1.u AS x, e1.v AS y, e2.v AS z
          FROM tc_or e1
          JOIN tc_or e2 ON e2.u = e1.v
          JOIN tc_or e3 ON e3.u = e1.u AND e3.v = e2.v
          WHERE e1.u <> e2.v
        ), tc_pn AS (
          SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
            SELECT x AS node FROM tc_tri
            UNION ALL SELECT y AS node FROM tc_tri
            UNION ALL SELECT z AS node FROM tc_tri
          ) GROUP BY node
        )
        SELECT d.node, d.degree,
               CAST(COALESCE(p.n_triangles, 0) AS BIGINT) AS n_triangles,
               CASE WHEN d.degree >= 2 THEN
                 ROUND(COALESCE(p.n_triangles, 0) * 2.0
                       / (d.degree * (d.degree - 1)), 4) END AS clustering
        FROM tc_deg d LEFT JOIN tc_pn p ON p.node = d.node
    """


# ---- k-core peel -------------------------------------------------------------
#
# The k-core (maximal subgraph where every member keeps >= k
# neighbors INSIDE the subgraph) is the density complement to
# triangle_counts' local texture: a link farm can fake degree but
# organic communities nest cores — frontier reputation wants "is
# this host held by a dense neighborhood or propped by pendant
# trees".  The peel is the standard synchronous fixpoint (Matula &
# Beck / Batagelj-Zaversnik semantics, distributed a la Montresor's
# k-core message passing): each round drops EVERY node whose current
# degree < k at once, then recomputes.  Synchronous rounds (not the
# sequential min-degree order) make the result engine-portable: the
# fixpoint set is identical either way — the k-core is unique — and
# round r's surviving edge set is a pure function of round r-1's, so
# a fixed-round unrolled SQL CTE chain replays the Spark loop
# exactly, converged or not.
#
# Scale shape per round: ONE hash agg (degrees, map-side partials) +
# TWO node-keyed equi-joins of the symmetrized edge table against
# the tiny keep-set + localCheckpoint lineage truncation with the
# surviving-edge count riding the same job as an Observation
# (the connected_components / hits discipline — one job per round,
# nothing all-pairs, no driver-side graph).

def _kcore_sym(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Symmetrized, deduped, loop-free directed view: each undirected
    edge exactly once per direction, so degree = COUNT per side."""
    lo = F.least(F.col(src), F.col(dst))
    hi = F.greatest(F.col(src), F.col(dst))
    und = (
        edges.filter(F.col(src) != F.col(dst))
        .select(lo.alias("a"), hi.alias("b"))
        .distinct()
    )
    return und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )


def _kcore_round(sym: DataFrame, k: int) -> DataFrame:
    deg = sym.groupBy("a").agg(F.count("*").alias("deg"))
    keep = deg.filter(F.col("deg") >= k).select("a")
    return (
        sym.join(keep, "a")
        .join(keep.withColumnRenamed("a", "b"), "b")
        .select("a", "b")
    )


def kcore(edges: DataFrame, k: int, rounds: int,
          src: str = "src", dst: str = "dst") -> DataFrame:
    """(node, degree) after `rounds` synchronous peels toward the
    k-core.  Fixed round count for cross-engine replay — pick
    `rounds` >= the peel depth (longest pendant chain) or use
    :func:`kcore_converged`; a converged peel is the exact k-core.
    Self-loops and duplicate/reversed edges collapse first."""
    sym = _kcore_sym(edges, src, dst).localCheckpoint()
    for _ in range(rounds):
        sym = _kcore_round(sym, k).localCheckpoint()
    return (
        sym.groupBy("a").agg(F.count("*").alias("degree"))
        .select(F.col("a").alias("node"), "degree")
    )


def kcore_converged(edges: DataFrame, k: int, max_rounds: int = 64,
                    src: str = "src", dst: str = "dst") -> DataFrame:
    """:func:`kcore` run to the fixpoint: stops when a round removes
    no edge (edge count is the convergence witness — a dropped node
    always drops its edges — and rides each round's checkpoint job
    as an Observation, zero extra actions)."""
    from pyspark.sql import Observation

    sym = _kcore_sym(edges, src, dst).localCheckpoint()
    prev = None
    for _ in range(max_rounds):
        obs = Observation()
        sym = _kcore_round(sym, k).observe(
            obs, F.count(F.lit(1)).alias("n")).localCheckpoint()
        n = obs.get["n"]
        if n == prev:
            break
        prev = n
    return (
        sym.groupBy("a").agg(F.count("*").alias("degree"))
        .select(F.col("a").alias("node"), "degree")
    )


def kcore_py(edge_list, k: int, rounds: int):
    """Sequential from-scratch reference for the synchronous peel —
    the distributed-vs-sequential contract pin."""
    cur = {(min(u, v), max(u, v)) for u, v in edge_list if u != v}
    for _ in range(rounds):
        deg = {}
        for u, v in cur:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        nxt = {(u, v) for u, v in cur if u in keep and v in keep}
        if nxt == cur:
            break
        cur = nxt
    deg = {}
    for u, v in cur:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    return deg


def kcore_sql(edges: str, k: int, rounds: int,
              src: str = "src", dst: str = "dst") -> str:
    """DuckDB replay of :func:`kcore` — the same symmetrize + fixed
    peel rounds as an unrolled linear CTE chain."""
    ctes = [f"""kc_u AS (
          SELECT DISTINCT least({src}, {dst}) AS a, greatest({src}, {dst}) AS b
          FROM {edges} WHERE {src} <> {dst}
        ), kc_e0 AS (
          SELECT a, b FROM kc_u
          UNION ALL SELECT b AS a, a AS b FROM kc_u
        )"""]
    # kc_e{r} and kc_k{r} are each referenced more than once;
    # MATERIALIZED stops exponential CTE inlining (the seed_distance
    # lesson — DuckDB 1.0 inlines multi-referenced CTEs)
    for r in range(rounds):
        ctes.append(f"""kc_k{r} AS MATERIALIZED (
          SELECT a FROM kc_e{r} GROUP BY a HAVING COUNT(*) >= {k}
        ), kc_e{r + 1} AS MATERIALIZED (
          SELECT e.a, e.b FROM kc_e{r} e
          JOIN kc_k{r} x ON e.a = x.a
          JOIN kc_k{r} y ON e.b = y.a
        )""")
    return f"""
        WITH {", ".join(ctes)}
        SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS degree
        FROM kc_e{rounds} GROUP BY a
    """


# ---- hop distance from the seed set ------------------------------------------
#
# "How far is this host from anything we trust?" is the frontier's
# depth map: BFS layer over the DIRECTED link graph from the seed
# hosts — the number the reference's crawl implicitly tracks as its
# BFS wave (T1's depth limit) and TrustRank smooths into mass. The
# exact hop count is the audit view: depth-0/1 hosts are the curated
# neighborhood, depth-5+ reachable-only-through-chains hosts are
# where spam lives, unreachable hosts should not be in the frontier
# at all. Synchronous label-correction rounds (Bellman-Ford with
# unit weights): per round ONE src-keyed equi-join + ONE min agg +
# ONE node-keyed merge, localCheckpoint truncation, changed-count
# riding the checkpoint job as an Observation. Fixed `rounds` =
# max depth resolved; the unrolled CTE chain replays it exactly.
# NULL-aware min is spelled explicitly (CASE, not LEAST) — engines
# disagree on LEAST's NULL behavior.

def _dist_merge(old, cand):
    return (
        F.when(old.isNull(), cand)
        .when(cand.isNull(), old)
        .otherwise(F.least(old, cand))
    )


def seed_distance(edges: DataFrame, seeds: DataFrame, rounds: int,
                  src: str = "src", dst: str = "dst",
                  seed_col: str = "id") -> DataFrame:
    """(node, dist) for every endpoint of the directed edge list;
    dist = exact hop count from the nearest seed, NULL when
    unreachable within `rounds` hops. Seeds not in the graph are
    ignored (distance flows along edges only)."""
    from pyspark.sql import Observation

    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    e = edges.select(F.col(src).alias("esrc"),
                     F.col(dst).alias("edst")).distinct().localCheckpoint()
    state = (
        nodes.join(seeds.select(F.col(seed_col).alias("node"),
                                F.lit(0).cast("long").alias("__s")),
                   "node", "left")
        .select("node", F.col("__s").alias("dist"))
        .localCheckpoint()
    )
    for _ in range(rounds):
        cand = (
            e.join(state.where(F.col("dist").isNotNull())
                   .select(F.col("node").alias("esrc"), "dist"), "esrc")
            .groupBy(F.col("edst").alias("node"))
            .agg(F.min(F.col("dist") + 1).alias("cand"))
        )
        obs = Observation()
        merged = (
            state.join(cand, "node", "left")
            .select("node", _dist_merge(F.col("dist"), F.col("cand"))
                    .alias("new_dist"), "dist")
            .observe(obs, F.count(F.when(
                ~F.col("new_dist").eqNullSafe(F.col("dist")), 1)).alias("ch"))
            .select("node", F.col("new_dist").alias("dist"))
        )
        state = merged.localCheckpoint()
        if not int(obs.get["ch"] or 0):
            break
    return state


def seed_distance_py(edge_list, seed_ids, rounds: int):
    """Sequential reference for the synchronous label correction."""
    nodes = {u for u, _ in edge_list} | {v for _, v in edge_list}
    dist = {n: (0 if n in set(seed_ids) else None) for n in nodes}
    for _ in range(rounds):
        nxt = dict(dist)
        for u, v in edge_list:
            if dist[u] is not None:
                c = dist[u] + 1
                if nxt[v] is None or c < nxt[v]:
                    nxt[v] = c
        if nxt == dist:
            break
        dist = nxt
    return dist


def seed_distance_sql(edges: str, seeds: str, rounds: int,
                      src: str = "src", dst: str = "dst",
                      seed_col: str = "id") -> str:
    """DuckDB replay of :func:`seed_distance` — unrolled synchronous
    rounds, same explicit NULL-aware min."""
    # every round CTE is referenced twice downstream; MATERIALIZED
    # stops DuckDB's inliner from expanding the chain exponentially
    # (12 rounds would otherwise open the base scan 2^12 times)
    ctes = [f"""sd_n AS MATERIALIZED (
          SELECT {src} AS node FROM {edges}
          UNION SELECT {dst} AS node FROM {edges}
        ), sd_e AS MATERIALIZED (
          SELECT DISTINCT {src} AS esrc, {dst} AS edst FROM {edges}
        ), sd_0 AS MATERIALIZED (
          SELECT n.node,
                 CASE WHEN s.{seed_col} IS NOT NULL
                      THEN CAST(0 AS BIGINT) END AS dist
          FROM sd_n n LEFT JOIN {seeds} s ON s.{seed_col} = n.node
        )"""]
    for r in range(rounds):
        ctes.append(f"""sd_c{r} AS (
          SELECT e.edst AS node, MIN(s.dist + 1) AS cand
          FROM sd_e e JOIN sd_{r} s ON s.node = e.esrc
          WHERE s.dist IS NOT NULL GROUP BY e.edst
        ), sd_{r + 1} AS MATERIALIZED (
          SELECT s.node,
                 CASE WHEN s.dist IS NULL THEN c.cand
                      WHEN c.cand IS NULL THEN s.dist
                      ELSE least(s.dist, c.cand) END AS dist
          FROM sd_{r} s LEFT JOIN sd_c{r} c ON c.node = s.node
        )""")
    return f"""
        WITH {", ".join(ctes)}
        SELECT node, dist FROM sd_{rounds}
    """
