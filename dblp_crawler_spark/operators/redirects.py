"""Transitive redirect resolution — collapse 3xx / rel=canonical
chains to their final resource before frontier admission.

A web frontier that doesn't resolve redirects fetches the same final
page under every alias and pollutes the seen set with intermediate
hops. The reference never needs this (its one host serves stable
URLs); at web scale it's a standard frontier-admission step: resolve
src → final, then canonicalize + hash the FINAL url into the
bloom/cuckoo bank.

Semantics mirror real HTTP clients: follow at most ``max_hops``
redirects (curl caps at 50, browsers ~20); a chain still unresolved
at the cap — which includes every cycle — is reported
``resolved = false`` ("too many redirects"), never an error.

Scale shape: the redirect map is a FUNCTIONAL graph (one out-edge
per src; duplicate records are collapsed to the min dst for
determinism). Each round is ONE equi-join of live states against the
map + a projection; lineage is truncated per round with
localCheckpoint and the moved-counter rides the checkpoint's own job
as an Observation (the connected_components discipline — zero extra
actions per round). Rounds stop as soon as no row moves, so
wall-clock is O(longest chain), not O(max_hops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(
    redirects: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 20,
) -> DataFrame:
    """(src, dst) redirect records → (src, final, hops, resolved).

    One output row per distinct src. ``hops`` is the number of edges
    followed (capped at max_hops); ``resolved`` is false iff the walk
    was still on a redirecting node at the cap (long chain or cycle).
    """
    from pyspark.sql import Observation

    rmap = (
        redirects.groupBy(F.col(src).alias("m_src"))
        .agg(F.min(F.col(dst)).alias("m_dst"))
        .localCheckpoint()
    )
    state = rmap.select(
        F.col("m_src").alias("src_id"),
        F.col("m_dst").alias("cur"),
        F.lit(1).cast("int").alias("hops"),
    ).localCheckpoint()
    for _ in range(max_hops - 1):
        obs = Observation()
        moved = F.col("m_dst").isNotNull().cast("int")
        stepped = (
            state.join(rmap, state["cur"] == rmap["m_src"], "left")
            .observe(obs, F.sum(moved).alias("moved"))
            .select(
                "src_id",
                F.coalesce("m_dst", "cur").alias("cur"),
                (F.col("hops") + moved).alias("hops"),
            )
        )
        state = stepped.localCheckpoint()
        if not int(obs.get["moved"] or 0):
            break
    fin = state.join(rmap, state["cur"] == rmap["m_src"], "left").select(
        F.col("src_id").alias(src),
        F.col("cur").alias("final"),
        "hops",
        F.col("m_src").isNull().alias("resolved"),
    )
    return fin
