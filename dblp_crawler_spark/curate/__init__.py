"""Standalone training-data curation pipeline over a documents table.

The crawl engine produces page/summary tables; this package makes the
LLM-data-pipeline operators (textstats gates, dedup, components)
runnable as one declarative pass over ANY parquet documents table
(columns: an id column + a text column), batch or via the CLI:

    python -m dblp_crawler_spark.curate -i docs.parquet -o out/ \
        --min-quality 0.7 --lang en --max-rep 0.6 --min-tokens 10 \
        --dedup minhash --report mix.json

Everything is native-expression Spark: the gates are one projection,
exact dedup is one hash agg, minhash dedup is the banded LSH +
connected-components drop-list, keepbest dedup (--dedup keepbest
--key-col url) keeps the highest-quality doc per duplicate key via
one window group-limit shuffle. No eval, no Python row loops.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class CurateConfig:
    min_tokens: int = 10
    max_tokens: int = 100_000
    min_quality: float = 0.7
    max_rep: float = 0.6
    lang: str | None = "en"
    dedup: str = "exact"          # exact | minhash | keepbest | none
    minhash_threshold: float = 0.8
    text_col: str = "text"
    id_col: str = "doc_id"
    key_col: str | None = None    # required for dedup="keepbest"


def curate(docs: DataFrame, cfg: CurateConfig = CurateConfig()) -> tuple[DataFrame, DataFrame]:
    """Apply the gate chain + dedup; returns (kept, report).

    kept   = the surviving rows of `docs` (all original columns).
    report = one-row counts DataFrame (n_input, n_gated, n_kept) —
             computed from the same plans, no extra scans beyond the
             two aggregates."""
    from ..operators import dedup as D
    from ..operators import textstats as T

    scored = docs.withColumns({
        "__n_tok": T.token_count(cfg.text_col),
        "__quality": T.quality_score(cfg.text_col),
        "__rep": T.repetition_ratio(cfg.text_col, n=3),
        "__lang": T.lang_id(cfg.text_col),
    })
    gate = (
        (F.col("__n_tok") >= cfg.min_tokens)
        & (F.col("__n_tok") <= cfg.max_tokens)
        & (F.col("__quality") >= cfg.min_quality)
        & (F.col("__rep") <= cfg.max_rep)
    )
    if cfg.lang:
        gate = gate & (F.col("__lang") == cfg.lang)
    gated = scored.filter(gate).drop("__n_tok", "__quality", "__rep", "__lang")

    if cfg.dedup == "exact":
        kept = D.drop_exact_dups(gated, text_col=cfg.text_col, id_col=cfg.id_col)
    elif cfg.dedup == "minhash":
        pairs = D.minhash_near_dups(
            gated, text_col=cfg.text_col, id_col=cfg.id_col, threshold=cfg.minhash_threshold
        )
        cc = D.connected_components(pairs, src="a", dst="b")
        drop = (
            cc.filter(F.col("id") != F.col("component"))
            .select(F.col("id").alias(cfg.id_col))
        )
        kept = gated.join(drop, cfg.id_col, "left_anti")
    elif cfg.dedup == "keepbest":
        # crawl-dup case: many fetches share one canonical key (url,
        # title_hash, caption) — keep the highest-QUALITY one, not the
        # min-id one, with the deterministic (quality DESC, id ASC)
        # tiebreak. Reuses the gate chain's already-computed __quality
        # column (re-derived from `scored`, not recomputed per row).
        if not cfg.key_col:
            raise ValueError("dedup='keepbest' requires key_col (the duplicate group key)")
        kept = D.drop_dups_keep_best(
            scored.filter(gate).drop("__n_tok", "__rep", "__lang"),
            key_col=cfg.key_col, score_col="__quality", id_col=cfg.id_col,
        ).drop("__quality")
    elif cfg.dedup == "none":
        kept = gated
    else:
        raise ValueError(f"unknown dedup mode {cfg.dedup!r} (exact|minhash|keepbest|none)")

    report = (
        docs.select(F.count(F.lit(1)).alias("n_input"))
        .crossJoin(gated.select(F.count(F.lit(1)).alias("n_gated")))
        .crossJoin(kept.select(F.count(F.lit(1)).alias("n_kept")))
    )
    return kept, report
