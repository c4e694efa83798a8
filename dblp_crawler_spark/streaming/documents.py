"""Streaming document curation: the batch curation chain
(lang gate → quality gate → repetition gate → exact dedup) applied
to an unbounded document stream.

Why this exists: a crawl is a stream — pages arrive continuously,
and a training-data pipeline curates them as they land rather than
re-scanning the corpus. Every scalar gate in operators/textstats is
a stateless per-row expression, so it is streaming-safe verbatim;
the only stateful step is exact dedup, which becomes Structured
Streaming keyed state (`dropDuplicates` on the text hash).

State posture at scale: plain `dropDuplicates` keeps one state row
per distinct hash forever — exact, but state grows with the corpus
(that is inherent to exact streaming dedup; it is the streaming
twin of the seen_pubs table). When keys are only duplicated within
a bounded arrival window, pass `within_watermark` to use
`dropDuplicatesWithinWatermark`, which expires state at the horizon.

`curate` is one definition for both engines: called on a batch
DataFrame it equals the batch pipeline (tested equal to
`__spark_entry__.q_pipeline_curation` semantics); called on a
readStream DataFrame it runs incrementally under any trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.textstats import lang_id, quality_score, repetition_ratio, token_count


def curate(docs: DataFrame, min_tokens: int = 10, min_quality: float = 0.7,
           max_repetition: float = 0.6, lang: str = "en",
           within_watermark: str | None = None,
           text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gate + dedup a (possibly streaming) document set. Returns
    (id, n_tokens, quality, rep_ratio) for survivors; first arrival
    wins the dedup in streaming mode (batch mode: arbitrary member —
    use drop_exact_dups for the deterministic min-id variant)."""
    scored = docs.select(
        F.col(id_col),
        F.col(text_col),
        token_count(text_col).alias("n_tokens"),
        quality_score(text_col).alias("quality"),
        F.round(repetition_ratio(text_col, 3), 4).alias("rep_ratio"),
        lang_id(text_col).alias("lang_pred"),
    )
    kept = scored.filter(
        (F.col("lang_pred") == lang)
        & (F.col("quality") >= min_quality)
        & (F.col("rep_ratio") <= max_repetition)
        & (F.col("n_tokens") >= min_tokens)
    ).withColumn("text_hash", F.md5(F.col(text_col)))
    if within_watermark is not None:
        deduped = kept.dropDuplicatesWithinWatermark(["text_hash"])
    else:
        deduped = kept.dropDuplicates(["text_hash"])
    return deduped.select(id_col, "n_tokens", "quality", "rep_ratio")


def quota_cap_stream(docs: DataFrame, n: int, source_col: str = "source",
                     id_col: str = "doc_id") -> DataFrame:
    """Streaming per-source quota cap: admit the first `n` documents
    per source in ARRIVAL order and drop the rest — the unbounded
    twin of textstats.per_source_cap (which ranks by quality over a
    finished corpus; a stream admits greedily as pages land, the
    crawl-side mix control). Arrival order = micro-batch order;
    inside one micro-batch, ascending id is the deterministic
    tie-break (group rows reach the state function unordered).

    Returns (source, id, rank): rank is the admit ordinal within the
    source (0-based, contiguous across micro-batches).

    State posture: ONE integer per source (the admitted count) —
    state is bounded by #sources regardless of stream length, the
    opposite regime from exact dedup's per-key state. No timeout:
    a quota never expires.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    id_dt = docs.schema[id_col].dataType.simpleString()
    src_dt = docs.schema[source_col].dataType.simpleString()
    out_schema = f"{source_col} {src_dt}, {id_col} {id_dt}, rank long"
    state_schema = "admitted long"

    def fn(key, pdfs, state: GroupState):
        (src,) = key
        (admitted,) = state.get if state.exists else (0,)
        rows = pd.concat(list(pdfs), ignore_index=True)
        if len(rows) == 0:
            return
        rows = rows.sort_values(id_col, ignore_index=True)
        take = rows.iloc[: max(n - admitted, 0)]
        if len(take):
            yield pd.DataFrame(
                {
                    source_col: take[source_col],
                    id_col: take[id_col],
                    "rank": range(admitted, admitted + len(take)),
                }
            )
        state.update((admitted + len(take),))

    return (
        docs.select(source_col, id_col)
        .groupBy(source_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )
