"""Streaming sketch maintenance — the point of CRDT sketch state.

HLL registers and CMS counters are associative/commutative/idempotent
(resp. associative/commutative) aggregations, so they run UNCHANGED
as Structured Streaming stateful aggregations: each micro-batch folds
its rows into the register/counter state, and the state at any point
equals the batch build over everything seen so far — no reprocessing,
no watermark needed (the state is bounded by 2^p registers / d·w
counters per group, not by the stream length).

At 100 TB this is how the sketches are actually maintained: a
continuous ingest keeps (group, register, rho) current; "distinct
users this month" is answered from the tiny state table, never by
rescanning raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_stream(events: DataFrame, key_col: str, group_cols: list[str] | None = None,
               p: int = 12, hash_fn=None, hash_bits: int = 64) -> DataFrame:
    """Streaming HLL register maintenance: the same register/rho
    projection as sketch.hll_build, aggregated with max(rho) under
    whatever trigger the caller runs. State size ≤ groups · 2^p rows.
    Use outputMode('update' or 'complete'); the register table at any
    trigger equals hll_build over all rows ingested so far
    (idempotent max-merge — duplicate replays are harmless)."""
    from ..operators.sketch import hll_build

    # hll_build is a pure select + groupBy(...).max — the identical
    # plan is streaming-legal, so just reuse it.
    return hll_build(events, key_col, group_cols, p, hash_fn=hash_fn, hash_bits=hash_bits)


def cms_stream(events: DataFrame, key_col: str, d: int = 4, w: int = 1 << 12,
               weight_col: str | None = None, hash_fn=None) -> DataFrame:
    """Streaming count-min maintenance: slot-wise SUM state (exact
    integer counters). State size ≤ d·w rows. The counter table at
    any trigger equals cms_build over all rows ingested so far."""
    from ..operators.sketch import cms_build

    return cms_build(events, key_col, d, w, weight_col=weight_col, hash_fn=hash_fn)


def fingerprint_stream(docs: DataFrame, group_cols: list[str] | None = None,
                       columns: list[str] | None = None) -> DataFrame:
    """Streaming dataset-fingerprint maintenance: count / bit-XOR /
    additive nibble sums are all commutative streaming aggregates,
    so the replica-audit fingerprint (operators/audit.py) stays
    CURRENT as data lands — an ingest pipeline publishes its own
    multiset hash continuously, and the receiving side compares the
    tiny state tables instead of ever rescanning either copy. State
    size = one row per group. The state at any trigger equals
    table_fingerprint over all rows ingested so far (the CRDT merge
    claim, live)."""
    from ..operators.audit import table_fingerprint

    return table_fingerprint(docs, group_cols=group_cols, columns=columns)
