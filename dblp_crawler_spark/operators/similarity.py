"""Similarity search over an embedding column (array<float>).

Three paths:
  * brute-force cosine top-k — the exactness baseline: broadcast the
    (small) query set against the corpus, JVM-side zip_with dot
    products, per-query top-k window;
  * LSH-bucketed ANN — a scale path: deterministic random
    hyperplanes (seeded numpy, shipped as literals) → sign bits →
    bucket equi-join with multi-probe (hamming-1 neighbors), exact
    re-rank inside the candidate set;
  * IVF ANN — the other classic scale path: a coarse quantizer
    (hash-seeded k-means, a few distributed Lloyd rounds) assigns
    every corpus vector to a cell; a query probes only its
    `nprobe` nearest cells. The centroid table is tiny and
    broadcast; the corpus side is written partitioned by cell so a
    probe is a partition-pruned scan.

At 100 TB the corpus side is bucketed on disk by signature/cell, so
the probe join prunes partitions; the brute-force path stays as the
verification oracle (recall gates in tests).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import cosine_sim, l2_norm


def _dot(a, b) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _cos_pre(qv, cv, nq, nc) -> Column:
    """Cosine from precomputed norms: the dot/(nq*nc) expression is
    bit-identical to cosine_sim — only where the norm folds run
    moves (once per input row, BEFORE the candidate join/explode,
    instead of once per candidate pair)."""
    return _dot(qv, cv) / (F.col(nq) * F.col(nc))

# centroid scoring runs through an interpreted HOF lambda: O(cells ·
# dim) interpreted ops per corpus row. Past this many cells the build
# should be sharded (per-shard quantizers), not widened.
_MAX_HOF_CELLS = 256


def brute_force_topk(queries: DataFrame, corpus: DataFrame, k: int = 10,
                     q_id: str = "q_id", c_id: str = "vec_id",
                     q_vec: str = "q_vec", c_vec: str = "embedding") -> DataFrame:
    """Exact top-k by cosine; deterministic tie-break on corpus id.
    Queries are broadcast (the small side by construction). Norms are
    folded once per input row BEFORE the cross join (bit-identical:
    the dot/(nq*nc) expression is unchanged), so each of the
    |q|x|corpus| pairs costs one dot product, not three folds."""
    from .dedup import l2_norm

    q = F.broadcast(
        queries.select(F.col(q_id), F.col(q_vec).cast("array<double>").alias("__qv"))
        .withColumn("__nq", l2_norm(F.col("__qv")))
    )
    c = corpus.select(F.col(c_id), F.col(c_vec).cast("array<double>").alias("__cv")).withColumn(
        "__nc", l2_norm(F.col("__cv"))
    )
    scored = q.crossJoin(c).withColumn("cosine", _cos_pre("__qv", "__cv", "__nq", "__nc"))
    w = Window.partitionBy(q_id).orderBy(F.desc("cosine"), F.asc(c_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, F.round("cosine", 6).alias("cosine"), "rank")
    )


def _planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal((n_planes, dim))


def _planes_literal(planes: np.ndarray) -> Column:
    """array<array<double>> literal via ONE parsed SQL expression.
    (Building it from per-element F.lit calls costs thousands of py4j
    round trips — measured ~8 s of driver time for 8 tables x 6
    planes x 64 dims before any Spark work started.)"""
    rows = ",".join("array(" + ",".join(f"{float(x)!r}D" for x in row) + ")" for row in planes)
    return F.expr(f"array({rows})")


#: fixed-point scale for quantized LSH signatures (2^20): plane and
#: vector components become exact integers, so every dot product is
#: exact integer arithmetic — the SAME bucket assignment in any
#: engine (Spark, DuckDB, a future executor version), instead of
#: depending on float summation order at the sign boundary.
LSH_QUANT_SCALE = 1 << 20


def _iplanes(planes: np.ndarray) -> list[list[int]]:
    """Quantize plane components to integers in PYTHON so the exact
    same literals ship to Spark and to the SQL oracle."""
    return [[int(round(float(x) * LSH_QUANT_SCALE)) for x in row] for row in planes]


def quantize_vec(vec: Column) -> Column:
    """floor(vec · 2^20) as array<long> — compute ONCE per row and
    share across all signature tables."""
    return F.transform(vec, lambda x: F.floor(x * F.lit(float(LSH_QUANT_SCALE))).cast("long"))


def lsh_signature_quantized(qvec: Column, iplanes: list[list[int]]) -> Column:
    """Sign-bit signature over fixed-point integers: bit_i = 1 iff
    qvec · iplane_i > 0, where qvec = quantize_vec(vec). Same
    single-expression zip_with(planes, masks) shape as the float
    lsh_signature (one nested fold, not a per-plane expression
    chain — measured ~1.5× cheaper). All-long arithmetic — exact,
    order-independent, engine-portable. With |vec| ≤ ~1 and N(0,1)
    planes the products stay < 2^43 and 64-dim sums < 2^49: no
    overflow, and even a double-based replay is exact."""
    rows = ",".join("array(" + ",".join(f"{p}L" for p in row) + ")" for row in iplanes)
    pl = F.expr(f"array({rows})")
    masks = F.expr("array(" + ",".join(f"{1 << i}L" for i in range(len(iplanes))) + ")")
    bits = F.zip_with(
        pl,
        masks,
        lambda p, m: F.when(
            F.aggregate(
                F.zip_with(qvec, p, lambda a, b: a * b), F.lit(0).cast("long"), lambda acc, v: acc + v
            ) > 0,
            m,
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda a, x: a.bitwiseOR(x))


def lsh_signature(vec: Column, planes: np.ndarray) -> Column:
    """Sign-bit signature: bit_i = 1 iff vec · plane_i > 0 — one
    zip_with over (plane, bitmask) pairs, JVM-side, no UDF."""
    pl = _planes_literal(planes)
    masks = F.expr("array(" + ",".join(f"{1 << i}L" for i in range(len(planes))) + ")")
    bits = F.zip_with(
        pl,
        masks,
        lambda p, m: F.when(
            F.aggregate(F.zip_with(vec, p, lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v) > 0,
            m,
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda a, x: a.bitwiseOR(x))


def _nearest_cells(vec: Column, centroids: DataFrame, n: int, cent_id: str = "cell",
                   cent_vec: str = "centroid"):
    """Per-row top-n centroid ids by cosine — centroids collected to
    ONE array literal-like broadcast struct column (the centroid
    table is ≤ a few thousand rows by construction).

    Regime note: the scoring lambda runs INTERPRETED (higher-order
    functions don't codegen), so per-row cost is O(n_cells · dim)
    interpreted ops — fine through a few hundred cells (see
    ``_MAX_HOF_CELLS`` guard in ivf_index); at larger quantizers,
    shard the corpus and build per-shard indexes with bounded cell
    counts rather than one giant centroid array."""
    cents = F.broadcast(
        centroids.groupBy().agg(
            F.collect_list(F.struct(F.col(cent_id).alias("c"), F.col(cent_vec).alias("v"))).alias("__cents")
        )
    )
    scored = F.transform(
        F.col("__cents"),
        lambda s: F.struct(cosine_sim(vec, s["v"]).alias("sim"), s["c"].alias("c")),
    )
    top = F.slice(F.reverse(F.array_sort(scored)), 1, n)
    return cents, F.transform(top, lambda s: s["c"])


def ivf_index(corpus: DataFrame, n_cells: int = 16, iters: int = 2, seed: int = 42,
              c_id: str = "vec_id", c_vec: str = "embedding") -> tuple[DataFrame, DataFrame]:
    """Build the IVF coarse quantizer: deterministic init (the
    n_cells corpus rows with the smallest xxhash64(id, seed) — a
    seeded sample without RNG state), then `iters` distributed Lloyd
    rounds (assign = argmax cosine vs broadcast centroids; update =
    per-(cell, dimension) mean via posexplode + two hash aggs).

    Returns (centroids(cell, centroid), assigned(corpus + cell)).
    At scale: write `assigned` partitioned/bucketed by cell — then a
    probe reads only nprobe cells (partition pruning), and the
    centroid table is broadcast everywhere. Each Lloyd round is two
    shuffles (argmax agg is map-side partial over the explode), and
    each round's centroids are localCheckpoint-ed: without the
    truncation every action would re-execute the whole assignment
    chain (plan depth O(iters) — the exact lineage blow-up
    connected_components avoids the same way)."""
    if n_cells > _MAX_HOF_CELLS:
        import warnings

        warnings.warn(
            f"n_cells={n_cells} scores centroids through an interpreted HOF "
            f"lambda; beyond {_MAX_HOF_CELLS} cells build sharded indexes instead",
            stacklevel=2,
        )
    c0 = corpus.select(F.col(c_id), F.col(c_vec).cast("array<double>").alias("__cv"))
    init = (
        c0.orderBy(F.xxhash64(F.col(c_id).cast("string"), F.lit(seed)))
        .limit(n_cells)
        .select(F.col("__cv").alias("centroid"))
    )
    w0 = Window.orderBy(F.xxhash64(F.col("centroid").cast("array<string>").cast("string")))
    centroids = init.withColumn("cell", F.row_number().over(w0) - 1).select("cell", "centroid")
    centroids = centroids.localCheckpoint(eager=True)
    for _ in range(iters):
        cents, top1 = _nearest_cells(F.col("__cv"), centroids, 1)
        assigned = c0.crossJoin(cents).select(
            F.col(c_id), F.col("__cv"), F.element_at(top1, 1).alias("cell")
        )
        centroids = (
            assigned.select("cell", F.posexplode("__cv").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.avg("val").alias("m"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
                ).alias("centroid")
            )
            # truncate lineage: the next round (and every later
            # action) starts from materialized n_cells rows, not the
            # full prior assignment plan
            .localCheckpoint(eager=True)
        )
    cents, top1 = _nearest_cells(F.col("__cv"), centroids, 1)
    assigned = c0.crossJoin(cents).select(
        F.col(c_id), F.col("__cv").alias("vec"), F.element_at(top1, 1).alias("cell")
    )
    return centroids, assigned


def ivf_topk(queries: DataFrame, centroids: DataFrame, assigned: DataFrame, k: int = 10,
             nprobe: int = 4, q_id: str = "q_id", q_vec: str = "q_vec",
             c_id: str = "vec_id") -> DataFrame:
    """IVF search: per query, cosine-rank the broadcast centroids,
    take the top-`nprobe` cells, equi-join the (cell-partitioned)
    corpus on cell, exact re-rank inside the probed cells. Recall < 1
    by design — gated against brute_force_topk in tests."""
    q0 = queries.select(F.col(q_id), F.col(q_vec).cast("array<double>").alias("__qv")).withColumn(
        "__nq", l2_norm(F.col("__qv"))
    )
    cents, topn = _nearest_cells(F.col("__qv"), centroids, nprobe)
    probes = q0.crossJoin(cents).select(
        F.col(q_id), F.col("__qv"), F.col("__nq"), F.explode(topn).alias("cell")
    )
    scored = (
        probes.join(assigned.withColumn("__nc", l2_norm(F.col("vec"))), "cell")
        .withColumn("cosine", _cos_pre("__qv", "vec", "__nq", "__nc"))
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("cosine"), F.asc(c_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, F.round("cosine", 6).alias("cosine"), "rank")
    )


def write_ivf_store(assigned: DataFrame, path: str) -> None:
    """Persist the IVF-assigned corpus partitioned by cell —
    `ivf_topk_pruned` then scans ONLY the probed cells (Catalyst
    partition pruning; the Iceberg equivalent is a partition
    transform on cell). This is how the probe stays O(probed cells)
    I/O at 100 TB instead of a full-corpus scan per query batch."""
    assigned.write.mode("overwrite").partitionBy("cell").parquet(path)


def quantize_unit(vec: Column, nrm: Column) -> Column:
    """floor((vec / ‖vec‖) · 2^20) as array<long> — fixed-point UNIT
    vector, so integer L2 between these is monotone in cosine (the
    re-rank metric). `nrm` must be l2_norm(vec) computed as the
    sequential fold (engine-portable: same element order → identical
    partial sums → identical quantized ints in any engine)."""
    safe = F.when(nrm == 0, F.lit(1.0)).otherwise(nrm)
    return F.transform(
        vec, lambda x: F.floor(x / safe * F.lit(float(LSH_QUANT_SCALE))).cast("long")
    )


def _l2q(a: Column, b: Column) -> Column:
    """Exact integer squared L2 between fixed-point vectors: diffs
    ≤ 2^22, squares ≤ 2^44, 64-dim sums < 2^51 — no overflow, and a
    double-based replay (dot(a,a) − 2·dot(a,b) + dot(b,b)) is exact
    too, so the ranking is engine-portable."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _nearest_cells_quantized(qvec: Column, centroids: DataFrame, n: int):
    """Top-n cells by exact integer L2 (tie → smaller cell id) — the
    quantized counterpart of _nearest_cells; same broadcast
    collect_list shape and the same _MAX_HOF_CELLS regime."""
    cents = F.broadcast(
        centroids.groupBy().agg(
            F.collect_list(F.struct(F.col("cell").alias("c"), F.col("qcent").alias("v"))).alias("__cents")
        )
    )
    scored = F.transform(
        F.col("__cents"),
        lambda s: F.struct(_l2q(qvec, s["v"]).alias("d"), s["c"].alias("c")),
    )
    top = F.slice(F.array_sort(scored), 1, n)
    return cents, F.transform(top, lambda s: s["c"])


def _assign_cells_vectorized(c0: DataFrame, cents_df: DataFrame, c_id: str) -> DataFrame:
    """Value-identical large-k replay of the quantized HOF argmin
    assignment (pinned equal in tests): exact int64 arithmetic via
    d = |q|² + |c|² − 2·q·c over the fixed-point vectors (every term
    < 2^46 — exact), ties → smallest cell (centroid rows ordered by
    cell; argmin returns the FIRST minimum, and array_sort on
    (d, cell) structs picks the same one). Arrow-batched numpy
    matmul instead of an interpreted per-row lambda over all k
    centroids — the input_hint UDF discipline (vectorized, never
    per-row Python). The centroid matrix is a driver-side collect of
    k·dim longs — bounded by the quantizer, never the corpus."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    rows = cents_df.orderBy("cell").collect()
    C = np.array([list(r["qcent"]) for r in rows], dtype=np.int64)
    cells = np.array([r["cell"] for r in rows], dtype=np.int64)
    cnorm = (C * C).sum(axis=1)

    keep = [f for f in c0.schema.fields if f.name in (c_id, "__cv", "__qq")]
    out_schema = StructType(keep + [StructField("cell", IntegerType())])

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                pdf = pdf.copy()
                pdf["cell"] = np.array([], dtype="int32")
                yield pdf
                continue
            Q = np.array([np.asarray(v, dtype=np.int64) for v in pdf["__qq"]], dtype=np.int64)
            qn = (Q * Q).sum(axis=1)
            d = qn[:, None] + cnorm[None, :] - 2 * (Q @ C.T)
            out = pdf.copy()
            out["cell"] = cells[d.argmin(axis=1)].astype("int32")
            yield out

    return c0.select(*[f.name for f in keep]).mapInPandas(run, out_schema)


def ivf_index_quantized(corpus: DataFrame, n_cells: int = 8, iters: int = 1, seed: int = 42,
                        c_id: str = "vec_id", c_vec: str = "embedding") -> tuple[DataFrame, DataFrame]:
    """Fixed-point IVF quantizer: EVERY arithmetic step that decides
    cell membership is exact integer work, so the index is
    engine-portable — a corpus partitioned on disk by these cells is
    re-derivable bit-identically by any engine (the DuckDB oracle
    replays init, Lloyd round(s), and final assignment), exactly the
    property a persistent 100 TB cell-partitioned store needs across
    executor upgrades.

      * init: the n_cells rows with the smallest (hash60(id, seed),
        id) — portable seeded sample; cell id = rank in that order;
      * assign: argmin integer squared L2 (tie → smaller cell) over
        quantize_unit'd vectors (fixed-point UNIT vectors, so integer
        L2 is monotone in the cosine re-rank metric; see
        LSH_QUANT_SCALE);
      * update: per-dimension floor(avg) — sums of fixed-point ints
        stay exact in double, so the floor'd mean is deterministic;
      * re-rank at query time stays float cosine (the proven
        list_cosine_similarity equivalence).

    Same per-round localCheckpoint lineage truncation as ivf_index.
    Returns (centroids(cell, qcent), assigned(id, vec, cell))."""
    from ..functions.hashing import hash60

    c0 = (
        corpus.select(F.col(c_id), F.col(c_vec).cast("array<double>").alias("__cv"))
        .withColumn("__nrm", l2_norm(F.col("__cv")))
        .withColumn("__qq", quantize_unit(F.col("__cv"), F.col("__nrm")))
    )
    # distributed top-k on the seed key (TakeOrderedAndProject), then
    # rank WITHIN the n_cells rows — no global window over the corpus
    init = (
        c0.select(c_id, "__qq", hash60(F.col(c_id), seed).alias("__sk"))
        .orderBy("__sk", c_id)
        .limit(n_cells)
    )
    w0 = Window.orderBy("__sk", F.col(c_id))
    centroids = (
        init.withColumn("cell", F.row_number().over(w0) - 1)
        .select("cell", F.col("__qq").alias("qcent"))
        .localCheckpoint(eager=True)
    )

    def assign(cents_df):
        # two value-identical regimes (equality pinned in tests):
        #   k <= _MAX_HOF_CELLS — pure-expression argmin through the
        #     broadcast HOF lambda (no Python anywhere);
        #   k >  _MAX_HOF_CELLS — the interpreted lambda's O(k·dim)
        #     per-row cost stops scaling (cells grow ∝ corpus under
        #     the SemDeDup auto-parameterization), so switch to the
        #     Arrow-batched exact-int64 numpy argmin.
        if n_cells > _MAX_HOF_CELLS:
            return _assign_cells_vectorized(c0, cents_df, c_id)
        cents, top1 = _nearest_cells_quantized(F.col("__qq"), cents_df, 1)
        return c0.crossJoin(cents).select(
            F.col(c_id), F.col("__cv"), F.col("__qq"), F.element_at(top1, 1).alias("cell")
        )

    for _ in range(iters):
        assigned = assign(centroids)
        # floor-of-mean per dimension, then RE-NORMALIZE the centroid
        # to unit fixed point: with unit-scale centroids, integer-L2
        # argmin IS cosine argmax (up to 2^-20 quantization) — without
        # it, longer centroids are unfairly penalized and recall drops
        # (measured 0.82 -> 0.68 at nprobe=4). Every step stays exact:
        # m <= 2^20, m^2 <= 2^40 and 64-term sums <= 2^46 are exact in
        # double, so the re-normalized ints replay in any engine.
        raw = (
            assigned.select("cell", F.posexplode("__qq").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.floor(F.avg("val")).cast("long").alias("m"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
                ).alias("__qraw")
            )
        )
        cn = F.sqrt(
            F.aggregate(
                F.transform("__qraw", lambda x: (x * x).cast("double")),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )
        centroids = (
            raw.withColumn("__cn", cn)
            .select("cell", quantize_unit(F.col("__qraw"), F.col("__cn")).alias("qcent"))
            .localCheckpoint(eager=True)
        )
    assigned = assign(centroids).select(
        F.col(c_id), F.col("__cv").alias("vec"), "cell"
    )
    return centroids, assigned


def ivf_topk_pruned(spark, path: str, queries: DataFrame, centroids: DataFrame,
                    k: int = 10, nprobe: int = 4, q_id: str = "q_id",
                    q_vec: str = "q_vec", c_id: str = "vec_id",
                    quantized: bool = False) -> DataFrame:
    """IVF search against the cell-partitioned store. The probe-cell
    set (≤ queries × nprobe values, deduped) collects driver-side —
    a tiny aggregate, never the vectors — and prunes the scan to
    those directories; then the same exact in-cell re-rank as
    ivf_topk. Result-identical to ivf_topk over the same index.
    With quantized=True, `centroids` is an ivf_index_quantized
    (cell, qcent) table and cell probing is exact integer L2 —
    engine-portable; the in-cell re-rank stays float cosine either
    way."""
    q0 = queries.select(F.col(q_id), F.col(q_vec).cast("array<double>").alias("__qv")).withColumn(
        "__nq", l2_norm(F.col("__qv"))
    )
    if quantized:
        cents, topn = _nearest_cells_quantized(
            quantize_unit(F.col("__qv"), F.col("__nq")), centroids, nprobe
        )
    else:
        cents, topn = _nearest_cells(F.col("__qv"), centroids, nprobe)
    probes = q0.crossJoin(cents).select(
        F.col(q_id), F.col("__qv"), F.col("__nq"), F.explode(topn).alias("cell")
    )
    wanted = [r[0] for r in probes.select("cell").distinct().collect()]
    store = spark.read.parquet(path).filter(F.col("cell").isin(wanted)).withColumn(
        "__nc", l2_norm(F.col("vec"))
    )
    scored = probes.join(store, "cell").withColumn(
        "cosine", _cos_pre("__qv", "vec", "__nq", "__nc")
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("cosine"), F.asc(c_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, F.round("cosine", 6).alias("cosine"), "rank")
    )


def lsh_topk(queries: DataFrame, corpus: DataFrame, k: int = 10, n_planes: int = 8,
             n_tables: int = 4, seed: int = 42, dim: int | None = None,
             q_id: str = "q_id", c_id: str = "vec_id",
             q_vec: str = "q_vec", c_vec: str = "embedding",
             multiprobe: bool = True, quantized: bool = True) -> DataFrame:
    """ANN top-k, standard multi-table LSH: L independent plane sets,
    candidate = bucket match in ANY table (plus hamming-1 probes),
    exact cosine re-rank within the candidate set. Recall < 1 by
    design; compare against brute_force_topk to measure it.

    The bucket join key is (table, bucket) — at scale the corpus is
    written bucketed by this key so each probe is partition-pruned.

    quantized=True (default) computes signatures in fixed-point
    integer arithmetic (see lsh_signature_quantized): bucket
    assignment becomes exact and engine-portable — a corpus bucketed
    on disk years ago still joins correctly, and the DuckDB oracle
    replays the candidate set bit-identically. quantized=False keeps
    the float-dot signature (identical buckets except for vectors
    lying within ~2^-20 of a plane). Recall is gated for the default
    path in tests.

    `dim` is required: the plane literals are built driver-side and
    the array length is not in the schema — inferring it would run a
    hidden corpus job before the query even builds."""
    if dim is None:
        raise ValueError("lsh_topk requires dim (embedding length); "
                         "inferring it would run a hidden driver-side job")
    c0 = corpus.select(F.col(c_id), F.col(c_vec).cast("array<double>").alias("__cv")).withColumn(
        "__nc", l2_norm(F.col("__cv"))
    )
    q0 = queries.select(F.col(q_id), F.col(q_vec).cast("array<double>").alias("__qv")).withColumn(
        "__nq", l2_norm(F.col("__qv"))
    )
    if quantized:
        c0 = c0.withColumn("__qq", quantize_vec(F.col("__cv")))
        q0 = q0.withColumn("__qq", quantize_vec(F.col("__qv")))
    sig_cols_c, sig_cols_q = [], []
    for t in range(n_tables):
        planes = _planes(dim, n_planes, seed + t)
        if quantized:
            ip = _iplanes(planes)
            sig_cols_c.append(lsh_signature_quantized(F.col("__qq"), ip).alias(f"b{t}"))
            sig_cols_q.append(lsh_signature_quantized(F.col("__qq"), ip).alias(f"b{t}"))
        else:
            sig_cols_c.append(lsh_signature(F.col("__cv"), planes).alias(f"b{t}"))
            sig_cols_q.append(lsh_signature(F.col("__qv"), planes).alias(f"b{t}"))
    c = c0.select(F.col(c_id), F.col("__cv"), F.col("__nc"), F.posexplode(F.array(*sig_cols_c)).alias("table", "bucket"))
    q = q0.select(F.col(q_id), F.col("__qv"), F.col("__nq"), F.posexplode(F.array(*sig_cols_q)).alias("table", "bucket"))
    if multiprobe:
        masks = F.array(*[F.lit(1 << i).cast("long") for i in range(n_planes)])
        probes = F.array_union(
            F.array(F.col("bucket")),
            F.transform(masks, lambda m: F.col("bucket").bitwiseXOR(m)),
        )
        q = q.withColumn("bucket", F.explode(probes))
    scored = (
        q.join(c, ["table", "bucket"])
        .select(q_id, c_id, "__qv", "__cv", "__nq", "__nc")
        .dropDuplicates([q_id, c_id])
        .withColumn("cosine", _cos_pre("__qv", "__cv", "__nq", "__nc"))
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("cosine"), F.asc(c_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, F.round("cosine", 6).alias("cosine"), "rank")
    )


def hard_negatives(queries: DataFrame, corpus: DataFrame, k: int = 5,
                   q_id: str = "q_id", c_id: str = "vec_id",
                   q_vec: str = "q_vec", c_vec: str = "embedding",
                   q_label: str = "q_label", c_label: str = "label") -> DataFrame:
    """Contrastive hard-negative mining: for each anchor, the k most
    cosine-similar corpus vectors with a DIFFERENT label — the
    near-miss negatives that make contrastive losses (InfoNCE/
    triplet) learn, where random negatives are trivially separable.

    Same scored shape as :func:`brute_force_topk` with a label
    inequality folded in BEFORE ranking, so the rank-k cutoff is over
    eligible negatives only. Anchors are the broadcast side (a
    sampled/batched set by construction); corpus-scale mining should
    feed candidate buckets from :func:`lsh_topk`/:func:`ivf_topk`
    machinery instead of widening the anchor set — the exact verifier
    shape is this function either way. NULL labels never match
    anything (SQL inequality semantics): anchors with NULL labels
    produce no rows, NULL-labeled corpus vectors are never negatives.
    """
    from .dedup import l2_norm

    q = F.broadcast(
        queries.select(F.col(q_id), F.col(q_label),
                       F.col(q_vec).cast("array<double>").alias("__qv"))
        .withColumn("__nq", l2_norm(F.col("__qv")))
    )
    c = corpus.select(F.col(c_id), F.col(c_label),
                      F.col(c_vec).cast("array<double>").alias("__cv")).withColumn(
        "__nc", l2_norm(F.col("__cv"))
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col(q_label) != F.col(c_label))
        .withColumn("cosine", _cos_pre("__qv", "__cv", "__nq", "__nc"))
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("cosine"), F.asc(c_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, F.round("cosine", 6).alias("cosine"), "rank")
    )


# ---- product quantization (PQ / ADC) -----------------------------------------
#
# The compression tier of the ANN family: IVF shrinks the SEARCH
# (scan only probed cells), PQ shrinks the VECTORS — m sub-codes of
# log2(n_codes) bits replace dim floats (64-dim f32 → 4 bytes at
# m=4, n_codes=256: 64×), so a 100 TB embedding corpus's codes fit
# hot storage and candidate scoring never touches raw vectors.
# Like ivf_index_quantized, EVERY step that decides a code is exact
# integer work over fixed-point unit vectors, so codes, ADC scores,
# ranks, and ties replay bit-identically in any engine (Jégou/
# Douze/Schmid, TPAMI'11 — the IVFADC construction, re-expressed as
# joins + hash aggregations).


def _pq_qbase(corpus: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, qv): fixed-point unit vector per row (quantize_unit) —
    the shared input grain for PQ training, encoding, and queries."""
    return (
        corpus.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("__cv"))
        .withColumn("__nrm", l2_norm(F.col("__cv")))
        .select(id_col, quantize_unit(F.col("__cv"), F.col("__nrm")).alias("qv"))
    )


def _pq_subvectors(qdf: DataFrame, m: int, dim: int, id_col: str) -> DataFrame:
    """(id, j, sv): the m contiguous d/m-dim subvectors of qv,
    exploded map-side (no shuffle)."""
    if dim % m:
        raise ValueError("dim must be divisible by m")
    d_sub = dim // m
    parts = [
        F.struct(
            F.lit(j).alias("j"), F.slice("qv", j * d_sub + 1, d_sub).alias("sv")
        )
        for j in range(m)
    ]
    return qdf.select(id_col, F.explode(F.array(*parts)).alias("p")).select(
        id_col, F.col("p.j").alias("j"), F.col("p.sv").alias("sv")
    )


def _pq_assign(subs: DataFrame, codebook: DataFrame, n_codes: int,
               id_col: str) -> DataFrame:
    """Nearest sub-centroid per (id, j): exact integer squared L2,
    tie → smaller code, folded into one int64 MIN key (d * n_codes
    + c, the scheduler's argmax trick mirrored) — broadcast join on
    j + one hash agg, no window. d ≤ 2^49 for 16-dim fixed-point
    subvectors, so the key stays < 2^58 at n_codes ≤ 256."""
    cb = F.broadcast(codebook.select("j", "c", "qcent"))
    key = _l2q(F.col("sv"), F.col("qcent")) * n_codes + F.col("c")
    return (
        subs.join(cb, "j")
        .groupBy(id_col, "j")
        .agg(F.min(key).alias("__k"))
        .select(
            id_col, "j", F.pmod("__k", F.lit(n_codes)).cast("int").alias("code")
        )
    )


def pq_train(corpus: DataFrame, dim: int, m: int = 4, n_codes: int = 8,
             iters: int = 1, seed: int = 42, c_id: str = "vec_id",
             c_vec: str = "embedding") -> DataFrame:
    """Train the PQ codebook: per subspace j an independent k-means
    over the corpus's j-th subvectors. Deterministic portable init —
    the n_codes rows with the smallest (hash60(id, seed), id) seed
    ALL subspaces (one distributed top-k, no per-subspace sampling
    pass); each Lloyd round is one broadcast assign + one
    floor-of-mean update (exact: fixed-point ints sum exactly in
    double), localCheckpoint'ed so lineage stays O(1) in iters —
    the ivf_index_quantized discipline. A code left empty by a round
    drops out of the codebook (standard empty-cluster shrink) and
    replays identically in the oracle.

    Returns codebook(j, c, qcent array<long>)."""
    from ..functions.hashing import hash60

    base = _pq_qbase(corpus, c_id, c_vec)
    subs = _pq_subvectors(base, m, dim, c_id)
    init = (
        base.select(c_id, "qv", hash60(F.col(c_id), seed).alias("__sk"))
        .orderBy("__sk", c_id)
        .limit(n_codes)
    )
    w0 = Window.orderBy("__sk", F.col(c_id))
    seeds = init.withColumn("c", F.row_number().over(w0) - 1).select("c", "qv")
    codebook = (
        _pq_subvectors(seeds, m, dim, "c")
        .select("j", "c", F.col("sv").alias("qcent"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        a = _pq_assign(subs, codebook, n_codes, c_id)
        codebook = (
            subs.join(a, [c_id, "j"])
            .select("j", F.col("code").alias("c"), F.posexplode("sv").alias("pos", "val"))
            .groupBy("j", "c", "pos")
            .agg(F.floor(F.avg("val")).cast("long").alias("m"))
            .groupBy("j", "c")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("qcent")
            )
            .localCheckpoint(eager=True)
        )
    return codebook


def pq_encode(corpus: DataFrame, codebook: DataFrame, dim: int, m: int = 4,
              n_codes: int = 8, c_id: str = "vec_id",
              c_vec: str = "embedding") -> DataFrame:
    """Encode the corpus against a trained codebook:
    (id, j, code int) — m rows per vector, the join-ready long form
    (pack with :func:`pq_pack` for storage)."""
    base = _pq_qbase(corpus, c_id, c_vec)
    return _pq_assign(_pq_subvectors(base, m, dim, c_id), codebook, n_codes, c_id)


def pq_pack(codes: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """(id, codes array<int>) — the storage form: m small ints per
    vector instead of dim floats."""
    return codes.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("j", "code"))), lambda s: s["code"]
        ).alias("codes")
    )


def pq_adc_topk(queries: DataFrame, codes: DataFrame, codebook: DataFrame,
                dim: int, m: int = 4, k: int = 10, q_id: str = "q_id",
                q_vec: str = "q_vec", c_id: str = "vec_id") -> DataFrame:
    """Asymmetric-distance (ADC) top-k: per query, a tiny distance
    table — exact integer L2 from each query subvector to every
    sub-centroid (m·n_codes entries, broadcast) — then every corpus
    vector scores as the SUM of m table lookups joined on (j, code):
    no raw corpus vectors are read at query time, the property that
    makes PQ the 100 TB scan tier. Deterministic (adc, id) ranking;
    production recall comes from re-ranking the ADC shortlist with
    exact cosine (:func:`pq_topk_reranked`)."""
    qb = _pq_qbase(queries, q_id, q_vec)
    qsubs = _pq_subvectors(qb, m, dim, q_id)
    dt = qsubs.join(F.broadcast(codebook), "j").select(
        q_id, "j", F.col("c").alias("code"),
        _l2q(F.col("sv"), F.col("qcent")).alias("d"),
    )
    scored = (
        codes.join(dt, ["j", "code"])
        .groupBy(q_id, c_id)
        .agg(F.sum("d").alias("adc"))
    )
    w = Window.partitionBy(q_id).orderBy(F.col("adc").asc(), F.col(c_id).asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def pq_topk_reranked(queries: DataFrame, codes: DataFrame, codebook: DataFrame,
                     corpus: DataFrame, dim: int, m: int = 4, k: int = 10,
                     shortlist: int = 50, q_id: str = "q_id",
                     q_vec: str = "q_vec", c_id: str = "vec_id",
                     c_vec: str = "embedding") -> DataFrame:
    """IVFADC-style serving shape: ADC shortlist (cheap, code-only)
    → exact float-cosine re-rank of the shortlist against raw
    vectors (reads `shortlist` rows per query, not the corpus)."""
    short = pq_adc_topk(queries, codes, codebook, dim, m, shortlist,
                        q_id, q_vec, c_id).select(q_id, c_id)
    qn = queries.select(
        F.col(q_id), F.col(q_vec).cast("array<double>").alias("__qv")
    ).withColumn("__nq", l2_norm(F.col("__qv")))
    cn = corpus.select(
        F.col(c_id), F.col(c_vec).cast("array<double>").alias("__rv")
    ).withColumn("__nc", l2_norm(F.col("__rv")))
    scored = (
        short.join(qn, q_id).join(cn, c_id)
        .select(
            q_id, c_id,
            _cos_pre(F.col("__qv"), F.col("__rv"), "__nq", "__nc").alias("cosine"),
        )
    )
    w = Window.partitionBy(q_id).orderBy(F.col("cosine").desc(), F.col(c_id).asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ---- binary (sign) quantization + hamming ANN ---------------------------------

#: 32 set-bit positions per packed word: always-positive int64s, the
#: same portability discipline as hash60 (no sign-bit games in either
#: engine's shift/xor path).
BQ_WORD_BITS = 32


def binary_quantize(vecs: DataFrame, dim: int, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """(id, words array<long>): 1-bit sign quantization — bit i set
    iff v[i] > 0, packed into 32-bit words.  The memory-minimum
    retrieval tier next to PQ: 64-dim float32 vectors (256 B)
    collapse to 8 B of code, so a 100 TB embedding corpus's codes
    fit hot memory and the scan reads 32× fewer bytes; hamming
    distance on sign codes is the standard angular-distance
    surrogate (Charikar hyperplane LSH with axis-aligned planes).
    Pure expressions; exact and engine-portable (float sign compares
    identically everywhere)."""
    words = []
    for w in range(0, dim, BQ_WORD_BITS):
        # unrolled constant-shift terms (shiftleft needs a literal
        # shift; 32 flat when-terms per word stay trivially in codegen)
        terms = [
            F.when(
                F.try_element_at(vec_col, F.lit(i + 1)) > 0,
                F.lit(1 << (i - w)).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
            for i in range(w, min(w + BQ_WORD_BITS, dim))
        ]
        words.append(sum(terms[1:], terms[0]))
    return vecs.select(F.col(id_col), F.array(*words).alias("words"))


def binary_hamming_topk(vecs: DataFrame, query_pred, k: int = 10,
                        dim: int = 64, id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Brute-force hamming top-k over sign codes: queries (rows
    matching ``query_pred``) against the whole corpus —
    (query_id, vec_id, hamming, rank).  The brute scan IS the
    point at this tier (codes are 32× lighter than floats); for
    radius-bounded lookups pair the codes with the pigeonhole
    blocking kernel (dedup.hamming_near_dups_exact) instead.
    Deterministic ties (hamming ASC, id ASC); self-matches excluded.
    Plan: broadcast query codes × corpus codes, one query-keyed
    window group-limit."""
    codes = binary_quantize(vecs, dim, id_col, vec_col)
    q = codes.filter(query_pred).select(
        F.col(id_col).alias("query_id"), F.col("words").alias("qw")
    )
    dist = F.aggregate(
        F.zip_with("qw", "words", lambda a, b: F.bit_count(a.bitwiseXOR(b))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col(id_col).asc()
    )
    return (
        codes.join(F.broadcast(q), F.col(id_col) != F.col("query_id"))
        .withColumn("hamming", dist)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "hamming", F.col("rank").cast("int").alias("rank"))
    )


def binary_hamming_topk_sql(src: str, query_pred_sql: str, k: int = 10,
                            dim: int = 64, id_col: str = "vec_id",
                            vec_col: str = "embedding") -> str:
    """DuckDB replay of :func:`binary_hamming_topk` — same sign
    packing, same xor/bit_count fold, same rank and ties."""
    words = ", ".join(
        "CAST(list_sum(list_transform(range({lo}, {hi}), "
        "i -> CASE WHEN {v}[i + 1] > 0 THEN (CAST(1 AS BIGINT) << (i - {lo})) "
        "ELSE 0 END)) AS BIGINT) AS w{j}".format(
            lo=w, hi=min(w + BQ_WORD_BITS, dim), v=vec_col, j=w // BQ_WORD_BITS
        )
        for w in range(0, dim, BQ_WORD_BITS)
    )
    n_words = (dim + BQ_WORD_BITS - 1) // BQ_WORD_BITS
    dist = " + ".join(
        f"bit_count(xor(q.w{j}, c.w{j}))" for j in range(n_words)
    )
    return f"""
        WITH bq AS (
          SELECT {id_col}, {words} FROM {src}
        ), bq_q AS (
          SELECT * FROM bq WHERE {query_pred_sql}
        ), bq_d AS (
          SELECT q.{id_col} AS query_id, c.{id_col} AS {id_col},
                 CAST({dist} AS BIGINT) AS hamming
          FROM bq_q q JOIN bq c ON c.{id_col} <> q.{id_col}
        )
        SELECT query_id, {id_col}, hamming, rank FROM (
          SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY hamming ASC, {id_col} ASC) AS INT) AS rank
          FROM bq_d
        ) WHERE rank <= {k}
    """


# ---- embedding validation gate -------------------------------------------------

def embedding_quality(vecs: DataFrame, dim: int, id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      max_abs: float = 100.0) -> DataFrame:
    """(id, n_dims, has_nan, zero_norm, max_abs_val, ok): the
    validation gate embeddings must pass BEFORE any ANN/cluster op —
    a NaN poisons every distance it touches (and sorts
    unpredictably), a zero vector makes cosine undefined, a
    wrong-length or exploded-magnitude vector is an upstream bug
    that silently skews neighborhoods. One pure-expression pass:
    dimension check, NaN scan (exists), zero-norm via max(|v_i|)=0
    (no sum that could overflow on garbage), magnitude bound."""
    v = F.col(vec_col)
    absmax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    has_nan = F.exists(v, lambda x: F.isnan(x))
    d = vecs.select(
        F.col(id_col),
        F.size(v).alias("n_dims"),
        F.coalesce(has_nan, F.lit(True)).alias("has_nan"),
        F.coalesce(absmax == 0.0, F.lit(True)).alias("zero_norm"),
        absmax.cast("double").alias("max_abs_val"),
    )
    ok = (
        (F.col("n_dims") == dim)
        & ~F.col("has_nan")
        & ~F.col("zero_norm")
        & (F.col("max_abs_val") <= max_abs)
    )
    return d.withColumn("ok", F.coalesce(ok, F.lit(False)))


def embedding_quality_sql(src: str, dim: int, id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          max_abs: float = 100.0) -> str:
    """DuckDB replay of :func:`embedding_quality`."""
    absmax = f"list_max(list_transform({vec_col}, x -> abs(x)))"
    return f"""
        WITH eq AS (
          SELECT {id_col},
                 CAST(len({vec_col}) AS INT) AS n_dims,
                 -- empty list: Spark's exists() is false, DuckDB's
                 -- list_bool_or is NULL — split NULL-input (true)
                 -- from empty (false) explicitly
                 CASE WHEN {vec_col} IS NULL THEN true
                      ELSE COALESCE(list_bool_or(list_transform({vec_col}, x -> isnan(x))), false)
                 END AS has_nan,
                 COALESCE({absmax} = 0.0, true) AS zero_norm,
                 CAST({absmax} AS DOUBLE) AS max_abs_val
          FROM {src}
        )
        SELECT *, COALESCE(n_dims = {dim} AND NOT has_nan AND NOT zero_norm
                           AND max_abs_val <= {max_abs}, false) AS ok
        FROM eq
    """


# ---- embedding drift between snapshots ---------------------------------------
#
# Retraining data pipelines need to know when a source's embedding
# DISTRIBUTION moved — a redesign, a language shift, an injection —
# before the model does. The per-group signal is the cosine between
# the two snapshots' mean vectors; the engineering problem is that
# float sums are partition-order-dependent, so the mean is computed
# over MILLI-QUANTIZED components (floor(v*1000) as int64): every
# sum is exact integer work, cosine is scale-invariant so the
# un-divided integer sum vectors ARE the mean direction, and the
# only floats are the final sqrt/divide on three exact integers.
# Overflow headroom: |q| <= 1000, so the dot products stay under
# int64 past 10^6 rows x 1000 dims per group. Two explode+sum aggs
# + one per-(group,dim) join + one per-group fold.

def embedding_drift(snap_a: DataFrame, snap_b: DataFrame,
                    group_col: str = "label",
                    vec_col: str = "embedding") -> DataFrame:
    """(group, n_a, n_b, cos_sim, drift) per group present in both
    snapshots; drift = round(1 - cos, 6). Groups whose quantized sum
    vector is all-zero on either side report NULL cosine."""
    def sums(df, tag):
        return (
            df.select(F.col(group_col).alias("g"),
                      F.posexplode(F.col(vec_col)).alias("d", "v"))
            .withColumn("q", F.floor(F.col("v").cast("double") * 1000)
                        .cast("long"))
            .groupBy("g", "d")
            .agg(F.sum("q").alias(f"s_{tag}"))
        )

    na = snap_a.groupBy(F.col(group_col).alias("g")) \
        .agg(F.count(F.lit(1)).alias("n_a"))
    nb = snap_b.groupBy(F.col(group_col).alias("g")) \
        .agg(F.count(F.lit(1)).alias("n_b"))
    j = sums(snap_a, "a").join(sums(snap_b, "b"), ["g", "d"])
    folded = j.groupBy("g").agg(
        F.sum(F.col("s_a") * F.col("s_b")).alias("ab"),
        F.sum(F.col("s_a") * F.col("s_a")).alias("aa"),
        F.sum(F.col("s_b") * F.col("s_b")).alias("bb"),
    )
    cos = F.when(
        (F.col("aa") > 0) & (F.col("bb") > 0),
        F.round(F.col("ab") / (F.sqrt(F.col("aa")) * F.sqrt(F.col("bb"))), 6),
    )
    return (
        folded.join(na, "g").join(nb, "g")
        .select(F.col("g").alias(group_col), "n_a", "n_b",
                cos.alias("cos_sim"),
                F.round(1 - cos, 6).alias("drift"))
    )


def embedding_drift_sql(a: str, b: str, group_col: str = "label",
                        vec_col: str = "embedding") -> str:
    """DuckDB replay of :func:`embedding_drift` — same milli
    quantization and integer folds."""
    def sums(src, tag):
        return f"""(
          SELECT {group_col} AS g, d - 1 AS d,
                 CAST(SUM(CAST(floor(CAST(v AS DOUBLE) * 1000) AS BIGINT))
                      AS BIGINT) AS s_{tag}
          FROM (SELECT {group_col},
                       unnest({vec_col}) AS v,
                       generate_subscripts({vec_col}, 1) AS d
                FROM {src})
          GROUP BY {group_col}, d)"""

    return f"""
        WITH ed_a AS {sums(a, 'a')}, ed_b AS {sums(b, 'b')},
        ed_f AS (
          SELECT g, CAST(SUM(s_a * s_b) AS BIGINT) AS ab,
                 CAST(SUM(s_a * s_a) AS BIGINT) AS aa,
                 CAST(SUM(s_b * s_b) AS BIGINT) AS bb
          FROM ed_a JOIN ed_b USING (g, d) GROUP BY g
        ), ed_na AS (
          SELECT {group_col} AS g, CAST(COUNT(*) AS BIGINT) AS n_a
          FROM {a} GROUP BY {group_col}
        ), ed_nb AS (
          SELECT {group_col} AS g, CAST(COUNT(*) AS BIGINT) AS n_b
          FROM {b} GROUP BY {group_col}
        )
        SELECT g AS {group_col}, n_a, n_b,
               CASE WHEN aa > 0 AND bb > 0 THEN
                 ROUND(ab / (sqrt(aa) * sqrt(bb)), 6) END AS cos_sim,
               ROUND(1 - CASE WHEN aa > 0 AND bb > 0 THEN
                 ROUND(ab / (sqrt(aa) * sqrt(bb)), 6) END, 6) AS drift
        FROM ed_f JOIN ed_na USING (g) JOIN ed_nb USING (g)
    """
