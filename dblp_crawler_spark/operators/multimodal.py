"""Image payload operators — Arrow-batched decode/verify/transform.

The scheduler's fetch targets are image+caption pages stored in the
`images` Iceberg-style table (EXACT input_hint shape). All pixel work
runs inside `mapInPandas` over Arrow batches: the per-batch loop
dispatches one numpy-vectorized operation per image — no per-row
Python in the pyspark sense (no row-at-a-time UDF; BASELINE.json
input_hint). The codec itself is the deterministic stand-in from
codecs.py (this container has no image library); swapping PIL/libvips
in touches codecs.py only.

input_hint gates implemented here:
  * decoded-pixel allclose vs the reference pixel source of truth —
    PSNR = ∞ for lossless 'png', ≥ 40 dB for lossy 'jpeg';
  * caption equality vs the linked publication;
  * phash recompute: equal for lossless, hamming ≤ 4 for lossy.

Scale: images are fetched by equi-join on image_id (shuffle hash
join; at 100 TB the images table is partitioned/bucketed by
xxhash64(image_id) so the join co-locates); decode is cpu-bound and
salted across executors (functions.hashing.salted_repartition
upstream when the source is skewed by host).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .. import codecs

DECODE_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("fmt", StringType(), True),
        StructField("w", IntegerType(), True),
        StructField("h", IntegerType(), True),
        StructField("decoded_w", IntegerType(), True),
        StructField("decoded_h", IntegerType(), True),
        StructField("psnr_db", DoubleType(), True),  # vs reference pixels (inf → None-safe big)
        StructField("phash_stored", LongType(), True),
        StructField("phash_recomputed", LongType(), True),
        StructField("phash_hamming", IntegerType(), True),
        StructField("decode_ok", BooleanType(), False),
    ]
)


def decode_and_verify(images: DataFrame) -> DataFrame:
    """Decode every image and compute the input_hint invariants
    against the deterministic reference pixels (codecs.synth_pixels
    keyed by image_id — the fixture's source of truth)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in DECODE_SCHEMA.fieldNames()}
            for row in pdf.itertuples(index=False):
                rec = {
                    "image_id": row.image_id, "fmt": row.fmt, "w": row.w, "h": row.h,
                    "decoded_w": None, "decoded_h": None, "psnr_db": None,
                    "phash_stored": row.phash, "phash_recomputed": None,
                    "phash_hamming": None, "decode_ok": False,
                }
                try:
                    px = codecs.decode_image(bytes(row.bytes))
                    ref = codecs.synth_pixels(row.image_id, int(row.w), int(row.h))
                    p = codecs.psnr(ref, px)
                    rh = codecs.phash64(px)
                    ham = bin((rh ^ int(row.phash)) & ((1 << 64) - 1)).count("1")
                    rec.update(
                        decoded_w=int(px.shape[1]), decoded_h=int(px.shape[0]),
                        psnr_db=float(min(p, 99.0)), phash_recomputed=rh,
                        phash_hamming=ham, decode_ok=True,
                    )
                except Exception:
                    pass
                for k, v in rec.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return images.mapInPandas(run, DECODE_SCHEMA)


def payload_gate(decoded: DataFrame) -> DataFrame:
    """Boolean gate per input_hint: lossless must round-trip exactly
    (psnr capped at 99 = inf), lossy must clear 40 dB; phash hamming
    0 (lossless) / ≤4 (lossy); dimensions must match metadata."""
    lossless = F.col("fmt") == "png"
    return decoded.withColumn(
        "payload_ok",
        F.col("decode_ok")
        & (F.col("decoded_w") == F.col("w"))
        & (F.col("decoded_h") == F.col("h"))
        & F.when(lossless, (F.col("psnr_db") >= 99.0) & (F.col("phash_hamming") == 0)).otherwise(
            (F.col("psnr_db") >= 40.0) & (F.col("phash_hamming") <= 4)
        ),
    )


def fetch_images_for_pubs(pubs: DataFrame, images: DataFrame) -> DataFrame:
    """The scheduler's payload fetch (north_rule: 'schedule fetches of
    image+caption pages'): emitted pubs → their image pages, with the
    caption-equality gate vs the linked pub title
    (fixture contract: caption == title ⊕ ' — figure 1')."""
    p = pubs.select(
        F.col("key").alias("pub_key"),
        F.col("title"),
        F.col("image_id"),
    ).filter(F.col("image_id").isNotNull())
    joined = p.join(images, "image_id", "inner")
    expected = F.concat(
        F.coalesce(F.col("title"), F.concat(F.lit("untitled "), F.col("pub_key"))), F.lit(" — figure 1")
    )
    return joined.withColumn("caption_ok", F.col("caption") == expected)


# ---- generic multimodal transforms (training-pipeline ops) ---------------
FEATURES_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("mean_r", DoubleType(), True),
        StructField("mean_g", DoubleType(), True),
        StructField("mean_b", DoubleType(), True),
        StructField("std_gray", DoubleType(), True),
        StructField("thumb_phash", LongType(), True),
    ]
)


def extract_features(images: DataFrame, thumb: int = 16) -> DataFrame:
    """Decode → per-channel stats + thumbnail phash. The pattern —
    binary column in, typed feature columns out, numpy inside Arrow
    batches — is the template for any decode/feature/resize stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in FEATURES_SCHEMA.fieldNames()}
            for row in pdf.itertuples(index=False):
                try:
                    px = codecs.decode_image(bytes(row.bytes)).astype(np.float64)
                    small = _resize_nearest(px, thumb, thumb)
                    out["image_id"].append(row.image_id)
                    out["mean_r"].append(float(px[..., 0].mean()))
                    out["mean_g"].append(float(px[..., 1].mean()))
                    out["mean_b"].append(float(px[..., 2].mean()))
                    out["std_gray"].append(float(px.mean(axis=2).std()))
                    out["thumb_phash"].append(codecs.phash64(small.astype(np.uint8)))
                except Exception:
                    out["image_id"].append(row.image_id)
                    for k in ("mean_r", "mean_g", "mean_b", "std_gray", "thumb_phash"):
                        out[k].append(None)
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes").mapInPandas(run, FEATURES_SCHEMA)


def _resize_nearest(px: np.ndarray, w: int, h: int) -> np.ndarray:
    ys = (np.arange(h) * px.shape[0] // h).clip(0, px.shape[0] - 1)
    xs = (np.arange(w) * px.shape[1] // w).clip(0, px.shape[1] - 1)
    return px[ys][:, xs]


RESIZE_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("bytes", BinaryType(), True),
        StructField("w", IntegerType(), True),
        StructField("h", IntegerType(), True),
        StructField("resize_ok", BooleanType(), False),
    ]
)


def resize_images(images: DataFrame, w: int, h: int, fmt: str = "png") -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode. The standard
    training-pipeline normalization stage: binary in, binary out,
    numpy inside Arrow batches, failures marked not dropped."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in RESIZE_SCHEMA.fieldNames()}
            for row in pdf.itertuples(index=False):
                rec = {"image_id": row.image_id, "bytes": None, "w": None, "h": None, "resize_ok": False}
                try:
                    px = codecs.decode_image(bytes(row.bytes))
                    small = _resize_nearest(px, w, h).astype(np.uint8)
                    rec.update(bytes=codecs.encode_image(small, fmt), w=w, h=h, resize_ok=True)
                except Exception:
                    pass
                for k, v in rec.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes").mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("video_id", StringType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("ts_ms", LongType(), False),
        StructField("w", IntegerType(), False),
        StructField("h", IntegerType(), False),
        StructField("frame_phash", LongType(), False),
    ]
)


def sample_frames(videos: DataFrame, every_n: int = 5,
                  id_col: str = "video_id", bytes_col: str = "bytes") -> DataFrame:
    """Video frame sampling: one input row explodes into every-Nth-
    frame rows with event timestamps — the mapInPandas 1→many shape
    every video pipeline stage (captioning, dedup, safety) builds on.
    Container decode is the deterministic stand-in (codecs.decode_video;
    deploy binds PyAV/ffmpeg there); the Spark plumbing — schema,
    Arrow batching, row explosion — is real and tested."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in FRAME_SCHEMA.fieldNames()}
            for row in pdf.itertuples(index=False):
                try:
                    frames, fps = codecs.decode_video(bytes(getattr(row, bytes_col)))
                except NotImplementedError:
                    continue  # undecodable container: dropped, counted upstream
                for i in range(0, len(frames), every_n):
                    f = frames[i]
                    out["video_id"].append(getattr(row, id_col))
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(int(i * 1000 / fps))
                    out["w"].append(int(f.shape[1]))
                    out["h"].append(int(f.shape[0]))
                    out["frame_phash"].append(codecs.phash64(f))
            yield pd.DataFrame(out)

    return videos.select(F.col(id_col), F.col(bytes_col)).mapInPandas(run, FRAME_SCHEMA)


AUDIO_SCHEMA = StructType(
    [
        StructField("audio_id", StringType(), False),
        StructField("sample_rate", IntegerType(), True),
        StructField("duration_s", DoubleType(), True),
        StructField("rms", DoubleType(), True),
        StructField("zero_crossing_hz", DoubleType(), True),
        StructField("peak", DoubleType(), True),
        StructField("decode_ok", BooleanType(), False),
    ]
)


def audio_features(audios: DataFrame, id_col: str = "audio_id", bytes_col: str = "bytes") -> DataFrame:
    """Audio feature extraction over PCM16 WAV — a REAL decode path
    (stdlib `wave`, no external library): duration, RMS level,
    zero-crossing rate, peak. On a sine fixture these have analytic
    values (RMS = A/√2, ZCR = 2f), pinned in tests."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in AUDIO_SCHEMA.fieldNames()}
            for row in pdf.itertuples(index=False):
                rec = {"audio_id": getattr(row, id_col), "sample_rate": None, "duration_s": None,
                       "rms": None, "zero_crossing_hz": None, "peak": None, "decode_ok": False}
                try:
                    x, sr = codecs.decode_wav(bytes(getattr(row, bytes_col)))
                    dur = len(x) / sr
                    crossings = int(np.count_nonzero(np.diff(np.signbit(x))))
                    rec.update(
                        sample_rate=sr, duration_s=float(dur),
                        rms=float(np.sqrt(np.mean(x * x))),
                        zero_crossing_hz=float(crossings / dur / 2.0),
                        peak=float(np.max(np.abs(x))), decode_ok=True,
                    )
                except Exception:
                    pass
                for k, v in rec.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return audios.select(F.col(id_col), F.col(bytes_col)).mapInPandas(run, AUDIO_SCHEMA)


def phash_near_dup_images(images: DataFrame, max_hamming: int = 4,
                          prefix_bits: int = 12) -> DataFrame:
    """Image near-duplicate pairs by perceptual hash: the crawl's
    images table already carries `phash:int64` (input_hint shape), so
    duplicate-image detection across URLs — re-hosted figures,
    resized copies, recompressed thumbnails — is the SAME blocked
    hamming join as SimHash text dedup, on a column that needs no
    decode. Reuses dedup.hamming_near_dups (prefix block + in-block
    xor/bit_count verify): an equi-join, never all-pairs, and no
    image bytes ever enter the shuffle (phash + id only)."""
    from .dedup import hamming_near_dups

    return hamming_near_dups(
        images.select("image_id", "phash"), "phash", "image_id", max_hamming, prefix_bits
    )


# ---- aspect-ratio bucketing (training-batch geometry) -----------------------
#: SDXL-style resolution buckets around a 1024^2 pixel budget:
#: (width, height) targets whose aspect ratios ladder from 1:4 to 4:1.
DEFAULT_ASPECT_BUCKETS: list[tuple[int, int]] = [
    (512, 2048), (576, 1728), (640, 1536), (768, 1344), (832, 1216),
    (896, 1152), (1024, 1024), (1152, 896), (1216, 832), (1344, 768),
    (1536, 640), (1728, 576), (2048, 512),
]


def aspect_bucket(images: DataFrame, w_col: str = "w", h_col: str = "h",
                  buckets: list[tuple[int, int]] | None = None) -> DataFrame:
    """Assign every image to the resolution bucket whose aspect ratio
    is nearest its own — the standard geometry step of a multimodal
    training pipeline (images in one batch must share a target
    (w, h); mixing aspect ratios forces destructive square crops).

    Adds (bucket_id, target_w, target_h) to the input. Pure
    projection over the (w, h) METADATA columns — never touches
    image bytes, so at 100 TB it runs on a pruned two-int-column
    scan and shuffles nothing. The argmin is an array_sort over a
    13-struct literal array per row (JVM-side); the aspect-distance
    doubles are deterministic scalar divisions of integers, so
    bucket assignment is exact and engine-portable (the driver entry
    is DuckDB-oracled row-by-row). Ties break to the smaller bucket
    index. Input hint parity: operates on exactly the w:int32 /
    h:int32 columns of the image+caption table shape
    (BASELINE.json input_hint)."""
    bks = buckets or DEFAULT_ASPECT_BUCKETS
    ar = F.col(w_col).cast("double") / F.col(h_col).cast("double")
    arr = F.array(*[
        F.struct(
            F.abs(ar - F.lit(bw / bh)).alias("d"),
            F.lit(i).alias("i"),
        )
        for i, (bw, bh) in enumerate(bks)
    ])
    best_i = F.array_sort(arr)[0]["i"]
    tw = F.element_at(F.array(*[F.lit(bw) for bw, _ in bks]), best_i + 1).alias("target_w")
    th = F.element_at(F.array(*[F.lit(bh) for _, bh in bks]), best_i + 1).alias("target_h")
    return images.select("*", best_i.alias("bucket_id"), tw, th)


def assemble_batches(images: DataFrame, batch_size: int,
                     id_col: str = "image_id", w_col: str = "w", h_col: str = "h",
                     buckets: list[tuple[int, int]] | None = None,
                     drop_last: bool = True) -> DataFrame:
    """Training-batch assembly over aspect buckets: every batch holds
    exactly `batch_size` images of ONE resolution bucket (mixed
    geometry in a batch forces destructive square crops), batches are
    filled in id order, and with drop_last the ragged tail of each
    bucket is dropped — the SDXL-style bucketed dataloader contract,
    materialized as columns so shards can be written batch-contiguous.

    Returns (id, bucket_id, target_w, target_h, batch_id, slot):
    batch_id is per-bucket (bucket b's batches are 0..n_b/B-1), slot
    is the position inside the batch.

    Scale shape: a per-bucket row_number window would funnel each
    bucket — ~1/len(buckets) of the CORPUS — through one task, so the
    rank comes from the same two-pass distributed prefix sum as the
    crawl's global_sequence, range-partitioned on (bucket_id, id)
    (each bucket spans many partitions), minus each bucket's start
    offset (a len(buckets)-row aggregate, broadcast back). Metadata
    only — bytes stay in the store until the shard writer reads the
    assembled manifest."""
    from .scheduler import global_sequence

    if batch_size <= 0:
        raise ValueError("batch_size must be positive")
    assigned = aspect_bucket(images, w_col=w_col, h_col=h_col, buckets=buckets)
    seq = global_sequence(assigned, 0, ["bucket_id", id_col])
    counts = seq.groupBy("bucket_id").agg(F.count(F.lit(1)).alias("__n_b"))
    w_off = Window.orderBy("bucket_id").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "bucket_id",
        F.coalesce(F.sum("__n_b").over(w_off), F.lit(0)).alias("__off"),
        "__n_b",
    )
    rank = (F.col("seq") - F.col("__off")).alias("__rank")
    out = (
        seq.join(F.broadcast(offsets), "bucket_id")
        .select(
            F.col(id_col),
            "bucket_id",
            "target_w",
            "target_h",
            F.floor(rank / batch_size).cast("int").alias("batch_id"),
            (rank % batch_size).cast("int").alias("slot"),
            rank,
            "__n_b",
        )
    )
    if drop_last:
        out = out.filter(F.col("__rank") < (F.col("__n_b") - F.col("__n_b") % batch_size))
    return out.drop("__rank", "__n_b")


def scene_cuts(frames: DataFrame, max_hamming: int = 10,
               video_col: str = "video_id", idx_col: str = "frame_idx",
               phash_col: str = "phash") -> DataFrame:
    """Shot-boundary segmentation over per-frame perceptual hashes:
    a cut opens a new scene wherever hamming(phash, previous frame's
    phash) > max_hamming. The standard first pass for video training
    data — scene-level sampling (one keyframe per scene) beats
    uniform frame sampling, and scene counts gate slideshow-like
    junk.

    Scale shape: ONE window per video (lag + running sum — frames of
    one video are processed together, state linear in frames of that
    video, videos parallel); phashes are 64-bit ints, frame BYTES
    never enter this plan at all (the phash column comes from the
    stored feature table, same no-decode posture as
    phash_near_dup_images).

    Returns (video_id, n_frames, n_scenes, longest_scene).
    """
    w = Window.partitionBy(video_col).orderBy(idx_col)
    prev = F.lag(phash_col).over(w)
    cut = (
        prev.isNull()
        | (F.bit_count(F.col(phash_col).bitwiseXOR(prev)) > max_hamming)
    ).cast("int")
    scened = frames.select(
        video_col,
        idx_col,
        F.sum(cut).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("scene"),
    )
    per_scene = scened.groupBy(video_col, "scene").agg(
        F.count(F.lit(1)).alias("len")
    )
    return per_scene.groupBy(video_col).agg(
        F.sum("len").alias("n_frames"),
        F.count(F.lit(1)).alias("n_scenes"),
        F.max("len").alias("longest_scene"),
    )


def scene_segments(frames: DataFrame, max_hamming: int = 10,
                   video_col: str = "video_id", idx_col: str = "frame_idx",
                   phash_col: str = "phash", ts_col: str = "ts_ms") -> DataFrame:
    """Per-scene TIME INTERVALS — the alignment-ready form of
    :func:`scene_cuts`: same lag + running-sum islands over stored
    frame phashes, but instead of collapsing to per-video counts it
    keeps one row per scene with its [start_ms, end_ms] span (min/
    max of the member frames' timestamps). This is what subtitle
    alignment joins against (scene_transcripts); scale shape is
    identical to scene_cuts — ONE window per video, phash ints only,
    frame bytes never in the plan.

    Returns (video_id, scene, start_ms, end_ms, n_frames); scene is
    1-based in order of appearance."""
    w = Window.partitionBy(video_col).orderBy(idx_col)
    prev = F.lag(phash_col).over(w)
    cut = (
        prev.isNull()
        | (F.bit_count(F.col(phash_col).bitwiseXOR(prev)) > max_hamming)
    ).cast("int")
    scened = frames.select(
        video_col,
        ts_col,
        F.sum(cut).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("scene"),
    )
    return scened.groupBy(video_col, "scene").agg(
        F.min(ts_col).alias("start_ms"),
        F.max(ts_col).alias("end_ms"),
        F.count(F.lit(1)).alias("n_frames"),
    )


def scene_segments_sql(frames_src: str, max_hamming: int = 10,
                       video_col: str = "video_id",
                       idx_col: str = "frame_idx",
                       phash_col: str = "phash",
                       ts_col: str = "ts_ms") -> str:
    """DuckDB replay of :func:`scene_segments` over a frames relation
    exposing (video, idx, phash, ts) — lag and running sum in
    separate CTEs (no nested windows), bit_count(xor)."""
    return f"""
        WITH sg_l AS (
          SELECT {video_col} AS video_id, {idx_col} AS frame_idx,
                 {phash_col} AS phash, {ts_col} AS ts_ms,
                 lag({phash_col}) OVER (PARTITION BY {video_col}
                                        ORDER BY {idx_col}) AS prev
          FROM {frames_src}
        ), sg_c AS (
          SELECT video_id, frame_idx, ts_ms,
                 CASE WHEN prev IS NULL
                      OR bit_count(xor(phash, prev)) > {max_hamming}
                 THEN 1 ELSE 0 END AS cut
          FROM sg_l
        ), sg_s AS (
          SELECT video_id, ts_ms,
                 CAST(SUM(cut) OVER (PARTITION BY video_id ORDER BY frame_idx
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS BIGINT) AS scene
          FROM sg_c
        )
        SELECT video_id, scene, MIN(ts_ms) AS start_ms,
               MAX(ts_ms) AS end_ms, CAST(COUNT(*) AS BIGINT) AS n_frames
        FROM sg_s GROUP BY video_id, scene
    """


def scene_transcripts(segments: DataFrame, cues: DataFrame,
                      video_col: str = "video_id") -> DataFrame:
    """Align subtitle cues to scene intervals: a cue belongs to every
    scene whose [start_ms, end_ms] span it OVERLAPS (cues routinely
    straddle a cut — speech does not pause for the editor), and each
    scene's transcript is its cues' text joined in cue order. The
    result is the (video, scene, time-span, transcript) table a
    video-text training pair is minted from — one sample per scene
    with non-empty transcript, keyframe via scene_cuts sampling.

    Scale shape: ONE equi-join on video_id (cues and scenes of a
    video are co-partitioned; per-video row counts are bounded by
    runtime, not corpus size) + one hash agg with an array_sort for
    the in-scene cue order — no window, no cross join. Scenes with
    no overlapping cue survive with an empty transcript (left join):
    silent footage is a fact worth keeping, not a row to drop."""
    c = cues.select(
        F.col(video_col).alias("__v"),
        F.col("cue_idx"),
        F.col("start_ms").alias("__cs"),
        F.col("end_ms").alias("__ce"),
        F.col("text"),
    )
    j = segments.join(
        c,
        (segments[video_col] == c["__v"])
        & (F.col("__cs") <= F.col("end_ms"))
        & (F.col("__ce") >= F.col("start_ms")),
        "left",
    )
    agg = j.groupBy(video_col, "scene", "start_ms", "end_ms").agg(
        F.count("cue_idx").alias("n_cues"),
        F.array_sort(
            F.collect_list(F.struct("cue_idx", "text"))
        ).alias("__cues"),
    )
    transcript = F.array_join(
        F.transform(F.col("__cues"), lambda x: x["text"]), " "
    )
    return agg.select(
        video_col, "scene", "start_ms", "end_ms", "n_cues",
        transcript.alias("transcript"),
    )


def scene_transcripts_sql(segments_src: str, cues_src: str,
                          video_col: str = "video_id") -> str:
    """DuckDB replay of :func:`scene_transcripts` — same overlap
    predicate, string_agg ordered by cue_idx."""
    return f"""
        WITH st_j AS (
          SELECT s.video_id, s.scene, s.start_ms, s.end_ms,
                 c.cue_idx, c.text
          FROM {segments_src} s
          LEFT JOIN {cues_src} c
            ON s.video_id = c.{video_col}
           AND c.start_ms <= s.end_ms AND c.end_ms >= s.start_ms
        )
        SELECT video_id, scene, start_ms, end_ms,
               CAST(COUNT(cue_idx) AS BIGINT) AS n_cues,
               COALESCE(string_agg(text, ' ' ORDER BY cue_idx), '')
                 AS transcript
        FROM st_j
        GROUP BY video_id, scene, start_ms, end_ms
    """


def clip_alignment_gate(pairs: DataFrame, img_col: str = "img_emb",
                        cap_col: str = "cap_emb", tau_pct: int = 30) -> DataFrame:
    """CLIP-score style image/caption alignment gate (LAION-style
    curation): keep a pair iff cosine(img_emb, cap_emb) >= tau_pct/100.

    Embeddings are INTEGER vectors (array<long>, fixed-point
    quantized — the same representation the fixed-point IVF path
    uses), and the threshold test is cross-multiplied so no float
    ever enters:

        keep  <=>  dot > 0  AND  dot^2 * 10000 >= tau_pct^2 * |a|^2 * |b|^2

    which makes the kept set exact and engine-portable (the driver
    entry's DuckDB oracle derives the identical booleans). The dot >
    0 guard also totalizes the zero-norm case without a divide.

    Adds (dot, n_img, n_cap, align_keep) to the input. Pure
    projection — JVM-side zip_with/aggregate folds, no UDF, no
    shuffle; at a 10^10-pair corpus this is a map-only scan whose
    cost is O(dim) per row. int64-safe while
    dim * max|component|^2 <= 3e7 (then dot^2 * 10^4 <= 9e18 < 2^63
    and tau^2 * |a|^2 * |b|^2 is bounded the same way) — e.g.
    |component| <= 1900 at dim 8, or <= 121 at dim 2048; quantize
    coarser for wider embeddings.

    tau_pct must be in [1, 100]: the dot > 0 guard makes tau = 0
    unrepresentable and squaring would fold a negative tau onto its
    absolute value, so both are rejected.

    Reference parity: the reference gates which publication pages
    reach the output via summarizer-side filters
    (/root/reference/dblp_crawler/summarizer/__init__.py); this is
    the multimodal-training analogue of that filter-at-output hook
    (F2) applied to the image+caption table of BASELINE.json's
    input_hint.
    """
    if not 1 <= int(tau_pct) <= 100:
        raise ValueError(f"tau_pct must be in [1, 100], got {tau_pct!r}")
    zero = F.lit(0).cast("long")
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y), zero, lambda acc, v: acc + v
    )
    d = dot(img_col, cap_col)
    na = dot(img_col, img_col)
    nb = dot(cap_col, cap_col)
    out = pairs.select("*", d.alias("dot"), na.alias("n_img"), nb.alias("n_cap"))
    keep = (F.col("dot") > 0) & (
        F.col("dot") * F.col("dot") * F.lit(10000).cast("long")
        >= F.lit(int(tau_pct) ** 2).cast("long") * F.col("n_img") * F.col("n_cap")
    )
    return out.select("*", keep.alias("align_keep"))


def joint_near_dup_clusters(images: DataFrame, caption_col: str = "caption",
                            max_hamming: int = 4, prefix_bits: int = 12) -> DataFrame:
    """Cross-modal duplicate clusters over an image+caption table
    (input_hint shape): two images are duplicates if their phashes
    are within `max_hamming` OR they carry the exact same caption,
    and clusters close transitively across BOTH edge types — a
    re-hosted figure (phash twin, new caption) and a re-captioned
    copy (same caption, re-encoded pixels) of one image land in ONE
    cluster even though the pair (figure-twin, caption-copy) matches
    under neither signal directly. This is the LAION-style dedup a
    crawl of image+caption pages needs before training.

    Scale shape: phash pairs via the blocked hamming equi-join
    (dedup.hamming_near_dups — no bytes, never all-pairs); caption
    pairs as STAR edges (group min-id → one edge per extra member:
    O(n) edges even for a million-way caption collision, where a
    pairwise self-join would be quadratic); then the shared
    connected-components loop over the union.

    Returns (id, component) for every image in a cluster of >= 2.
    """
    from .dedup import connected_components

    img_pairs = phash_near_dup_images(images, max_hamming, prefix_bits).select("a", "b")
    cap = images.select("image_id", caption_col)
    reps = (
        cap.groupBy(caption_col)
        .agg(F.min("image_id").alias("a"), F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .drop("__n")
    )
    cap_pairs = (
        cap.join(reps, caption_col)
        .filter(F.col("image_id") != F.col("a"))
        .select("a", F.col("image_id").alias("b"))
    )
    return connected_components(img_pairs.unionByName(cap_pairs), src="a", dst="b")


def image_linear_gate(images: DataFrame, bit_weights: list, fmt_weights: dict,
                      bias: int = 0) -> DataFrame:
    """Linear image-safety/quality gate over decode-free features:
    score = bias + sum_k bit_k(phash) * bit_weights[k]
                 + fmt_weights.get(fmt, 0),
    accept iff score > 0. The image-side twin of the fastText-style
    text gate (textstats.hashed_linear_score): the model is a weight
    VECTOR evaluated as a flat integer expression — no decode, no
    bytes, no UDF, whole-stage codegen end to end. A real deployment
    (NSFW / watermark / quality logistic head distilled to a linear
    scorer over perceptual-hash bits and metadata) swaps the weights;
    the plan shape is exactly this one.

    bit_weights: one int per phash bit, index 0 = LSB (<= 64).
    Integer arithmetic only — scores are engine-portable.
    """
    score = F.lit(int(bias)).cast("long")
    for k, w in enumerate(bit_weights):
        if int(w) == 0:
            continue
        score = score + F.shiftrightunsigned(F.col("phash"), k).bitwiseAND(F.lit(1)) * F.lit(int(w))
    fmt_map = F.create_map(*[F.lit(x) for kv in fmt_weights.items() for x in kv])
    score = score + F.coalesce(fmt_map[F.col("fmt")], F.lit(0)).cast("long")
    return images.select("*", score.alias("score"), (score > 0).alias("accept"))


# caption-junk vocabulary shared with the SQL replay — keep sorted
CAPTION_GENERIC_TOKENS = sorted(
    "a an and the of img image photo photograph picture pic logo icon "
    "thumbnail thumb banner graphic screenshot".split()
)
CAPTION_FILENAME_RE = r"^(img|dsc|dcim|image|photo|pic|screenshot)[-_ ]?[0-9]+"
CAPTION_EXT_RE = r"\.(jpe?g|png|gif|webp|bmp|tiff?)$"
CAPTION_URL_RE = r"(https?://|www\.)"
CAPTION_STOCK_RE = (
    r"(shutterstock|getty images|istockphoto|alamy|dreamstime|123rf"
    r"|stock photo|royalty free|watermark)"
)


def caption_quality(pairs: DataFrame, caption_col: str = "caption",
                    id_col: str = "image_id", min_tokens: int = 3) -> DataFrame:
    """Alt-text junk gate for image+caption training pairs.

    Web alt text is mostly NOT a caption: camera filenames
    (``IMG_2041.jpg``), the word "image", stock-agency boilerplate,
    pasted URLs, and keyword-stuffed repetition all describe the
    *file*, not the *picture* — training a contrastive model on them
    teaches the text tower to read EXIF-speak. This is the text-side
    admission gate that runs BEFORE any embedding is computed (cf.
    the embedding-side gate ``similarity.embedding_quality`` and the
    post-hoc ``clip_alignment_gate`` — three layers, cheapest first).

    Flags (each independently reported so curation can tune the
    combination; ``ok`` = none fired):

      * ``too_short``      — fewer than `min_tokens` tokens;
      * ``filename_like``  — camera-roll prefix or image-file suffix;
      * ``has_url``        — scheme or www. present;
      * ``stock_boilerplate`` — agency / watermark phrases;
      * ``generic_only``   — every token is filler vocabulary;
      * ``low_diversity``  — ≥ 4 tokens but < 50% distinct
        (keyword-stuffing: "dog dog dog dog puppy dog").

    Pure projection over the shared ``[0-9a-z_]+`` tokenizer — no
    UDF, no shuffle, column-pruned scan; the same RE2-safe patterns
    drive :func:`caption_quality_sql`. At 100 TB this is a map-only
    pass the optimizer fuses into whatever scan feeds it.
    """
    low = F.lower(F.col(caption_col))
    toks = F.filter(F.split(low, r"[^0-9a-z_]+"), lambda w: w != "")
    n = F.size(toks)
    generic = F.array(*[F.lit(w) for w in CAPTION_GENERIC_TOKENS])
    too_short = n < min_tokens
    filename_like = low.rlike(CAPTION_FILENAME_RE) | low.rlike(CAPTION_EXT_RE)
    has_url = low.rlike(CAPTION_URL_RE)
    stock = low.rlike(CAPTION_STOCK_RE)
    generic_only = (n > 0) & F.forall(toks, lambda w: F.array_contains(generic, w))
    low_div = (n >= 4) & (
        F.size(F.array_distinct(toks)) * F.lit(2) < n
    )
    bad = too_short | filename_like | has_url | stock | generic_only | low_div
    return pairs.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        too_short.alias("too_short"),
        filename_like.alias("filename_like"),
        has_url.alias("has_url"),
        stock.alias("stock_boilerplate"),
        generic_only.alias("generic_only"),
        low_div.alias("low_diversity"),
        (~bad).alias("ok"),
    )


def caption_quality_sql(src: str, caption_col: str = "caption",
                        id_col: str = "image_id", min_tokens: int = 3) -> str:
    """DuckDB replay of :func:`caption_quality` — same tokenizer,
    same RE2 patterns, same flag algebra."""
    gen = ", ".join(f"'{w}'" for w in CAPTION_GENERIC_TOKENS)
    return f"""
        WITH cq0 AS (
          SELECT {id_col},
                 lower({caption_col}) AS cap,
                 list_filter(regexp_split_to_array(lower({caption_col}),
                             '[^0-9a-z_]+'), w -> w <> '') AS toks
          FROM {src}
        ), cq1 AS (
          SELECT {id_col}, cap, toks, CAST(len(toks) AS BIGINT) AS n_tokens,
                 len(toks) < {min_tokens} AS too_short,
                 (regexp_matches(cap, '{CAPTION_FILENAME_RE}')
                  OR regexp_matches(cap, '{CAPTION_EXT_RE}')) AS filename_like,
                 regexp_matches(cap, '{CAPTION_URL_RE}') AS has_url,
                 regexp_matches(cap, '{CAPTION_STOCK_RE}') AS stock_boilerplate,
                 (len(toks) > 0 AND list_has_all([{gen}], toks)) AS generic_only,
                 (len(toks) >= 4 AND len(list_distinct(toks)) * 2 < len(toks))
                   AS low_diversity
          FROM cq0
        )
        SELECT {id_col}, n_tokens, too_short, filename_like, has_url,
               stock_boilerplate, generic_only, low_diversity,
               NOT (too_short OR filename_like OR has_url OR stock_boilerplate
                    OR generic_only OR low_diversity) AS ok
        FROM cq1
    """
