"""Web-archive writer layout: SURT keys, WARC shard packing, CDX index.

The reference keeps fetched pages as in-memory ElementTree objects
and never persists raw bodies (dblp_crawler/graph.py holds parsed
nodes only); an open-web crawl at 10^10-URL scale must land fetched
payloads in the interchange layout every downstream consumer —
replay, dedup, extraction — already reads: WARC files plus a CDX
index (the Internet Archive / Common Crawl layout, both formats
public).  The hard part at scale is not the rendering, it is the
PLACEMENT: which record goes into which WARC shard at which byte
offset, decided deterministically and in parallel, so that a
1000-executor writer wave emits the same files as a single-threaded
archiver and the CDX rows can be computed BEFORE a single byte is
written.

Three pieces, all pure JVM expressions (no Python on the row path),
each with an adjacent ``*_sql`` DuckDB replay so the correctness
oracle re-derives the identical layout:

* :func:`surt_key` — the Sort-friendly URI Reordering Transform
  (host labels reversed and comma-joined, ``www.`` dropped, port
  kept, scheme dropped): the key CDX indexes sort by, clustering one
  registrable domain's captures.
* :func:`warc_layout` — serialize each record's exact WARC/1.0 byte
  length from its fields, total-order records by (surt, ts, url)
  (the CDX order), take the EXCLUSIVE byte prefix-sum with the same
  two-pass distributed plan as the crawl's
  :func:`~dblp_crawler_spark.operators.scheduler.global_sequence`
  (range partition + per-partition window + broadcast partition
  totals — no single-partition window), and place each record at
  ``shard = prefix DIV target_bytes``,
  ``rec_offset = prefix - min(prefix) over shard``.
* :func:`warc_shard_render` — reassemble any shard's full file text
  from its placed records (bounded per-group state: one shard ≈
  ``target_bytes`` by construction), used by tests to prove the
  offsets are the real byte offsets, not bookkeeping.

Why ``prefix DIV target`` and not a greedy rolling writer: greedy
("close the file once written >= target") makes every record's shard
depend on the exact overhang of every earlier file — an inherently
sequential recurrence.  ``prefix DIV target`` is a pure function of
the prefix sum (embarrassingly parallel, engine-portable) and bounds
every shard to ``target_bytes + max_record_len`` — the same size
guarantee a rolling writer gives, off by at most one record's
placement at each boundary.  At 100 TB with 1 GiB shards the shard
dimension is ~10^5 rows — the broadcast side of the offset join.

WARC-Date is carried as the epoch-seconds decimal string (documented
simplification: the layout math is identical for any fixed-width
rendering, and epoch strings compare/replay bit-identically in every
engine with no timezone or DST surface).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.urlnorm import _SCHEME_RE

#: layout defaults: 64 KiB shards keep small-SF fixtures multi-shard;
#: production would pass ~1 GiB.
DEFAULT_TARGET_BYTES = 1 << 16


# ---- SURT ------------------------------------------------------------------

def surt_key(url: Column | str) -> Column:
    """Sort-friendly URI Reordering Transform of a CANONICAL absolute
    URL (apply :func:`~dblp_crawler_spark.functions.urlnorm.canonical_url`
    first — SURT assumes one spelling per resource).

    ``https://www.sub.example.org:8443/a/b?q=1`` →
    ``org,example,sub:8443)/a/b?q=1``: scheme dropped, leading
    ``www.`` dropped, host labels reversed and comma-joined, port
    kept, then ``)`` + path[?query].  Pure projection."""
    u = F.col(url) if isinstance(url, str) else url
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    hostport = F.regexp_extract(rest, "^([^/?]*)", 1)
    host = F.regexp_replace(
        F.regexp_extract(hostport, "^([^:]*)", 1), r"^www\.", ""
    )
    port = F.regexp_extract(hostport, "(:[0-9]+)$", 1)
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    pathq0 = F.regexp_replace(rest, "^[^/?]*", "")
    pathq = F.when(pathq0 == "", F.lit("/")).otherwise(pathq0)
    return F.concat(rev, port, F.lit(")"), pathq)


def surt_key_sql(expr: str) -> str:
    """DuckDB fragment computing exactly ``surt_key(expr)`` (kept
    adjacent so the two definitions evolve together)."""
    rest = f"regexp_replace({expr}, '{_SCHEME_RE}', '')"
    hostport = f"regexp_extract({rest}, '^([^/?]*)', 1)"
    host = (
        f"regexp_replace(regexp_extract({hostport}, '^([^:]*)', 1),"
        " '^www\\.', '')"
    )
    port = f"regexp_extract({hostport}, '(:[0-9]+)$', 1)"
    rev = f"array_to_string(list_reverse(string_split({host}, '.')), ',')"
    pathq0 = f"regexp_replace({rest}, '^[^/?]*', '')"
    pathq = f"CASE WHEN {pathq0} = '' THEN '/' ELSE {pathq0} END"
    return f"{rev} || {port} || ')' || {pathq}"


# ---- WARC record rendering ---------------------------------------------------

def warc_record_text(url: Column, ts: Column, payload: Column) -> Column:
    """The serialized WARC/1.0 response record for one capture —
    header block, blank line, payload, record separator.  Rendered
    eagerly so the byte length used for placement is the length OF
    THE ACTUAL BYTES (``octet_length``), never a re-derivation that
    could drift from the renderer."""
    header = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "),
        url,
        F.lit("\r\nWARC-Date: "),
        ts.cast("string"),
        F.lit("\r\nContent-Length: "),
        F.octet_length(payload).cast("string"),
        F.lit("\r\n\r\n"),
    )
    return F.concat(header, payload, F.lit("\r\n\r\n"))


def warc_record_sql(url: str, ts: str, payload: str) -> str:
    """DuckDB fragment computing exactly
    ``warc_record_text(url, ts, payload)`` (strlen = UTF-8 bytes,
    matching Spark's octet_length)."""
    return (
        "'WARC/1.0' || chr(13) || chr(10) || 'WARC-Type: response'"
        " || chr(13) || chr(10) || 'WARC-Target-URI: ' || " + url +
        " || chr(13) || chr(10) || 'WARC-Date: ' || CAST(" + ts + " AS VARCHAR)"
        " || chr(13) || chr(10) || 'Content-Length: '"
        f" || CAST(strlen({payload}) AS VARCHAR)"
        " || chr(13) || chr(10) || chr(13) || chr(10)"
        f" || {payload} || chr(13) || chr(10) || chr(13) || chr(10)"
    )


# ---- placement ---------------------------------------------------------------

def _exclusive_byte_prefix(df: DataFrame, order_cols: list,
                           len_col: str) -> DataFrame:
    """Exclusive prefix-sum of ``len_col`` under the total order
    ``order_cols`` → adds ``prefix`` (long).  The weighted twin of
    :func:`~dblp_crawler_spark.operators.scheduler.global_sequence`
    (same two-pass plan, same branch-consistency localCheckpoint —
    see that docstring for why the checkpoint is load-bearing):
    range-partition on the order, per-partition running sum, plus
    the broadcast exclusive sum of per-partition byte totals."""
    cols = df.columns
    n_part = max(2, df.sparkSession.sparkContext.defaultParallelism)
    d = (
        df.repartitionByRange(n_part, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        d.groupBy("__pid")
        .agg(F.sum(len_col).alias("__bytes"))
        .select("__pid", F.coalesce(F.sum("__bytes").over(w_off), F.lit(0)).alias("__off"))
    )
    w_run = (
        Window.partitionBy("__pid").orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        d.join(F.broadcast(offsets), "__pid")
        .withColumn(
            "prefix",
            (F.col("__off") + F.coalesce(F.sum(len_col).over(w_run), F.lit(0))).cast("long"),
        )
        .select(*cols, "prefix")
    )


def warc_layout(records: DataFrame, target_bytes: int = DEFAULT_TARGET_BYTES,
                url_col: str = "url", ts_col: str = "ts",
                payload_col: str = "payload", mime_col: str = "mime",
                digest_col: str = "digest",
                keep_record: bool = False) -> DataFrame:
    """Deterministic WARC shard placement + CDX rows for a wave of
    fetched records ``(url, ts, payload, mime, digest)``.

    Returns one CDX row per record: ``(surt, url, ts, mime, digest,
    shard, shard_name, rec_offset, rec_len)`` (+ ``rec`` when
    ``keep_record`` — feed that to :func:`warc_shard_render`).
    Records are totally ordered by (surt, ts, url) — the CDX sort
    order, so one host's captures are contiguous within and across
    shards — and placed at ``shard = prefix DIV target_bytes`` where
    ``prefix`` is the exclusive byte prefix-sum of exact serialized
    record lengths (see module docstring for why DIV beats the
    sequential rolling writer).  ``rec_offset`` subtracts the
    shard's first prefix via a broadcast join against the per-shard
    minimum (the shard dimension is total_bytes/target rows — tiny).

    Every value is integer arithmetic over exact byte lengths: any
    engine replays the identical placement (:func:`warc_layout_sql`),
    and a killed writer wave re-derives exactly where every record
    belongs — placement is idempotent because it is a pure function
    of the record set, not of writer state."""
    rec = warc_record_text(F.col(url_col), F.col(ts_col), F.col(payload_col))
    base = records.select(
        surt_key(F.col(url_col)).alias("surt"),
        F.col(url_col).alias("url"),
        F.col(ts_col).cast("long").alias("ts"),
        F.col(mime_col).alias("mime"),
        F.col(digest_col).alias("digest"),
        rec.alias("rec"),
    )
    return _place(base, target_bytes, keep_record,
                  extra_cols=["mime", "digest"])


def _place(base: DataFrame, target_bytes: int, keep_record: bool,
           extra_cols: list) -> DataFrame:
    """Shared placement core: given rendered records ``(surt, url,
    ts, rec, *extra_cols)``, compute exact byte lengths, the
    exclusive prefix under the CDX total order, and the DIV-target
    shard + per-shard offset (broadcast join against the tiny shard
    dimension)."""
    sized = base.withColumn("rec_len", F.octet_length("rec").cast("long"))
    placed = _exclusive_byte_prefix(
        sized, order_cols=["surt", "ts", "url"], len_col="rec_len"
    ).withColumn("shard", F.expr(f"CAST(prefix DIV {target_bytes} AS INT)"))
    starts = placed.groupBy("shard").agg(F.min("prefix").alias("__start"))
    return (
        placed.join(F.broadcast(starts), "shard")
        .select(
            "surt", "url", "ts", *extra_cols, "shard",
            F.format_string("warc-%05d.warc", F.col("shard")).alias("shard_name"),
            (F.col("prefix") - F.col("__start")).alias("rec_offset"),
            "rec_len",
            *(["rec"] if keep_record else []),
        )
    )


def warc_layout_sql(src: str, target_bytes: int = DEFAULT_TARGET_BYTES,
                    url_col: str = "url", ts_col: str = "ts",
                    payload_col: str = "payload", mime_col: str = "mime",
                    digest_col: str = "digest") -> str:
    """DuckDB replay of :func:`warc_layout` over ``src`` — same SURT,
    same serialized record bytes, same exclusive prefix (a global
    window is fine at oracle scale), same DIV placement."""
    surt = surt_key_sql(url_col)
    rec = warc_record_sql(url_col, f"CAST({ts_col} AS BIGINT)", payload_col)
    return f"""
        WITH wa_rec AS (
          SELECT {surt} AS surt, {url_col} AS url,
                 CAST({ts_col} AS BIGINT) AS ts, {mime_col} AS mime,
                 {digest_col} AS digest,
                 CAST(strlen({rec}) AS BIGINT) AS rec_len
          FROM {src}
        ), wa_pre AS (
          SELECT *, COALESCE(SUM(rec_len) OVER (ORDER BY surt, ts, url
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
          FROM wa_rec
        ), wa_sh AS (
          SELECT *, CAST(prefix // {target_bytes} AS INT) AS shard FROM wa_pre
        )
        SELECT surt, url, ts, mime, digest, shard,
               printf('warc-%05d.warc', shard) AS shard_name,
               CAST(prefix - MIN(prefix) OVER (PARTITION BY shard) AS BIGINT) AS rec_offset,
               rec_len
        FROM wa_sh
    """


def warc_shard_render(layout: DataFrame) -> DataFrame:
    """Reassemble full WARC file text per shard from a
    ``warc_layout(..., keep_record=True)`` frame →
    ``(shard, shard_name, shard_bytes, shard_text)``.

    Per-group state is one shard's records — bounded at
    ``target_bytes + max_record_len`` BY CONSTRUCTION of the
    placement, so the collect_list is the writer's own unit of work,
    not an unbounded skew surface.  Records concatenate in
    rec_offset order; tests prove ``octet_length(shard_text)``
    equals ``max(rec_offset + rec_len)`` and that every record's
    bytes sit at exactly its CDX offset."""
    return (
        layout.groupBy("shard", "shard_name")
        .agg(
            F.array_sort(F.collect_list(F.struct("rec_offset", "rec"))).alias("__parts"),
        )
        .select(
            "shard", "shard_name",
            F.octet_length(
                F.array_join(F.transform("__parts", lambda x: x["rec"]), "")
            ).cast("long").alias("shard_bytes"),
            F.array_join(F.transform("__parts", lambda x: x["rec"]), "").alias("shard_text"),
        )
    )


# ---- digest-based archive dedup (revisit records) -----------------------------

def warc_revisit_record_text(url: Column, ts: Column, orig_url: Column,
                             orig_ts: Column, digest: Column) -> Column:
    """Serialized WARC revisit record: a zero-payload stub recording
    that this capture's content is byte-identical to an earlier
    capture (WARC 1.1 identical-payload-digest profile — the
    Internet Archive / Common Crawl convention that keeps a
    recrawl-heavy archive from storing every unchanged page again).
    Same epoch-seconds date convention as the response renderer."""
    return F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: revisit\r\nWARC-Target-URI: "),
        url,
        F.lit("\r\nWARC-Date: "), ts.cast("string"),
        F.lit("\r\nWARC-Refers-To-Target-URI: "), orig_url,
        F.lit("\r\nWARC-Refers-To-Date: "), orig_ts.cast("string"),
        F.lit("\r\nWARC-Payload-Digest: "), digest.cast("string"),
        F.lit("\r\nContent-Length: 0\r\n\r\n\r\n\r\n"),
    )


def warc_revisit_record_sql(url: str, ts: str, orig_url: str, orig_ts: str,
                            digest: str) -> str:
    """DuckDB fragment computing exactly ``warc_revisit_record_text``."""
    crlf = "chr(13) || chr(10)"
    return (
        f"'WARC/1.0' || {crlf} || 'WARC-Type: revisit' || {crlf}"
        f" || 'WARC-Target-URI: ' || {url} || {crlf}"
        f" || 'WARC-Date: ' || CAST({ts} AS VARCHAR) || {crlf}"
        f" || 'WARC-Refers-To-Target-URI: ' || {orig_url} || {crlf}"
        f" || 'WARC-Refers-To-Date: ' || CAST({orig_ts} AS VARCHAR) || {crlf}"
        f" || 'WARC-Payload-Digest: ' || CAST({digest} AS VARCHAR) || {crlf}"
        f" || 'Content-Length: 0' || {crlf} || {crlf} || {crlf} || {crlf}"
    )


def warc_revisit_layout(records: DataFrame,
                        target_bytes: int = DEFAULT_TARGET_BYTES,
                        url_col: str = "url", ts_col: str = "ts",
                        payload_col: str = "payload", mime_col: str = "mime",
                        digest_col: str = "digest",
                        keep_record: bool = False) -> DataFrame:
    """Digest-deduplicated WARC placement: per content digest the
    EARLIEST capture (min (ts, url) — deterministic, engine-portable)
    serializes as a full response record; every later capture
    serializes as a zero-payload revisit stub pointing at it.  Then
    the mixed record set flows through the same deterministic
    placement as :func:`warc_layout`.

    This is the archive-side counterpart of the corpus dedup family:
    at recrawl-heavy web scale most captures are byte-identical to a
    prior capture, so payload bytes collapse to one copy per digest
    while the CDX keeps one row per CAPTURE (replay still resolves
    every (url, ts) — through WARC-Refers-To for revisits).

    Plan: one digest-keyed window (rank + first-capture url/ts share
    the single exchange), then the placement's range partition —
    payloads never shuffle beyond those two exchanges.  Returns CDX
    rows + ``rec_type`` ('response'|'revisit') +
    ``refers_to_url``/``refers_to_ts`` (NULL on responses)."""
    order = [F.col(ts_col).asc(), F.col(url_col).asc()]
    w = Window.partitionBy(digest_col).orderBy(*order)
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cls = records.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).cast("long").alias("ts"),
        F.col(mime_col).alias("mime"),
        F.col(digest_col).alias("digest"),
        F.col(payload_col).alias("__payload"),
        F.row_number().over(w).alias("__rn"),
        F.first(url_col).over(wf).alias("__o_url"),
        F.first(F.col(ts_col).cast("long")).over(wf).alias("__o_ts"),
    )
    is_first = F.col("__rn") == 1
    rec = F.when(
        is_first,
        warc_record_text(F.col("url"), F.col("ts"), F.col("__payload")),
    ).otherwise(
        warc_revisit_record_text(
            F.col("url"), F.col("ts"),
            F.col("__o_url"), F.col("__o_ts"), F.col("digest"),
        )
    )
    base = cls.select(
        surt_key(F.col("url")).alias("surt"),
        "url", "ts", "mime", "digest",
        F.when(is_first, F.lit("response")).otherwise(F.lit("revisit")).alias("rec_type"),
        F.when(is_first, F.lit(None).cast("string")).otherwise(F.col("__o_url")).alias("refers_to_url"),
        F.when(is_first, F.lit(None).cast("long")).otherwise(F.col("__o_ts")).alias("refers_to_ts"),
        rec.alias("rec"),
    )
    return _place(
        base, target_bytes, keep_record,
        extra_cols=["mime", "digest", "rec_type", "refers_to_url", "refers_to_ts"],
    )


def warc_revisit_layout_sql(src: str,
                            target_bytes: int = DEFAULT_TARGET_BYTES,
                            url_col: str = "url", ts_col: str = "ts",
                            payload_col: str = "payload",
                            mime_col: str = "mime",
                            digest_col: str = "digest") -> str:
    """DuckDB replay of :func:`warc_revisit_layout` — same earliest-
    capture election, same stub/response rendering, same placement."""
    surt = surt_key_sql("url")
    resp = warc_record_sql("url", "ts", "payload")
    rev = warc_revisit_record_sql("url", "ts", "o_url", "o_ts", "digest")
    return f"""
        WITH wr_cls AS (
          SELECT {url_col} AS url, CAST({ts_col} AS BIGINT) AS ts,
                 {mime_col} AS mime, {digest_col} AS digest,
                 {payload_col} AS payload,
                 ROW_NUMBER() OVER (PARTITION BY {digest_col}
                   ORDER BY CAST({ts_col} AS BIGINT), {url_col}) AS rn,
                 FIRST_VALUE({url_col}) OVER (PARTITION BY {digest_col}
                   ORDER BY CAST({ts_col} AS BIGINT), {url_col}) AS o_url,
                 FIRST_VALUE(CAST({ts_col} AS BIGINT)) OVER (PARTITION BY {digest_col}
                   ORDER BY CAST({ts_col} AS BIGINT), {url_col}) AS o_ts
          FROM {src}
        ), wr_rec AS (
          SELECT {surt} AS surt, url, ts, mime, digest,
                 CASE WHEN rn = 1 THEN 'response' ELSE 'revisit' END AS rec_type,
                 CASE WHEN rn = 1 THEN NULL ELSE o_url END AS refers_to_url,
                 CASE WHEN rn = 1 THEN NULL ELSE o_ts END AS refers_to_ts,
                 CASE WHEN rn = 1 THEN {resp} ELSE {rev} END AS rec
          FROM wr_cls
        ), wr_len AS (
          SELECT *, CAST(strlen(rec) AS BIGINT) AS rec_len FROM wr_rec
        ), wr_pre AS (
          SELECT *, COALESCE(SUM(rec_len) OVER (ORDER BY surt, ts, url
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
          FROM wr_len
        ), wr_sh AS (
          SELECT *, CAST(prefix // {target_bytes} AS INT) AS shard FROM wr_pre
        )
        SELECT surt, url, ts, mime, digest, rec_type, refers_to_url,
               refers_to_ts, shard,
               printf('warc-%05d.warc', shard) AS shard_name,
               CAST(prefix - MIN(prefix) OVER (PARTITION BY shard) AS BIGINT) AS rec_offset,
               rec_len
        FROM wr_sh
    """


# ---- WebDataset shard layout ------------------------------------------------------
#
# The release format of image+caption training data: plain tar
# shards of (sample.jpg, sample.txt) member pairs, consumed
# sequentially by dataloaders (no random seeks, object-store
# friendly). The writer arithmetic is pure integer work — a ustar
# member occupies 512 + ceil(len/512)*512 bytes — so shard
# placement and every member's byte offset are a deterministic
# function of the sample set alone, exactly like warc_layout: the
# manifest is computable BEFORE a byte is written, any engine
# replays it, and a killed writer re-derives where everything
# belongs. A SAMPLE (both members) is always placed whole in one
# shard — WebDataset's contract; tar_structure is the reader-side
# inverse, and the round-trip against Python's tarfile writer is
# pinned in tests.

WDS_TARGET_BYTES = 1 << 30


def _tar_member_bytes(data_len: Column) -> Column:
    """Bytes a ustar member occupies: header + data padded to 512."""
    return (F.lit(512)
            + ((data_len + F.lit(511)) / F.lit(512)).cast("long") * F.lit(512))


def webdataset_manifest(pairs: DataFrame,
                        target_bytes: int = WDS_TARGET_BYTES,
                        id_col: str = "image_id",
                        payload_col: str = "bytes",
                        caption_col: str = "caption") -> DataFrame:
    """Deterministic WebDataset shard layout for (id, payload,
    caption) samples → two rows per sample: (shard, shard_name,
    image_id, member_name, header_offset, data_offset, data_bytes).

    Samples are totally ordered by id, placed whole at
    ``shard = prefix DIV target_bytes`` over the exclusive byte
    prefix-sum of exact sample sizes (the warc_layout discipline —
    same `_exclusive_byte_prefix`, same broadcast per-shard start
    subtraction), and within a sample the .jpg member precedes the
    .txt member (the WebDataset grouping rule: a sample's members
    are adjacent, keyed by the shared basename)."""
    img_len = F.octet_length(F.col(payload_col)).cast("long")
    txt_len = F.octet_length(F.col(caption_col)).cast("long")
    sized = pairs.select(
        F.col(id_col).alias("image_id"),
        img_len.alias("__il"),
        txt_len.alias("__tl"),
        (_tar_member_bytes(img_len) + _tar_member_bytes(txt_len)
         ).alias("sample_bytes"),
    )
    placed = _exclusive_byte_prefix(
        sized, order_cols=["image_id"], len_col="sample_bytes"
    ).withColumn("shard", F.expr(f"CAST(prefix DIV {target_bytes} AS INT)"))
    starts = placed.groupBy("shard").agg(F.min("prefix").alias("__start"))
    base = (
        placed.join(F.broadcast(starts), "shard")
        .withColumn("__soff", F.col("prefix") - F.col("__start"))
    )
    members = base.select(
        "shard", "image_id",
        F.explode(
            F.array(
                F.struct(
                    F.concat(F.col("image_id"), F.lit(".jpg")).alias("member_name"),
                    F.col("__soff").alias("header_offset"),
                    F.col("__il").alias("data_bytes"),
                ),
                F.struct(
                    F.concat(F.col("image_id"), F.lit(".txt")).alias("member_name"),
                    (F.col("__soff") + _tar_member_bytes(F.col("__il"))
                     ).alias("header_offset"),
                    F.col("__tl").alias("data_bytes"),
                ),
            )
        ).alias("m"),
    )
    return members.select(
        "shard",
        F.format_string("shard-%05d.tar", F.col("shard")).alias("shard_name"),
        "image_id",
        F.col("m.member_name").alias("member_name"),
        F.col("m.header_offset").alias("header_offset"),
        (F.col("m.header_offset") + F.lit(512)).alias("data_offset"),
        F.col("m.data_bytes").alias("data_bytes"),
    )


def webdataset_manifest_sql(src: str, target_bytes: int = WDS_TARGET_BYTES,
                            id_col: str = "image_id",
                            payload_hex_col: str = "h",
                            caption_col: str = "caption") -> str:
    """DuckDB replay of :func:`webdataset_manifest` over ``src``
    exposing the payload as HEX (entry fixtures carry hex) — same
    member arithmetic, global-window prefix at oracle scale."""
    def member(expr: str) -> str:
        return f"(512 + (({expr} + 511) // 512) * 512)"

    return f"""
        WITH wd_s AS (
          SELECT {id_col} AS image_id,
                 CAST(strlen({payload_hex_col}) // 2 AS BIGINT) AS il,
                 CAST(octet_length(encode({caption_col})) AS BIGINT) AS tl
          FROM {src}
        ), wd_z AS (
          SELECT *, {member('il')} + {member('tl')} AS sample_bytes FROM wd_s
        ), wd_p AS (
          SELECT *, COALESCE(SUM(sample_bytes) OVER (ORDER BY image_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS prefix
          FROM wd_z
        ), wd_h AS (
          SELECT *, CAST(prefix // {target_bytes} AS INT) AS shard FROM wd_p
        ), wd_o AS (
          SELECT *, prefix - MIN(prefix) OVER (PARTITION BY shard) AS soff
          FROM wd_h
        ), wd_m AS (
          SELECT shard, image_id, image_id || '.jpg' AS member_name,
                 soff AS header_offset, il AS data_bytes
          FROM wd_o
          UNION ALL
          SELECT shard, image_id, image_id || '.txt' AS member_name,
                 soff + {member('il')} AS header_offset, tl AS data_bytes
          FROM wd_o
        )
        SELECT shard, printf('shard-%05d.tar', shard) AS shard_name,
               image_id, member_name,
               CAST(header_offset AS BIGINT) AS header_offset,
               CAST(header_offset + 512 AS BIGINT) AS data_offset,
               data_bytes
        FROM wd_m
    """
