"""Magic-byte content-type sniffing for fetched payloads.

A crawler cannot trust the URL extension or the server's
Content-Type header (the reference fetches one well-behaved site and
never checks; at web scale, mislabeled and spoofed payloads are
routine and feeding them to an image decoder is a crash/exploit
vector). Real fetch pipelines sniff the leading bytes — the same
table every `file(1)`/WHATWG-MIME implementation uses — BEFORE any
decode is attempted.

Spark shape: ONE hex projection of the first 16 payload bytes
(`hex(substring(bytes, 1, 16))`), then a `when`-chain of string
window tests on that 32-char hex string — all JVM expressions inside
whole-stage codegen, no UDF; only 16 bytes of each (possibly
multi-MB) blob feed the comparison. The blob itself never shuffles:
sniffing is a map-side projection.

Magic numbers are public constants (GIF87a/89a, PNG, JPEG, RIFF
containers, PDF, gzip, zip, ID3/mp3, ftyp/mp4, BMP). RIFF containers
(webp/wav/avi) need two windows — RIFF at byte 0 plus the form type
at byte 8 — both read from the same single hex projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# label → list of (1-based hex offset, uppercase hex) windows that
# must ALL match. Order matters: first matching row wins, so more
# specific prefixes come before shorter ones.
MAGIC_TABLE: list[tuple[str, list[tuple[int, str]]]] = [
    ("png", [(1, "89504E470D0A1A0A")]),
    ("gif", [(1, "474946383761")]),            # GIF87a
    ("gif", [(1, "474946383961")]),            # GIF89a
    ("jpeg", [(1, "FFD8FF")]),
    ("webp", [(1, "52494646"), (17, "57454250")]),  # RIFF + 'WEBP'@8
    ("wav", [(1, "52494646"), (17, "57415645")]),   # RIFF + 'WAVE'@8
    ("avi", [(1, "52494646"), (17, "41564920")]),   # RIFF + 'AVI '@8
    ("pdf", [(1, "25504446")]),                # %PDF
    ("gzip", [(1, "1F8B")]),
    ("zip", [(1, "504B0304")]),
    ("mp3", [(1, "494433")]),                  # ID3 tag
    ("zstd", [(1, "28B52FFD")]),               # zstd frame (RFC 8878)
    ("parquet", [(1, "50415231")]),            # 'PAR1'
    ("mp4", [(9, "66747970")]),                # 'ftyp' at byte 4
    ("tiff", [(1, "49492A00")]),               # II*\0 (little-endian)
    ("tiff", [(1, "4D4D002A")]),               # MM\0* (big-endian)
    ("bmp", [(1, "424D")]),
    ("ico", [(1, "00000100")]),                # ICONDIR, type 1 = icon
    ("ico", [(1, "00000200")]),                # ICONDIR, type 2 = cursor
]

UNKNOWN = "octet-stream"


def sniffed_type(bytes_col: Column | str) -> Column:
    """Column expression: the sniffed content-type label for a binary
    payload column, `octet-stream` when no magic matches or the
    payload is NULL/too short (a short prefix simply fails every
    window compare)."""
    b = F.col(bytes_col) if isinstance(bytes_col, str) else bytes_col
    h = F.hex(F.substring(b, 1, 16))
    expr = F.lit(UNKNOWN)
    # build the when-chain in reverse so the FIRST table row is the
    # OUTERMOST (first-evaluated) branch
    for label, windows in reversed(MAGIC_TABLE):
        cond = None
        for off, prefix in windows:
            c = F.substring(h, off, len(prefix)) == prefix
            cond = c if cond is None else cond & c
        expr = F.when(cond, label).otherwise(expr)
    return F.when(h.isNull(), UNKNOWN).otherwise(expr)


def sniff_case_sql(h_col: str = "h") -> str:
    """The DuckDB replay of `sniffed_type` as a CASE expression over
    an already-projected `hex(substring(bytes, 1, 16))` column —
    generated from the SAME MAGIC_TABLE so engine and oracle can
    never drift."""
    whens = []
    for label, windows in MAGIC_TABLE:
        cond = " AND ".join(
            f"substring({h_col}, {off}, {len(p)}) = '{p}'" for off, p in windows
        )
        whens.append(f"WHEN {cond} THEN '{label}'")
    chain = "\n               ".join(whens)
    return (
        f"CASE WHEN {h_col} IS NULL THEN '{UNKNOWN}'\n"
        f"               {chain}\n"
        f"               ELSE '{UNKNOWN}' END"
    )


def sniff_content_type(df: DataFrame, bytes_col: str = "bytes",
                       out_col: str = "sniffed") -> DataFrame:
    """Add the sniffed content-type label — map-side, no shuffle."""
    return df.withColumn(out_col, sniffed_type(bytes_col))


def content_type_mismatch(df: DataFrame, declared_col: str = "fmt",
                          bytes_col: str = "bytes") -> DataFrame:
    """Audit declared-vs-sniffed type: adds `sniffed` and a
    `mismatch` flag (true when the payload's magic bytes contradict
    the declared format). The crawl-side use is a per-host spoofing
    rate — feed the flag into any rollup; the flag itself is a pure
    projection so the audit costs one scan."""
    out = sniff_content_type(df, bytes_col=bytes_col)
    return out.withColumn(
        "mismatch",
        F.col("sniffed") != F.col(declared_col),
    )


# ---- header-only image dimensions ------------------------------------------
#
# Dimensions WITHOUT decode: the resolution prefilter (drop icons,
# drop decompression-bomb dimensions, bucket by aspect) has to run
# BEFORE bytes reach a decoder, from header fields alone. PNG/GIF/BMP
# store dimensions at fixed offsets; JPEG requires walking the
# segment chain to the SOF marker. Everything below reads ONE hex
# projection of the first 64 payload bytes — pure string/arith
# expressions, no UDF, blobs never shuffle; the DuckDB replay is
# generated from the same offsets (image_dims_sql).

#: JPEG segment-walk depth: planted/normal headers reach SOF within
#: a few segments; real-world EXIF-heavy files may need more hops —
#: raise together with the hex window (64 bytes here).
JPEG_MAX_HOPS = 6


def _hex2long(hx: Column, pos: Column, n: int) -> Column:
    return F.conv(hx.substr(pos, F.lit(n)), 16, 10).cast("long")


def _le(hx: Column, pos: Column, n_bytes: int) -> Column:
    """Little-endian integer from `n_bytes` bytes at hex-char `pos`."""
    v = None
    for i in range(n_bytes):
        byte = _hex2long(hx, pos + F.lit(2 * i), 2)
        term = byte * F.lit(256**i)
        v = term if v is None else v + term
    return v


def image_dims(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Add (fmt, width, height) parsed from header bytes only:
    png (IHDR, big-endian), gif (logical screen, little-endian),
    bmp (BITMAPINFOHEADER, little-endian), jpeg (bounded SOF0/1/2
    segment walk, big-endian). Unknown/NULL/truncated payloads get
    NULL dims. Map-side projection; only 64 bytes of each blob feed
    the expressions.

    The JPEG walk is a single `aggregate` fold over hop indices with
    a (pos, w, h) struct accumulator — each hop's position references
    the ACCUMULATOR, not a re-substituted expression. (A naive
    unrolled chain re-inlines the position ~4× per hop — 4^6 copies
    blew Janino's 64 KB codegen method limit before this shape.)
    The hex window and sniffed fmt are projected ONCE into named
    columns; the dim expressions reference those attributes, which
    CollapseProject won't duplicate (non-cheap exprs stay staged)."""
    staged = df.withColumns(
        {
            "__hx": F.hex(F.substring(F.col(bytes_col), 1, 64)),
            "fmt": sniffed_type(F.col(bytes_col)),
        }
    )
    hx = F.col("__hx")

    # JPEG: hop segments from hex-char 5 (after FFD8) until an SOF
    # marker; each segment is marker(2B) + length(2B incl. itself) +
    # payload. Height/width sit 3/5 bytes into the SOF payload. Once
    # found, pos freezes and coalesce keeps the first match.
    def hop(acc, _i):
        pos = acc["pos"]
        marker = hx.substr(pos, F.lit(4))
        is_sof = marker.isin("FFC0", "FFC1", "FFC2")
        found = acc["h"].isNotNull() | is_sof
        nxt = F.when(found, pos).otherwise(
            pos + F.lit(4) + F.lit(2) * _hex2long(hx, pos + F.lit(4), 4)
        )
        return F.struct(
            nxt.alias("pos"),
            F.coalesce(acc["w"], F.when(is_sof, _hex2long(hx, pos + F.lit(14), 4))).alias("w"),
            F.coalesce(acc["h"], F.when(is_sof, _hex2long(hx, pos + F.lit(10), 4))).alias("h"),
        )

    acc0 = F.struct(
        F.lit(5).cast("long").alias("pos"),
        F.lit(None).cast("long").alias("w"),
        F.lit(None).cast("long").alias("h"),
    )
    jpeg = F.aggregate(F.sequence(F.lit(1), F.lit(JPEG_MAX_HOPS)), acc0, hop)

    width = (
        F.when(F.col("fmt") == "png", _hex2long(hx, F.lit(33), 8))
        .when(F.col("fmt") == "gif", _le(hx, F.lit(13), 2))
        .when(F.col("fmt") == "bmp", _le(hx, F.lit(37), 4))
        .when(F.col("fmt") == "jpeg", jpeg["w"])
    )
    height = (
        F.when(F.col("fmt") == "png", _hex2long(hx, F.lit(41), 8))
        .when(F.col("fmt") == "gif", _le(hx, F.lit(17), 2))
        .when(F.col("fmt") == "bmp", _le(hx, F.lit(45), 4))
        .when(F.col("fmt") == "jpeg", jpeg["h"])
    )
    return staged.withColumns({"width": width, "height": height}).drop("__hx")


def _le_sql(h: str, pos: int, n_bytes: int) -> str:
    terms = [
        f"TRY_CAST(concat('0x', substring({h}, {pos + 2 * i}, 2)) AS BIGINT) * {256**i}"
        for i in range(n_bytes)
    ]
    return "(" + " + ".join(terms) + ")"


def _be_sql(h: str, pos_expr: str, n: int) -> str:
    return f"TRY_CAST(concat('0x', substring({h}, {pos_expr}, {n})) AS BIGINT)"


def image_dims_sql(h_col: str = "h") -> tuple[str, str, str]:
    """DuckDB replay of :func:`image_dims` over an already-projected
    `hex(substring(bytes, 1, 64))` column: returns (fmt_sql,
    width_sql, height_sql) generated from the SAME offsets. The JPEG
    walk is unrolled positionally: pos{i+1} = pos{i} + 4 + 2*len —
    expressed via nested CASE chains (TRY_CAST absorbs truncated
    tails exactly like Spark's NULL-propagating conv)."""
    fmt = sniff_case_sql(h_col)

    # unrolled jpeg walk: build (pos expr, sof cond) per hop
    pos_expr = "5"
    jw_cases, jh_cases = [], []
    for _ in range(JPEG_MAX_HOPS):
        marker = f"substring({h_col}, {pos_expr}, 4)"
        is_sof = f"{marker} IN ('FFC0', 'FFC1', 'FFC2')"
        jh_cases.append(
            f"WHEN {is_sof} THEN {_be_sql(h_col, f'({pos_expr}) + 10', 4)}"
        )
        jw_cases.append(
            f"WHEN {is_sof} THEN {_be_sql(h_col, f'({pos_expr}) + 14', 4)}"
        )
        seg_len = f"TRY_CAST(concat('0x', substring({h_col}, ({pos_expr}) + 4, 4)) AS BIGINT)"
        pos_expr = f"({pos_expr}) + 4 + 2 * {seg_len}"
    jh = "CASE " + " ".join(jh_cases) + " ELSE NULL END"
    jw = "CASE " + " ".join(jw_cases) + " ELSE NULL END"

    width = f"""CASE ({fmt})
        WHEN 'png' THEN {_be_sql(h_col, '33', 8)}
        WHEN 'gif' THEN {_le_sql(h_col, 13, 2)}
        WHEN 'bmp' THEN {_le_sql(h_col, 37, 4)}
        WHEN 'jpeg' THEN ({jw})
        ELSE NULL END"""
    height = f"""CASE ({fmt})
        WHEN 'png' THEN {_be_sql(h_col, '41', 8)}
        WHEN 'gif' THEN {_le_sql(h_col, 17, 2)}
        WHEN 'bmp' THEN {_le_sql(h_col, 45, 4)}
        WHEN 'jpeg' THEN ({jh})
        ELSE NULL END"""
    return fmt, width, height


# ---- EXIF orientation (decode-free TIFF IFD walk) ---------------------------
#
# Orientation is the header field resize/phash/thumbnail stages MUST
# read before touching pixels: orientations 5-8 transpose the image,
# so header width/height are swapped relative to display and a phash
# computed on the raw decode won't match the visually-identical
# rotated copy. Cameras write it in the EXIF APP1 segment (JPEG) or
# IFD0 directly (TIFF) — both are public formats (TIFF 6.0 / EXIF
# 2.x): a byte-order mark ('II' little / 'MM' big endian), an IFD
# offset, then 12-byte tag entries; orientation is tag 0x0112, a
# SHORT stored in the first two bytes of the entry's value field.
#
# Same discipline as image_dims: ONE hex projection (256 bytes — the
# APP1 header + first IFD entries sit well inside it), pure
# expressions, every intermediate staged as a NAMED column so the
# endian-conditional reads never re-inline the segment walk (the
# Janino 64 KB lesson from the SOF walk applies 8× harder here).

#: APP1 segment-walk depth (JPEG) and IFD entries scanned; raise
#: together with EXIF_WINDOW_BYTES for EXIF blocks that bury
#: orientation deep (conventionally it is within the first few).
EXIF_MAX_HOPS = 6
IFD_MAX_ENTRIES = 8
EXIF_WINDOW_BYTES = 256

#: hex of 'Exif\0\0' — the APP1 payload signature
_EXIF_SIG = "457869660000"
_ORIENT_TAG = 0x0112


def _exif_stage(df: DataFrame, bytes_col: str,
                window_bytes: int = EXIF_WINDOW_BYTES) -> DataFrame:
    """Shared EXIF staging: hex window + fmt sniff + APP1 walk to the
    TIFF header (__t), byte order (__le), IFD offset/entry count/
    entry base (__ifd/__n/__e) — every tag scanner (orientation,
    GPS) starts from this frame. Split out so each op stays one
    bounded expression on top of ONE staging pass."""
    staged = df.withColumns(
        {
            "__ex": F.hex(F.substring(F.col(bytes_col), 1, window_bytes)),
            "fmt": sniffed_type(F.col(bytes_col)),
        }
    )
    hx = F.col("__ex")

    # JPEG: hop segments until APP1 with the Exif signature; TIFF
    # header starts 10 bytes into the segment (marker 2 + len 2 +
    # signature 6) → hex pos + 20.
    def hop(acc, _i):
        pos = acc["t_pos"]
        found = acc["t"].isNotNull()
        marker = hx.substr(pos, F.lit(4))
        is_app1 = (marker == "FFE1") & (
            hx.substr(pos + F.lit(8), F.lit(12)) == _EXIF_SIG
        )
        nxt = F.when(found | is_app1, pos).otherwise(
            pos + F.lit(4) + F.lit(2) * _hex2long(hx, pos + F.lit(4), 4)
        )
        return F.struct(
            nxt.alias("t_pos"),
            F.coalesce(acc["t"], F.when(is_app1, pos + F.lit(20))).alias("t"),
        )

    acc0 = F.struct(
        F.lit(5).cast("long").alias("t_pos"),
        F.lit(None).cast("long").alias("t"),
    )
    app1_t = F.aggregate(F.sequence(F.lit(1), F.lit(EXIF_MAX_HOPS)), acc0, hop)["t"]

    s1 = staged.withColumn(
        "__t",
        F.when(F.col("fmt") == "jpeg", app1_t)
        .when(F.col("fmt") == "tiff", F.lit(1).cast("long")),
    )
    bo = hx.substr(F.col("__t"), F.lit(4))
    s2 = s1.withColumn(
        "__le",  # NULL byte-order mark → NULL propagates to the reads
        F.when(bo == "4949", F.lit(True)).when(bo == "4D4D", F.lit(False)),
    )

    def rd(pos, n_bytes):
        """Endian-aware n-byte read at hex position `pos`."""
        return F.when(F.col("__le"), _le(hx, pos, n_bytes)).otherwise(
            _hex2long(hx, pos, 2 * n_bytes)
        )

    s3 = s2.withColumn("__ifd", rd(F.col("__t") + F.lit(8), 4))
    return s3.withColumns(
        {
            "__n": rd(F.col("__t") + F.lit(2) * F.col("__ifd"), 2),
            "__e": F.col("__t") + F.lit(2) * F.col("__ifd") + F.lit(4),
        }
    )


def _ifd_tag_value(tag: int):
    """Coalesced scan of the staged IFD entries for `tag`: the SHORT
    stored in the entry's value field, NULL when absent. Operates on
    the columns :func:`_exif_stage` produces."""
    hx = F.col("__ex")

    def rd(pos, n_bytes):
        return F.when(F.col("__le"), _le(hx, pos, n_bytes)).otherwise(
            _hex2long(hx, pos, 2 * n_bytes)
        )

    branches = []
    for i in range(IFD_MAX_ENTRIES):
        epos = F.col("__e") + F.lit(24 * i)
        branches.append(
            F.when(
                (F.lit(i) < F.col("__n")) & (rd(epos, 2) == tag),
                rd(epos + F.lit(16), 2),
            )
        )
    return F.coalesce(*branches)


def exif_orientation(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Add (fmt, orientation, swap_dims) parsed from header bytes
    only: JPEG (bounded APP1 segment walk to the Exif signature,
    then the TIFF walk) and standalone TIFF (walk starts at byte 0).
    orientation is 1-8 or NULL (no EXIF / malformed / out-of-range);
    swap_dims is true for orientations 5-8 (the transposing ones) and
    false otherwise — the flag a resize or aspect-bucket stage keys
    on. Map-side projection; blobs never shuffle."""
    orient = _ifd_tag_value(_ORIENT_TAG)
    return (
        _exif_stage(df, bytes_col).withColumn(
            "orientation",
            F.when(orient.between(1, 8), orient).cast("int"),
        )
        .withColumn(
            "swap_dims",
            F.coalesce(F.col("orientation") >= 5, F.lit(False)),
        )
        .drop("__ex", "__t", "__le", "__ifd", "__n", "__e")
    )


def _le_sql_var(h: str, pos_expr: str, n_bytes: int) -> str:
    """Little-endian read at a VARIABLE hex position expression."""
    terms = [
        f"TRY_CAST(concat('0x', substring({h}, ({pos_expr}) + {2 * i}, 2)) AS BIGINT) * {256 ** i}"
        for i in range(n_bytes)
    ]
    return "(" + " + ".join(terms) + ")"


def _rd_sql(h: str, le: str, pos_expr: str, n_bytes: int) -> str:
    be = f"TRY_CAST(concat('0x', substring({h}, {pos_expr}, {2 * n_bytes})) AS BIGINT)"
    return f"CASE WHEN {le} THEN {_le_sql_var(h, pos_expr, n_bytes)} ELSE {be} END"


def _exif_stage_sql(src: str, keep: str, h_col: str, fmt_col: str) -> str:
    """The shared DuckDB staging CTE chain (mirrors
    :func:`_exif_stage`): APP1 walk unrolled positionally, then the
    SAME staged reads as CTE columns — mirroring the Spark staging
    keeps each expression small instead of re-inlining the walk into
    every endian-conditional read. Exposes `eo_en(keep, fmt, h, t,
    le, ifd, n, e)`; callers append their tag scan."""
    pos_expr = "5"
    t_cases = []
    for _ in range(EXIF_MAX_HOPS):
        is_app1 = (
            f"substring({h_col}, {pos_expr}, 4) = 'FFE1' AND "
            f"substring({h_col}, ({pos_expr}) + 8, 12) = '{_EXIF_SIG}'"
        )
        t_cases.append(f"WHEN {is_app1} THEN ({pos_expr}) + 20")
        seg_len = f"TRY_CAST(concat('0x', substring({h_col}, ({pos_expr}) + 4, 4)) AS BIGINT)"
        pos_expr = f"({pos_expr}) + 4 + 2 * {seg_len}"
    walk = "CASE " + " ".join(t_cases) + " ELSE NULL END"
    t = (
        f"CASE WHEN {fmt_col} = 'jpeg' THEN ({walk}) "
        f"WHEN {fmt_col} = 'tiff' THEN 1 ELSE NULL END"
    )
    return f"""eo_t AS (
          SELECT {keep}, {fmt_col} AS fmt, {h_col} AS h, CAST({t} AS BIGINT) AS t
          FROM {src}
        ), eo_le AS (
          SELECT *, CASE substring(h, t, 4) WHEN '4949' THEN true
                    WHEN '4D4D' THEN false ELSE NULL END AS le
          FROM eo_t
        ), eo_ifd AS (
          SELECT *, {_rd_sql('h', 'le', 't + 8', 4)} AS ifd FROM eo_le
        ), eo_en AS (
          SELECT *, {_rd_sql('h', 'le', 't + 2 * ifd', 2)} AS n,
                 t + 2 * ifd + 4 AS e
          FROM eo_ifd
        )"""


def exif_orientation_sql(src: str, keep: str = "doc_id",
                         h_col: str = "h", fmt_col: str = "fmt") -> str:
    """DuckDB replay of :func:`exif_orientation` over ``src`` (must
    expose `keep`, a projected ``hex(substring(bytes,1,256))`` column
    and the sniffed `fmt`)."""
    orient_branches = ", ".join(
        f"CASE WHEN {i} < n AND ({_rd_sql('h', 'le', f'e + {24 * i}', 2)}) = {_ORIENT_TAG} "
        f"THEN ({_rd_sql('h', 'le', f'e + {24 * i} + 16', 2)}) END"
        for i in range(IFD_MAX_ENTRIES)
    )
    return f"""
        WITH {_exif_stage_sql(src, keep, h_col, fmt_col)}, eo_o AS (
          SELECT {keep}, fmt, COALESCE({orient_branches}) AS o FROM eo_en
        )
        SELECT {keep}, fmt,
               CAST(CASE WHEN o BETWEEN 1 AND 8 THEN o END AS INT) AS orientation,
               COALESCE(CASE WHEN o BETWEEN 1 AND 8 THEN o END >= 5, false) AS swap_dims
        FROM eo_o
    """


#: EXIF GPSInfo IFD pointer tag (EXIF 2.x / TIFF 6.0 public spec)
_GPS_TAG = 0x8825


def exif_gps_flag(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Privacy gate: does the image header carry an EXIF GPSInfo IFD
    (tag 0x8825)? Phone cameras geotag by default, so a web-scraped
    image corpus leaks shooting locations — training sets strip or
    drop geotagged rows, and the DETECTION must be decode-free (the
    whole point is not to propagate the bytes further). Presence of
    the pointer tag is the signal; the pointed-to IFD (the actual
    coordinates) is deliberately NOT read.

    Same staging as :func:`exif_orientation` — one hex projection,
    bounded IFD scan, map-side only; blobs never shuffle. Output:
    (input minus bytes internals, fmt, has_gps). `has_gps` is false
    for non-EXIF/malformed headers (no evidence = no flag; pair with
    a format allowlist if absence must be proven).
    """
    hx = F.col("__ex")

    def rd(pos, n_bytes):
        return F.when(F.col("__le"), _le(hx, pos, n_bytes)).otherwise(
            _hex2long(hx, pos, 2 * n_bytes)
        )

    present = []
    for i in range(IFD_MAX_ENTRIES):
        epos = F.col("__e") + F.lit(24 * i)
        present.append(
            F.when((F.lit(i) < F.col("__n")) & (rd(epos, 2) == _GPS_TAG), F.lit(1))
        )
    return (
        _exif_stage(df, bytes_col)
        .withColumn("has_gps", F.coalesce(*present, F.lit(0)) == 1)
        .drop("__ex", "__t", "__le", "__ifd", "__n", "__e")
    )


def exif_gps_flag_sql(src: str, keep: str = "doc_id",
                      h_col: str = "h", fmt_col: str = "fmt") -> str:
    """DuckDB replay of :func:`exif_gps_flag` — same staging chain,
    presence scan for the GPSInfo pointer tag."""
    present = ", ".join(
        f"CASE WHEN {i} < n AND ({_rd_sql('h', 'le', f'e + {24 * i}', 2)}) = {_GPS_TAG} "
        f"THEN 1 END"
        for i in range(IFD_MAX_ENTRIES)
    )
    return f"""
        WITH {_exif_stage_sql(src, keep, h_col, fmt_col)}
        SELECT {keep}, fmt, COALESCE({present}, 0) = 1 AS has_gps
        FROM eo_en
    """


# ---- JPEG quality estimate (DQT inversion, decode-free) ---------------------
#
# Heavily recompressed JPEGs are a curation signal (training sets
# drop them; CDNs mint them) that is invisible to resolution checks:
# the quantization table IS the quality knob, and it sits in the DQT
# segment readable without decode. libjpeg (public source) derives
# the table from quality Q as table[i] = clamp((base[i]*S + 50)/100)
# with S = 5000/Q for Q<50 else 200-2Q, over the Annex-K luminance
# base table — so the inverse, S ≈ 100*sum(table)/sum(base), recovers
# an estimate of Q from header bytes alone.  Integer-exact estimator
# (engine-portable, replayed by the oracle):
#
#   scale_pct = (100 * dqt_sum) DIV base_sum
#   quality   = 5000 DIV scale_pct         if scale_pct >= 100
#             = (200 - scale_pct) DIV 2    otherwise
#
# Accurate to ±2 for Q in ~[25, 97] (tested against tables generated
# by the exact libjpeg formula); below Q≈20 the 255-clamp saturates
# coefficients and the estimate reads high (monotonically — still a
# valid threshold signal), and Q=100's all-1 table estimates 99.
# That is exactly enough to threshold "recompressed below Q≈60".

#: JPEG Annex K luminance base table (zigzag order irrelevant: only
#: the sum enters the estimator).
DQT_BASE = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
DQT_BASE_SUM = sum(DQT_BASE)
DQT_MAX_HOPS = 6
DQT_WINDOW_BYTES = 256


def jpeg_quality(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Add (fmt, dqt_sum, approx_quality) from the first 8-bit DQT
    table — NULL for non-JPEG payloads, walks that never reach a DQT
    within the window/hop bounds, and 16-bit-precision tables
    (Pq != 0: high-end encoders; rare on the web).  Same staging
    discipline as the SOF/EXIF walks: one 256-byte hex projection,
    the segment walk as an aggregate fold, the 64-coefficient sum as
    a second fold over the staged table position — pure expressions,
    no UDF, blobs never shuffle."""
    staged = df.withColumns(
        {
            "__qx": F.hex(F.substring(F.col(bytes_col), 1, DQT_WINDOW_BYTES)),
            "fmt": sniffed_type(F.col(bytes_col)),
        }
    )
    hx = F.col("__qx")

    def hop(acc, _i):
        pos = acc["q_pos"]
        found = acc["q"].isNotNull()
        is_dqt = hx.substr(pos, F.lit(4)) == "FFDB"
        nxt = F.when(found | is_dqt, pos).otherwise(
            pos + F.lit(4) + F.lit(2) * _hex2long(hx, pos + F.lit(4), 4)
        )
        return F.struct(
            nxt.alias("q_pos"),
            # table bytes start after marker(2B) + len(2B) + Pq/Tq(1B)
            F.coalesce(acc["q"], F.when(is_dqt, pos + F.lit(10))).alias("q"),
        )

    acc0 = F.struct(
        F.lit(5).cast("long").alias("q_pos"),
        F.lit(None).cast("long").alias("q"),
    )
    walk = F.aggregate(F.sequence(F.lit(1), F.lit(DQT_MAX_HOPS)), acc0, hop)["q"]
    s1 = staged.withColumn(
        "__q", F.when(F.col("fmt") == "jpeg", walk)
    )
    # 8-bit precision only: the Pq/Tq byte precedes the table
    pq_ok = _hex2long(hx, F.col("__q") - F.lit(2), 2) < 16
    s2 = s1.withColumn("__q8", F.when(pq_ok, F.col("__q")))
    coeff_sum = F.aggregate(
        F.sequence(F.lit(0), F.lit(63)),
        F.lit(0).cast("long"),
        lambda acc, i: acc + _hex2long(hx, F.col("__q8") + F.lit(2) * i, 2),
    )
    s3 = s2.withColumn("dqt_sum", coeff_sum)
    scale = F.expr(f"CAST(100 * dqt_sum DIV {DQT_BASE_SUM} AS BIGINT)")
    quality = F.when(
        scale >= 100, F.expr("CAST(5000 DIV (100 * dqt_sum DIV "
                             f"{DQT_BASE_SUM}) AS BIGINT)")
    ).otherwise((F.lit(200) - scale) / F.lit(2)).cast("long")
    return (
        s3.withColumn(
            "approx_quality",
            F.when(F.col("dqt_sum").isNotNull() & (F.col("dqt_sum") > 0), quality).cast("int"),
        )
        .drop("__qx", "__q", "__q8")
    )


def jpeg_quality_sql(src: str, keep: str = "doc_id", h_col: str = "h",
                     fmt_col: str = "fmt") -> str:
    """DuckDB replay of :func:`jpeg_quality` over ``src`` exposing
    `keep`, the 256-byte hex projection and the sniffed fmt — walk
    unrolled positionally, coefficient sum via list_sum over the
    staged table position, same integer estimator."""
    pos_expr = "5"
    q_cases = []
    for _ in range(DQT_MAX_HOPS):
        is_dqt = f"substring({h_col}, {pos_expr}, 4) = 'FFDB'"
        q_cases.append(f"WHEN {is_dqt} THEN ({pos_expr}) + 10")
        seg_len = f"TRY_CAST(concat('0x', substring({h_col}, ({pos_expr}) + 4, 4)) AS BIGINT)"
        pos_expr = f"({pos_expr}) + 4 + 2 * {seg_len}"
    walk = "CASE " + " ".join(q_cases) + " ELSE NULL END"
    return f"""
        WITH jq_q AS (
          SELECT {keep}, {fmt_col} AS fmt, {h_col} AS h,
                 CASE WHEN {fmt_col} = 'jpeg' THEN CAST(({walk}) AS BIGINT) END AS q
          FROM {src}
        ), jq_q8 AS (
          SELECT *, CASE WHEN TRY_CAST(concat('0x', substring(h, q - 2, 2)) AS BIGINT) < 16
                         THEN q END AS q8
          FROM jq_q
        ), jq_sum AS (
          -- list_reduce, not list_sum: a truncated table must yield
          -- NULL exactly like Spark's NULL-propagating fold (list_sum
          -- skips NULL elements and would return a partial sum)
          SELECT {keep}, fmt,
                 list_reduce(list_transform(range(0, 64),
                   i -> TRY_CAST(concat('0x', substring(h, q8 + 2 * i, 2)) AS BIGINT)),
                   (a, b) -> a + b) AS dqt_sum
          FROM jq_q8
        )
        SELECT {keep}, fmt, CAST(dqt_sum AS BIGINT) AS dqt_sum,
               CAST(CASE WHEN dqt_sum > 0 THEN
                 CASE WHEN 100 * dqt_sum // {DQT_BASE_SUM} >= 100
                      THEN 5000 // (100 * dqt_sum // {DQT_BASE_SUM})
                      ELSE (200 - 100 * dqt_sum // {DQT_BASE_SUM}) // 2 END
               END AS INT) AS approx_quality
        FROM jq_sum
    """


# ---- charset declaration detection -------------------------------------------
#
# The decode step needs a charset BEFORE parsing, and at web scale the
# HTTP header lies or is absent; the standard resolution order (WHATWG
# encoding sniffing, public) is BOM > transport header > in-document
# declaration > default. This implements the BOM tier (byte-exact,
# authoritative) and the in-document tier (<meta charset>, http-equiv
# content-type, XML declaration — a documented regex heuristic: a
# literal 'charset=' inside unrelated attribute text can false-
# positive, which the WHATWG prescan accepts too).

#: order matters: UTF-32 BOMs contain the UTF-16 BOMs as prefixes.
BOM_TABLE: list[tuple[str, str]] = [
    ("utf-32le", "FFFE0000"),
    ("utf-32be", "0000FEFF"),
    ("utf-8", "EFBBBF"),
    ("utf-16le", "FFFE"),
    ("utf-16be", "FEFF"),
]

_CHARSET_VAL = "[a-zA-Z0-9._-]+"
_META_CHARSET_RE = rf"(?i)<meta[^>]*\scharset\s*=\s*[\"']?({_CHARSET_VAL})"
_HTTP_EQUIV_RE = rf"(?i)<meta[^>]+content\s*=\s*[\"'][^\"']*charset=({_CHARSET_VAL})"
_XML_DECL_RE = rf"(?i)<\?xml[^>]*encoding\s*=\s*[\"']({_CHARSET_VAL})"


def bom_charset(bytes_col: Column | str) -> Column:
    """Charset from the byte-order mark (authoritative tier) — NULL
    when no BOM. One 4-byte hex window; longest BOM wins."""
    b = F.col(bytes_col) if isinstance(bytes_col, str) else bytes_col
    h = F.hex(F.substring(b, 1, 4))
    expr = F.lit(None).cast("string")
    for label, bom in reversed(BOM_TABLE):
        expr = F.when(F.substring(h, 1, len(bom)) == bom, label).otherwise(expr)
    return expr


def bom_charset_sql(h_col: str) -> str:
    """DuckDB replay over a projected ``hex(substring(bytes,1,4))``
    column — generated from the same BOM_TABLE."""
    whens = " ".join(
        f"WHEN substring({h_col}, 1, {len(bom)}) = '{bom}' THEN '{label}'"
        for label, bom in BOM_TABLE
    )
    return f"CASE {whens} ELSE NULL END"


def meta_charset(html_col: Column | str) -> Column:
    """Charset from in-document declarations, in WHATWG prescan
    precedence: <meta charset=...> / http-equiv content charset /
    <?xml encoding=...?>. Lowercased; NULL when none declared."""
    s = F.col(html_col) if isinstance(html_col, str) else html_col
    picks = [
        F.nullif(F.regexp_extract(s, p, 1), F.lit(""))
        for p in (_META_CHARSET_RE, _HTTP_EQUIV_RE, _XML_DECL_RE)
    ]
    return F.lower(F.coalesce(*picks))


def meta_charset_sql(expr: str) -> str:
    """DuckDB fragment computing exactly ``meta_charset(expr)`` —
    same RE2-compatible patterns, same precedence."""
    picks = ", ".join(
        "nullif(regexp_extract({e}, '{p}', 1), '')".format(
            e=expr, p=p.replace("'", "''")  # SQL-escape the quote class
        )
        for p in (_META_CHARSET_RE, _HTTP_EQUIV_RE, _XML_DECL_RE)
    )
    return f"lower(coalesce({picks}))"


def charset_decl(df: DataFrame, bytes_col: str = "bytes",
                 html_col: str = "html",
                 default: str = "utf-8") -> DataFrame:
    """Add (bom, meta, charset): the resolved decode charset =
    BOM > in-document declaration > default. Pure projection —
    4 bytes of the blob and one regex pass over the (already
    transport-decoded) markup; no shuffle, no UDF."""
    return df.withColumns(
        {
            "bom": bom_charset(bytes_col),
            "meta": meta_charset(html_col),
        }
    ).withColumn("charset", F.coalesce("bom", "meta", F.lit(default)))


# ---- JPEG structure: progressive flag + chroma subsampling --------------------
#
# Two more decode-free curation signals from the SOF header: the
# marker itself says baseline (FFC0/FFC1) vs progressive (FFC2 —
# breaks streaming decoders and some training loaders), and the
# first component's sampling-factor byte says the chroma subsampling
# (0x22 → 4:2:0, 0x21 → 4:2:2, 0x11 → 4:4:4 for the standard
# YCbCr layout) — the quality tier CDNs silently downgrade.

SOF_MARKERS = ("FFC0", "FFC1", "FFC2")
SUBSAMPLING = {0x22: "4:2:0", 0x21: "4:2:2", 0x11: "4:4:4", 0x12: "4:4:0"}


def jpeg_structure(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Add (fmt, progressive, n_components, subsampling) from the
    SOF segment — NULL for non-JPEG / walks that never reach an SOF
    in the window; subsampling is 'gray' for single-component scans,
    'other' for nonstandard factor bytes.  Same bounded fold + staged
    reads as the dims/EXIF/DQT walks; one 256-byte hex projection."""
    staged = df.withColumns(
        {
            "__sx": F.hex(F.substring(F.col(bytes_col), 1, DQT_WINDOW_BYTES)),
            "fmt": sniffed_type(F.col(bytes_col)),
        }
    )
    hx = F.col("__sx")

    def hop(acc, _i):
        pos = acc["s_pos"]
        found = acc["s"].isNotNull()
        marker = hx.substr(pos, F.lit(4))
        is_sof = marker.isin(*SOF_MARKERS)
        nxt = F.when(found | is_sof, pos).otherwise(
            pos + F.lit(4) + F.lit(2) * _hex2long(hx, pos + F.lit(4), 4)
        )
        return F.struct(
            nxt.alias("s_pos"),
            F.coalesce(acc["s"], F.when(is_sof, pos)).alias("s"),
        )

    acc0 = F.struct(
        F.lit(5).cast("long").alias("s_pos"),
        F.lit(None).cast("long").alias("s"),
    )
    walk = F.aggregate(F.sequence(F.lit(1), F.lit(DQT_MAX_HOPS)), acc0, hop)["s"]
    s1 = staged.withColumn("__s", F.when(F.col("fmt") == "jpeg", walk))
    s2 = s1.withColumns(
        {
            "__marker": hx.substr(F.col("__s"), F.lit(4)),
            "__ncomp": _hex2long(hx, F.col("__s") + F.lit(18), 2),
            "__hv": _hex2long(hx, F.col("__s") + F.lit(22), 2),
        }
    )
    sub = F.lit("other")
    for hv, label in SUBSAMPLING.items():
        sub = F.when(F.col("__hv") == hv, label).otherwise(sub)
    sub = F.when(F.col("__ncomp") == 1, "gray").otherwise(sub)
    return (
        s2.withColumns(
            {
                "progressive": F.when(
                    F.col("__marker").isNotNull() & F.col("__ncomp").isNotNull(),
                    F.col("__marker") == "FFC2",
                ),
                "n_components": F.col("__ncomp").cast("int"),
                "subsampling": F.when(F.col("__ncomp").isNotNull(), sub),
            }
        )
        .drop("__sx", "__s", "__marker", "__ncomp", "__hv")
    )


def jpeg_structure_sql(src: str, keep: str = "doc_id", h_col: str = "h",
                       fmt_col: str = "fmt") -> str:
    """DuckDB replay of :func:`jpeg_structure` — unrolled walk,
    staged reads, same CASE tables."""
    pos_expr = "5"
    s_cases = []
    markers = ", ".join(f"'{m}'" for m in SOF_MARKERS)
    for _ in range(DQT_MAX_HOPS):
        is_sof = f"substring({h_col}, {pos_expr}, 4) IN ({markers})"
        s_cases.append(f"WHEN {is_sof} THEN ({pos_expr})")
        seg_len = f"TRY_CAST(concat('0x', substring({h_col}, ({pos_expr}) + 4, 4)) AS BIGINT)"
        pos_expr = f"({pos_expr}) + 4 + 2 * {seg_len}"
    walk = "CASE " + " ".join(s_cases) + " ELSE NULL END"
    sub_whens = " ".join(
        f"WHEN {hv} THEN '{label}'" for hv, label in SUBSAMPLING.items()
    )
    return f"""
        WITH js0 AS (
          SELECT {keep}, {fmt_col} AS fmt, {h_col} AS h,
                 CASE WHEN {fmt_col} = 'jpeg' THEN CAST(({walk}) AS BIGINT) END AS s
          FROM {src}
        ), js1 AS (
          SELECT *, substring(h, s, 4) AS marker,
                 TRY_CAST(concat('0x', substring(h, s + 18, 2)) AS BIGINT) AS ncomp,
                 TRY_CAST(concat('0x', substring(h, s + 22, 2)) AS BIGINT) AS hv
          FROM js0
        )
        SELECT {keep}, fmt,
               CASE WHEN s IS NOT NULL AND ncomp IS NOT NULL
                    THEN marker = 'FFC2' END AS progressive,
               CAST(ncomp AS INT) AS n_components,
               CASE WHEN ncomp = 1 THEN 'gray'
                    WHEN ncomp IS NOT NULL THEN
                      CASE hv {sub_whens} ELSE 'other' END
               END AS subsampling
        FROM js1
    """


# ---- decompression-bomb gate ---------------------------------------------------

#: default safety thresholds: 2^26 pixels (~67 MP — beyond any
#: legitimate web image) and 200 claimed pixels per payload byte
#: (honest compressed images run ~0.5–50 px/byte; a 50 KB file
#: claiming 100 MP is the bomb signature).
BOMB_MAX_PIXELS = 1 << 26
BOMB_MAX_PX_PER_BYTE = 200


def image_bomb_gate(df: DataFrame, bytes_col: str = "bytes",
                    max_pixels: int = BOMB_MAX_PIXELS,
                    max_px_per_byte: int = BOMB_MAX_PX_PER_BYTE) -> DataFrame:
    """Add (pixels, payload_bytes, oversized, bomb_ratio, safe): the
    header-vs-payload sanity gate that must run BEFORE bytes reach a
    decoder — a decompression bomb is a tiny payload whose header
    declares enormous dimensions, and the only defense that costs
    zero decode work is comparing the two numbers.  ``safe`` is
    true only for payloads with KNOWN dims passing both checks
    (unknown/unparseable dims are not safe — the decoder can't be
    told what to expect).  Ratio check is integer cross-multiplied
    (pixels > bytes · max_px_per_byte), never a float divide."""
    d = image_dims(df, bytes_col=bytes_col)
    pixels = (F.col("width") * F.col("height")).cast("long")
    nbytes = F.octet_length(F.col(bytes_col)).cast("long")
    d = d.withColumns({"pixels": pixels, "payload_bytes": nbytes})
    oversized = F.col("pixels") > max_pixels
    bomb = F.col("pixels") > F.col("payload_bytes") * max_px_per_byte
    return d.withColumns(
        {
            "oversized": F.coalesce(oversized, F.lit(False)),
            "bomb_ratio": F.coalesce(bomb, F.lit(False)),
            "safe": F.coalesce(~oversized & ~bomb, F.lit(False)),
        }
    )


def image_bomb_gate_sql(src: str, keep: str = "doc_id", h_col: str = "h",
                        max_pixels: int = BOMB_MAX_PIXELS,
                        max_px_per_byte: int = BOMB_MAX_PX_PER_BYTE) -> str:
    """DuckDB replay over ``src`` exposing `keep` + the 64-byte hex
    window (payloads must fit the window so strlen(h)/2 is the true
    payload size — entry fixtures guarantee it)."""
    fmt, width, height = image_dims_sql(h_col)
    return f"""
        WITH bg0 AS (
          SELECT {keep}, {fmt} AS fmt, CAST({width} AS BIGINT) AS width,
                 CAST({height} AS BIGINT) AS height,
                 CAST(strlen({h_col}) // 2 AS BIGINT) AS payload_bytes
          FROM {src}
        ), bg1 AS (
          SELECT *, width * height AS pixels FROM bg0
        )
        SELECT {keep}, fmt, width, height, pixels, payload_bytes,
               COALESCE(pixels > {max_pixels}, false) AS oversized,
               COALESCE(pixels > payload_bytes * {max_px_per_byte}, false) AS bomb_ratio,
               COALESCE(pixels <= {max_pixels}
                        AND pixels <= payload_bytes * {max_px_per_byte}, false) AS safe
        FROM bg1
    """


# ---- PNG structure: bit depth / color type / interlace ------------------------
#
# The PNG sibling of jpeg_structure, all at FIXED IHDR offsets (PNG
# spec): bit depth (16-bit masters vs 8-bit web), color type
# (palette images decode through a PLTE lookup — a different code
# path worth routing; types 4/6 carry alpha), and Adam7 interlacing
# (the progressive analogue). Bytes 24/25/28 of the file.

PNG_COLOR_TYPES = {0: "gray", 2: "rgb", 3: "palette", 4: "gray-alpha", 6: "rgba"}


def png_structure(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Add (fmt, bit_depth, color_type, interlaced, has_alpha) from
    the IHDR — NULL for non-PNG or truncated headers; unknown color
    codes → 'other'. Fixed-offset reads over the same 64-byte hex
    window as image_dims; pure projection."""
    staged = df.withColumns(
        {
            "__px": F.hex(F.substring(F.col(bytes_col), 1, 64)),
            "fmt": sniffed_type(F.col(bytes_col)),
        }
    )
    hx = F.col("__px")
    is_png = F.col("fmt") == "png"
    depth = F.when(is_png, _hex2long(hx, F.lit(49), 2))
    ctype = F.when(is_png, _hex2long(hx, F.lit(51), 2))
    inter = F.when(is_png, _hex2long(hx, F.lit(57), 2))
    label = F.lit("other")
    for code, name in PNG_COLOR_TYPES.items():
        label = F.when(ctype == code, name).otherwise(label)
    return (
        staged.withColumns(
            {
                "bit_depth": depth.cast("int"),
                "color_type": F.when(ctype.isNotNull(), label),
                "interlaced": F.when(inter.isNotNull(), inter == 1),
                "has_alpha": F.when(ctype.isNotNull(), ctype.isin(4, 6)),
            }
        )
        .drop("__px")
    )


def png_structure_sql(src: str, keep: str = "doc_id", h_col: str = "h",
                      fmt_col: str = "fmt") -> str:
    """DuckDB replay of :func:`png_structure` — same offsets and
    CASE tables."""
    def rd(pos):
        return (f"CASE WHEN {fmt_col} = 'png' THEN "
                f"TRY_CAST(concat('0x', substring({h_col}, {pos}, 2)) AS BIGINT) END")

    ct_whens = " ".join(
        f"WHEN {code} THEN '{name}'" for code, name in PNG_COLOR_TYPES.items()
    )
    return f"""
        WITH ps AS (
          SELECT {keep}, {fmt_col} AS fmt, {rd(49)} AS depth,
                 {rd(51)} AS ctype, {rd(57)} AS inter
          FROM {src}
        )
        SELECT {keep}, fmt, CAST(depth AS INT) AS bit_depth,
               CASE WHEN ctype IS NOT NULL THEN
                 CASE ctype {ct_whens} ELSE 'other' END END AS color_type,
               CASE WHEN inter IS NOT NULL THEN inter = 1 END AS interlaced,
               CASE WHEN ctype IS NOT NULL THEN ctype IN (4, 6) END AS has_alpha
        FROM ps
    """


# byte-12 chunk fourcc (hex chars 25..32) → container variant
WEBP_VARIANTS = {"56503820": "lossy",      # 'VP8 '
                 "5650384C": "lossless",   # 'VP8L'
                 "56503858": "extended"}   # 'VP8X'


def webp_structure(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Add (fmt, variant, width, height, has_alpha, is_animated)
    parsed from the WebP container header — decode-free, like
    :func:`jpeg_structure`/:func:`png_structure`, over the same
    64-byte hex window. WebP is the dominant modern web image format
    and splits into three on-disk variants a pipeline must route
    differently: 'VP8 ' lossy (no alpha, never animated), 'VP8L'
    lossless (alpha bit packed into the 5-byte signature block),
    'VP8X' extended (the only animated form; alpha/animation flags
    plus a 24-bit canvas size).

    Field layout is the public container spec (RIFC fourcc at byte
    12, chunk payload at byte 20): lossy requires the 9D012A frame
    sync then 14-bit LE dims (upper 2 bits are the scaling hint —
    masked); lossless packs width-1 / height-1 / alpha into an LE32
    read LSB-first after the 0x2F signature byte; extended carries a
    flags byte (0x10 alpha, 0x02 animation) and width-1 / height-1
    as LE24. Truncated headers NULL-absorb via conv('') → NULL;
    non-webp rows get all-NULL structure; an unknown or truncated
    fourcc yields a NULL variant (and NULL everything else)."""
    staged = df.withColumns(
        {
            "__wx": F.hex(F.substring(F.col(bytes_col), 1, 64)),
            "fmt": sniffed_type(F.col(bytes_col)),
        }
    )
    hx = F.col("__wx")
    fcc = F.when(F.col("fmt") == "webp", hx.substr(F.lit(25), F.lit(8)))
    staged = staged.withColumn("__fcc", fcc)
    fcc = F.col("__fcc")

    variant = F.lit(None).cast("string")
    for code, name in WEBP_VARIANTS.items():
        variant = F.when(fcc == code, name).otherwise(variant)

    # lossy: frame sync 9D012A at bytes 23..25, dims LE16 & 0x3FFF
    sync_ok = hx.substr(F.lit(47), F.lit(6)) == "9D012A"
    lossy_w = F.when(sync_ok, _le(hx, F.lit(53), 2).bitwiseAND(F.lit(16383)))
    lossy_h = F.when(sync_ok, _le(hx, F.lit(57), 2).bitwiseAND(F.lit(16383)))

    # lossless: 0x2F signature at byte 20, then LE32 bit-pack
    sig_ok = hx.substr(F.lit(41), F.lit(2)) == "2F"
    bits = _le(hx, F.lit(43), 4)
    ll_w = F.when(sig_ok, bits.bitwiseAND(F.lit(16383)) + 1)
    ll_h = F.when(sig_ok, F.shiftright(bits, 14).bitwiseAND(F.lit(16383)) + 1)
    ll_alpha = F.when(sig_ok, F.shiftright(bits, 28).bitwiseAND(F.lit(1)) == 1)

    # extended: flags byte 20, canvas dims LE24 (stored minus one)
    flags = _hex2long(hx, F.lit(41), 2)
    ex_w = _le(hx, F.lit(49), 3) + 1
    ex_h = _le(hx, F.lit(55), 3) + 1
    ex_alpha = flags.bitwiseAND(F.lit(16)) == 16
    ex_anim = flags.bitwiseAND(F.lit(2)) == 2

    width = (
        F.when(fcc == "56503820", lossy_w)
        .when(fcc == "5650384C", ll_w)
        .when(fcc == "56503858", ex_w)
    )
    height = (
        F.when(fcc == "56503820", lossy_h)
        .when(fcc == "5650384C", ll_h)
        .when(fcc == "56503858", ex_h)
    )
    has_alpha = (
        F.when(fcc == "56503820", F.lit(False))
        .when(fcc == "5650384C", ll_alpha)
        .when(fcc == "56503858", ex_alpha)
    )
    is_anim = (
        F.when(fcc.isin("56503820", "5650384C"), F.lit(False))
        .when(fcc == "56503858", ex_anim)
    )
    return (
        staged.withColumns(
            {
                "variant": variant,
                "width": width.cast("int"),
                "height": height.cast("int"),
                "has_alpha": has_alpha,
                "is_animated": is_anim,
            }
        )
        .drop("__wx", "__fcc")
    )


def webp_structure_sql(src: str, keep: str = "doc_id", h_col: str = "h",
                       fmt_col: str = "fmt") -> str:
    """DuckDB replay of :func:`webp_structure` — same offsets, same
    NULL absorption (TRY_CAST mirrors conv); bit masks/shifts spelled
    as non-negative integer div/mod so both engines agree exactly."""
    var_whens = " ".join(
        f"WHEN '{code}' THEN '{name}'" for code, name in WEBP_VARIANTS.items()
    )
    bits = _le_sql(h_col, 43, 4)
    flags = f"TRY_CAST(concat('0x', substring({h_col}, 41, 2)) AS BIGINT)"
    return f"""
        WITH ws AS (
          SELECT {keep}, {fmt_col} AS fmt,
                 CASE WHEN {fmt_col} = 'webp'
                      THEN substring({h_col}, 25, 8) END AS fcc,
                 substring({h_col}, 47, 6) = '9D012A' AS sync_ok,
                 {_le_sql(h_col, 53, 2)} AS lw_raw,
                 {_le_sql(h_col, 57, 2)} AS lh_raw,
                 substring({h_col}, 41, 2) = '2F' AS sig_ok,
                 {bits} AS bits,
                 {flags} AS flags,
                 {_le_sql(h_col, 49, 3)} AS exw_raw,
                 {_le_sql(h_col, 55, 3)} AS exh_raw
          FROM {src}
        )
        SELECT {keep}, fmt,
               CASE fcc {var_whens} END AS variant,
               CAST(CASE fcc
                 WHEN '56503820' THEN CASE WHEN sync_ok THEN lw_raw % 16384 END
                 WHEN '5650384C' THEN CASE WHEN sig_ok THEN bits % 16384 + 1 END
                 WHEN '56503858' THEN exw_raw + 1 END AS INT) AS width,
               CAST(CASE fcc
                 WHEN '56503820' THEN CASE WHEN sync_ok THEN lh_raw % 16384 END
                 WHEN '5650384C' THEN CASE WHEN sig_ok THEN (bits // 16384) % 16384 + 1 END
                 WHEN '56503858' THEN exh_raw + 1 END AS INT) AS height,
               CASE fcc
                 WHEN '56503820' THEN FALSE
                 WHEN '5650384C' THEN CASE WHEN sig_ok
                      THEN (bits // 268435456) % 2 = 1 END
                 WHEN '56503858' THEN (flags // 16) % 2 = 1 END AS has_alpha,
               CASE WHEN fcc IN ('56503820', '5650384C') THEN FALSE
                    WHEN fcc = '56503858' THEN (flags // 2) % 2 = 1
               END AS is_animated
        FROM ws
    """


GIF_WINDOW_BYTES = 1024
# 0x21 0xFF 0x0B 'NETSCAPE2.0' — the application-extension signature
# every looping animated GIF carries (before the first image
# descriptor by convention, i.e. within header + GCT + a few bytes).
NETSCAPE_SIG_HEX = "21FF0B" + "4E45545343415045322E30"
# byte-aligned containment: the signature must start at an odd
# (1-based) hex position, i.e. after a whole number of bytes — a
# bare `contains` would false-positive on palette bytes that spell
# the signature straddling a byte boundary.
_NETSCAPE_ALIGNED_RE = "^(?:[0-9A-F]{2})*" + NETSCAPE_SIG_HEX


def gif_structure(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Add (fmt, version, has_gct, palette_size, bg_index,
    is_animated_hint) from the GIF header — the decode-free tier for
    the legacy-web image format, sibling of jpeg/png/webp_structure.

    Fixed-offset fields are exact: version ('87a'/'89a' from the
    magic), global-color-table flag + 2^(N+1) palette size and the
    background index from the packed byte at offset 10. Animation is
    a HINT: the NETSCAPE2.0 looping application extension is located
    byte-aligned inside the first 1 KiB (header 13 B + GCT ≤ 768 B +
    extension block always fit) — a GIF with the signature bytes at
    an aligned offset inside palette data would false-positive
    (same documented caveat as the WHATWG meta-charset prescan), and
    a non-looping multi-frame GIF carries no NETSCAPE block and
    reads false. Exactness would need an unbounded sub-block walk;
    the hint is the admission-gate trade every curation pipeline
    makes. Non-GIF rows get all-NULL structure."""
    staged = df.withColumns(
        {
            "__gx": F.hex(F.substring(F.col(bytes_col), 1, GIF_WINDOW_BYTES)),
            "fmt": sniffed_type(F.col(bytes_col)),
        }
    )
    hx = F.col("__gx")
    is_gif = F.col("fmt") == "gif"
    version = F.when(is_gif & (hx.substr(F.lit(9), F.lit(2)) == "37"), "87a") \
               .when(is_gif & (hx.substr(F.lit(9), F.lit(2)) == "39"), "89a")
    packed = F.when(is_gif, _hex2long(hx, F.lit(21), 2))
    has_gct = F.when(packed.isNotNull(), packed >= 128)
    size_bits = packed.bitwiseAND(F.lit(7))
    palette = F.lit(0).cast("long")
    for b in range(8):
        palette = F.when(size_bits == b, F.lit(2 ** (b + 1))).otherwise(palette)
    palette = F.when(has_gct.isNotNull(),
                     F.when(has_gct, palette).otherwise(F.lit(0)))
    bg = F.when(packed.isNotNull(), _hex2long(hx, F.lit(23), 2))
    anim = F.when(is_gif, hx.rlike(_NETSCAPE_ALIGNED_RE))
    return (
        staged.withColumns(
            {
                "version": version,
                "has_gct": has_gct,
                "palette_size": palette.cast("int"),
                "bg_index": bg.cast("int"),
                "is_animated_hint": anim,
            }
        )
        .drop("__gx")
    )


def gif_structure_sql(src: str, keep: str = "doc_id", h_col: str = "h",
                      fmt_col: str = "fmt") -> str:
    """DuckDB replay of :func:`gif_structure` — same offsets, same
    aligned-containment regex (RE2-compatible), bit ops as integer
    div/mod."""
    packed = (f"CASE WHEN {fmt_col} = 'gif' THEN "
              f"TRY_CAST(concat('0x', substring({h_col}, 21, 2)) AS BIGINT) END")
    bg = f"TRY_CAST(concat('0x', substring({h_col}, 23, 2)) AS BIGINT)"
    pal_whens = " ".join(f"WHEN {b} THEN {2 ** (b + 1)}" for b in range(8))
    return f"""
        WITH gs AS (
          SELECT {keep}, {fmt_col} AS fmt,
                 CASE WHEN {fmt_col} = 'gif' THEN substring({h_col}, 9, 2) END AS vb,
                 {packed} AS packed,
                 CASE WHEN {fmt_col} = 'gif' THEN {bg} END AS bg,
                 CASE WHEN {fmt_col} = 'gif'
                      THEN regexp_matches({h_col}, '{_NETSCAPE_ALIGNED_RE}') END AS anim
          FROM {src}
        )
        SELECT {keep}, fmt,
               CASE vb WHEN '37' THEN '87a' WHEN '39' THEN '89a' END AS version,
               CASE WHEN packed IS NOT NULL THEN packed >= 128 END AS has_gct,
               CAST(CASE WHEN packed IS NOT NULL THEN
                 CASE WHEN packed >= 128
                      THEN CASE packed % 8 {pal_whens} END
                      ELSE 0 END END AS INT) AS palette_size,
               CAST(CASE WHEN packed IS NOT NULL THEN bg END AS INT) AS bg_index,
               anim AS is_animated_hint
        FROM gs
    """


#: EXIF sub-IFD pointer (IFD0 tag 0x8769) and DateTimeOriginal
#: (Exif-IFD tag 0x9003) — EXIF 2.x public spec.
_EXIF_IFD_TAG = 0x8769
_DTO_TAG = 0x9003
EXIF_DT_WINDOW_BYTES = 1024
# hex of a well-formed 'YYYY:MM:DD HH:MM:SS' — digits 0x30-0x39,
# ':' 0x3A, ' ' 0x20; validating the HEX makes the later decode safe
# (garbage offsets land on arbitrary bytes, never valid UTF-8 here).
_DT_HEX_RE = ("^(?:3[0-9]){4}3A(?:3[0-9]){2}3A(?:3[0-9]){2}20"
              "(?:3[0-9]){2}3A(?:3[0-9]){2}3A(?:3[0-9]){2}$")


def exif_datetime(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Add (fmt, datetime_original, capture_year) from EXIF
    DateTimeOriginal — the provenance/recency signal an image corpus
    dedups and stratifies on (a 2009 phone photo and its 2024
    re-upload share pixels but not capture time), decode-free like
    the rest of the header family.

    Two-level TIFF walk on top of the shared staging: IFD0 scan for
    the Exif sub-IFD pointer (tag 0x8769, LONG value = byte offset
    from the TIFF header), then a second bounded entry scan inside
    the sub-IFD for tag 0x9003, whose 20-byte ASCII value always
    lives behind an offset (count 20 > 4). Every hop (pointer,
    sub-IFD count/base, string offset, string hex) is staged as a
    named column — the anti-Janino discipline — and the 19-char
    'YYYY:MM:DD HH:MM:SS' is validated against its hex signature
    before decoding, so corrupt offsets NULL out instead of decoding
    garbage. Window 1 KiB (EXIF blocks sit at the file head; deeper
    metadata NULL-absorbs)."""
    hx = F.col("__ex")

    def rd(pos, n_bytes):
        return F.when(F.col("__le"), _le(hx, pos, n_bytes)).otherwise(
            _hex2long(hx, pos, 2 * n_bytes)
        )

    s = _exif_stage(df, bytes_col, window_bytes=EXIF_DT_WINDOW_BYTES)

    xoff_branches = []
    for i in range(IFD_MAX_ENTRIES):
        epos = F.col("__e") + F.lit(24 * i)
        xoff_branches.append(
            F.when(
                (F.lit(i) < F.col("__n")) & (rd(epos, 2) == _EXIF_IFD_TAG),
                rd(epos + F.lit(16), 4),
            )
        )
    s = s.withColumn("__xoff", F.coalesce(*xoff_branches))
    s = s.withColumns(
        {
            "__sn": rd(F.col("__t") + F.lit(2) * F.col("__xoff"), 2),
            "__se": F.col("__t") + F.lit(2) * F.col("__xoff") + F.lit(4),
        }
    )
    soff_branches = []
    for i in range(IFD_MAX_ENTRIES):
        epos = F.col("__se") + F.lit(24 * i)
        soff_branches.append(
            F.when(
                (F.lit(i) < F.col("__sn")) & (rd(epos, 2) == _DTO_TAG),
                rd(epos + F.lit(16), 4),
            )
        )
    s = s.withColumn("__soff", F.coalesce(*soff_branches))
    s = s.withColumn(
        "__dth", hx.substr(F.col("__t") + F.lit(2) * F.col("__soff"), F.lit(38))
    )
    dt = F.when(F.col("__dth").rlike(_DT_HEX_RE),
                F.decode(F.unhex(F.col("__dth")), "UTF-8"))
    return (
        s.withColumn("datetime_original", dt)
        .withColumn(
            "capture_year",
            F.substring(F.col("datetime_original"), 1, 4).cast("int"),
        )
        .drop("__ex", "__t", "__le", "__ifd", "__n", "__e",
              "__xoff", "__sn", "__se", "__soff", "__dth")
    )


def exif_datetime_sql(src: str, keep: str = "doc_id", h_col: str = "h",
                      fmt_col: str = "fmt") -> str:
    """DuckDB replay of :func:`exif_datetime` — the shared staging
    chain plus the two-level scan as CTEs mirroring the Spark
    staging columns."""
    xoff = ", ".join(
        f"CASE WHEN {i} < n AND ({_rd_sql('h', 'le', f'e + {24 * i}', 2)}) = {_EXIF_IFD_TAG} "
        f"THEN ({_rd_sql('h', 'le', f'e + {24 * i} + 16', 4)}) END"
        for i in range(IFD_MAX_ENTRIES)
    )
    soff = ", ".join(
        f"CASE WHEN {i} < sn AND ({_rd_sql('h', 'le', f'se + {24 * i}', 2)}) = {_DTO_TAG} "
        f"THEN ({_rd_sql('h', 'le', f'se + {24 * i} + 16', 4)}) END"
        for i in range(IFD_MAX_ENTRIES)
    )
    return f"""
        WITH {_exif_stage_sql(src, keep, h_col, fmt_col)}, ed_x AS (
          SELECT *, COALESCE({xoff}) AS xoff FROM eo_en
        ), ed_s AS (
          SELECT *, {_rd_sql('h', 'le', 't + 2 * xoff', 2)} AS sn,
                 t + 2 * xoff + 4 AS se
          FROM ed_x
        ), ed_o AS (
          SELECT *, COALESCE({soff}) AS soff FROM ed_s
        ), ed_d AS (
          SELECT *, substring(h, CAST(t + 2 * soff AS BIGINT), 38) AS dth
          FROM ed_o
        ), ed_f AS (
          SELECT *, CASE WHEN regexp_matches(dth, '{_DT_HEX_RE}')
                         THEN decode(unhex(dth)) END AS datetime_original
          FROM ed_d
        )
        SELECT {keep}, fmt, datetime_original,
               TRY_CAST(substring(datetime_original, 1, 4) AS INT) AS capture_year
        FROM ed_f
    """


# ---- ISO-BMFF (MP4 / AVIF / HEIC) structure ---------------------------------

ISOBMFF_WINDOW_BYTES = 1024
#: major-brand fourcc (bytes 8-11 of the ftyp box) → label
ISOBMFF_BRANDS = {
    "61766966": "avif", "68656963": "heic", "68656978": "heix",
    "6D696631": "mif1", "69736F6D": "isom", "6D703431": "mp41",
    "6D703432": "mp42", "71742020": "qt", "4D344120": "m4a",
    "64617368": "dash",
}
_ISPE_HEX = "69737065"   # 'ispe' — image spatial extents property
_MVHD_HEX = "6D766864"   # 'mvhd' — movie header (timescale + duration)


def _aligned_box_pos(hx: Column, fourcc_hex: str) -> Column:
    """1-based hex position of the first BYTE-ALIGNED occurrence of a
    box fourcc, NULL when absent — the shortest even-length prefix
    before the fourcc (non-greedy), same alignment discipline as the
    GIF NETSCAPE hint."""
    pat = "^((?:[0-9A-F]{2})*?)" + fourcc_hex
    return F.when(
        hx.rlike(pat),
        F.length(F.regexp_extract(hx, pat, 1)) + 1,
    )


def isobmff_structure(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Add (fmt, brand, width, height, duration_sec) from the
    ISO-BMFF box layer — the shared container of MP4 video and the
    AVIF/HEIC image formats (which a magic sniff can only call
    'mp4'; the MAJOR BRAND at bytes 8-11 of the ftyp box is what
    routes a payload to an image vs a video pipeline).

    Dims come from the first byte-aligned 'ispe' box (image spatial
    extents — the property AVIF/HEIC carry; plain video has none and
    reads NULL: track dims live in tkhd's 16.16 fixed-point, out of
    scope). Duration comes from the first aligned 'mvhd' box —
    version-aware (v0 32-bit / v1 64-bit times) with an exact
    integer `duration div timescale`, NULL on a zero timescale.
    Both locates share the GIF-hint caveats: byte-aligned
    containment within the first 1 KiB, so a tail-moov (non-faststart)
    MP4 reads NULL duration, and fourcc bytes inside unrelated data
    at an aligned offset would false-positive. Non-ISO-BMFF rows get
    all-NULL structure. Pure map-side projection."""
    staged = df.withColumns(
        {
            "__bx": F.hex(F.substring(F.col(bytes_col), 1, ISOBMFF_WINDOW_BYTES)),
            "fmt": sniffed_type(F.col(bytes_col)),
        }
    )
    hx = F.col("__bx")
    is_box = F.col("fmt") == "mp4"
    brand_cc = F.when(is_box, hx.substr(F.lit(17), F.lit(8)))
    staged = staged.withColumns(
        {
            "__brand_cc": brand_cc,
            "__ispe": F.when(is_box, _aligned_box_pos(hx, _ISPE_HEX)),
            "__mvhd": F.when(is_box, _aligned_box_pos(hx, _MVHD_HEX)),
        }
    )
    brand = F.lit(None).cast("string")
    for code, name in ISOBMFF_BRANDS.items():
        brand = F.when(F.col("__brand_cc") == code, name).otherwise(brand)
    brand = F.when(F.col("__brand_cc").isNotNull(),
                   F.coalesce(brand, F.lit("other")))
    # guard: a truncated window yields a partial fourcc → NULL brand
    brand = F.when(F.length(F.col("__brand_cc")) == 8, brand)

    p = F.col("__ispe")
    width = _hex2long(hx, p + F.lit(16), 8)
    height = _hex2long(hx, p + F.lit(24), 8)

    m = F.col("__mvhd")
    ver = _hex2long(hx, m + F.lit(8), 2)
    ts = F.when(ver == 0, _hex2long(hx, m + F.lit(32), 8)) \
          .when(ver == 1, _hex2long(hx, m + F.lit(48), 8))
    dur = F.when(ver == 0, _hex2long(hx, m + F.lit(40), 8)) \
           .when(ver == 1, _hex2long(hx, m + F.lit(56), 16))
    staged = staged.withColumns({"__ts": ts, "__dur": dur})
    return (
        staged.withColumns(
            {
                "brand": brand,
                "width": width.cast("int"),
                "height": height.cast("int"),
                "duration_sec": F.when(
                    F.col("__ts") > 0, F.expr("__dur div __ts")
                ),
            }
        )
        .drop("__bx", "__brand_cc", "__ispe", "__mvhd", "__ts", "__dur")
    )


def isobmff_structure_sql(src: str, keep: str = "doc_id", h_col: str = "h",
                          fmt_col: str = "fmt") -> str:
    """DuckDB replay of :func:`isobmff_structure` — same aligned
    locates (regexp prefix length), brand table, and version-aware
    integer division."""
    brand_whens = " ".join(
        f"WHEN '{code}' THEN '{name}'" for code, name in ISOBMFF_BRANDS.items()
    )

    def pos(fourcc):
        pat = "^((?:[0-9A-F]{2})*?)" + fourcc
        return (f"CASE WHEN regexp_matches({h_col}, '{pat}') THEN "
                f"length(regexp_extract({h_col}, '{pat}', 1)) + 1 END")

    return f"""
        WITH ib_s AS (
          SELECT {keep}, {fmt_col} AS fmt, {h_col} AS h,
                 CASE WHEN {fmt_col} = 'mp4'
                      THEN substring({h_col}, 17, 8) END AS brand_cc,
                 CASE WHEN {fmt_col} = 'mp4' THEN {pos(_ISPE_HEX)} END AS ip,
                 CASE WHEN {fmt_col} = 'mp4' THEN {pos(_MVHD_HEX)} END AS mp
          FROM {src}
        ), ib_v AS (
          SELECT *, {_be_sql('h', 'mp + 8', 2)} AS ver FROM ib_s
        ), ib_d AS (
          SELECT *,
                 CASE ver WHEN 0 THEN {_be_sql('h', 'mp + 32', 8)}
                          WHEN 1 THEN {_be_sql('h', 'mp + 48', 8)} END AS ts,
                 CASE ver WHEN 0 THEN {_be_sql('h', 'mp + 40', 8)}
                          WHEN 1 THEN {_be_sql('h', 'mp + 56', 16)} END AS dur
          FROM ib_v
        )
        SELECT {keep}, fmt,
               CASE WHEN length(brand_cc) = 8 THEN
                 CASE brand_cc {brand_whens} ELSE 'other' END END AS brand,
               CAST({_be_sql('h', 'ip + 16', 8)} AS INT) AS width,
               CAST({_be_sql('h', 'ip + 24', 8)} AS INT) AS height,
               CASE WHEN ts > 0 THEN dur // ts END AS duration_sec
        FROM ib_d
    """


# ---- image role classification ----------------------------------------------

#: (role, rule) in priority order — first match wins. Pure integer
#: geometry (cross-multiplied aspect tests, never a float divide).
IMAGE_ROLE_ORDER = ["tracking_pixel", "icon", "banner", "thumbnail", "content"]


def image_role_classify(df: DataFrame, width_col: str = "width",
                        height_col: str = "height") -> DataFrame:
    """Add `role` from header dims: the admission ROUTER an
    image+caption pipeline needs before any decode — 1×1 tracking
    pixels, chrome icons, and ad banners pollute CLIP-style training
    sets yet sail through byte-level gates. Rules (first match):
    tracking_pixel (both dims ≤ 2), icon (≤ 64×64 and aspect within
    2:1 either way), banner (aspect ≥ 4:1 either way), thumbnail
    (longest side ≤ 160), content otherwise; NULL dims → NULL role
    (route to the unknown queue, never silently 'content'). Pure
    projection over columns :func:`image_dims` already produced."""
    w, h = F.col(width_col), F.col(height_col)
    role = (
        F.when(w.isNull() | h.isNull(), F.lit(None).cast("string"))
        .when((w <= 2) & (h <= 2), "tracking_pixel")
        .when((w <= 64) & (h <= 64) & (w <= 2 * h) & (h <= 2 * w), "icon")
        .when((w >= 4 * h) | (h >= 4 * w), "banner")
        .when(F.greatest(w, h) <= 160, "thumbnail")
        .otherwise("content")
    )
    return df.withColumn("role", role)


def image_role_sql(w: str = "width", h: str = "height") -> str:
    """DuckDB fragment computing exactly ``image_role_classify``'s
    role column."""
    return f"""CASE
        WHEN {w} IS NULL OR {h} IS NULL THEN NULL
        WHEN {w} <= 2 AND {h} <= 2 THEN 'tracking_pixel'
        WHEN {w} <= 64 AND {h} <= 64 AND {w} <= 2 * {h} AND {h} <= 2 * {w}
          THEN 'icon'
        WHEN {w} >= 4 * {h} OR {h} >= 4 * {w} THEN 'banner'
        WHEN GREATEST({w}, {h}) <= 160 THEN 'thumbnail'
        ELSE 'content' END"""


# ---- PDF structure (decode-free) --------------------------------------------

PDF_WINDOW_BYTES = 2048
_PDF_LINEARIZED_HEX = "2F4C696E656172697A6564"   # '/Linearized'
_PDF_ENCRYPT_HEX = "2F456E6372797074"            # '/Encrypt'


def pdf_structure(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Add (fmt, pdf_version, linearized_hint, encrypted_hint) from
    the first 2 KiB — the routing tier for the web's most common
    non-HTML document format: version gates parser choice,
    linearized ('fast web view') files stream-parse, and encrypted
    files go to a credentials queue instead of crashing a text
    extractor. Version from the fixed '%PDF-M.N' header; the two
    dictionary keys are byte-aligned containment HINTS (the
    /Encrypt reference normally lives in the TRAILER at EOF — a
    false negative here only means a later gate catches it; the
    linearization dict, per spec, must sit in the first 1024 bytes,
    so that hint is near-exact). Same caveat family as the GIF
    NETSCAPE hint, documented."""
    staged = df.withColumns(
        {
            "__px": F.hex(F.substring(F.col(bytes_col), 1, PDF_WINDOW_BYTES)),
            "fmt": sniffed_type(F.col(bytes_col)),
        }
    )
    hx = F.col("__px")
    is_pdf = F.col("fmt") == "pdf"
    # '%PDF-' + digit '.' digit → hex 255044462D 3M 2E 3N
    ver = F.when(
        is_pdf & hx.rlike("^255044462D3[0-9]2E3[0-9]"),
        F.concat(hx.substr(F.lit(12), F.lit(1)), F.lit("."),
                 hx.substr(F.lit(16), F.lit(1))),
    )
    aligned = "^(?:[0-9A-F]{2})*"
    return (
        staged.withColumns(
            {
                "pdf_version": ver,
                "linearized_hint": F.when(
                    is_pdf, hx.rlike(aligned + _PDF_LINEARIZED_HEX)),
                "encrypted_hint": F.when(
                    is_pdf, hx.rlike(aligned + _PDF_ENCRYPT_HEX)),
            }
        )
        .drop("__px")
    )


def pdf_structure_sql(src: str, keep: str = "doc_id", h_col: str = "h",
                      fmt_col: str = "fmt") -> str:
    """DuckDB replay of :func:`pdf_structure`."""
    aligned = "^(?:[0-9A-F]{2})*"
    return f"""
        SELECT {keep}, {fmt_col} AS fmt,
               CASE WHEN {fmt_col} = 'pdf'
                     AND regexp_matches({h_col}, '^255044462D3[0-9]2E3[0-9]')
                    THEN substring({h_col}, 12, 1) || '.'
                         || substring({h_col}, 16, 1) END AS pdf_version,
               CASE WHEN {fmt_col} = 'pdf' THEN
                 regexp_matches({h_col}, '{aligned}{_PDF_LINEARIZED_HEX}')
               END AS linearized_hint,
               CASE WHEN {fmt_col} = 'pdf' THEN
                 regexp_matches({h_col}, '{aligned}{_PDF_ENCRYPT_HEX}')
               END AS encrypted_hint
        FROM {src}
    """


# ---- gzip member header ------------------------------------------------------

GZIP_WINDOW_BYTES = 512
# printable-ASCII hex pairs (0x20-0x7E) — the gate that makes the
# fname decode safe
_PRINTABLE_HEX_RE = "^(?:[2-6][0-9A-F]|7[0-9A-E])*$"


def gzip_structure(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Add (fmt, mtime, has_fname, fname) from the gzip member
    header (RFC 1952) — provenance for the .gz members a WARC/dump
    pipeline meets constantly: MTIME is the original file's epoch
    seconds (0 = 'no timestamp' per spec → NULL), FNAME the original
    file name. The name is extracted only when FLG declares it AND
    no FEXTRA field precedes it (variable-length, would shift the
    offset); the zero-terminated latin-1 run is found with the
    aligned non-greedy prefix trick and validated printable-ASCII
    before decoding. Truncated headers NULL-absorb."""
    staged = df.withColumns(
        {
            "__gz": F.hex(F.substring(F.col(bytes_col), 1, GZIP_WINDOW_BYTES)),
            "fmt": sniffed_type(F.col(bytes_col)),
        }
    )
    hx = F.col("__gz")
    is_gz = F.col("fmt") == "gzip"
    flg = F.when(is_gz, _hex2long(hx, F.lit(7), 2))
    staged = staged.withColumn("__flg", flg)
    flg = F.col("__flg")
    mtime_raw = _le(hx, F.lit(9), 4)
    mtime = F.when(mtime_raw > 0, mtime_raw)
    has_fname = F.when(flg.isNotNull(), flg.bitwiseAND(F.lit(8)) == 8)
    no_extra = flg.bitwiseAND(F.lit(4)) == 0
    name_hex = F.regexp_extract(
        hx, "^(?:[0-9A-F]{2}){10}((?:[0-9A-F]{2})*?)00", 1)
    fname = F.when(
        has_fname & no_extra & (name_hex != "")
        & name_hex.rlike(_PRINTABLE_HEX_RE),
        F.decode(F.unhex(name_hex), "UTF-8"),
    )
    return (
        staged.withColumns(
            {
                "mtime": F.when(flg.isNotNull(), mtime).cast("long"),
                "has_fname": has_fname,
                "fname": fname,
            }
        )
        .drop("__gz", "__flg")
    )


def gzip_structure_sql(src: str, keep: str = "doc_id", h_col: str = "h",
                       fmt_col: str = "fmt") -> str:
    """DuckDB replay of :func:`gzip_structure`."""
    flg = (f"CASE WHEN {fmt_col} = 'gzip' THEN "
           f"TRY_CAST(concat('0x', substring({h_col}, 7, 2)) AS BIGINT) END")
    name_hex = (f"regexp_extract({h_col}, "
                f"'^(?:[0-9A-F]{{2}}){{10}}((?:[0-9A-F]{{2}})*?)00', 1)")
    return f"""
        WITH gz_s AS (
          SELECT {keep}, {fmt_col} AS fmt, {h_col} AS h, {flg} AS flg,
                 {_le_sql(h_col, 9, 4)} AS mtime_raw, {name_hex} AS name_hex
          FROM {src}
        )
        SELECT {keep}, fmt,
               CAST(CASE WHEN flg IS NOT NULL AND mtime_raw > 0
                    THEN mtime_raw END AS BIGINT) AS mtime,
               CASE WHEN flg IS NOT NULL THEN (flg // 8) % 2 = 1 END AS has_fname,
               CASE WHEN (flg // 8) % 2 = 1 AND (flg // 4) % 2 = 0
                     AND name_hex <> ''
                     AND regexp_matches(name_hex, '{_PRINTABLE_HEX_RE}')
                    THEN decode(unhex(name_hex)) END AS fname
        FROM gz_s
    """


# ---- ICO / favicon structure ---------------------------------------------------
#
# The favicon container (Microsoft ICONDIR, also the WHATWG sniff
# table's image/x-icon): a crawler meets one per host, and the
# routing decision is real — modern favicons embed whole PNG streams
# per entry (Vista+), which decode through the PNG path, while
# classic entries are DIB bitmaps.  Multi-resolution files declare
# one ICONDIRENTRY per image; the 0-byte width/height convention
# means 256.

#: entries scanned for dims / PNG payloads — favicons beyond 4
#: entries are rare and only the first ICO_SCAN_ENTRIES contribute
#: to max_w/max_h/has_png_entry (documented cap, pinned in tests).
ICO_SCAN_ENTRIES = 4
#: window covers ICONDIR + 4 entries + small embedded payload heads.
ICO_WINDOW_BYTES = 2048
_PNG_MAGIC_HEX = "89504E470D0A1A0A"


def ico_structure(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Add (fmt, kind, n_images, max_w, max_h, has_png_entry) from
    the ICONDIR header — decode-free like the rest of the header
    family.  kind distinguishes icons from cursors (same container,
    type word 1 vs 2); n_images is the declared entry count; max_w /
    max_h are the largest declared dimensions over the first
    ``ICO_SCAN_ENTRIES`` entries with the 0 → 256 convention applied;
    has_png_entry is true when any scanned entry's payload offset
    lands on a PNG magic inside the window (the Vista+ PNG-embedded
    form that must route through the PNG decoder).  Truncated
    directories NULL-absorb; non-ico rows get all-NULL structure."""
    staged = df.withColumns(
        {
            "__ix": F.hex(F.substring(F.col(bytes_col), 1, ICO_WINDOW_BYTES)),
            "fmt": sniffed_type(F.col(bytes_col)),
        }
    )
    hx = F.col("__ix")
    is_ico = F.col("fmt") == "ico"
    kind = F.when(is_ico,
                  F.when(hx.substr(F.lit(5), F.lit(4)) == "0100", "icon")
                   .otherwise("cursor"))
    n = F.when(is_ico, _le(hx, F.lit(9), 2))
    staged = staged.withColumn("__n", n)
    n = F.col("__n")
    cols, ws, hs, pngs = {}, [], [], []
    for i in range(ICO_SCAN_ENTRIES):
        base = 13 + 32 * i  # entry i starts at byte 6 + 16 i
        valid = n > i
        wd = F.when(valid, _hex2long(hx, F.lit(base), 2))
        ht = F.when(valid, _hex2long(hx, F.lit(base + 2), 2))
        off = F.when(valid, _le(hx, F.lit(base + 24), 4))
        cols[f"__w{i}"] = F.when(wd == 0, 256).otherwise(wd)
        cols[f"__h{i}"] = F.when(ht == 0, 256).otherwise(ht)
        cols[f"__p{i}"] = hx.substr(
            (F.lit(2) * off + 1).cast("int"), F.lit(16)
        ) == _PNG_MAGIC_HEX
        ws.append(f"__w{i}")
        hs.append(f"__h{i}")
        pngs.append(f"__p{i}")
    staged = staged.withColumns(cols)
    has_png = F.lit(False)
    for p in pngs:
        has_png = has_png | F.coalesce(F.col(p), F.lit(False))
    return (
        staged.withColumns(
            {
                "kind": kind,
                "n_images": n.cast("int"),
                "max_w": F.array_max(F.array(*ws)).cast("int"),
                "max_h": F.array_max(F.array(*hs)).cast("int"),
                "has_png_entry": F.when(n.isNotNull(), has_png),
            }
        )
        .drop("__ix", "__n", *ws, *hs, *pngs)
    )


def ico_structure_sql(src: str, keep: str = "doc_id", h_col: str = "h",
                      fmt_col: str = "fmt") -> str:
    """DuckDB replay of :func:`ico_structure` — same offsets, same
    0 → 256 mapping, list_max mirroring array_max's NULL-skipping."""
    n = (f"CASE WHEN {fmt_col} = 'ico' THEN "
         f"{_le_sql(h_col, 9, 2)} END")
    w_terms, h_terms, p_terms = [], [], []
    for i in range(ICO_SCAN_ENTRIES):
        base = 13 + 32 * i
        wd = f"TRY_CAST(concat('0x', substring(h, {base}, 2)) AS BIGINT)"
        ht = f"TRY_CAST(concat('0x', substring(h, {base + 2}, 2)) AS BIGINT)"
        off = _le_sql("h", base + 24, 4)
        w_terms.append(
            f"CASE WHEN n > {i} THEN "
            f"CASE WHEN ({wd}) = 0 THEN 256 ELSE {wd} END END")
        h_terms.append(
            f"CASE WHEN n > {i} THEN "
            f"CASE WHEN ({ht}) = 0 THEN 256 ELSE {ht} END END")
        p_terms.append(
            f"COALESCE(CASE WHEN n > {i} THEN "
            f"substring(h, CAST(2 * ({off}) + 1 AS BIGINT), 16)"
            f" = '{_PNG_MAGIC_HEX}' END, false)")
    return f"""
        WITH ic0 AS (
          SELECT {keep}, {fmt_col} AS fmt, {h_col} AS h, {n} AS n
          FROM {src}
        )
        SELECT {keep}, fmt,
               CASE WHEN fmt = 'ico' THEN
                 CASE WHEN substring(h, 5, 4) = '0100'
                      THEN 'icon' ELSE 'cursor' END END AS kind,
               CAST(n AS INT) AS n_images,
               CAST(list_max([{", ".join(w_terms)}]) AS INT) AS max_w,
               CAST(list_max([{", ".join(h_terms)}]) AS INT) AS max_h,
               CASE WHEN n IS NOT NULL
                    THEN {" OR ".join(p_terms)} END AS has_png_entry
        FROM ic0
    """


# ---- JPEG colorspace routing ----------------------------------------------------
#
# The loader-crash tier: 4-component (CMYK/YCCK) JPEGs come out of
# print/press pipelines, decode to inverted or garbage colors in
# naive loaders, and crash training stacks that assume 3 channels;
# the only decode-free routing signal is the SOF component count
# plus the Adobe APP14 transform byte (libjpeg convention: 3-comp is
# YCbCr unless Adobe says transform=0 → RGB; 4-comp is CMYK unless
# transform=2 → YCCK).  ICC presence (APP2 'ICC_PROFILE\0') marks
# payloads whose colors are wrong WITHOUT profile application —
# worth routing to a color-managed decode path.

#: hops for the colorspace walk: APP0+APP1+APP2+APP14+DQTs+SOF needs
#: ~7 segments; an ICC segment is ONE hop regardless of size.
JPEG_CS_MAX_HOPS = 10
#: window: covers headers with small-to-moderate ICC payloads; a
#: multi-KB profile pushes SOF beyond it and colorspace NULL-absorbs
#: (has_icc is still detected — APP2 precedes the profile bytes).
JPEG_CS_WINDOW_BYTES = 4096
_ICC_SIG_HEX = "4943435F50524F46494C4500"   # 'ICC_PROFILE\0'
_ADOBE_HEX = "41646F6265"                   # 'Adobe'


def jpeg_colorspace(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Add (fmt, n_components, adobe_transform, has_icc, colorspace,
    cmyk_risk) from the segment chain.  One bounded fold tracks the
    FIRST SOF / APP14 / ICC-bearing APP2 positions simultaneously
    (the walk parks at SOS/EOI so entropy-coded bytes are never
    interpreted as markers); every read is a staged named column.
    adobe_transform is NULL unless the APP14 payload actually spells
    'Adobe' (a foreign APP14 is not a transform declaration).
    colorspace: 1 comp → gray; 3 comp → rgb iff transform=0 else
    ycbcr; 4 comp → ycck iff transform=2 else cmyk.  cmyk_risk is
    the 4-component flag a 3-channel loader must gate on."""
    staged = df.withColumns(
        {
            "__cx": F.hex(F.substring(F.col(bytes_col), 1, JPEG_CS_WINDOW_BYTES)),
            "fmt": sniffed_type(F.col(bytes_col)),
        }
    )
    hx = F.col("__cx")
    is_jpeg = F.col("fmt") == "jpeg"

    def hop(acc, _i):
        pos = acc["pos"]
        marker = hx.substr(pos, F.lit(4))
        stop = marker.isin("FFDA", "FFD9")
        nxt = F.when(stop, pos).otherwise(
            pos + F.lit(4) + F.lit(2) * _hex2long(hx, pos + F.lit(4), 4)
        )
        return F.struct(
            nxt.alias("pos"),
            F.coalesce(acc["sof"],
                       F.when(marker.isin(*SOF_MARKERS), pos)).alias("sof"),
            F.coalesce(acc["a14"],
                       F.when(marker == "FFEE", pos)).alias("a14"),
            F.coalesce(acc["icc"], F.when(
                (marker == "FFE2")
                & (hx.substr(pos + F.lit(8), F.lit(24)) == _ICC_SIG_HEX),
                pos)).alias("icc"),
        )

    acc0 = F.struct(
        F.lit(5).cast("long").alias("pos"),
        F.lit(None).cast("long").alias("sof"),
        F.lit(None).cast("long").alias("a14"),
        F.lit(None).cast("long").alias("icc"),
    )
    walk = F.aggregate(F.sequence(F.lit(1), F.lit(JPEG_CS_MAX_HOPS)), acc0, hop)
    s1 = staged.withColumn("__walk", F.when(is_jpeg, walk))
    s2 = s1.withColumns(
        {
            "__sof": F.col("__walk.sof"),
            "__a14": F.col("__walk.a14"),
            "__icc": F.col("__walk.icc"),
        }
    )
    s3 = s2.withColumns(
        {
            "__nc": _hex2long(hx, F.col("__sof") + F.lit(18), 2),
            "__tr": F.when(
                hx.substr(F.col("__a14") + F.lit(8), F.lit(10)) == _ADOBE_HEX,
                _hex2long(hx, F.col("__a14") + F.lit(30), 2),
            ),
        }
    )
    nc, tr = F.col("__nc"), F.col("__tr")
    colorspace = (
        F.when(nc == 1, "gray")
         .when(nc == 3, F.when(tr == 0, "rgb").otherwise("ycbcr"))
         .when(nc == 4, F.when(tr == 2, "ycck").otherwise("cmyk"))
    )
    return (
        s3.withColumns(
            {
                "n_components": nc.cast("int"),
                "adobe_transform": tr.cast("int"),
                "has_icc": F.when(is_jpeg, F.col("__icc").isNotNull()),
                "colorspace": colorspace,
                "cmyk_risk": F.when(nc.isNotNull(), nc == 4),
            }
        )
        .drop("__cx", "__walk", "__sof", "__a14", "__icc", "__nc", "__tr")
    )


def jpeg_colorspace_sql(src: str, keep: str = "doc_id", h_col: str = "h",
                        fmt_col: str = "fmt") -> str:
    """DuckDB replay of :func:`jpeg_colorspace` — the fold unrolled
    as a linear CTE chain (one hop per CTE, so the position
    expression never multiplies out)."""
    markers = ", ".join(f"'{m}'" for m in SOF_MARKERS)
    ctes = [f"""jc0 AS (
          SELECT {keep}, {fmt_col} AS fmt, {h_col} AS h,
                 CAST(5 AS BIGINT) AS pos,
                 CAST(NULL AS BIGINT) AS sof,
                 CAST(NULL AS BIGINT) AS a14,
                 CAST(NULL AS BIGINT) AS icc
          FROM {src}
        )"""]
    for k in range(JPEG_CS_MAX_HOPS):
        seg_len = "TRY_CAST(concat('0x', substring(h, pos + 4, 4)) AS BIGINT)"
        ctes.append(f"""jc{k + 1} AS (
          SELECT {keep}, fmt, h,
                 CASE WHEN substring(h, pos, 4) IN ('FFDA', 'FFD9') THEN pos
                      ELSE pos + 4 + 2 * {seg_len} END AS pos,
                 COALESCE(sof, CASE WHEN substring(h, pos, 4) IN ({markers})
                               THEN pos END) AS sof,
                 COALESCE(a14, CASE WHEN substring(h, pos, 4) = 'FFEE'
                               THEN pos END) AS a14,
                 COALESCE(icc, CASE WHEN substring(h, pos, 4) = 'FFE2'
                               AND substring(h, pos + 8, 24) = '{_ICC_SIG_HEX}'
                               THEN pos END) AS icc
          FROM jc{k})""")
    last = f"jc{JPEG_CS_MAX_HOPS}"
    return f"""
        WITH {", ".join(ctes)}, jcf AS (
          SELECT {keep}, fmt,
                 CASE WHEN fmt = 'jpeg' THEN
                   TRY_CAST(concat('0x', substring(h, sof + 18, 2)) AS BIGINT)
                 END AS nc,
                 CASE WHEN fmt = 'jpeg'
                      AND substring(h, a14 + 8, 10) = '{_ADOBE_HEX}' THEN
                   TRY_CAST(concat('0x', substring(h, a14 + 30, 2)) AS BIGINT)
                 END AS tr,
                 CASE WHEN fmt = 'jpeg' THEN icc IS NOT NULL END AS has_icc
          FROM {last}
        )
        SELECT {keep}, fmt,
               CAST(nc AS INT) AS n_components,
               CAST(tr AS INT) AS adobe_transform,
               has_icc,
               CASE WHEN nc = 1 THEN 'gray'
                    WHEN nc = 3 THEN
                      CASE WHEN tr = 0 THEN 'rgb' ELSE 'ycbcr' END
                    WHEN nc = 4 THEN
                      CASE WHEN tr = 2 THEN 'ycck' ELSE 'cmyk' END
               END AS colorspace,
               CASE WHEN nc IS NOT NULL THEN nc = 4 END AS cmyk_risk
        FROM jcf
    """


# ---- standalone TIFF structure --------------------------------------------------
#
# Scanner/archival pipelines hand a crawler bare .tif masters; the
# routing facts (dims for the bomb gate, compression for the decode
# path — LZW and old-style JPEG-in-TIFF need different codecs, and
# uncompressed masters are the multi-GB rows worth a size gate) all
# live in IFD0, read with the SAME endian-aware machinery as the
# EXIF family (_exif_stage already resolves the standalone-TIFF
# header at byte 0).  TIFF 6.0 requires IFD entries sorted by tag,
# so width (0x0100) / height (0x0101) / compression (0x0103) sit in
# the first few entries — the bounded IFD_MAX_ENTRIES scan is exact
# for spec-compliant files (deeper tags NULL-absorb, documented).

_TIFF_W_TAG = 0x0100
_TIFF_H_TAG = 0x0101
_TIFF_COMP_TAG = 0x0103
#: TIFF 6.0 / supplement compression codes → decode-path labels.
TIFF_COMPRESSION = {1: "none", 2: "ccitt", 5: "lzw", 6: "jpeg-old",
                    7: "jpeg", 8: "deflate", 32773: "packbits"}


def tiff_structure(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Add (fmt, endian, width, height, compression) for standalone
    TIFF payloads — the master-file sibling of the jpeg/png header
    tiers.  endian is 'II'/'MM'; compression maps the TIFF 6.0 code
    to a decode-path label ('other' for codes off the table, NULL
    when the tag is absent).  Non-TIFF rows get all-NULL structure;
    JPEG-embedded EXIF stays the exif_* family's job — this operator
    gates on fmt = 'tiff' (byte-0 header).

    Plan-size discipline: the 8 typed entry reads are staged ONCE as
    an array-of-structs column and each tag lookup is a small filter
    over that attribute — inlining the typed scan three
    times (w/h/compression) tripled the expression tree and cost ~6 s
    of Catalyst/codegen compile PER QUERY, independent of row count
    (measured; this shape is ~0.5 s).  Lookup skips NULL vals so
    duplicate-tag semantics stay coalesce-identical to the oracle."""
    staged = _exif_stage(df, bytes_col)
    hx = F.col("__ex")

    def rd(pos, n_bytes):
        return F.when(F.col("__le"), _le(hx, pos, n_bytes)).otherwise(
            _hex2long(hx, pos, 2 * n_bytes)
        )

    ents = []
    for i in range(IFD_MAX_ENTRIES):
        epos = F.col("__e") + F.lit(24 * i)
        typ = rd(epos + F.lit(4), 2)
        val = F.when(typ == 3, rd(epos + F.lit(16), 2)) \
               .when(typ == 4, rd(epos + F.lit(16), 4))
        tag = F.when(F.lit(i) < F.col("__n"), rd(epos, 2))
        ents.append(F.struct(tag.alias("tag"), val.alias("val")))
    s1 = staged.withColumn("__ents", F.array(*ents))

    def tagval(tag):
        return F.try_element_at(
            F.filter("__ents",
                     lambda e: (e["tag"] == tag) & e["val"].isNotNull()),
            F.lit(1),
        )["val"]

    is_tiff = F.col("fmt") == "tiff"
    gate = lambda c: F.when(is_tiff, c)  # noqa: E731
    endian = F.when(F.col("__le"), "II").otherwise("MM")
    comp_code = tagval(_TIFF_COMP_TAG)
    comp = F.lit("other")
    for code, label in TIFF_COMPRESSION.items():
        comp = F.when(comp_code == code, label).otherwise(comp)
    comp = F.when(comp_code.isNotNull(), comp)
    return (
        s1.withColumns(
            {
                "endian": gate(endian),
                "width": gate(tagval(_TIFF_W_TAG)).cast("int"),
                "height": gate(tagval(_TIFF_H_TAG)).cast("int"),
                "compression": gate(comp),
            }
        )
        .drop("__ex", "__t", "__le", "__ifd", "__n", "__e", "__ents")
    )


def tiff_structure_sql(src: str, keep: str = "doc_id", h_col: str = "h",
                       fmt_col: str = "fmt") -> str:
    """DuckDB replay of :func:`tiff_structure` — shared staging CTE,
    same type-aware entry scan."""
    def typed_branches(tag: int) -> str:
        parts = []
        for i in range(IFD_MAX_ENTRIES):
            typ = _rd_sql("h", "le", f"e + {24 * i} + 4", 2)
            val2 = _rd_sql("h", "le", f"e + {24 * i} + 16", 2)
            val4 = _rd_sql("h", "le", f"e + {24 * i} + 16", 4)
            parts.append(
                f"CASE WHEN {i} < n AND ({_rd_sql('h', 'le', f'e + {24 * i}', 2)}) = {tag} "
                f"THEN CASE WHEN ({typ}) = 3 THEN ({val2}) "
                f"WHEN ({typ}) = 4 THEN ({val4}) END END"
            )
        return "COALESCE(" + ", ".join(parts) + ")"

    comp_whens = " ".join(
        f"WHEN {code} THEN '{label}'" for code, label in TIFF_COMPRESSION.items()
    )
    return f"""
        WITH {_exif_stage_sql(src, keep, h_col, fmt_col)}, ts_v AS (
          SELECT {keep}, fmt, le,
                 {typed_branches(_TIFF_W_TAG)} AS w,
                 {typed_branches(_TIFF_H_TAG)} AS hh,
                 {typed_branches(_TIFF_COMP_TAG)} AS cc
          FROM eo_en
        )
        SELECT {keep}, fmt,
               CASE WHEN fmt = 'tiff' THEN
                 CASE WHEN le THEN 'II' ELSE 'MM' END END AS endian,
               CAST(CASE WHEN fmt = 'tiff' THEN w END AS INT) AS width,
               CAST(CASE WHEN fmt = 'tiff' THEN hh END AS INT) AS height,
               CASE WHEN fmt = 'tiff' AND cc IS NOT NULL THEN
                 CASE cc {comp_whens} ELSE 'other' END END AS compression
        FROM ts_v
    """


# ---- APNG detection --------------------------------------------------------------
#
# APNG hides animation inside an ordinary PNG: the acTL chunk before
# the first IDAT is the ONLY marker (the magic bytes are plain PNG),
# so a pipeline that routes "png = still image" silently trains on
# frame 1 of animations.  The chunk walk is length-hopped like the
# JPEG segment walk — chunk = len(4 BE) type(4) data crc(4) — and
# PARKS at IDAT/IEND, which enforces the spec's ordering for free:
# an acTL after the image data is not an APNG and is never seen.

PNG_CHUNK_MAX_HOPS = 8
PNG_ANIM_WINDOW_BYTES = 1024
_ACTL_HEX = "6163544C"
_IDAT_HEX = "49444154"
_IEND_HEX = "49454E44"


def png_animated(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Add (fmt, is_apng, n_frames, n_plays) — acTL-before-IDAT
    detection plus the declared frame/replay counts (n_plays 0 =
    loop forever, per spec).  Bounded chunk walk over one 1 KiB hex
    window; a multi-KB iCCP before acTL pushes it out of the window
    and the row NULL-absorbs to is_apng=false (documented — same
    trade as every header tier).  Non-PNG rows get all-NULL."""
    staged = df.withColumns(
        {
            "__px": F.hex(F.substring(F.col(bytes_col), 1, PNG_ANIM_WINDOW_BYTES)),
            "fmt": sniffed_type(F.col(bytes_col)),
        }
    )
    hx = F.col("__px")
    is_png = F.col("fmt") == "png"

    def hop(acc, _i):
        pos = acc["pos"]
        ctype = hx.substr(pos + F.lit(8), F.lit(8))
        stop = ctype.isin(_IDAT_HEX, _IEND_HEX)
        nxt = F.when(stop, pos).otherwise(
            pos + F.lit(24) + F.lit(2) * _hex2long(hx, pos, 8)
        )
        return F.struct(
            nxt.alias("pos"),
            F.coalesce(acc["actl"],
                       F.when(ctype == _ACTL_HEX, pos)).alias("actl"),
        )

    acc0 = F.struct(
        F.lit(17).cast("long").alias("pos"),   # byte 8: first chunk
        F.lit(None).cast("long").alias("actl"),
    )
    walk = F.aggregate(
        F.sequence(F.lit(1), F.lit(PNG_CHUNK_MAX_HOPS)), acc0, hop)["actl"]
    s1 = staged.withColumn("__actl", F.when(is_png, walk))
    a = F.col("__actl")
    return (
        s1.withColumns(
            {
                "is_apng": F.when(is_png, a.isNotNull()),
                "n_frames": F.when(a.isNotNull(),
                                   _hex2long(hx, a + F.lit(16), 8)).cast("int"),
                "n_plays": F.when(a.isNotNull(),
                                  _hex2long(hx, a + F.lit(24), 8)).cast("int"),
            }
        )
        .drop("__px", "__actl")
    )


def png_animated_sql(src: str, keep: str = "doc_id", h_col: str = "h",
                     fmt_col: str = "fmt") -> str:
    """DuckDB replay of :func:`png_animated` — linear CTE chain (the
    jpeg_colorspace discipline)."""
    ctes = [f"""pa0 AS (
          SELECT {keep}, {fmt_col} AS fmt, {h_col} AS h,
                 CAST(17 AS BIGINT) AS pos,
                 CAST(NULL AS BIGINT) AS actl
          FROM {src}
        )"""]
    for k in range(PNG_CHUNK_MAX_HOPS):
        clen = f"TRY_CAST(concat('0x', substring(h, pos, 8)) AS BIGINT)"
        ctes.append(f"""pa{k + 1} AS (
          SELECT {keep}, fmt, h,
                 CASE WHEN substring(h, pos + 8, 8)
                        IN ('{_IDAT_HEX}', '{_IEND_HEX}') THEN pos
                      ELSE pos + 24 + 2 * {clen} END AS pos,
                 COALESCE(actl, CASE WHEN substring(h, pos + 8, 8)
                          = '{_ACTL_HEX}' THEN pos END) AS actl
          FROM pa{k})""")
    last = f"pa{PNG_CHUNK_MAX_HOPS}"
    return f"""
        WITH {", ".join(ctes)}, paf AS (
          SELECT {keep}, fmt,
                 CASE WHEN fmt = 'png' THEN actl END AS actl, h
          FROM {last}
        )
        SELECT {keep}, fmt,
               CASE WHEN fmt = 'png' THEN actl IS NOT NULL END AS is_apng,
               CAST(CASE WHEN actl IS NOT NULL THEN TRY_CAST(concat('0x',
                 substring(h, actl + 16, 8)) AS BIGINT) END AS INT) AS n_frames,
               CAST(CASE WHEN actl IS NOT NULL THEN TRY_CAST(concat('0x',
                 substring(h, actl + 24, 8)) AS BIGINT) END AS INT) AS n_plays
        FROM paf
    """


# ---- payload completeness (trailer-byte + declared-size checks) ------------------
#
# Interrupted fetches are routine at crawl scale (timeouts, reset
# connections, byte-budget cutoffs) and a Content-Length check cannot
# catch them when the response was chunked or the header lied — but
# the major image formats carry an END marker the payload must close
# with, readable from the LAST bytes without decode: JPEG's EOI
# (FFD9), PNG's IEND chunk (length-0 + fourcc + its FIXED CRC
# AE426082 — a spec constant, so the whole 12-byte trailer is one
# literal compare), GIF's 0x3B trailer. RIFF containers (webp/wav/
# avi) instead DECLARE their size in the header (LE32 at byte 4 =
# file size - 8), so completeness is an exact integer compare.
# Every existing header tier reads leading bytes; this is the one
# check that must read the TAIL — still only 12 bytes of a possibly
# multi-MB blob (hex of a bounded substr from octet_length-11), pure
# expressions, map-side, blobs never shuffle.

#: fmt → hex suffix the payload must end with (trailer convention)
TRAILER_TABLE: dict[str, str] = {
    "jpeg": "FFD9",
    "png": "0000000049454E44AE426082",
    "gif": "3B",
}
_RIFF_FMTS = ("webp", "wav", "avi")


def payload_complete(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Add (fmt, payload_bytes, trailer_ok, truncated): decode-free
    structural completeness for fetched payloads. `trailer_ok` is the
    per-format check (suffix compare or RIFF declared-size equality),
    NULL for formats with no trailer convention (bmp, pdf, ...);
    `truncated` is its negation under the same gate — NULL means "no
    evidence", never "complete". A payload shorter than its trailer
    fails the suffix compare (hex of the whole payload can't end with
    a longer literal), so short-read stubs flag without special
    cases."""
    b = F.col(bytes_col)
    nbytes = F.octet_length(b).cast("long")
    # last 12 bytes, hexed — position clamps to 1 for tiny payloads
    tail = F.hex(b.substr(F.greatest(nbytes - F.lit(11), F.lit(1)).cast("int"),
                          F.lit(12)))
    head = F.hex(F.substring(b, 1, 16))
    riff_declared = _le(head, F.lit(9), 4)

    staged = df.withColumns(
        {
            "fmt": sniffed_type(b),
            "payload_bytes": nbytes,
        }
    )
    ok = F.lit(None).cast("boolean")
    for fmt, suffix in TRAILER_TABLE.items():
        ok = F.when(F.col("fmt") == fmt, tail.endswith(suffix)).otherwise(ok)
    ok = F.when(
        F.col("fmt").isin(*_RIFF_FMTS),
        F.col("payload_bytes") == riff_declared + F.lit(8),
    ).otherwise(ok)
    return staged.withColumns(
        {"trailer_ok": ok, "truncated": ~ok}
    )


def payload_complete_sql(src: str, keep: str = "doc_id", h_col: str = "h",
                         fmt_col: str = "fmt") -> str:
    """DuckDB replay of :func:`payload_complete` over ``src`` exposing
    `keep`, the FULL payload hex and the sniffed fmt (entry fixtures
    are small enough that the whole payload is the window) — same
    TRAILER_TABLE, same RIFF size equation on strlen/2."""
    trailer_whens = " ".join(
        f"WHEN '{fmt}' THEN ends_with({h_col}, '{suffix}')"
        for fmt, suffix in TRAILER_TABLE.items()
    )
    riff_fmts = ", ".join(f"'{f}'" for f in _RIFF_FMTS)
    return f"""
        WITH pc0 AS (
          SELECT {keep}, {fmt_col} AS fmt,
                 CAST(strlen({h_col}) // 2 AS BIGINT) AS payload_bytes,
                 CASE {fmt_col} {trailer_whens}
                      ELSE CASE WHEN {fmt_col} IN ({riff_fmts})
                        THEN strlen({h_col}) // 2 = {_le_sql(h_col, 9, 4)} + 8
                      END
                 END AS trailer_ok
          FROM {src}
        )
        SELECT {keep}, fmt, payload_bytes, trailer_ok,
               NOT trailer_ok AS truncated
        FROM pc0
    """


# ---- composed payload admission ---------------------------------------------------
#
# The image-store admission verdict, composed from the header tiers
# in one plan: magic sniff (can a decoder be chosen at all), trailer
# completeness (did the fetch finish), declared-vs-sniffed mismatch
# (is the server lying), header dims + the decompression-bomb gate
# (is it safe to decode). Precedence is the cheapest-rejection order
# a real pipeline uses — each tier only runs logically "after" the
# previous one passed, though physically it is ONE projection.

#: formats admitted to the image decode path at all
ADMIT_FMTS = ("jpeg", "png", "gif", "bmp", "webp", "tiff")
#: formats whose dims image_dims can read (the bomb gate's domain);
#: the rest route to 'review' — decodable but not yet bomb-checkable
DIMS_FMTS = ("jpeg", "png", "gif", "bmp")


def payload_admission(df: DataFrame, bytes_col: str = "bytes",
                      declared_col: str | None = None) -> DataFrame:
    """Add (fmt, payload_bytes, trailer_ok, width, height, pixels,
    oversized, bomb_ratio, verdict): the composed admission decision.

    verdict ∈ {'notimage', 'truncated', 'mismatch', 'review', 'bomb',
    'admit'} with that precedence: non-image formats first (nothing
    downstream applies), then structural truncation (trailer_ok IS
    false — a NULL convention passes, no evidence is not rejection),
    then declared-type contradiction (only when ``declared_col`` is
    given and non-NULL), then dims-unreadable formats → 'review'
    (decodable but the bomb gate can't vouch), then the bomb gate,
    then 'admit'. Pure composition of :func:`sniffed_type`,
    :func:`payload_complete` and :func:`image_bomb_gate` — one
    map-side projection, blobs never shuffle."""
    staged = image_bomb_gate(payload_complete(df, bytes_col=bytes_col),
                             bytes_col=bytes_col)
    mismatch = (
        (F.col(declared_col).isNotNull() & (F.col("fmt") != F.col(declared_col)))
        if declared_col else F.lit(False)
    )
    verdict = (
        F.when(~F.col("fmt").isin(*ADMIT_FMTS), "notimage")
        .when(F.col("trailer_ok") == False, "truncated")  # noqa: E712
        .when(mismatch, "mismatch")
        .when(~F.col("fmt").isin(*DIMS_FMTS) | F.col("width").isNull()
              | F.col("height").isNull(), "review")
        .when(F.col("oversized") | F.col("bomb_ratio"), "bomb")
        .otherwise("admit")
    )
    return staged.withColumn("verdict", verdict)


def payload_admission_sql(src: str, keep: str = "doc_id", h_col: str = "h",
                          declared_col: str | None = None) -> str:
    """DuckDB replay of :func:`payload_admission` over ``src``
    exposing `keep`, the full payload hex and (optionally) the
    declared format — chains the payload_complete and image_bomb_gate
    replays as CTEs over the SAME source and joins on `keep`, so the
    composition is verified as one unit."""
    fmt_sql = sniff_case_sql(h_col)
    decl = f", {declared_col}" if declared_col else ""
    staged = (f"(SELECT {keep}, {h_col}, {fmt_sql} AS fmt{decl} "
              f"FROM {src})")
    admit = ", ".join(f"'{f}'" for f in ADMIT_FMTS)
    dims = ", ".join(f"'{f}'" for f in DIMS_FMTS)
    mismatch = (
        f"({declared_col} IS NOT NULL AND fmt <> {declared_col})"
        if declared_col else "false"
    )
    decl_kp = f"{keep}{decl}"
    return f"""
        WITH pa_pc AS (
          {payload_complete_sql(staged, keep=decl_kp, h_col=h_col, fmt_col='fmt')}
        ), pa_bg AS (
          {image_bomb_gate_sql(staged, keep=keep, h_col=h_col)}
        ), pa_j AS (
          SELECT pc.*, bg.width, bg.height, bg.pixels,
                 bg.oversized, bg.bomb_ratio
          FROM pa_pc pc JOIN pa_bg bg USING ({keep})
        )
        SELECT {keep}, fmt, payload_bytes, trailer_ok, width, height,
               pixels, oversized, bomb_ratio,
               CASE WHEN fmt NOT IN ({admit}) THEN 'notimage'
                    WHEN trailer_ok = false THEN 'truncated'
                    WHEN {mismatch} THEN 'mismatch'
                    WHEN fmt NOT IN ({dims}) OR width IS NULL
                         OR height IS NULL THEN 'review'
                    WHEN oversized OR bomb_ratio THEN 'bomb'
                    ELSE 'admit' END AS verdict
        FROM pa_j
    """


# ---- ICC profile header (JPEG APP2, decode-free) ----------------------------------
#
# Color management routing: a CMYK press profile, a 16-bit display
# profile, or an exotic rendering intent each need a different
# normalize step before pixels enter a training set, and the routing
# facts live in the ICC profile HEADER (public ICC.1 spec, fixed
# 128-byte layout) carried in JPEG APP2 segments behind the
# 'ICC_PROFILE\0' signature — readable without decoding either the
# image or the profile body. Same bounded-fold + staged-read
# machinery as the EXIF/DQT walks; the 512-byte window covers
# JFIF/EXIF-prefixed files (a multi-KB EXIF block pushes APP2 out
# and the row NULL-absorbs — the documented header-tier trade).

ICC_WINDOW_BYTES = 512
ICC_MAX_HOPS = 6
_ICC_SIG = "4943435F50524F46494C4500"  # 'ICC_PROFILE\0'
_ICC_ACSP = "61637370"                 # 'acsp' magic at profile offset 36

#: profile/device class signature (offset 12) → label
ICC_CLASSES = {"6D6E7472": "display", "73636E72": "input",
               "70727472": "output", "73706163": "colorspace",
               "6C696E6B": "link", "61627374": "abstract"}
#: data colour space signature (offset 16) → label
ICC_COLORSPACES = {"52474220": "rgb", "434D594B": "cmyk",
                   "47524159": "gray", "4C616220": "lab"}
#: rendering intent (offset 64) → label
ICC_INTENTS = {0: "perceptual", 1: "relative", 2: "saturation",
               3: "absolute"}


def icc_profile(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Add (fmt, has_icc, icc_size, icc_class, icc_colorspace,
    icc_intent) from the first APP2 ICC segment's profile header —
    all NULL for non-JPEG rows and walks that never reach an ICC
    APP2; ``has_icc`` is the segment-found flag, and the FIELDS are
    additionally gated on the 'acsp' magic at profile offset 36 (a
    corrupt profile shows has_icc=true, fields NULL — found but not
    trusted). Signatures off the class/colorspace tables label
    'other', intents ≥4 label 'other'. Map-side projection, blobs
    never shuffle."""
    staged = df.withColumns(
        {
            "__ix": F.hex(F.substring(F.col(bytes_col), 1, ICC_WINDOW_BYTES)),
            "fmt": sniffed_type(F.col(bytes_col)),
        }
    )
    hx = F.col("__ix")

    def hop(acc, _i):
        pos = acc["i_pos"]
        found = acc["p"].isNotNull()
        is_icc = (hx.substr(pos, F.lit(4)) == "FFE2") & (
            hx.substr(pos + F.lit(8), F.lit(24)) == _ICC_SIG
        )
        nxt = F.when(found | is_icc, pos).otherwise(
            pos + F.lit(4) + F.lit(2) * _hex2long(hx, pos + F.lit(4), 4)
        )
        return F.struct(
            nxt.alias("i_pos"),
            # profile base: marker(2B)+len(2B)+sig(12B)+seq/total(2B)
            F.coalesce(acc["p"], F.when(is_icc, pos + F.lit(36))).alias("p"),
        )

    acc0 = F.struct(
        F.lit(5).cast("long").alias("i_pos"),
        F.lit(None).cast("long").alias("p"),
    )
    walk = F.aggregate(F.sequence(F.lit(1), F.lit(ICC_MAX_HOPS)), acc0, hop)["p"]
    s1 = staged.withColumn("__p", F.when(F.col("fmt") == "jpeg", walk))
    p = F.col("__p")
    acsp_ok = hx.substr(p + F.lit(72), F.lit(8)) == _ICC_ACSP
    s2 = s1.withColumn("__pv", F.when(acsp_ok, p))
    pv = F.col("__pv")

    # nullif: a window-truncated signature read yields '' in Spark
    # but NULL via the oracle's nullif — align both to NULL
    cls_hex = F.nullif(hx.substr(pv + F.lit(24), F.lit(8)), F.lit(""))
    cs_hex = F.nullif(hx.substr(pv + F.lit(32), F.lit(8)), F.lit(""))
    cls = F.lit("other")
    for code, label in ICC_CLASSES.items():
        cls = F.when(cls_hex == code, label).otherwise(cls)
    cs = F.lit("other")
    for code, label in ICC_COLORSPACES.items():
        cs = F.when(cs_hex == code, label).otherwise(cs)
    intent_n = _hex2long(hx, pv + F.lit(128), 8)
    intent = F.lit("other")
    for code, label in ICC_INTENTS.items():
        intent = F.when(intent_n == code, label).otherwise(intent)
    return (
        s2.withColumns(
            {
                "has_icc": F.when(F.col("fmt") == "jpeg", p.isNotNull()),
                "icc_size": F.when(pv.isNotNull(),
                                   _hex2long(hx, pv, 8)).cast("long"),
                "icc_class": F.when(pv.isNotNull() & cls_hex.isNotNull(), cls),
                "icc_colorspace": F.when(pv.isNotNull() & cs_hex.isNotNull(), cs),
                "icc_intent": F.when(intent_n.isNotNull(), intent),
            }
        )
        .drop("__ix", "__p", "__pv")
    )


def icc_profile_sql(src: str, keep: str = "doc_id", h_col: str = "h",
                    fmt_col: str = "fmt") -> str:
    """DuckDB replay of :func:`icc_profile` — unrolled APP2 walk,
    staged profile base, same signature tables."""
    pos_expr = "5"
    p_cases = []
    for _ in range(ICC_MAX_HOPS):
        is_icc = (
            f"substring({h_col}, {pos_expr}, 4) = 'FFE2' AND "
            f"substring({h_col}, ({pos_expr}) + 8, 24) = '{_ICC_SIG}'"
        )
        p_cases.append(f"WHEN {is_icc} THEN ({pos_expr}) + 36")
        seg_len = (f"TRY_CAST(concat('0x', substring({h_col}, "
                   f"({pos_expr}) + 4, 4)) AS BIGINT)")
        pos_expr = f"({pos_expr}) + 4 + 2 * {seg_len}"
    walk = "CASE " + " ".join(p_cases) + " ELSE NULL END"
    cls_whens = " ".join(
        f"WHEN '{c}' THEN '{l}'" for c, l in ICC_CLASSES.items())
    cs_whens = " ".join(
        f"WHEN '{c}' THEN '{l}'" for c, l in ICC_COLORSPACES.items())
    in_whens = " ".join(
        f"WHEN {c} THEN '{l}'" for c, l in ICC_INTENTS.items())
    return f"""
        WITH icc0 AS (
          SELECT {keep}, {fmt_col} AS fmt, {h_col} AS h,
                 CASE WHEN {fmt_col} = 'jpeg'
                      THEN CAST(({walk}) AS BIGINT) END AS p
          FROM {src}
        ), icc1 AS (
          SELECT *, CASE WHEN substring(h, p + 72, 8) = '{_ICC_ACSP}'
                         THEN p END AS pv
          FROM icc0
        ), icc2 AS (
          SELECT {keep}, fmt, p, pv,
                 nullif(substring(h, pv + 24, 8), '') AS cls_hex,
                 nullif(substring(h, pv + 32, 8), '') AS cs_hex,
                 TRY_CAST(concat('0x', substring(h, pv, 8)) AS BIGINT) AS sz,
                 TRY_CAST(concat('0x', substring(h, pv + 128, 8)) AS BIGINT)
                   AS intent_n
          FROM icc1
        )
        SELECT {keep}, fmt,
               CASE WHEN fmt = 'jpeg' THEN p IS NOT NULL END AS has_icc,
               CAST(CASE WHEN pv IS NOT NULL THEN sz END AS BIGINT) AS icc_size,
               CASE WHEN pv IS NOT NULL AND cls_hex IS NOT NULL THEN
                 CASE cls_hex {cls_whens} ELSE 'other' END END AS icc_class,
               CASE WHEN pv IS NOT NULL AND cs_hex IS NOT NULL THEN
                 CASE cs_hex {cs_whens} ELSE 'other' END END AS icc_colorspace,
               CASE WHEN intent_n IS NOT NULL THEN
                 CASE intent_n {in_whens} ELSE 'other' END END AS icc_intent
        FROM icc2
    """


# ---- WebP animation (ANIM / ANMF chunk walk) --------------------------------------
#
# The WebP sibling of png_animated: VP8X extended files hide
# animation behind the container — the ANIM chunk carries the loop
# count and each frame is an ANMF chunk. RIFF chunks are
# fourcc(4) + size(4 LE) + payload padded to EVEN length (the pad
# byte is the classic off-by-one in naive walkers — pinned). The
# walk is bounded (window + hops), so the frame count is a LOWER
# BOUND for many-frame files — the loop count and the is_animated
# routing flag (what a pipeline actually keys on) sit in the first
# chunks and are exact.

WEBP_CHUNK_MAX_HOPS = 10
WEBP_ANIM_WINDOW_BYTES = 1024
_ANIM_HEX = "414E494D"
_ANMF_HEX = "414E4D46"


def webp_animation(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Add (fmt, is_animated, loop_count, n_frames_lb) for WebP
    payloads — non-WebP rows all-NULL; still WebP (no ANIM chunk)
    is_animated=false with NULL loop/frames; loop_count 0 = loop
    forever (spec). ``n_frames_lb`` counts ANMF chunks inside the
    window/hop bound (exact for header-sized fixtures, a documented
    lower bound beyond). One hex projection, bounded fold, map-side
    only."""
    staged = df.withColumns(
        {
            "__wa": F.hex(F.substring(F.col(bytes_col), 1,
                                      WEBP_ANIM_WINDOW_BYTES)),
            "fmt": sniffed_type(F.col(bytes_col)),
        }
    )
    hx = F.col("__wa")

    def hop(acc, _i):
        pos = acc["pos"]
        fourcc = hx.substr(pos, F.lit(8))
        size = _le(hx, pos + F.lit(8), 4)  # chunk size is LE32
        pad = size % 2
        nxt = pos + F.lit(16) + F.lit(2) * (size + pad)
        return F.struct(
            nxt.alias("pos"),
            F.coalesce(acc["anim"],
                       F.when(fourcc == _ANIM_HEX, pos)).alias("anim"),
            (acc["cnt"] + F.when(fourcc == _ANMF_HEX, F.lit(1))
             .otherwise(F.lit(0))).alias("cnt"),
        )

    acc0 = F.struct(
        F.lit(25).cast("long").alias("pos"),   # byte 12: first chunk
        F.lit(None).cast("long").alias("anim"),
        F.lit(0).cast("long").alias("cnt"),
    )
    walk = F.aggregate(
        F.sequence(F.lit(1), F.lit(WEBP_CHUNK_MAX_HOPS)), acc0, hop)
    is_webp = F.col("fmt") == "webp"
    s1 = staged.withColumns(
        {
            "__anim": F.when(is_webp, walk["anim"]),
            "__cnt": F.when(is_webp, walk["cnt"]),
        }
    )
    a = F.col("__anim")
    return (
        s1.withColumns(
            {
                "is_animated": F.when(is_webp, a.isNotNull()),
                # ANIM payload: BGColor(4B) then LoopCount LE16
                "loop_count": F.when(a.isNotNull(),
                                     _le(hx, a + F.lit(24), 2)).cast("int"),
                "n_frames_lb": F.when(a.isNotNull(),
                                      F.col("__cnt")).cast("int"),
            }
        )
        .drop("__wa", "__anim", "__cnt")
    )


def webp_animation_sql(src: str, keep: str = "doc_id", h_col: str = "h",
                       fmt_col: str = "fmt") -> str:
    """DuckDB replay of :func:`webp_animation` — linear CTE chain
    (the png_animated discipline), same LE size + even-pad hop."""
    def le4(pos):
        return _le_sql_var("h", pos, 4)

    ctes = [f"""wa0 AS (
          SELECT {keep}, {fmt_col} AS fmt, {h_col} AS h,
                 CAST(25 AS BIGINT) AS pos,
                 CAST(NULL AS BIGINT) AS anim,
                 CAST(0 AS BIGINT) AS cnt
          FROM {src}
        )"""]
    for k in range(WEBP_CHUNK_MAX_HOPS):
        size = le4("pos + 8")
        ctes.append(f"""wa{k + 1} AS (
          SELECT {keep}, fmt, h,
                 pos + 16 + 2 * (({size}) + ({size}) % 2) AS pos,
                 COALESCE(anim, CASE WHEN substring(h, pos, 8)
                          = '{_ANIM_HEX}' THEN pos END) AS anim,
                 cnt + CASE WHEN substring(h, pos, 8) = '{_ANMF_HEX}'
                            THEN 1 ELSE 0 END AS cnt
          FROM wa{k})""")
    last = f"wa{WEBP_CHUNK_MAX_HOPS}"
    return f"""
        WITH {", ".join(ctes)}, waf AS (
          SELECT {keep}, fmt, h,
                 CASE WHEN fmt = 'webp' THEN anim END AS anim,
                 CASE WHEN fmt = 'webp' THEN cnt END AS cnt
          FROM {last}
        )
        SELECT {keep}, fmt,
               CASE WHEN fmt = 'webp' THEN anim IS NOT NULL END AS is_animated,
               CAST(CASE WHEN anim IS NOT NULL
                    THEN {_le_sql_var('h', 'anim + 24', 2)} END AS INT)
                 AS loop_count,
               CAST(CASE WHEN anim IS NOT NULL THEN cnt END AS INT)
                 AS n_frames_lb
        FROM waf
    """


# ---- EXIF strip (decode-free byte surgery) -----------------------------------------
#
# The PUBLISH-side privacy transform: exif_gps_flag DETECTS geotags,
# but a corpus that ships payloads must REMOVE the metadata — and the
# whole EXIF block (GPS, serial numbers, owner names) lives in one
# APP1 segment whose boundaries are readable from the header, so the
# strip is pure byte surgery (two binary substrings + concat), no
# decode, no re-encode, pixels untouched. Positions come from the
# bounded hex-window walk; the SURGERY runs on the full binary
# column, so payload size is irrelevant — only the segment must
# START inside the window (it sits right after SOI in practice).

def exif_strip(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Add (fmt, had_exif, removed_bytes, stripped): the payload with
    its first EXIF APP1 segment removed — byte-identical input for
    rows with no EXIF (non-JPEG, EXIF-less JPEG, or a walk that
    never reaches APP1 in-window; had_exif=false, removed_bytes
    NULL). A found-but-truncated length field NULL-absorbs to the
    untouched payload rather than shearing bytes (had_exif stays
    true, removed_bytes NULL — detected but not safely removable).
    Only the FIRST Exif APP1 strips (multiple APP1s — XMP etc. — keep
    their own segments; re-run to fixpoint if a hostile file stacks
    Exif blocks)."""
    b = F.col(bytes_col)
    staged = df.withColumns(
        {
            "__sx": F.hex(F.substring(b, 1, EXIF_WINDOW_BYTES)),
            "fmt": sniffed_type(b),
        }
    )
    hx = F.col("__sx")

    def hop(acc, _i):
        pos = acc["pos"]
        found = acc["app1"].isNotNull()
        marker = hx.substr(pos, F.lit(4))
        is_app1 = (marker == "FFE1") & (
            hx.substr(pos + F.lit(8), F.lit(12)) == _EXIF_SIG
        )
        nxt = F.when(found | is_app1, pos).otherwise(
            pos + F.lit(4) + F.lit(2) * _hex2long(hx, pos + F.lit(4), 4)
        )
        return F.struct(
            nxt.alias("pos"),
            F.coalesce(acc["app1"], F.when(is_app1, pos)).alias("app1"),
        )

    acc0 = F.struct(
        F.lit(5).cast("long").alias("pos"),
        F.lit(None).cast("long").alias("app1"),
    )
    walk = F.aggregate(F.sequence(F.lit(1), F.lit(EXIF_MAX_HOPS)), acc0, hop)["app1"]
    s1 = staged.withColumn("__p", F.when(F.col("fmt") == "jpeg", walk))
    p = F.col("__p")
    # segment byte length: marker (2) + the length field's value —
    # valid only when the WHOLE segment fits inside the payload (a
    # declared length running past the end means surgery would shear
    # real bytes: detected but not safely removable)
    seg = F.lit(2) + _hex2long(hx, p + F.lit(4), 4)
    b0 = (p + F.lit(1)) / F.lit(2)  # 1-based byte index of the marker
    s2 = s1.withColumns(
        {
            "__b0": b0.cast("long"),
            "__seg": F.when(
                p.isNotNull()
                & (b0.cast("long") + seg - 1 <= F.octet_length(b)),
                seg,
            ),
        }
    )
    head = b.substr(F.lit(1), (F.col("__b0") - 1).cast("int"))
    tail = b.substr((F.col("__b0") + F.col("__seg")).cast("int"),
                    F.octet_length(b))
    stripped = F.when(
        F.col("__p").isNotNull() & F.col("__seg").isNotNull(),
        F.concat(head, tail),
    ).otherwise(b)
    return (
        s2.withColumns(
            {
                "had_exif": F.col("__p").isNotNull(),
                "removed_bytes": F.col("__seg"),
                "stripped": stripped,
            }
        )
        .drop("__sx", "__p", "__b0", "__seg")
    )


def exif_strip_sql(src: str, keep: str = "doc_id", h_col: str = "h",
                   fmt_col: str = "fmt") -> str:
    """DuckDB replay of :func:`exif_strip` over the FULL payload hex
    (fixtures fit the window): unrolled APP1 walk, the same two-
    substring surgery on the hex string (positions double, lengths
    double — hex chars are 2 per byte)."""
    pos_expr = "5"
    p_cases = []
    for _ in range(EXIF_MAX_HOPS):
        is_app1 = (
            f"substring({h_col}, {pos_expr}, 4) = 'FFE1' AND "
            f"substring({h_col}, ({pos_expr}) + 8, 12) = '{_EXIF_SIG}'"
        )
        p_cases.append(f"WHEN {is_app1} THEN ({pos_expr})")
        seg_len = (f"TRY_CAST(concat('0x', substring({h_col}, "
                   f"({pos_expr}) + 4, 4)) AS BIGINT)")
        pos_expr = f"({pos_expr}) + 4 + 2 * {seg_len}"
    walk = "CASE " + " ".join(p_cases) + " ELSE NULL END"
    return f"""
        WITH es0 AS (
          SELECT {keep}, {fmt_col} AS fmt, {h_col} AS h,
                 CASE WHEN {fmt_col} = 'jpeg'
                      THEN CAST(({walk}) AS BIGINT) END AS p
          FROM {src}
        ), es1 AS (
          SELECT *, CASE WHEN p IS NOT NULL
                      AND (p + 1) // 2
                          + 2 + TRY_CAST(concat('0x',
                              substring(h, p + 4, 4)) AS BIGINT) - 1
                          <= strlen(h) // 2
                    THEN 2 + TRY_CAST(concat('0x',
                           substring(h, p + 4, 4)) AS BIGINT)
                 END AS seg
          FROM es0
        )
        SELECT {keep}, fmt,
               p IS NOT NULL AS had_exif,
               seg AS removed_bytes,
               CASE WHEN p IS NOT NULL AND seg IS NOT NULL THEN
                 substring(h, 1, p - 1) || substring(h, p + 2 * seg)
               ELSE h END AS stripped_hex
        FROM es1
    """


# ---- XMP rights / license extraction ----------------------------------------------
#
# Compliance tier: whether a scraped image may enter a training set
# at all often lives in its XMP packet — xmpRights:Marked (the
# copyrighted flag), xmpRights:WebStatement (the license URL: CC
# deeds live here) and dc:rights (the human-readable notice). XMP is
# plain UTF-8 XML inside a JPEG APP1 segment behind the public
# namespace signature, so extraction is: walk to the segment, slice
# EXACTLY the packet bytes (always valid UTF-8 — the binary around
# it never reaches the decoder), decode, regex. Attribute and
# element spellings both occur in the wild; both are matched.

XMP_WINDOW_BYTES = 4096
XMP_MAX_HOPS = 6
#: hex of 'http://ns.adobe.com/xap/1.0/\0' — the APP1 XMP signature
_XMP_SIG = "687474703A2F2F6E732E61646F62652E636F6D2F7861702F312E302F00"
_XMP_SIG_BYTES = 29

_XMP_MARKED_RE = (
    r'(?is)xmpRights:Marked\s*(?:=\s*["\x27]|>\s*)(True|False)'
)
_XMP_WEBSTMT_RE = (
    r'(?is)xmpRights:WebStatement\s*(?:=\s*["\x27]|>\s*)([^"\x27<\s]+)'
)
_XMP_RIGHTS_RE = r"(?is)<dc:rights>.*?<rdf:li[^>]*>([^<]*)<"


def xmp_license(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Add (fmt, has_xmp, xmp_marked, license_url, rights): the
    XMP rights fields, NULL-absorbing for non-JPEG rows, XMP-less
    files and fields the packet doesn't carry. ``xmp_marked`` is the
    tri-state copyrighted flag (NULL = not asserted); rights text is
    the first <rdf:li> of dc:rights. One hex window (4 KiB — XMP
    sits at the file head; larger packets truncate and fields past
    the window NULL-absorb, documented), one packet slice, three
    regex extracts. Map-side only."""
    staged = df.withColumns(
        {
            "__mx": F.hex(F.substring(F.col(bytes_col), 1, XMP_WINDOW_BYTES)),
            "fmt": sniffed_type(F.col(bytes_col)),
        }
    )
    hx = F.col("__mx")
    sig_hex_len = 2 * _XMP_SIG_BYTES

    def hop(acc, _i):
        pos = acc["pos"]
        found = acc["x"].isNotNull()
        is_xmp = (hx.substr(pos, F.lit(4)) == "FFE1") & (
            hx.substr(pos + F.lit(8), F.lit(sig_hex_len)) == _XMP_SIG
        )
        nxt = F.when(found | is_xmp, pos).otherwise(
            pos + F.lit(4) + F.lit(2) * _hex2long(hx, pos + F.lit(4), 4)
        )
        return F.struct(
            nxt.alias("pos"),
            F.coalesce(acc["x"], F.when(is_xmp, pos)).alias("x"),
        )

    acc0 = F.struct(
        F.lit(5).cast("long").alias("pos"),
        F.lit(None).cast("long").alias("x"),
    )
    walk = F.aggregate(F.sequence(F.lit(1), F.lit(XMP_MAX_HOPS)), acc0, hop)["x"]
    s1 = staged.withColumn("__x", F.when(F.col("fmt") == "jpeg", walk))
    p = F.col("__x")
    pkt_len = (_hex2long(hx, p + F.lit(4), 4) - F.lit(2 + _XMP_SIG_BYTES)) * 2
    pkt = hx.substr((p + F.lit(8) + F.lit(sig_hex_len)).cast("int"),
                    pkt_len.cast("int"))
    s2 = s1.withColumn(
        "__xml",
        F.when(p.isNotNull() & (pkt_len > 0),
               F.decode(F.unhex(pkt), "UTF-8")),
    )
    xml = F.col("__xml")
    marked_raw = F.lower(F.nullif(
        F.regexp_extract(xml, _XMP_MARKED_RE, 1), F.lit("")))
    return (
        s2.withColumns(
            {
                "has_xmp": F.when(F.col("fmt") == "jpeg", p.isNotNull()),
                "xmp_marked": F.when(marked_raw == "true", True)
                .when(marked_raw == "false", False),
                "license_url": F.nullif(
                    F.regexp_extract(xml, _XMP_WEBSTMT_RE, 1), F.lit("")),
                "rights": F.nullif(
                    F.regexp_extract(xml, _XMP_RIGHTS_RE, 1), F.lit("")),
            }
        )
        .drop("__mx", "__x", "__xml")
    )


def xmp_license_sql(src: str, keep: str = "doc_id", h_col: str = "h",
                    fmt_col: str = "fmt") -> str:
    """DuckDB replay of :func:`xmp_license` — unrolled walk, the same
    packet slice through unhex+decode, the same patterns (\\x27
    spells the single quote so the patterns embed in SQL literals
    unescaped)."""
    sig_hex_len = 2 * _XMP_SIG_BYTES
    pos_expr = "5"
    x_cases = []
    for _ in range(XMP_MAX_HOPS):
        is_xmp = (
            f"substring({h_col}, {pos_expr}, 4) = 'FFE1' AND "
            f"substring({h_col}, ({pos_expr}) + 8, {sig_hex_len}) = '{_XMP_SIG}'"
        )
        x_cases.append(f"WHEN {is_xmp} THEN ({pos_expr})")
        seg_len = (f"TRY_CAST(concat('0x', substring({h_col}, "
                   f"({pos_expr}) + 4, 4)) AS BIGINT)")
        pos_expr = f"({pos_expr}) + 4 + 2 * {seg_len}"
    walk = "CASE " + " ".join(x_cases) + " ELSE NULL END"
    return f"""
        WITH xl0 AS (
          SELECT {keep}, {fmt_col} AS fmt, {h_col} AS h,
                 CASE WHEN {fmt_col} = 'jpeg'
                      THEN CAST(({walk}) AS BIGINT) END AS x
          FROM {src}
        ), xl1 AS (
          SELECT *, (TRY_CAST(concat('0x', substring(h, x + 4, 4)) AS BIGINT)
                     - {2 + _XMP_SIG_BYTES}) * 2 AS pl
          FROM xl0
        ), xl2 AS (
          SELECT {keep}, fmt, x,
                 CASE WHEN x IS NOT NULL AND pl > 0 THEN
                   decode(unhex(substring(h, x + 8 + {sig_hex_len}, pl)))
                 END AS xml
          FROM xl1
        ), xl3 AS (
          SELECT {keep}, fmt, x,
                 lower(nullif(regexp_extract(xml,
                   '{_XMP_MARKED_RE}', 1), '')) AS marked_raw,
                 nullif(regexp_extract(xml, '{_XMP_WEBSTMT_RE}', 1), '')
                   AS license_url,
                 nullif(regexp_extract(xml, '{_XMP_RIGHTS_RE}', 1), '')
                   AS rights
          FROM xl2
        )
        SELECT {keep}, fmt,
               CASE WHEN fmt = 'jpeg' THEN x IS NOT NULL END AS has_xmp,
               CASE WHEN marked_raw = 'true' THEN true
                    WHEN marked_raw = 'false' THEN false END AS xmp_marked,
               license_url, rights
        FROM xl3
    """


# ---- EXIF camera make/model (provenance) -------------------------------------------
#
# Provenance tier: a host whose images all report ONE camera model is
# a single-shooter archive; a host whose images report NONE is
# usually synthetic/scraped output (generators don't write EXIF) —
# per-host model diversity is the stock-farm signal. The Model tag
# (0x0110, ASCII) lives in IFD0; ASCII values are NUL-terminated and
# count>4 values live behind an offset from the TIFF header, so the
# read is: scan entries for the tag, pick inline vs offset storage by
# COUNT, slice exactly count-1 bytes, decode. Same staging as the
# EXIF family.

_MODEL_TAG = 0x0110
#: longest model string read (beyond: truncated — it is a label)
MODEL_MAX_BYTES = 32


def exif_camera_model(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Add (fmt, camera_model): the EXIF Model string, NULL for
    non-EXIF rows, absent tags, non-ASCII types, and reads past the
    window. Inline (count ≤ 4) and offset-stored values both handled;
    the NUL terminator is excluded by slicing count−1 bytes; values
    longer than MODEL_MAX_BYTES clamp (a label, not a payload).
    Map-side projection on the shared 256-byte EXIF window."""
    staged = _exif_stage(df, bytes_col)
    hx = F.col("__ex")

    def rd(pos, n_bytes):
        return F.when(F.col("__le"), _le(hx, pos, n_bytes)).otherwise(
            _hex2long(hx, pos, 2 * n_bytes)
        )

    branches = []
    for i in range(IFD_MAX_ENTRIES):
        epos = F.col("__e") + F.lit(24 * i)
        typ = rd(epos + F.lit(4), 2)
        cnt = rd(epos + F.lit(8), 4)
        hit = (F.lit(i) < F.col("__n")) & (rd(epos, 2) == _MODEL_TAG) & (typ == 2)
        n = F.least(cnt - 1, F.lit(MODEL_MAX_BYTES))
        inline = hx.substr(epos + F.lit(16), (n * 2).cast("int"))
        off_pos = F.col("__t") + F.lit(2) * rd(epos + F.lit(16), 4)
        stored = hx.substr(off_pos.cast("int"), (n * 2).cast("int"))
        branches.append(
            F.when(hit & (cnt > 1),
                   F.when(cnt <= 4, inline).otherwise(stored))
        )
    model_hex = F.coalesce(*branches)
    # a window-truncated slice has odd/short hex; unhex NULL-absorbs
    model = F.when(
        model_hex.rlike("^(?:[0-9A-F]{2})+$"),
        F.decode(F.unhex(model_hex), "UTF-8"),
    )
    return (
        staged.withColumn("camera_model", model)
        .drop("__ex", "__t", "__le", "__ifd", "__n", "__e")
    )


def exif_camera_model_sql(src: str, keep: str = "doc_id", h_col: str = "h",
                          fmt_col: str = "fmt") -> str:
    """DuckDB replay of :func:`exif_camera_model` — shared staging
    CTE, same inline-vs-offset rule, same clamp and hex validation."""
    def branch(i):
        typ = _rd_sql("h", "le", f"e + {24 * i} + 4", 2)
        cnt = _rd_sql("h", "le", f"e + {24 * i} + 8", 4)
        tag = _rd_sql("h", "le", f"e + {24 * i}", 2)
        n = f"least(({cnt}) - 1, {MODEL_MAX_BYTES})"
        inline = f"substring(h, e + {24 * i} + 16, ({n}) * 2)"
        off = _rd_sql("h", "le", f"e + {24 * i} + 16", 4)
        stored = f"substring(h, t + 2 * ({off}), ({n}) * 2)"
        return (f"CASE WHEN {i} < n AND ({tag}) = {_MODEL_TAG} "
                f"AND ({typ}) = 2 AND ({cnt}) > 1 THEN "
                f"CASE WHEN ({cnt}) <= 4 THEN {inline} ELSE {stored} END END")

    branches = ", ".join(branch(i) for i in range(IFD_MAX_ENTRIES))
    return f"""
        WITH {_exif_stage_sql(src, keep, h_col, fmt_col)}, cm AS (
          SELECT {keep}, fmt, COALESCE({branches}) AS mh FROM eo_en
        )
        SELECT {keep}, fmt,
               CASE WHEN regexp_matches(mh, '^(?:[0-9A-F]{{2}})+$')
                    THEN decode(unhex(mh)) END AS camera_model
        FROM cm
    """


# ---- PNG textual metadata (tEXt) -------------------------------------------
#
# Generators sign their PNG output here: Stable Diffusion WebUI
# writes the whole prompt into a 'parameters' tEXt chunk, most
# exporters write 'Software' — the PNG counterpart of the EXIF
# camera-model provenance signal (which PNGs never carry).  The walk
# is png_animated's bounded chunk hop parked at IDAT/IEND, so a tEXt
# placed after the image data is never seen (spec-legal but useless
# for provenance: generators always write it before IDAT).  The
# keyword's NUL separator has no declared length, so the scan is an
# unrolled first-NUL probe bounded at PNG_KEYWORD_MAX_BYTES; keyword
# and value decode only when their hex is printable ASCII — DuckDB's
# decode() ERRORS on invalid UTF-8 where Spark substitutes U+FFFD,
# and the printable gate is what keeps both engines exact (a Latin-1
# accented value NULL-absorbs on both; documented clamp).

_TEXT_HEX = "74455874"
PNG_KEYWORD_MAX_BYTES = 24
PNG_TEXT_MAX_BYTES = 48
#: hex pairs of printable ASCII 0x20..0x7E — decode-safe on BOTH engines
_PRINTABLE_HEX_RE = "^(?:2[0-9A-F]|[3-6][0-9A-F]|7[0-9A-E])+$"
#: generator fingerprints for the Software keyword (case-insensitive)
_GEN_SOFTWARE_RE = "(?i)(stable.?diffusion|midjourney|dall.e|novelai|invokeai|comfyui)"


def png_text_chunk(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Add (fmt, text_keyword, text_value, gen_hint) from the FIRST
    tEXt chunk before IDAT/IEND — all NULL for non-PNG rows, PNGs
    without a pre-IDAT tEXt, keywords with no NUL within the scan
    bound, and non-printable-ASCII keyword/value bytes.  text_value
    clamps at PNG_TEXT_MAX_BYTES (a provenance label, not a payload);
    an empty text field decodes to ''.  gen_hint is true when the
    keyword is 'parameters' (SD-WebUI's prompt chunk) or 'Software'
    names a known generator; false for any other decoded keyword;
    NULL when no keyword decoded.  One 1 KiB hex projection."""
    staged = df.withColumns(
        {
            "__px": F.hex(F.substring(F.col(bytes_col), 1, PNG_ANIM_WINDOW_BYTES)),
            "fmt": sniffed_type(F.col(bytes_col)),
        }
    )
    hx = F.col("__px")
    is_png = F.col("fmt") == "png"

    def hop(acc, _i):
        pos = acc["pos"]
        ctype = hx.substr(pos + F.lit(8), F.lit(8))
        stop = ctype.isin(_IDAT_HEX, _IEND_HEX)
        nxt = F.when(stop, pos).otherwise(
            pos + F.lit(24) + F.lit(2) * _hex2long(hx, pos, 8)
        )
        return F.struct(
            nxt.alias("pos"),
            F.coalesce(acc["t"],
                       F.when(ctype == _TEXT_HEX, pos)).alias("t"),
        )

    acc0 = F.struct(
        F.lit(17).cast("long").alias("pos"),
        F.lit(None).cast("long").alias("t"),
    )
    walk = F.aggregate(
        F.sequence(F.lit(1), F.lit(PNG_CHUNK_MAX_HOPS)), acc0, hop)["t"]
    s1 = staged.withColumn("__t", F.when(is_png, walk))
    t = F.col("__t")
    s2 = s1.withColumn("__len", F.when(t.isNotNull(), _hex2long(hx, t, 8)))
    ln = F.col("__len")
    # first NUL byte index within the keyword scan bound = keyword length
    nul_branches = [
        F.when(
            (F.lit(i) < F.least(ln, F.lit(PNG_KEYWORD_MAX_BYTES + 1)))
            & (hx.substr(t + F.lit(16 + 2 * i), F.lit(2)) == "00"),
            F.lit(i).cast("long"),
        )
        for i in range(PNG_KEYWORD_MAX_BYTES + 1)
    ]
    s3 = s2.withColumn("__klen", F.coalesce(*nul_branches))
    klen = F.col("__klen")
    kw_hex = F.when(klen > 0, hx.substr(t + F.lit(16), (klen * 2).cast("int")))
    vlen = F.least(ln - klen - 1, F.lit(PNG_TEXT_MAX_BYTES))
    val_hex = F.when(
        klen > 0,
        hx.substr((t + 16 + 2 * (klen + 1)).cast("int"), (vlen * 2).cast("int")),
    )
    keyword = F.when(kw_hex.rlike(_PRINTABLE_HEX_RE),
                     F.decode(F.unhex(kw_hex), "UTF-8"))
    s4 = s3.withColumns(
        {
            "text_keyword": keyword,
            "text_value": F.when(
                keyword.isNotNull(),
                F.when(vlen == 0, F.lit("")).otherwise(
                    F.when(val_hex.rlike(_PRINTABLE_HEX_RE),
                           F.decode(F.unhex(val_hex), "UTF-8"))
                ),
            ),
        }
    )
    gen = (F.col("text_keyword") == "parameters") | (
        (F.col("text_keyword") == "Software")
        & F.col("text_value").rlike(_GEN_SOFTWARE_RE)
    )
    return (
        s4.withColumn(
            "gen_hint",
            F.when(F.col("text_keyword").isNotNull(), F.coalesce(gen, F.lit(False))),
        )
        .drop("__px", "__t", "__len", "__klen")
    )


def png_text_chunk_sql(src: str, keep: str = "doc_id", h_col: str = "h",
                       fmt_col: str = "fmt") -> str:
    """DuckDB replay of :func:`png_text_chunk` — same chunk-hop CTE
    chain as png_animated_sql, same NUL probe, printable gate, and
    generator regex."""
    ctes = [f"""pt0 AS (
          SELECT {keep}, {fmt_col} AS fmt, {h_col} AS h,
                 CAST(17 AS BIGINT) AS pos,
                 CAST(NULL AS BIGINT) AS t
          FROM {src}
        )"""]
    for k in range(PNG_CHUNK_MAX_HOPS):
        clen = "TRY_CAST(concat('0x', substring(h, pos, 8)) AS BIGINT)"
        ctes.append(f"""pt{k + 1} AS (
          SELECT {keep}, fmt, h,
                 CASE WHEN substring(h, pos + 8, 8)
                        IN ('{_IDAT_HEX}', '{_IEND_HEX}') THEN pos
                      ELSE pos + 24 + 2 * {clen} END AS pos,
                 COALESCE(t, CASE WHEN substring(h, pos + 8, 8)
                          = '{_TEXT_HEX}' THEN pos END) AS t
          FROM pt{k})""")
    last = f"pt{PNG_CHUNK_MAX_HOPS}"
    nul = ", ".join(
        f"CASE WHEN {i} < least(ln, {PNG_KEYWORD_MAX_BYTES + 1}) "
        f"AND substring(h, t + {16 + 2 * i}, 2) = '00' "
        f"THEN CAST({i} AS BIGINT) END"
        for i in range(PNG_KEYWORD_MAX_BYTES + 1)
    )
    return f"""
        WITH {", ".join(ctes)}, pt_t AS (
          SELECT {keep}, fmt, h,
                 CASE WHEN fmt = 'png' THEN t END AS t
          FROM {last}
        ), pt_l AS (
          SELECT {keep}, fmt, h, t,
                 CASE WHEN t IS NOT NULL THEN
                   TRY_CAST(concat('0x', substring(h, t, 8)) AS BIGINT) END AS ln
          FROM pt_t
        ), pt_k AS (
          SELECT {keep}, fmt, h, t, ln, COALESCE({nul}) AS klen
          FROM pt_l
        ), pt_hx AS (
          SELECT {keep}, fmt, ln, klen,
                 CASE WHEN klen > 0 THEN substring(h, t + 16, klen * 2) END AS kh,
                 least(ln - klen - 1, {PNG_TEXT_MAX_BYTES}) AS vlen,
                 CASE WHEN klen > 0 THEN
                   substring(h, t + 16 + 2 * (klen + 1),
                             least(ln - klen - 1, {PNG_TEXT_MAX_BYTES}) * 2) END AS vh
          FROM pt_k
        ), pt_d AS (
          SELECT {keep}, fmt, vlen, vh,
                 CASE WHEN regexp_matches(kh, '{_PRINTABLE_HEX_RE}')
                      THEN decode(unhex(kh)) END AS text_keyword
          FROM pt_hx
        ), pt_v AS (
          SELECT {keep}, fmt, text_keyword,
                 CASE WHEN text_keyword IS NOT NULL THEN
                   CASE WHEN vlen = 0 THEN ''
                        WHEN regexp_matches(vh, '{_PRINTABLE_HEX_RE}')
                        THEN decode(unhex(vh)) END END AS text_value
          FROM pt_d
        )
        SELECT {keep}, fmt, text_keyword, text_value,
               CASE WHEN text_keyword IS NOT NULL THEN COALESCE(
                 text_keyword = 'parameters' OR (text_keyword = 'Software'
                   AND regexp_matches(text_value, '{_GEN_SOFTWARE_RE}')),
                 FALSE) END AS gen_hint
        FROM pt_v
    """


# ---- physical pixel density (JFIF APP0 / PNG pHYs) ---------------------------
#
# Density metadata is scan-vs-screen provenance: a 300/600 dpi JPEG
# is overwhelmingly a scanner/camera-pipeline product, 72/96 dpi is
# screen-export, and PNGs carrying pHYs in meters come from print
# tooling — another decode-free axis for the synthetic-vs-archival
# split (generators emit no density or the library default). JFIF
# reads are fixed offsets (spec pins 'JFIF\0' + version + unit +
# X/Y density at the head of a leading APP0); PNG reuses the bounded
# chunk walk parked at IDAT/IEND to find pHYs. dpi_x/dpi_y
# normalize to dots-per-inch with INTEGER half-up arithmetic
# (25.4 mm/inch → ×254 over the metric divisor) so both engines
# round identically; aspect-ratio-only densities (JFIF unit 0)
# yield NULL dpi, and a JPEG whose first segment is not a JFIF APP0
# (EXIF-first files) reports all-NULL — EXIF density lives in the
# IFD walk family, not here.

_PHYS_HEX = "70485973"
#: JFIF unit byte / pHYs unit byte → label
DENSITY_UNITS_JFIF = {0: "aspect", 1: "dpi", 2: "dpcm"}


def image_density(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Add (fmt, density_unit, density_x, density_y, dpi_x, dpi_y):
    raw declared densities plus inch-normalized integers (half-up).
    NULL throughout for rows without density metadata."""
    staged = df.withColumns(
        {
            "__dx": F.hex(F.substring(F.col(bytes_col), 1, PNG_ANIM_WINDOW_BYTES)),
            "fmt": sniffed_type(F.col(bytes_col)),
        }
    )
    hx = F.col("__dx")
    # JFIF: FFD8(4) FFE0(4) len(4) 'JFIF\0'(10) ver(4) unit(2) dx(4) dy(4)
    is_jfif = (
        (F.col("fmt") == "jpeg")
        & (hx.substr(F.lit(5), F.lit(4)) == "FFE0")
        & (hx.substr(F.lit(13), F.lit(10)) == "4A46494600")
    )
    j_unit = F.when(is_jfif, _hex2long(hx, F.lit(27), 2))
    j_dx = F.when(is_jfif, _hex2long(hx, F.lit(29), 4))
    j_dy = F.when(is_jfif, _hex2long(hx, F.lit(33), 4))

    def hop(acc, _i):
        pos = acc["pos"]
        ctype = hx.substr(pos + F.lit(8), F.lit(8))
        stop = ctype.isin(_IDAT_HEX, _IEND_HEX)
        nxt = F.when(stop, pos).otherwise(
            pos + F.lit(24) + F.lit(2) * _hex2long(hx, pos, 8)
        )
        return F.struct(
            nxt.alias("pos"),
            F.coalesce(acc["p"],
                       F.when(ctype == _PHYS_HEX, pos)).alias("p"),
        )

    acc0 = F.struct(
        F.lit(17).cast("long").alias("pos"),
        F.lit(None).cast("long").alias("p"),
    )
    walk = F.aggregate(
        F.sequence(F.lit(1), F.lit(PNG_CHUNK_MAX_HOPS)), acc0, hop)["p"]
    s1 = staged.withColumn("__p", F.when(F.col("fmt") == "png", walk))
    p = F.col("__p")
    p_x = _hex2long(hx, p + F.lit(16), 8)
    p_y = _hex2long(hx, p + F.lit(24), 8)
    p_m = _hex2long(hx, p + F.lit(32), 2) == 1  # 1 = per metre
    unit = (
        F.when(p.isNotNull() & p_m, "per_meter")
        .when(p.isNotNull(), "aspect")
        .when(j_unit == 0, "aspect")
        .when(j_unit == 1, "dpi")
        .when(j_unit == 2, "dpcm")
    )
    dx = F.coalesce(F.when(p.isNotNull(), p_x), j_dx)
    dy = F.coalesce(F.when(p.isNotNull(), p_y), j_dy)
    u = F.col("density_unit")
    out = s1.withColumns(
        {
            "density_unit": unit,
            "density_x": dx.cast("long"),
            "density_y": dy.cast("long"),
        }
    )
    return out.withColumns(
        {
            "dpi_x": F.floor(
                F.when(u == "dpi", F.col("density_x"))
                .when(u == "dpcm", (F.col("density_x") * 254 + 50) / 100)
                .when(u == "per_meter", (F.col("density_x") * 254 + 5000) / 10000)
            ).cast("long"),
            "dpi_y": F.floor(
                F.when(u == "dpi", F.col("density_y"))
                .when(u == "dpcm", (F.col("density_y") * 254 + 50) / 100)
                .when(u == "per_meter", (F.col("density_y") * 254 + 5000) / 10000)
            ).cast("long"),
        }
    ).drop("__dx", "__p")


def image_density_sql(src: str, keep: str = "doc_id", h_col: str = "h",
                      fmt_col: str = "fmt") -> str:
    """DuckDB replay of :func:`image_density` — same JFIF offsets,
    chunk walk, unit labels, and integer dpi arithmetic."""
    ctes = [f"""dn0 AS (
          SELECT {keep}, {fmt_col} AS fmt, {h_col} AS h,
                 CAST(17 AS BIGINT) AS pos,
                 CAST(NULL AS BIGINT) AS p
          FROM {src}
        )"""]
    for k in range(PNG_CHUNK_MAX_HOPS):
        clen = "TRY_CAST(concat('0x', substring(h, pos, 8)) AS BIGINT)"
        ctes.append(f"""dn{k + 1} AS (
          SELECT {keep}, fmt, h,
                 CASE WHEN substring(h, pos + 8, 8)
                        IN ('{_IDAT_HEX}', '{_IEND_HEX}') THEN pos
                      ELSE pos + 24 + 2 * {clen} END AS pos,
                 COALESCE(p, CASE WHEN substring(h, pos + 8, 8)
                          = '{_PHYS_HEX}' THEN pos END) AS p
          FROM dn{k})""")
    last = f"dn{PNG_CHUNK_MAX_HOPS}"

    def be(pos_expr, n):
        return f"TRY_CAST(concat('0x', substring(h, {pos_expr}, {n})) AS BIGINT)"

    jfif = ("fmt = 'jpeg' AND substring(h, 5, 4) = 'FFE0' "
            "AND substring(h, 13, 10) = '4A46494600'")
    return f"""
        WITH {", ".join(ctes)}, dn_j AS (
          SELECT {keep}, fmt, h,
                 CASE WHEN fmt = 'png' THEN p END AS p,
                 CASE WHEN {jfif} THEN {be(27, 2)} END AS j_unit,
                 CASE WHEN {jfif} THEN {be(29, 4)} END AS j_dx,
                 CASE WHEN {jfif} THEN {be(33, 4)} END AS j_dy
          FROM {last}
        ), dn_u AS (
          SELECT {keep}, fmt,
                 CASE WHEN p IS NOT NULL AND {be('p + 32', 2)} = 1
                        THEN 'per_meter'
                      WHEN p IS NOT NULL THEN 'aspect'
                      WHEN j_unit = 0 THEN 'aspect'
                      WHEN j_unit = 1 THEN 'dpi'
                      WHEN j_unit = 2 THEN 'dpcm' END AS density_unit,
                 CAST(COALESCE(CASE WHEN p IS NOT NULL
                          THEN {be('p + 16', 8)} END, j_dx) AS BIGINT) AS density_x,
                 CAST(COALESCE(CASE WHEN p IS NOT NULL
                          THEN {be('p + 24', 8)} END, j_dy) AS BIGINT) AS density_y
          FROM dn_j
        )
        SELECT {keep}, fmt, density_unit, density_x, density_y,
               CAST(floor(CASE WHEN density_unit = 'dpi' THEN density_x
                    WHEN density_unit = 'dpcm'
                      THEN (density_x * 254 + 50) / 100
                    WHEN density_unit = 'per_meter'
                      THEN (density_x * 254 + 5000) / 10000 END) AS BIGINT) AS dpi_x,
               CAST(floor(CASE WHEN density_unit = 'dpi' THEN density_y
                    WHEN density_unit = 'dpcm'
                      THEN (density_y * 254 + 50) / 100
                    WHEN density_unit = 'per_meter'
                      THEN (density_y * 254 + 5000) / 10000 END) AS BIGINT) AS dpi_y
        FROM dn_u
    """


# ---- EXIF thumbnail (IFD1) presence ------------------------------------------
#
# Cameras write an IFD1 thumbnail into every JPEG; exporters,
# messengers, and generators almost never do — so a host whose
# images still carry thumbnails is serving camera-original files
# (and leaking a privacy surface: the thumbnail often survives the
# crop that removed something from the main image). The pointer to
# IFD1 sits RIGHT AFTER IFD0's entry array: at e + 24*n (hex), a
# 4-byte offset from the TIFF header; 0 = no IFD1 (the spec's
# terminator). The read is gated on n <= IFD_MAX_ENTRIES — a
# corrupt entry count would place the pointer outside the window
# where partial-slice reads diverge between engines — and the IFD1
# entry count is only reported when the offset lands in-window
# (TRY_CAST/conv NULL-absorb the rest).

def exif_thumbnail(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Add (fmt, has_thumbnail, ifd1_entries): true when IFD0's
    next-IFD pointer is a sane nonzero offset; NULL for non-EXIF
    rows and implausible entry counts."""
    staged = _exif_stage(df, bytes_col)
    hx = F.col("__ex")

    def rd(pos, n_bytes):
        return F.when(F.col("__le"), _le(hx, pos, n_bytes)).otherwise(
            _hex2long(hx, pos, 2 * n_bytes)
        )

    sane = F.col("__n") <= IFD_MAX_ENTRIES
    off = F.when(sane, rd(F.col("__e") + F.lit(24) * F.col("__n"), 4))
    ifd1 = F.when(off > 0, rd(F.col("__t") + F.lit(2) * off, 2))
    return (
        staged.withColumns(
            {
                "has_thumbnail": F.when(off.isNotNull(), off > 0),
                "ifd1_entries": ifd1.cast("int"),
            }
        )
        .drop("__ex", "__t", "__le", "__ifd", "__n", "__e")
    )


def exif_thumbnail_sql(src: str, keep: str = "doc_id", h_col: str = "h",
                       fmt_col: str = "fmt") -> str:
    """DuckDB replay of :func:`exif_thumbnail` — shared staging CTE,
    same sanity gate and pointer arithmetic."""
    off = (f"CASE WHEN n <= {IFD_MAX_ENTRIES} THEN "
           f"{_rd_sql('h', 'le', 'e + 24 * n', 4)} END")
    return f"""
        WITH {_exif_stage_sql(src, keep, h_col, fmt_col)}, et_o AS (
          SELECT {keep}, fmt, h, t, le, ({off}) AS off FROM eo_en
        )
        SELECT {keep}, fmt,
               CASE WHEN off IS NOT NULL THEN off > 0 END AS has_thumbnail,
               CAST(CASE WHEN off > 0 THEN
                 {_rd_sql('h', 'le', 't + 2 * off', 2)} END AS INT) AS ifd1_entries
        FROM et_o
    """


# ---- EXIF Software tag (0x0131) ----------------------------------------------
#
# The JPEG-side counterpart of the PNG tEXt generator signature:
# editors and AI pipelines that DO write EXIF put themselves in the
# Software/ProcessingSoftware tag ("Adobe Photoshop 25.0", and
# increasingly the generator names the tEXt gate matches on PNGs).
# Same endian-aware inline-vs-offset ASCII read as the camera-model
# tag, same printable gate, and the SAME generator regex as
# png_text_chunk — one fingerprint table for both containers, so
# the host-level provenance rollup sees JPEG and PNG output of one
# tool identically.

_SOFTWARE_TAG = 0x0131


def exif_software(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Add (fmt, software, gen_hint): the EXIF Software string and
    whether it names a known generator; NULL for rows without the
    tag. Clamped at MODEL_MAX_BYTES like the camera model."""
    staged = _exif_stage(df, bytes_col)
    hx = F.col("__ex")

    def rd(pos, n_bytes):
        return F.when(F.col("__le"), _le(hx, pos, n_bytes)).otherwise(
            _hex2long(hx, pos, 2 * n_bytes)
        )

    branches = []
    for i in range(IFD_MAX_ENTRIES):
        epos = F.col("__e") + F.lit(24 * i)
        typ = rd(epos + F.lit(4), 2)
        cnt = rd(epos + F.lit(8), 4)
        hit = (F.lit(i) < F.col("__n")) & (rd(epos, 2) == _SOFTWARE_TAG) & (typ == 2)
        n = F.least(cnt - 1, F.lit(MODEL_MAX_BYTES))
        inline = hx.substr(epos + F.lit(16), (n * 2).cast("int"))
        off_pos = F.col("__t") + F.lit(2) * rd(epos + F.lit(16), 4)
        stored = hx.substr(off_pos.cast("int"), (n * 2).cast("int"))
        branches.append(
            F.when(hit & (cnt > 1),
                   F.when(cnt <= 4, inline).otherwise(stored))
        )
    sw_hex = F.coalesce(*branches)
    software = F.when(
        sw_hex.rlike("^(?:[0-9A-F]{2})+$"),
        F.decode(F.unhex(sw_hex), "UTF-8"),
    )
    return (
        staged.withColumns(
            {
                "software": software,
                "gen_hint": F.when(
                    software.isNotNull(),
                    F.coalesce(software.rlike(_GEN_SOFTWARE_RE), F.lit(False)),
                ),
            }
        )
        .drop("__ex", "__t", "__le", "__ifd", "__n", "__e")
    )


def exif_software_sql(src: str, keep: str = "doc_id", h_col: str = "h",
                      fmt_col: str = "fmt") -> str:
    """DuckDB replay of :func:`exif_software` — shared staging, same
    storage rule, same generator regex."""
    def branch(i):
        typ = _rd_sql("h", "le", f"e + {24 * i} + 4", 2)
        cnt = _rd_sql("h", "le", f"e + {24 * i} + 8", 4)
        tag = _rd_sql("h", "le", f"e + {24 * i}", 2)
        n = f"least(({cnt}) - 1, {MODEL_MAX_BYTES})"
        inline = f"substring(h, e + {24 * i} + 16, ({n}) * 2)"
        off = _rd_sql("h", "le", f"e + {24 * i} + 16", 4)
        stored = f"substring(h, t + 2 * ({off}), ({n}) * 2)"
        return (f"CASE WHEN {i} < n AND ({tag}) = {_SOFTWARE_TAG} "
                f"AND ({typ}) = 2 AND ({cnt}) > 1 THEN "
                f"CASE WHEN ({cnt}) <= 4 THEN {inline} ELSE {stored} END END")

    branches = ", ".join(branch(i) for i in range(IFD_MAX_ENTRIES))
    return f"""
        WITH {_exif_stage_sql(src, keep, h_col, fmt_col)}, sw AS (
          SELECT {keep}, fmt, COALESCE({branches}) AS sh FROM eo_en
        ), sw_d AS (
          SELECT {keep}, fmt,
                 CASE WHEN regexp_matches(sh, '^(?:[0-9A-F]{{2}})+$')
                      THEN decode(unhex(sh)) END AS software
          FROM sw
        )
        SELECT {keep}, fmt, software,
               CASE WHEN software IS NOT NULL THEN COALESCE(
                 regexp_matches(software, '{_GEN_SOFTWARE_RE}'), FALSE) END
                 AS gen_hint
        FROM sw_d
    """


# ---- EXIF inside PNG (eXIf chunk) --------------------------------------------
#
# PNG 1.5 standardized the eXIf chunk: a raw TIFF blob inside the
# chunk stream — iPhone screenshots and modern exporters write it,
# and a provenance pass that only reads JPEG APP1 calls those PNGs
# metadata-free. The chunk walk is the png_animated hop parked at
# IDAT/IEND; the chunk DATA is a TIFF header, so the byte-order /
# IFD-offset / entry-count staging and the orientation tag scan are
# the same endian-aware reads as the JPEG path, just anchored at the
# chunk data position. Same swap_dims contract as exif_orientation
# (orientations 5-8 transpose).

_EXIF_CHUNK_HEX = "65584966"


def png_exif_orientation(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Add (fmt, orientation, swap_dims) from a PNG eXIf chunk —
    NULL for non-PNG rows, PNGs without the chunk, malformed byte
    orders, absent tags, and out-of-range values."""
    staged = df.withColumns(
        {
            "__px": F.hex(F.substring(F.col(bytes_col), 1, PNG_ANIM_WINDOW_BYTES)),
            "fmt": sniffed_type(F.col(bytes_col)),
        }
    )
    hx = F.col("__px")

    def hop(acc, _i):
        pos = acc["pos"]
        ctype = hx.substr(pos + F.lit(8), F.lit(8))
        stop = ctype.isin(_IDAT_HEX, _IEND_HEX)
        nxt = F.when(stop, pos).otherwise(
            pos + F.lit(24) + F.lit(2) * _hex2long(hx, pos, 8)
        )
        return F.struct(
            nxt.alias("pos"),
            F.coalesce(acc["x"],
                       F.when(ctype == _EXIF_CHUNK_HEX, pos)).alias("x"),
        )

    acc0 = F.struct(
        F.lit(17).cast("long").alias("pos"),
        F.lit(None).cast("long").alias("x"),
    )
    walk = F.aggregate(
        F.sequence(F.lit(1), F.lit(PNG_CHUNK_MAX_HOPS)), acc0, hop)["x"]
    s1 = staged.withColumn(
        "__t", F.when(F.col("fmt") == "png", walk + F.lit(16)))
    bo = hx.substr(F.col("__t"), F.lit(4))
    s2 = s1.withColumn(
        "__le", F.when(bo == "4949", F.lit(True)).when(bo == "4D4D", F.lit(False)))

    def rd(pos, n_bytes):
        return F.when(F.col("__le"), _le(hx, pos, n_bytes)).otherwise(
            _hex2long(hx, pos, 2 * n_bytes)
        )

    s3 = s2.withColumn("__ifd", rd(F.col("__t") + F.lit(8), 4))
    s4 = s3.withColumns(
        {
            "__n": rd(F.col("__t") + F.lit(2) * F.col("__ifd"), 2),
            "__e": F.col("__t") + F.lit(2) * F.col("__ifd") + F.lit(4),
        }
    )
    branches = []
    for i in range(IFD_MAX_ENTRIES):
        epos = F.col("__e") + F.lit(24 * i)
        hit = (F.lit(i) < F.col("__n")) & (rd(epos, 2) == _ORIENT_TAG)
        branches.append(F.when(hit, rd(epos + F.lit(16), 2)))
    o = F.coalesce(*branches)
    o = F.when((o >= 1) & (o <= 8), o)
    return (
        s4.withColumns(
            {
                "orientation": o.cast("int"),
                "swap_dims": F.when(o.isNotNull(), o >= 5),
            }
        )
        .drop("__px", "__t", "__le", "__ifd", "__n", "__e")
    )


def png_exif_orientation_sql(src: str, keep: str = "doc_id", h_col: str = "h",
                             fmt_col: str = "fmt") -> str:
    """DuckDB replay of :func:`png_exif_orientation` — same chunk
    hop chain + TIFF staging anchored at the chunk data."""
    ctes = [f"""pe0 AS (
          SELECT {keep}, {fmt_col} AS fmt, {h_col} AS h,
                 CAST(17 AS BIGINT) AS pos,
                 CAST(NULL AS BIGINT) AS x
          FROM {src}
        )"""]
    for k in range(PNG_CHUNK_MAX_HOPS):
        clen = "TRY_CAST(concat('0x', substring(h, pos, 8)) AS BIGINT)"
        ctes.append(f"""pe{k + 1} AS (
          SELECT {keep}, fmt, h,
                 CASE WHEN substring(h, pos + 8, 8)
                        IN ('{_IDAT_HEX}', '{_IEND_HEX}') THEN pos
                      ELSE pos + 24 + 2 * {clen} END AS pos,
                 COALESCE(x, CASE WHEN substring(h, pos + 8, 8)
                          = '{_EXIF_CHUNK_HEX}' THEN pos END) AS x
          FROM pe{k})""")
    last = f"pe{PNG_CHUNK_MAX_HOPS}"
    branches = ", ".join(
        f"CASE WHEN {i} < n AND ({_rd_sql('h', 'le', f'e + {24 * i}', 2)})"
        f" = {_ORIENT_TAG} "
        f"THEN ({_rd_sql('h', 'le', f'e + {24 * i} + 16', 2)}) END"
        for i in range(IFD_MAX_ENTRIES)
    )
    return f"""
        WITH {", ".join(ctes)}, pe_t AS (
          SELECT {keep}, fmt, h,
                 CASE WHEN fmt = 'png' THEN x + 16 END AS t
          FROM {last}
        ), pe_le AS (
          SELECT *, CASE substring(h, t, 4) WHEN '4949' THEN true
                    WHEN '4D4D' THEN false ELSE NULL END AS le
          FROM pe_t
        ), pe_ifd AS (
          SELECT *, {_rd_sql('h', 'le', 't + 8', 4)} AS ifd FROM pe_le
        ), pe_en AS (
          SELECT *, {_rd_sql('h', 'le', 't + 2 * ifd', 2)} AS n,
                 t + 2 * ifd + 4 AS e
          FROM pe_ifd
        ), pe_o AS (
          SELECT {keep}, fmt, COALESCE({branches}) AS o FROM pe_en
        )
        SELECT {keep}, fmt,
               CAST(CASE WHEN o BETWEEN 1 AND 8 THEN o END AS INT)
                 AS orientation,
               CASE WHEN o BETWEEN 1 AND 8 THEN o >= 5 END AS swap_dims
        FROM pe_o
    """


# ---- WAV structure (RIFF fmt/data chunk walk) -------------------------------------
#
# Audio is the third modality of a multimodal crawl and WAV is its
# raw-capture container: the `fmt ` chunk is the codec contract
# (PCM vs float vs telephony companding), channels/rate/width set
# the storage cost per second, and the `data` chunk's DECLARED size
# gives an exact duration without reading a single sample — the
# audio sibling of jpeg_structure/png_structure. The walk hops real
# chunks (LIST/JUNK/bext commonly precede fmt in broadcast WAVs)
# with RIFF's odd-size pad rule, parks at `data` (whose payload is
# the file), and NULL-absorbs rows whose fmt chunk lies beyond the
# bounded window. Reference scope note: the reference crawls XML
# pages only (/root/reference/dblp_crawler/downloader.py:52-84);
# this tier exists for the image/audio graft axes.

WAV_WINDOW_BYTES = 256
WAV_MAX_HOPS = 6
_FMT_CC_HEX = "666D7420"    # 'fmt '
_DATA_CC_HEX = "64617461"   # 'data'

#: WAVE format code → codec label (shared by engine and oracle)
WAV_CODEC_TABLE: list[tuple[int, str]] = [
    (1, "pcm"),
    (3, "ieee_float"),
    (6, "alaw"),
    (7, "mulaw"),
    (65534, "extensible"),
]


def wav_structure(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Add (fmt, codec, channels, sample_rate, bits_per_sample,
    data_bytes, duration_ms) from the RIFF header alone. duration_ms
    is exact integer work: declared data bytes × 1000 div the
    header's byte rate (NULL when the byte rate is 0 or the fmt
    chunk is missing). Non-WAV rows get all-NULL structure."""
    staged = df.withColumns(
        {
            "__wx": F.hex(F.substring(F.col(bytes_col), 1, WAV_WINDOW_BYTES)),
            "fmt": sniffed_type(F.col(bytes_col)),
        }
    )
    hx = F.col("__wx")
    is_wav = F.col("fmt") == "wav"

    def hop(acc, _i):
        pos = acc["pos"]
        cc = hx.substr(pos, F.lit(8))
        size = _le(hx, pos + F.lit(8), 4)
        stop = (cc == _DATA_CC_HEX) | (cc == "")
        nxt = F.when(stop, pos).otherwise(
            pos + F.lit(16) + F.lit(2) * (size + size % F.lit(2))
        )
        return F.struct(
            nxt.alias("pos"),
            F.coalesce(
                acc["fpos"],
                F.when(cc == _FMT_CC_HEX, pos + F.lit(16)),
            ).alias("fpos"),
            F.coalesce(
                acc["dsize"], F.when(cc == _DATA_CC_HEX, size)
            ).alias("dsize"),
        )

    acc0 = F.struct(
        F.lit(25).cast("long").alias("pos"),   # byte 12: first subchunk
        F.lit(None).cast("long").alias("fpos"),
        F.lit(None).cast("long").alias("dsize"),
    )
    walk = F.aggregate(F.sequence(F.lit(1), F.lit(WAV_MAX_HOPS)), acc0, hop)
    s1 = staged.withColumns(
        {
            "__fp": F.when(is_wav, walk["fpos"]),
            "__ds": F.when(is_wav, walk["dsize"]),
        }
    )
    fp = F.col("__fp")
    code = _le(hx, fp, 2)
    codec = F.lit(None).cast("string")
    for c, label in reversed(WAV_CODEC_TABLE):
        codec = F.when(code == c, label).otherwise(codec)
    codec = F.when(code.isNotNull(), F.coalesce(codec, F.lit("other")))
    s2 = s1.withColumns(
        {
            "codec": codec,
            "channels": _le(hx, fp + F.lit(4), 2).cast("int"),
            "sample_rate": _le(hx, fp + F.lit(8), 4).cast("int"),
            "bits_per_sample": _le(hx, fp + F.lit(28), 2).cast("int"),
            "data_bytes": F.col("__ds"),
            "__br": _le(hx, fp + F.lit(16), 4),
        }
    )
    return s2.withColumn(
        "duration_ms",
        F.when(F.col("__br") > 0, F.expr("__ds * 1000 div __br")),
    ).drop("__wx", "__fp", "__ds", "__br")


def wav_structure_sql(src: str, keep: str = "doc_id", h_col: str = "h",
                      fmt_col: str = "fmt") -> str:
    """DuckDB replay of :func:`wav_structure` — linear CTE chain, one
    CTE per hop (the png_animated discipline), same codec table."""
    ctes = [f"""wv0 AS (
          SELECT {keep}, {fmt_col} AS fmt, {h_col} AS h,
                 CAST(25 AS BIGINT) AS pos,
                 CAST(NULL AS BIGINT) AS fpos,
                 CAST(NULL AS BIGINT) AS dsize
          FROM {src}
        )"""]
    size = _le_sql_var("h", "pos + 8", 4)
    for k in range(WAV_MAX_HOPS):
        ctes.append(f"""wv{k + 1} AS (
          SELECT {keep}, fmt, h,
                 CASE WHEN substring(h, pos, 8) IN ('{_DATA_CC_HEX}', '')
                        THEN pos
                      ELSE pos + 16 + 2 * ({size} + ({size}) % 2) END AS pos,
                 COALESCE(fpos, CASE WHEN substring(h, pos, 8)
                          = '{_FMT_CC_HEX}' THEN pos + 16 END) AS fpos,
                 COALESCE(dsize, CASE WHEN substring(h, pos, 8)
                          = '{_DATA_CC_HEX}' THEN {size} END) AS dsize
          FROM wv{k})""")
    last = f"wv{WAV_MAX_HOPS}"
    codec_whens = " ".join(
        f"WHEN {c} THEN '{label}'" for c, label in WAV_CODEC_TABLE
    )
    code = _le_sql_var("h", "fpos", 2)
    return f"""
        WITH {", ".join(ctes)}, wvg AS (
          SELECT {keep}, fmt, h,
                 CASE WHEN fmt = 'wav' THEN fpos END AS fpos,
                 CASE WHEN fmt = 'wav' THEN dsize END AS dsize
          FROM {last}
        ), wvf AS (
          SELECT {keep}, fmt, dsize AS data_bytes,
                 {code} AS code,
                 CAST({_le_sql_var("h", "fpos + 4", 2)} AS INT) AS channels,
                 CAST({_le_sql_var("h", "fpos + 8", 4)} AS INT) AS sample_rate,
                 CAST({_le_sql_var("h", "fpos + 28", 2)} AS INT)
                   AS bits_per_sample,
                 {_le_sql_var("h", "fpos + 16", 4)} AS br
          FROM wvg
        )
        SELECT {keep}, fmt,
               CASE WHEN code IS NOT NULL THEN
                 COALESCE(CASE code {codec_whens} END, 'other') END AS codec,
               channels, sample_rate, bits_per_sample, data_bytes,
               CASE WHEN br > 0 THEN data_bytes * 1000 // br END
                 AS duration_ms
        FROM wvf
    """


# ---- MP3 structure (ID3v2 + first MPEG frame header) ------------------------------
#
# Podcast/speech corpora arrive as MP3; the ID3v2 tag says how much
# metadata (often embedded cover art — kilobytes to megabytes)
# precedes the audio, and the FIRST MPEG frame header pins the
# stream contract: version, layer, bitrate, sample rate, channel
# mode — enough to cost a transcription pass and to route mono
# telephony away from music-tier storage, all without a decoder.
# ID3v2 sizes are SYNCSAFE (4×7 bits, high bit of every byte zero,
# so a tag size can never fake a frame sync); v2.4 footers add 10
# bytes. The frame is validated by its 11-bit sync before any field
# is read; a tag larger than the hex window NULL-absorbs the frame
# fields (documented — same trade as every header tier). Bitrate
# tables are Layer III only (the MP3 case); Layer I/II rows keep
# their version/layer but NULL the bitrate.

MP3_WINDOW_BYTES = 4096

#: MPEG version bits (frame byte 1 >> 3 & 3) → label; 1 is reserved
MP3_VERSION_TABLE: list[tuple[int, str]] = [(0, "2.5"), (2, "2"), (3, "1")]
#: layer bits (frame byte 1 >> 1 & 3) → layer number; 0 is reserved
MP3_LAYER_TABLE: list[tuple[int, int]] = [(1, 3), (2, 2), (3, 1)]
#: Layer III bitrate (kbps) by index 1..14; 0 = free, 15 = bad → NULL
MP3_BITRATE_V1_L3 = [32, 40, 48, 56, 64, 80, 96, 112,
                     128, 160, 192, 224, 256, 320]
MP3_BITRATE_V2_L3 = [8, 16, 24, 32, 40, 48, 56, 64,
                     80, 96, 112, 128, 144, 160]
#: sample rate by version label and 2-bit index (3 = reserved)
MP3_SAMPLE_RATES = {"1": [44100, 48000, 32000],
                    "2": [22050, 24000, 16000],
                    "2.5": [11025, 12000, 8000]}
MP3_CHANNEL_MODES = ["stereo", "joint_stereo", "dual_channel", "mono"]


def _bits(col: Column, shift: int, mask: int) -> Column:
    """(col >> shift) & mask for small non-negative ints — exact
    because every intermediate fits a double's mantissa."""
    return (col / F.lit(1 << shift)).cast("long") % F.lit(mask + 1)


def mp3_structure(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Add (fmt, id3_major, tag_bytes, mpeg_version, layer,
    bitrate_kbps, sample_rate, channel_mode) — ID3v2 header + first
    frame header, decode-free. Only ID3-tagged files sniff as mp3
    (bare MPEG streams have no reliable magic); non-mp3 rows get
    all-NULL structure."""
    staged = df.withColumns(
        {
            "__mx": F.hex(F.substring(F.col(bytes_col), 1, MP3_WINDOW_BYTES)),
            "fmt": sniffed_type(F.col(bytes_col)),
        }
    )
    hx = F.col("__mx")
    is_mp3 = F.col("fmt") == "mp3"

    def byte(i: int) -> Column:
        return _hex2long(hx, F.lit(2 * i + 1), 2)

    size = (
        (byte(6) % 128) * F.lit(1 << 21) + (byte(7) % 128) * F.lit(1 << 14)
        + (byte(8) % 128) * F.lit(1 << 7) + (byte(9) % 128)
    )
    footer = _bits(byte(5), 4, 1)
    s1 = staged.withColumns(
        {
            "id3_major": F.when(is_mp3, byte(3)).cast("int"),
            "tag_bytes": F.when(is_mp3, F.lit(10) + size + F.lit(10) * footer),
        }
    )
    fpos = F.lit(2) * F.col("tag_bytes") + F.lit(1)
    fb1 = _hex2long(hx, fpos + F.lit(2), 2)
    fb2 = _hex2long(hx, fpos + F.lit(4), 2)
    fb3 = _hex2long(hx, fpos + F.lit(6), 2)
    sync_ok = (_hex2long(hx, fpos, 2) == 255) & (fb1 >= 224)
    s2 = s1.withColumns(
        {
            "__vb": F.when(sync_ok, _bits(fb1, 3, 3)),
            "__lb": F.when(sync_ok, _bits(fb1, 1, 3)),
            "__bi": F.when(sync_ok, _bits(fb2, 4, 15)),
            "__si": F.when(sync_ok, _bits(fb2, 2, 3)),
            "__cm": F.when(sync_ok, _bits(fb3, 6, 3)),
        }
    )
    ver = F.lit(None).cast("string")
    for bits, label in reversed(MP3_VERSION_TABLE):
        ver = F.when(F.col("__vb") == bits, label).otherwise(ver)
    layer = F.lit(None).cast("int")
    for bits, num in reversed(MP3_LAYER_TABLE):
        layer = F.when(F.col("__lb") == bits, F.lit(num)).otherwise(layer)
    s3 = s2.withColumns({"mpeg_version": ver, "layer": layer})
    bi = F.col("__bi")
    v1_arr = F.array([F.lit(x) for x in MP3_BITRATE_V1_L3])
    v2_arr = F.array([F.lit(x) for x in MP3_BITRATE_V2_L3])
    bitrate = F.when(
        (F.col("layer") == 3) & bi.between(1, 14),
        F.when(F.col("mpeg_version") == "1", F.element_at(v1_arr, bi.cast("int")))
        .when(F.col("mpeg_version").isin("2", "2.5"),
              F.element_at(v2_arr, bi.cast("int"))),
    )
    sr = F.lit(None).cast("int")
    for label, rates in MP3_SAMPLE_RATES.items():
        arr = F.array([F.lit(x) for x in rates])
        sr = F.when(
            (F.col("mpeg_version") == label) & F.col("__si").between(0, 2),
            F.element_at(arr, (F.col("__si") + 1).cast("int")),
        ).otherwise(sr)
    cm_arr = F.array([F.lit(x) for x in MP3_CHANNEL_MODES])
    return s3.withColumns(
        {
            "bitrate_kbps": bitrate.cast("int"),
            "sample_rate": sr.cast("int"),
            # explicit null guard: element_at(literal_array, NULL) is
            # unreliable (observed returning the LAST element on
            # Spark 4.1.2), so never hand it a nullable index bare
            "channel_mode": F.when(
                F.col("__cm").isNotNull(),
                F.element_at(cm_arr, (F.col("__cm") + 1).cast("int")),
            ),
        }
    ).drop("__mx", "__vb", "__lb", "__bi", "__si", "__cm")


def mp3_structure_sql(src: str, keep: str = "doc_id", h_col: str = "h",
                      fmt_col: str = "fmt") -> str:
    """DuckDB replay of :func:`mp3_structure` — same syncsafe size,
    same sync gate, same tables rendered as CASE arms."""
    def byte(i: int) -> str:
        return f"TRY_CAST(concat('0x', substring(h, {2 * i + 1}, 2)) AS BIGINT)"

    size = (f"(({byte(6)}) % 128) * {1 << 21} + (({byte(7)}) % 128) * {1 << 14}"
            f" + (({byte(8)}) % 128) * {1 << 7} + (({byte(9)}) % 128)")
    footer = f"(({byte(5)}) // 16) % 2"
    bhex = "TRY_CAST(concat('0x', substring(h, {p}, 2)) AS BIGINT)"
    fb0 = bhex.format(p="fpos")
    fb1 = bhex.format(p="fpos + 2")
    fb2 = bhex.format(p="fpos + 4")
    fb3 = bhex.format(p="fpos + 6")
    ver_whens = " ".join(f"WHEN {b} THEN '{v}'" for b, v in MP3_VERSION_TABLE)
    lay_whens = " ".join(f"WHEN {b} THEN {n}" for b, n in MP3_LAYER_TABLE)
    v1_whens = " ".join(f"WHEN {i + 1} THEN {kb}"
                        for i, kb in enumerate(MP3_BITRATE_V1_L3))
    v2_whens = " ".join(f"WHEN {i + 1} THEN {kb}"
                        for i, kb in enumerate(MP3_BITRATE_V2_L3))
    sr_arms = " ".join(
        f"""WHEN mpeg_version = '{label}' AND si BETWEEN 0 AND 2 THEN
              CASE si WHEN 0 THEN {r[0]} WHEN 1 THEN {r[1]} ELSE {r[2]} END"""
        for label, r in MP3_SAMPLE_RATES.items()
    )
    cm_whens = " ".join(f"WHEN {i} THEN '{m}'"
                        for i, m in enumerate(MP3_CHANNEL_MODES))
    return f"""
        WITH m30 AS (
          SELECT {keep}, {fmt_col} AS fmt, {h_col} AS h,
                 CASE WHEN {fmt_col} = 'mp3'
                   THEN CAST({byte(3)} AS INT) END AS id3_major,
                 CASE WHEN {fmt_col} = 'mp3'
                   THEN 10 + {size} + 10 * ({footer}) END AS tag_bytes
          FROM {src}
        ), m31 AS (
          SELECT *, 2 * tag_bytes + 1 AS fpos FROM m30
        ), m32 AS (
          SELECT {keep}, fmt, id3_major, tag_bytes,
                 CASE WHEN {fb0} = 255 AND {fb1} >= 224 THEN
                   ({fb1} // 8) % 4 END AS vb,
                 CASE WHEN {fb0} = 255 AND {fb1} >= 224 THEN
                   ({fb1} // 2) % 4 END AS lb,
                 CASE WHEN {fb0} = 255 AND {fb1} >= 224 THEN
                   ({fb2} // 16) % 16 END AS bi,
                 CASE WHEN {fb0} = 255 AND {fb1} >= 224 THEN
                   ({fb2} // 4) % 4 END AS si,
                 CASE WHEN {fb0} = 255 AND {fb1} >= 224 THEN
                   ({fb3} // 64) % 4 END AS cm
          FROM m31
        ), m33 AS (
          SELECT *, CASE vb {ver_whens} END AS mpeg_version,
                 CAST(CASE lb {lay_whens} END AS INT) AS layer
          FROM m32
        )
        SELECT {keep}, fmt, id3_major, tag_bytes, mpeg_version, layer,
               CAST(CASE WHEN layer = 3 AND bi BETWEEN 1 AND 14 THEN
                 CASE WHEN mpeg_version = '1' THEN CASE bi {v1_whens} END
                      WHEN mpeg_version IN ('2', '2.5')
                        THEN CASE bi {v2_whens} END
                 END END AS INT) AS bitrate_kbps,
               CAST(CASE {sr_arms} END AS INT) AS sample_rate,
               CASE cm {cm_whens} END AS channel_mode
        FROM m33
    """


# ---- TAR structure (ustar member walk) --------------------------------------------
#
# Tar is the RELEASE container of multimodal training data — the
# WebDataset convention packs (sample.jpg, sample.txt) member pairs
# into plain tar shards precisely because the format is readable
# with bounded header arithmetic: each member is a 512-byte header
# (name NUL-terminated at 0, size as 11 ASCII-octal digits at 124,
# typeflag at 156, 'ustar' magic at 257) followed by its data padded
# to the next 512 boundary. The walk below recovers the member table
# (name, size, type, data offset) without reading a data byte — the
# same audit a shard consumer does to random-access samples, and the
# inverse of webdataset_manifest's writer arithmetic, so the two can
# be tested against each other. Members whose headers lie beyond the
# hex window NULL-absorb (walk parks), archives that aren't tar
# contribute no rows.

TAR_WINDOW_BYTES = 8192
TAR_MAX_MEMBERS = 8
_USTAR_MAGIC_HEX = "7573746172"   # 'ustar' (POSIX \0 or GNU ' ' follows)


def _octal11(hx: Column, pos: Column) -> Column:
    """Exact integer from 11 ASCII-octal digits at hex-char `pos`
    (the %011o field format every mainstream tar writer emits);
    NULL if any byte is not an octal digit."""
    v = None
    ok = None
    for i in range(11):
        d = _hex2long(hx, pos + F.lit(2 * i), 2) - F.lit(48)
        c = d.between(0, 7)
        ok = c if ok is None else ok & c
        v = d if v is None else v * F.lit(8) + d
    return F.when(ok, v)


def tar_structure(df: DataFrame, bytes_col: str = "bytes",
                  keep: list[str] | None = None) -> DataFrame:
    """One row per tar member: (keep..., member_idx, name, typeflag,
    size_bytes, data_offset) — names NUL-terminated and printable-
    validated before decode, sizes exact octal integers, typeflag
    '0' for the old-tar NUL convention, data_offset in bytes from
    archive start. The walk requires the ustar magic per header and
    parks at the end-of-archive zero block."""
    keep = list(keep or ["doc_id"])
    staged = df.select(
        *keep, F.hex(F.substring(F.col(bytes_col), 1, TAR_WINDOW_BYTES)).alias("__tx")
    )
    hx = F.col("__tx")

    def hop(acc, _i):
        pos = acc["pos"]
        name0 = hx.substr(pos, F.lit(2))
        magic_ok = hx.substr(pos + F.lit(514), F.lit(10)) == _USTAR_MAGIC_HEX
        size = _octal11(hx, pos + F.lit(248))
        valid = (name0 != "") & (name0 != "00") & magic_ok & size.isNotNull()
        blocks = ((size + F.lit(511)) / F.lit(512)).cast("long")
        nxt = F.when(valid, pos + F.lit(1024) + F.lit(1024) * blocks).otherwise(pos)
        members = F.when(
            valid, F.concat(acc["members"], F.array(pos))
        ).otherwise(acc["members"])
        return F.struct(nxt.alias("pos"), members.alias("members"))

    acc0 = F.struct(
        F.lit(1).cast("long").alias("pos"),
        F.array().cast("array<long>").alias("members"),
    )
    walk = F.aggregate(
        F.sequence(F.lit(1), F.lit(TAR_MAX_MEMBERS)), acc0, hop)["members"]
    rows = staged.select(
        *keep, "__tx", F.posexplode(walk).alias("member_idx", "__mp")
    )
    p = F.col("__mp")
    name_hex = F.regexp_extract(
        hx.substr(p, F.lit(200)), "^((?:[0-9A-F]{2})*?)00", 1)
    name = F.when(
        (name_hex != "") & name_hex.rlike(_PRINTABLE_HEX_RE),
        F.decode(F.unhex(name_hex), "UTF-8"),
    )
    tf_hex = hx.substr(p + F.lit(312), F.lit(2))
    typeflag = F.when(tf_hex == "00", F.lit("0")).otherwise(
        F.decode(F.unhex(tf_hex), "UTF-8"))
    return rows.select(
        *keep,
        F.col("member_idx").cast("int").alias("member_idx"),
        name.alias("name"),
        typeflag.alias("typeflag"),
        _octal11(hx, p + F.lit(248)).alias("size_bytes"),
        ((p - F.lit(1)) / F.lit(2)).cast("long").alias("header_offset"),
        (((p - F.lit(1)) / F.lit(2)).cast("long") + F.lit(512)).alias("data_offset"),
    ).drop("__tx")


def _octal11_sql(h: str, pos_expr: str) -> str:
    digs = [
        f"(TRY_CAST(concat('0x', substring({h}, ({pos_expr}) + {2 * i}, 2))"
        f" AS BIGINT) - 48)"
        for i in range(11)
    ]
    ok = " AND ".join(f"{d} BETWEEN 0 AND 7" for d in digs)
    val = digs[0]
    for d in digs[1:]:
        val = f"({val} * 8 + {d})"
    return f"CASE WHEN {ok} THEN {val} END"


def tar_structure_sql(src: str, keep: str = "doc_id", h_col: str = "h") -> str:
    """DuckDB replay of :func:`tar_structure` — linear CTE chain, one
    MATERIALIZED CTE per member hop. Materialization is load-bearing
    twice over: the size expression would otherwise inline ~3x into
    the next hop's pos (exponential expression growth over 8 hops),
    and the final UNION references the last CTE once per member arm
    (DuckDB 1.0 inlines multi-referenced CTEs — the seed_distance
    lesson)."""
    ctes = [f"""tr0 AS MATERIALIZED (
          SELECT {keep}, {h_col} AS h, CAST(1 AS BIGINT) AS pos,
                 {", ".join(f"CAST(NULL AS BIGINT) AS m{j + 1}"
                            for j in range(TAR_MAX_MEMBERS))}
          FROM {src}
        )"""]
    for k in range(TAR_MAX_MEMBERS):
        size = _octal11_sql("h", "pos + 248")
        valid = (f"substring(h, pos, 2) <> '' AND substring(h, pos, 2) <> '00'"
                 f" AND substring(h, pos + 514, 10) = '{_USTAR_MAGIC_HEX}'"
                 f" AND sz IS NOT NULL")
        carries = ", ".join(
            f"m{j + 1}" for j in range(TAR_MAX_MEMBERS) if j != k
        )
        ctes.append(f"""tr{k + 1} AS MATERIALIZED (
          SELECT {keep}, h,
                 CASE WHEN {valid}
                   THEN pos + 1024 + 1024 * ((sz + 511) // 512)
                   ELSE pos END AS pos,
                 CASE WHEN {valid} THEN pos END AS m{k + 1}{"," if carries else ""}
                 {carries}
          FROM (SELECT *, {size} AS sz FROM tr{k}) tr{k}s)""")
    last = f"tr{TAR_MAX_MEMBERS}"
    arms = []
    for k in range(TAR_MAX_MEMBERS):
        p = f"m{k + 1}"
        name_hex = (f"regexp_extract(substring(h, {p}, 200),"
                    f" '^((?:[0-9A-F]{{2}})*?)00', 1)")
        arms.append(f"""
        SELECT {keep}, CAST({k} AS INT) AS member_idx,
               CASE WHEN {name_hex} <> ''
                     AND regexp_matches({name_hex}, '{_PRINTABLE_HEX_RE}')
                    THEN decode(unhex({name_hex})) END AS name,
               CASE WHEN substring(h, {p} + 312, 2) = '00' THEN '0'
                    ELSE decode(unhex(substring(h, {p} + 312, 2))) END
                 AS typeflag,
               {_octal11_sql("h", f"{p} + 248")} AS size_bytes,
               CAST(({p} - 1) // 2 AS BIGINT) AS header_offset,
               CAST(({p} - 1) // 2 + 512 AS BIGINT) AS data_offset
        FROM {last} WHERE {p} IS NOT NULL""")
    union = " UNION ALL ".join(f"SELECT * FROM ({a.strip()}) u{i}"
                               for i, a in enumerate(arms))
    return "WITH " + ", ".join(ctes) + " " + union


# ---- zstd frame header (RFC 8878) -------------------------------------------------
#
# Zstandard is the compression of modern data releases (.tar.zst
# shards, zstd-parquet, zstd WARCs), and its frame header declares
# exactly what a pipeline wants to know before spending a decode:
# the DECOMPRESSED content size (costing), the dictionary id (a
# frame compressed against a dictionary is undecodable without it —
# a real failure mode for shared-dictionary WARC archives), the
# window log (decoder memory budget), and whether a content
# checksum trails the frame. All in the first ≤ 18 bytes.

def zstd_structure(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Add (fmt, single_segment, has_checksum, window_log, dict_id,
    content_size) from the zstd frame header. content_size is NULL
    when the frame doesn't declare it (fcs flag 0 without the
    single-segment shortcut); dict_id NULL when undeclared;
    window_log NULL in single-segment frames (the content size IS
    the window). The 2-byte fcs format's +256 bias is applied per
    spec."""
    staged = df.withColumns(
        {
            "__zx": F.hex(F.substring(F.col(bytes_col), 1, 20)),
            "fmt": sniffed_type(F.col(bytes_col)),
        }
    )
    hx = F.col("__zx")
    is_z = F.col("fmt") == "zstd"
    fhd = F.when(is_z, _hex2long(hx, F.lit(9), 2))
    s1 = staged.withColumn("__fhd", fhd)
    fhd = F.col("__fhd")
    fcs_flag = _bits(fhd, 6, 3)
    ss = _bits(fhd, 5, 1) == 1
    did_flag = _bits(fhd, 0, 3)
    did_bytes = F.when(did_flag == 3, F.lit(4)).otherwise(did_flag)
    wd_bytes = F.when(ss, F.lit(0)).otherwise(F.lit(1))
    fcs_bytes = (
        F.when(fcs_flag == 0, F.when(ss, F.lit(1)).otherwise(F.lit(0)))
        .when(fcs_flag == 1, F.lit(2))
        .when(fcs_flag == 2, F.lit(4))
        .otherwise(F.lit(8))
    )
    wd_pos = F.lit(11)
    did_pos = wd_pos + 2 * wd_bytes
    fcs_pos = did_pos + 2 * did_bytes
    wd = _hex2long(hx, wd_pos, 2)
    s2 = s1.withColumns(
        {
            "single_segment": F.when(fhd.isNotNull(), ss),
            "has_checksum": F.when(fhd.isNotNull(), _bits(fhd, 2, 1) == 1),
            "window_log": F.when(
                fhd.isNotNull() & ~ss, (F.lit(10) + _bits(wd, 3, 31))
            ).cast("int"),
            "dict_id": F.when(did_bytes > 0, _le_col(hx, did_pos, did_bytes)),
            "content_size": F.when(
                fcs_bytes > 0,
                _le_col(hx, fcs_pos, fcs_bytes)
                + F.when(fcs_bytes == 2, F.lit(256)).otherwise(F.lit(0)),
            ),
        }
    )
    return s2.drop("__zx", "__fhd")


def _le_col(hx: Column, pos: Column, n_bytes: Column) -> Column:
    """Little-endian read whose LENGTH is itself a column (bounded
    8 bytes) — a when-chain over the possible widths."""
    out = F.lit(None).cast("long")
    for n in (1, 2, 4, 8):
        out = F.when(n_bytes == n, _le(hx, pos, n)).otherwise(out)
    return out


def zstd_structure_sql(src: str, keep: str = "doc_id", h_col: str = "h",
                       fmt_col: str = "fmt") -> str:
    """DuckDB replay of :func:`zstd_structure`."""
    def le_var(pos: str, n: str) -> str:
        arms = " ".join(
            f"WHEN {w} THEN {_le_sql_var('h', pos, w)}" for w in (1, 2, 4, 8)
        )
        return f"CASE {n} {arms} END"

    return f"""
        WITH zs0 AS (
          SELECT {keep}, {fmt_col} AS fmt, {h_col} AS h,
                 CASE WHEN {fmt_col} = 'zstd' THEN
                   TRY_CAST(concat('0x', substring({h_col}, 9, 2)) AS BIGINT)
                 END AS fhd
          FROM {src}
        ), zs1 AS (
          SELECT *, (fhd // 64) % 4 AS fcs_flag,
                 (fhd // 32) % 2 = 1 AS ss,
                 (fhd // 4) % 2 = 1 AS cks,
                 CASE WHEN fhd % 4 = 3 THEN 4 ELSE fhd % 4 END AS did_bytes
          FROM zs0
        ), zs2 AS (
          SELECT *, CASE WHEN ss THEN 0 ELSE 1 END AS wd_bytes,
                 CASE fcs_flag WHEN 0 THEN CASE WHEN ss THEN 1 ELSE 0 END
                      WHEN 1 THEN 2 WHEN 2 THEN 4 ELSE 8 END AS fcs_bytes
          FROM zs1
        ), zs3 AS (
          SELECT *, 11 + 2 * wd_bytes AS did_pos FROM zs2
        ), zs4 AS (
          SELECT *, did_pos + 2 * did_bytes AS fcs_pos FROM zs3
        )
        SELECT {keep}, fmt,
               CASE WHEN fhd IS NOT NULL THEN ss END AS single_segment,
               CASE WHEN fhd IS NOT NULL THEN cks END AS has_checksum,
               CAST(CASE WHEN fhd IS NOT NULL AND NOT ss THEN
                 10 + (TRY_CAST(concat('0x', substring(h, 11, 2)) AS BIGINT)
                       // 8) % 32 END AS INT) AS window_log,
               CASE WHEN did_bytes > 0
                 THEN {le_var('did_pos', 'did_bytes')} END AS dict_id,
               CASE WHEN fcs_bytes > 0
                 THEN {le_var('fcs_pos', 'fcs_bytes')}
                      + CASE WHEN fcs_bytes = 2 THEN 256 ELSE 0 END
               END AS content_size
        FROM zs4
    """


# ---- parquet file audit -----------------------------------------------------------
#
# The lakehouse's own file format, auditable decode-free: 'PAR1' at
# both ends (a missing tail magic is a torn upload — the object-
# store failure payload_complete catches for images), and the LE32
# at end-8 declaring the thrift footer's length. footer_bytes vs
# file size bounds metadata bloat (tiny files with huge footers are
# the small-file problem made visible in one projection).

def parquet_structure(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Add (fmt, file_bytes, tail_magic_ok, footer_bytes, complete)
    from the head and the LAST 8 bytes only."""
    b = F.col(bytes_col)
    nbytes = F.octet_length(b).cast("long")
    tail = F.hex(b.substr(F.greatest(nbytes - F.lit(7), F.lit(1)).cast("int"),
                          F.lit(8)))
    staged = df.withColumns(
        {
            "fmt": sniffed_type(b),
            "file_bytes": nbytes,
            "__pt": tail,
        }
    )
    is_pq = F.col("fmt") == "parquet"
    tail_ok = F.col("__pt").endswith("50415231")
    footer = _le(F.col("__pt"), F.lit(1), 4)
    s = staged.withColumns(
        {
            "tail_magic_ok": F.when(is_pq, tail_ok),
            "footer_bytes": F.when(is_pq & tail_ok, footer),
        }
    )
    return s.withColumn(
        "complete",
        F.when(
            is_pq,
            tail_ok & (F.col("footer_bytes") + F.lit(12) <= F.col("file_bytes")),
        ),
    ).drop("__pt")


def parquet_structure_sql(src: str, keep: str = "doc_id", h_col: str = "h",
                          fmt_col: str = "fmt") -> str:
    """DuckDB replay of :func:`parquet_structure` over the FULL
    payload hex (oracle fixtures are small; the tail window is the
    last 16 hex chars)."""
    tail = f"substring({h_col}, greatest(strlen({h_col}) - 15, 1), 16)"
    return f"""
        WITH pq0 AS (
          SELECT {keep}, {fmt_col} AS fmt,
                 CAST(strlen({h_col}) // 2 AS BIGINT) AS file_bytes,
                 {tail} AS pt
          FROM {src}
        ), pq1 AS (
          SELECT *, CASE WHEN fmt = 'parquet'
                   THEN ends_with(pt, '50415231') END AS tail_magic_ok,
                 CASE WHEN fmt = 'parquet' AND ends_with(pt, '50415231')
                   THEN {_le_sql_var('pt', '1', 4)} END AS footer_bytes
          FROM pq0
        )
        SELECT {keep}, fmt, file_bytes, tail_magic_ok, footer_bytes,
               CASE WHEN fmt = 'parquet' THEN
                 COALESCE(tail_magic_ok, false)
                 AND footer_bytes + 12 <= file_bytes END AS complete
        FROM pq1
    """


# ---- ID3v2 text frames (audio captions) -------------------------------------------
#
# The text a podcast/music corpus pairs with its audio lives in the
# ID3v2 tag's T-frames — TIT2 (title), TPE1 (artist), TALB (album),
# and friends — the audio analog of <img alt>: editorial text,
# already attached, no ASR needed. Frames walk like tar members:
# 4-char ASCII id, a size that is BE32 in v2.3 but SYNCSAFE in v2.4
# (the classic cross-version bug — a v2.4 tag read with v2.3 sizes
# walks into garbage), 2 flag bytes, then the payload whose first
# byte names the text encoding (0 latin1, 3 utf-8 → decoded;
# 1/2 UTF-16 → NULL-absorbed, documented). The walk parks at the
# padding (zero bytes fail the id grammar) or at anything that is
# not a frame id — including the first MPEG audio byte.

ID3_MAX_FRAMES = 8
_ID3_FID_RE = "^(?:3[0-9]|4[1-9A-F]|5[0-9A]){4}$"
#: structural UTF-8 over hex pairs: printable ASCII or complete
#: 2/3/4-byte sequences (whole code points per alternative, so the
#: match is unambiguous); lone continuation bytes and C0/C1 overlongs
#: fail. Latin-1 payloads (enc 0) validate ASCII-printable only —
#: a 0xE9 'é' in latin-1 is NOT valid UTF-8 and decode() would
#: mangle it, so such rows NULL-absorb (documented).
_UTF8_HEX_RE = ("^(?:2[0-9A-F]|[3-6][0-9A-F]|7[0-9A-E]"
                "|(?:C[2-9A-F]|D[0-9A-F])[89AB][0-9A-F]"
                "|E[0-9A-F](?:[89AB][0-9A-F]){2}"
                "|F[0-7](?:[89AB][0-9A-F]){3})+$")


def _id3_syncsafe(hx: Column, pos: Column) -> Column:
    v = None
    for i in range(4):
        d = _hex2long(hx, pos + F.lit(2 * i), 2) % 128
        v = d if v is None else v * F.lit(128) + d
    return v


def id3_text_frames(df: DataFrame, bytes_col: str = "bytes",
                    keep: list[str] | None = None) -> DataFrame:
    """One row per ID3v2 TEXT frame: (keep..., frame_idx, frame_id,
    text) — only latin-1/UTF-8 payloads decode (printable-validated,
    trailing NULs trimmed); non-mp3 rows and non-T frames contribute
    nothing."""
    keep = list(keep or ["doc_id"])
    staged = df.select(
        *keep,
        F.hex(F.substring(F.col(bytes_col), 1, MP3_WINDOW_BYTES)).alias("__ix"),
        sniffed_type(F.col(bytes_col)).alias("__fmt"),
    )
    hx = F.col("__ix")
    v24 = _hex2long(hx, F.lit(7), 2) == 4

    def fsize(pos):
        return F.when(v24, _id3_syncsafe(hx, pos + F.lit(8))).otherwise(
            _be(hx, pos + F.lit(8)))

    def hop(acc, _i):
        pos = acc["pos"]
        fid = hx.substr(pos, F.lit(8))
        size = fsize(pos)
        valid = fid.rlike(_ID3_FID_RE) & size.isNotNull() & (size > 0)
        nxt = F.when(valid, pos + F.lit(20) + F.lit(2) * size).otherwise(pos)
        frames = F.when(
            valid, F.concat(acc["frames"], F.array(pos))
        ).otherwise(acc["frames"])
        return F.struct(nxt.alias("pos"), frames.alias("frames"))

    # Header flags bit 6 (ID3v2.[34].0 §3.1) announces an extended
    # header at byte 10; skip it before the first frame hop or the
    # frame-id grammar fails immediately on its size bytes. v2.4's
    # size is syncsafe and INCLUDES the whole extended header; v2.3's
    # is BE32 and EXCLUDES its own 4 size bytes.
    flags = _hex2long(hx, F.lit(11), 2)
    has_ext = (flags % 128) >= 64
    ext_bytes = (
        F.when(has_ext & v24, _id3_syncsafe(hx, F.lit(21)))
        .when(has_ext, F.lit(4) + _be(hx, F.lit(21)))
        .otherwise(F.lit(0))
    )
    acc0 = F.struct(
        (F.lit(21) + F.lit(2) * ext_bytes).cast("long").alias("pos"),
        F.array().cast("array<long>").alias("frames"),
    )
    walk = F.when(
        F.col("__fmt") == "mp3",
        F.aggregate(F.sequence(F.lit(1), F.lit(ID3_MAX_FRAMES)), acc0, hop)["frames"],
    ).otherwise(F.array().cast("array<long>"))
    rows = staged.select(
        *keep, "__ix", F.posexplode(walk).alias("frame_idx", "__fp")
    )
    p = F.col("__fp")
    fid_txt = F.decode(F.unhex(hx.substr(p, F.lit(8))), "UTF-8")
    size = F.when(v24, _id3_syncsafe(hx, p + F.lit(8))).otherwise(
        _be(hx, p + F.lit(8)))
    enc = _hex2long(hx, p + F.lit(20), 2)
    body = F.regexp_replace(
        hx.substr(p + F.lit(22), (F.lit(2) * (size - F.lit(1))).cast("int")),
        "(?:00)+$", "")
    text = F.when(
        (body != "")
        & (
            ((enc == 0) & body.rlike(_PRINTABLE_HEX_RE))
            | ((enc == 3) & body.rlike(_UTF8_HEX_RE))
        ),
        F.decode(F.unhex(body), "UTF-8"),
    )
    return rows.where(fid_txt.startswith("T")).select(
        *keep,
        F.col("frame_idx").cast("int").alias("frame_idx"),
        fid_txt.alias("frame_id"),
        text.alias("text"),
    )


def _be(hx: Column, pos: Column) -> Column:
    return _hex2long(hx, pos, 8)


def id3_text_frames_sql(src: str, keep: str = "doc_id",
                        h_col: str = "h", fmt_col: str = "fmt") -> str:
    """DuckDB replay of :func:`id3_text_frames` — MATERIALIZED hop
    CTEs (the tar_structure lesson: stop both the per-hop size
    expression inlining and the union arms re-inlining the chain)."""
    v24 = "TRY_CAST(concat('0x', substring(h, 7, 2)) AS BIGINT) = 4"

    def syncsafe(pos: str) -> str:
        terms = [
            f"(TRY_CAST(concat('0x', substring(h, ({pos}) + {2 * i}, 2))"
            f" AS BIGINT) % 128) * {128 ** (3 - i)}"
            for i in range(4)
        ]
        return "(" + " + ".join(terms) + ")"

    def fsize(pos: str) -> str:
        return (f"CASE WHEN {v24} THEN {syncsafe(f'({pos}) + 8')}"
                f" ELSE TRY_CAST(concat('0x', substring(h, ({pos}) + 8, 8))"
                f" AS BIGINT) END")

    flags = "TRY_CAST(concat('0x', substring(h, 11, 2)) AS BIGINT)"
    has_ext = f"({flags} % 128) >= 64"
    ext_bytes = (
        f"CASE WHEN {has_ext} AND {v24} THEN {syncsafe('21')}"
        f" WHEN {has_ext} THEN 4 + TRY_CAST(concat('0x',"
        f" substring(h, 21, 8)) AS BIGINT) ELSE 0 END"
    )
    ctes = [f"""id0 AS MATERIALIZED (
          SELECT {keep}, {h_col} AS h, {fmt_col} AS fmt,
                 CAST(21 + 2 * ({ext_bytes}) AS BIGINT) AS pos,
                 {", ".join(f"CAST(NULL AS BIGINT) AS f{j + 1}"
                            for j in range(ID3_MAX_FRAMES))}
          FROM {src}
        )"""]
    for k in range(ID3_MAX_FRAMES):
        valid = (f"fmt = 'mp3' AND regexp_matches(substring(h, pos, 8),"
                 f" '{_ID3_FID_RE}') AND sz IS NOT NULL AND sz > 0")
        carries = ", ".join(
            f"f{j + 1}" for j in range(ID3_MAX_FRAMES) if j != k
        )
        ctes.append(f"""id{k + 1} AS MATERIALIZED (
          SELECT {keep}, h, fmt,
                 CASE WHEN {valid} THEN pos + 20 + 2 * sz ELSE pos END AS pos,
                 CASE WHEN {valid} THEN pos END AS f{k + 1}{"," if carries else ""}
                 {carries}
          FROM (SELECT *, {fsize('pos')} AS sz FROM id{k}) id{k}s)""")
    last = f"id{ID3_MAX_FRAMES}"
    arms = []
    for k in range(ID3_MAX_FRAMES):
        p = f"f{k + 1}"
        body = (f"regexp_replace(substring(h, {p} + 22,"
                f" CAST(2 * ({fsize(p)} - 1) AS INT)), '(?:00)+$', '')")
        arms.append(f"""
        SELECT {keep}, CAST({k} AS INT) AS frame_idx,
               decode(unhex(substring(h, {p}, 8))) AS frame_id,
               CASE WHEN {body} <> '' AND (
                      (TRY_CAST(concat('0x', substring(h, {p} + 20, 2))
                         AS BIGINT) = 0
                       AND regexp_matches({body}, '{_PRINTABLE_HEX_RE}'))
                      OR
                      (TRY_CAST(concat('0x', substring(h, {p} + 20, 2))
                         AS BIGINT) = 3
                       AND regexp_matches({body}, '{_UTF8_HEX_RE}')))
                    THEN decode(unhex({body})) END AS text
        FROM {last} WHERE {p} IS NOT NULL
          AND starts_with(decode(unhex(substring(h, {p}, 8))), 'T')""")
    union = " UNION ALL ".join(f"SELECT * FROM ({a.strip()}) v{i}"
                               for i, a in enumerate(arms))
    return "WITH " + ", ".join(ctes) + " " + union


# ---- composed audio admission ----------------------------------------------------
#
# The audio-store admission verdict, the audio analog of
# payload_admission: magic sniff (is it audio at all) → container
# structure (is the codec decodable, is the stream described) →
# quality gates (sample rate floor for ASR, duration band, bitrate
# floor). Cheapest-rejection precedence, physically ONE projection
# per tier over the same header bytes.

AUDIO_MIN_SAMPLE_RATE = 16000     # ASR models' common floor
AUDIO_MIN_MS = 1000
AUDIO_MAX_MS = 4 * 3600 * 1000
AUDIO_MIN_KBPS = 32
_WAV_ADMIT_CODECS = ("pcm", "ieee_float")


def audio_admission(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Add (fmt, verdict, admit): route each payload through the
    wav/mp3 header tiers and gate on codec, sample rate, duration
    and bitrate. Verdicts: not_audio / no_fmt_chunk /
    codec_unsupported / low_sample_rate / no_duration / too_short /
    too_long (wav); no_sync / unknown_bitrate / low_bitrate /
    low_sample_rate (mp3); admit."""
    w = wav_structure(df, bytes_col).withColumnsRenamed(
        {"sample_rate": "wav_sr", "codec": "wav_codec",
         "duration_ms": "wav_ms"}
    ).drop("channels", "bits_per_sample", "data_bytes", "fmt")
    m = mp3_structure(w, bytes_col).withColumnsRenamed(
        {"sample_rate": "mp3_sr"}
    )
    wav_verdict = (
        F.when(F.col("wav_codec").isNull(), "no_fmt_chunk")
        .when(~F.col("wav_codec").isin(*_WAV_ADMIT_CODECS),
              "codec_unsupported")
        .when(F.col("wav_sr") < AUDIO_MIN_SAMPLE_RATE, "low_sample_rate")
        .when(F.col("wav_ms").isNull(), "no_duration")
        .when(F.col("wav_ms") < AUDIO_MIN_MS, "too_short")
        .when(F.col("wav_ms") > AUDIO_MAX_MS, "too_long")
        .otherwise("admit")
    )
    mp3_verdict = (
        F.when(F.col("mpeg_version").isNull(), "no_sync")
        .when(F.col("bitrate_kbps").isNull(), "unknown_bitrate")
        .when(F.col("bitrate_kbps") < AUDIO_MIN_KBPS, "low_bitrate")
        .when(F.col("mp3_sr") < AUDIO_MIN_SAMPLE_RATE, "low_sample_rate")
        .otherwise("admit")
    )
    verdict = (
        F.when(F.col("fmt") == "wav", wav_verdict)
        .when(F.col("fmt") == "mp3", mp3_verdict)
        .otherwise("not_audio")
    )
    return m.withColumns(
        {"verdict": verdict, "admit": verdict == "admit"}
    )


def audio_admission_sql(src: str, keep: str = "doc_id", h_col: str = "h",
                        fmt_col: str = "fmt") -> str:
    """DuckDB replay of :func:`audio_admission` — the wav and mp3
    fragments joined on `keep` (both are per-row projections of the
    same staged relation), same verdict precedence."""
    wavf = wav_structure_sql(src, keep, h_col, fmt_col)
    mp3f = mp3_structure_sql(src, keep, h_col, fmt_col)
    codecs = ", ".join(f"'{c}'" for c in _WAV_ADMIT_CODECS)
    return f"""
        WITH aa_w AS ({wavf}), aa_m AS ({mp3f}), aa_j AS (
          SELECT w.{keep}, w.fmt, w.codec AS wav_codec,
                 w.sample_rate AS wav_sr, w.duration_ms AS wav_ms,
                 m.mpeg_version, m.bitrate_kbps, m.sample_rate AS mp3_sr
          FROM aa_w w JOIN aa_m m USING ({keep})
        ), aa_v AS (
          SELECT *,
            CASE WHEN fmt = 'wav' THEN
              CASE WHEN wav_codec IS NULL THEN 'no_fmt_chunk'
                   WHEN wav_codec NOT IN ({codecs}) THEN 'codec_unsupported'
                   WHEN wav_sr < {AUDIO_MIN_SAMPLE_RATE}
                     THEN 'low_sample_rate'
                   WHEN wav_ms IS NULL THEN 'no_duration'
                   WHEN wav_ms < {AUDIO_MIN_MS} THEN 'too_short'
                   WHEN wav_ms > {AUDIO_MAX_MS} THEN 'too_long'
                   ELSE 'admit' END
            WHEN fmt = 'mp3' THEN
              CASE WHEN mpeg_version IS NULL THEN 'no_sync'
                   WHEN bitrate_kbps IS NULL THEN 'unknown_bitrate'
                   WHEN bitrate_kbps < {AUDIO_MIN_KBPS} THEN 'low_bitrate'
                   WHEN mp3_sr < {AUDIO_MIN_SAMPLE_RATE}
                     THEN 'low_sample_rate'
                   ELSE 'admit' END
            ELSE 'not_audio' END AS verdict
          FROM aa_j
        )
        SELECT {keep}, fmt, verdict, verdict = 'admit' AS admit FROM aa_v
    """


# ---- ZIP end-of-central-directory audit -------------------------------------------
#
# The other dataset container (Kaggle dumps, scraped archives).
# Unlike tar, zip's table of contents lives at the END: the EOCD
# record (PK\\x05\\x06) in the last ~64 KiB names the entry count and
# where the central directory starts — so a consumer seeks, never
# scans. The audit reads the TAIL (the payload_complete discipline),
# finds the LAST aligned EOCD signature (a comment containing the
# signature bytes earlier in the tail must not win), and checks the
# central directory lies within the file.

ZIP_TAIL_BYTES = 1024
ZIP_EOCD_ATTEMPTS = 4
_EOCD_SIG = "504B0506"


def zip_structure(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Add (fmt, file_bytes, has_eocd, n_entries, cd_offset,
    cd_bytes, complete) from the last ZIP_TAIL_BYTES only.

    EOCD candidates are validated the way Info-ZIP does: a signature
    only counts if its comment-length field closes the file exactly
    (candidate_offset + 22 + comment_len == file_size) — a stray
    PK\x05\x06 inside the archive comment (or inside member data)
    fails that equation and the scan steps back to the previous
    aligned candidate (bounded ZIP_EOCD_ATTEMPTS steps, pinned in
    tests with a planted fake-signature comment)."""
    b = F.col(bytes_col)
    nbytes = F.octet_length(b).cast("long")
    tail_start = F.greatest(nbytes - F.lit(ZIP_TAIL_BYTES - 1), F.lit(1))
    staged = df.withColumns(
        {
            "fmt": sniffed_type(b),
            "file_bytes": nbytes,
            "__zt": F.hex(b.substr(tail_start.cast("int"),
                                   F.lit(ZIP_TAIL_BYTES))),
            "__toff": tail_start - F.lit(1),
        }
    )
    hx = F.col("__zt")
    is_zip = F.col("fmt") == "zip"

    def hop(acc, _i):
        done = acc["found"].isNotNull() | (acc["slen"] <= 0)
        seg = hx.substr(F.lit(1), acc["slen"].cast("int"))
        pre = F.regexp_extract(seg, "^((?:[0-9A-F]{2})*)" + _EOCD_SIG, 1)
        matched = seg.rlike(_EOCD_SIG)
        p = F.length(pre) + F.lit(1)
        clen = _le(hx, p + F.lit(40), 2)
        valid = (
            F.col("__toff") + (p - F.lit(1)) / F.lit(2) + F.lit(22) + clen
            == F.col("file_bytes")
        )
        nfound = F.when(matched & valid, p)
        nslen = F.when(matched, F.length(pre)).otherwise(F.lit(0))
        return F.struct(
            F.when(done, acc["found"]).otherwise(nfound).alias("found"),
            F.when(done, F.lit(0).cast("long"))
            .otherwise(nslen.cast("long")).alias("slen"),
        )

    acc0 = F.struct(
        F.lit(None).cast("long").alias("found"),
        F.length(hx).cast("long").alias("slen"),
    )
    eocd = F.when(
        is_zip,
        F.aggregate(F.sequence(F.lit(1), F.lit(ZIP_EOCD_ATTEMPTS)),
                    acc0, hop)["found"],
    )
    s1 = staged.withColumn("__ep", eocd)
    p = F.col("__ep")
    out = s1.withColumns(
        {
            "has_eocd": F.when(is_zip, p.isNotNull()),
            "n_entries": _le(hx, p + F.lit(20), 2).cast("long"),
            "cd_offset": _le(hx, p + F.lit(32), 4),
            "cd_bytes": _le(hx, p + F.lit(24), 4),
        }
    )
    eocd_abs = F.col("__toff") + (p - F.lit(1)) / F.lit(2)
    return out.withColumn(
        "complete",
        F.when(
            is_zip,
            F.coalesce(
                (F.col("cd_offset") + F.col("cd_bytes") <= eocd_abs),
                F.lit(False),
            ),
        ),
    ).drop("__zt", "__toff", "__ep")


def zip_structure_sql(src: str, keep: str = "doc_id", h_col: str = "h",
                      fmt_col: str = "fmt") -> str:
    """DuckDB replay of :func:`zip_structure` over the FULL payload
    hex (oracle fixtures fit the tail window, so toff = 0) — same
    comment-length candidate validation, MATERIALIZED hop CTEs."""
    ctes = [f"""ze0 AS MATERIALIZED (
          SELECT {keep}, {fmt_col} AS fmt, {h_col} AS h,
                 CAST(strlen({h_col}) // 2 AS BIGINT) AS file_bytes,
                 CAST(NULL AS BIGINT) AS found,
                 CAST(strlen({h_col}) AS BIGINT) AS slen
          FROM {src}
        )"""]
    for k in range(ZIP_EOCD_ATTEMPTS):
        pre = (f"regexp_extract(substring(h, 1, CAST(slen AS INT)),"
               f" '^((?:[0-9A-F]{{2}})*){_EOCD_SIG}', 1)")
        clen = _le_sql_var("h", "strlen(pre) + 1 + 40", 2)
        ctes.append(f"""ze{k + 1} AS MATERIALIZED (
          SELECT {keep}, fmt, h, file_bytes,
                 CASE WHEN found IS NOT NULL OR slen <= 0 THEN found
                      WHEN matched AND (strlen(pre)) // 2 + 22 + {clen}
                            = file_bytes
                        THEN strlen(pre) + 1 END AS found,
                 CASE WHEN found IS NOT NULL OR slen <= 0 THEN 0
                      WHEN matched THEN strlen(pre) ELSE 0 END AS slen
          FROM (SELECT *, {pre} AS pre,
                       regexp_matches(substring(h, 1, CAST(slen AS INT)),
                                      '{_EOCD_SIG}') AS matched
                FROM ze{k}) ze{k}s)""")
    last = f"ze{ZIP_EOCD_ATTEMPTS}"
    return f"""
        WITH {", ".join(ctes)}, zef AS (
          SELECT {keep}, fmt, h, file_bytes,
                 CASE WHEN fmt = 'zip' THEN found END AS ep
          FROM {last}
        ), zev AS (
          SELECT *, {_le_sql_var('h', 'ep + 20', 2)} AS n_entries,
                 {_le_sql_var('h', 'ep + 24', 4)} AS cd_bytes,
                 {_le_sql_var('h', 'ep + 32', 4)} AS cd_offset
          FROM zef
        )
        SELECT {keep}, fmt, file_bytes,
               CASE WHEN fmt = 'zip' THEN ep IS NOT NULL END AS has_eocd,
               CAST(n_entries AS BIGINT) AS n_entries, cd_offset, cd_bytes,
               CASE WHEN fmt = 'zip' THEN
                 COALESCE(cd_offset + cd_bytes <= (ep - 1) // 2, false)
               END AS complete
        FROM zev
    """
