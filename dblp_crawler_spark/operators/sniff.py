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
    ("mp4", [(9, "66747970")]),                # 'ftyp' at byte 4
    ("bmp", [(1, "424D")]),
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
