"""Order-independent table content checksums (replication validation).

The DMS feature this replicates: task-level table VALIDATION —
after full load + CDC, prove source and target hold the same rows
without moving either table (AWS DMS "ValidationEnabled"; the
reference pipeline leaves it to the operator — README's
data-viewing steps — so this is the engine-native version).

Design for 100 TB:

- Each row folds to a 60-bit digest of a CANONICAL string encoding
  (stable across engines: integers verbatim, doubles via
  DECIMAL(38,6), timestamps via epoch-µs, NULL via a sentinel), so
  the same logical row digests identically in Spark, DuckDB, or any
  SQL engine — that is what makes cross-system validation possible.
- The table checksum is the exact SUM of row digests as
  DECIMAL(38,0): commutative and associative, so Spark computes it
  with map-side partial aggregation and NO shuffle of data — one
  scan, one scalar per partition, one merged row out. Unlike XOR,
  SUM also catches duplicate-row-count changes.
- Comparing two 100 TB tables costs two independent scans and
  exchanges ~48 bytes, not a sort-merge of either.

Sum capacity: 2^60-max digests × rows stay inside DECIMAL(38,0)
for ~10^20 rows — not a practical bound.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ASCII unit/record separators: valid inside SQL string literals in
# both engines (NUL would not be), vanishingly unlikely in data
_NULL = "\x1eNULL\x1e"
_SEP = "\x1f"


def _canon(df: DataFrame, c: str) -> Column:
    """Canonical cross-engine string form of one column."""
    t = df.schema[c].dataType
    col = F.col(c)
    if isinstance(t, (T.TimestampType, T.TimestampNTZType)):
        # NTZ → TZ is a UTC reinterpretation under the engine's fixed
        # UTC session timezone, so both forms digest to the same µs
        if isinstance(t, T.TimestampNTZType):
            col = col.cast("timestamp")
        s = F.unix_micros(col).cast("string")
    elif isinstance(t, (T.DoubleType, T.FloatType)):
        # DECIMAL(38,6) spans |x| < 1e32 — far past any double that
        # survives a µs-exact pipeline. The narrower DECIMAL(18,6)
        # silently NULL'd |x| >= 1e12 under Spark's non-ANSI cast
        # (false-pass: overflow digested identically to genuine NULL)
        # while DuckDB's CAST errored — a cross-engine divergence.
        s = col.cast("decimal(38,6)").cast("string")
    elif isinstance(t, T.DateType):
        s = F.datediff(col, F.lit("1970-01-01")).cast("string")
    elif isinstance(
        t, (T.StringType, T.LongType, T.IntegerType, T.ShortType,
            T.ByteType, T.BooleanType, T.DecimalType)
    ):
        s = col.cast("string")
    else:
        raise TypeError(
            f"table_checksum: unsupported column type {c}: {t.simpleString()}"
        )
    return F.coalesce(s, F.lit(_NULL))


def row_digest(df: DataFrame, cols: list[str]) -> Column:
    """60-bit integer digest of the canonical row encoding."""
    joined = F.concat_ws(_SEP, *[_canon(df, c) for c in cols])
    return F.conv(F.substring(F.md5(joined), 1, 15), 16, 10).cast("long")


def table_checksum(
    df: DataFrame, table: str, cols: list[str] | None = None
) -> DataFrame:
    """One row: (table, n_rows, checksum) — checksum is the exact sum
    of row digests rendered as a string (engine-portable)."""
    cols = cols or df.columns
    return (
        df.select(row_digest(df, cols).alias("_d"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.coalesce(F.sum(F.col("_d").cast("decimal(38,0)")), F.lit(0))
            .cast("decimal(38,0)")
            .cast("string")
            .alias("checksum"),
        )
        .select(F.lit(table).alias("table_name"), "n_rows", "checksum")
    )


def checksum_oracle_sql(table: str, col_types: dict[str, str]) -> str:
    """DuckDB SQL producing the identical (table, n_rows, checksum)
    row — the cross-engine validation counterpart. ``col_types`` maps
    column → one of int/string/double/timestamp/date."""
    parts = []
    for c, t in col_types.items():
        if t == "timestamp":
            s = f"CAST(epoch_us({c}) AS VARCHAR)"
        elif t == "double":
            s = f"CAST(CAST({c} AS DECIMAL(38,6)) AS VARCHAR)"
        elif t == "date":
            s = f"CAST(datediff('day', DATE '1970-01-01', {c}) AS VARCHAR)"
        else:
            s = f"CAST({c} AS VARCHAR)"
        parts.append(f"COALESCE({s}, '{_NULL}')")
    joined = f"concat_ws('{_SEP}', {', '.join(parts)})"
    digest = f"CAST(('0x' || substr(md5({joined}), 1, 15)) AS BIGINT)"
    return f"""
    SELECT '{table}' AS table_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COALESCE(SUM(CAST({digest} AS DECIMAL(38,0))), 0) AS VARCHAR)
               AS checksum
    FROM {table}
    """


__all__ = ["table_checksum", "row_digest", "checksum_oracle_sql"]
