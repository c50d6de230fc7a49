"""Data-layout column builders: multi-dimensional clustering keys.

The range-sorted sink (sources/outputs.py ``sort_by``) gives tight
per-file min/max on ONE column — scans filtered on that column skip
files via parquet row-group stats. Filtering on a SECOND column still
reads everything. The standard fix is a space-filling curve: sort by an
interleaved-bits Z-ORDER (Morton) key and every file covers a small
hyper-rectangle, so min/max stats stay tight on ALL interleaved
dimensions at once (the same layout trick Delta/Iceberg ``OPTIMIZE
ZORDER BY`` applies).

Pure integer bit arithmetic (`shiftright`/`&`/`shiftleft` — JVM-side,
whole-stage-codegen'd) so the key is EXACT and any ANSI engine
reproduces it bit-for-bit; no UDFs, no floats.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def z_value(x: Column | str, y: Column | str, bits: int = 16) -> Column:
    """Morton/Z-order key interleaving the low ``bits`` bits of two
    non-negative integer columns: bit b of x lands at position 2b, bit b
    of y at 2b+1. Inputs must already be non-negative integers in
    [0, 2^bits) — quantize floats/wider ranges first (that choice is the
    caller's layout policy, not hidden here).

    2·bits ≤ 62 keeps the key in a signed int64 (bits ≤ 31).
    """
    if not 1 <= bits <= 31:
        raise ValueError(f"z_value: bits must be in [1, 31], got {bits}")
    cx = (F.col(x) if isinstance(x, str) else x).cast("long")
    cy = (F.col(y) if isinstance(y, str) else y).cast("long")
    out: Column | None = None
    for b in range(bits):
        xb = F.shiftleft(F.shiftright(cx, b).bitwiseAND(F.lit(1)), 2 * b)
        yb = F.shiftleft(F.shiftright(cy, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        contrib = xb.bitwiseOR(yb)
        out = contrib if out is None else out.bitwiseOR(contrib)
    assert out is not None
    return out


def z_value_sql(x: str, y: str, bits: int = 16) -> str:
    """The identical Z-order expression as ANSI SQL text (DuckDB-oracle
    twin of [z_value] — generated, term for term, from the same bit
    layout)."""
    if not 1 <= bits <= 31:
        raise ValueError(f"z_value_sql: bits must be in [1, 31], got {bits}")
    parts = []
    for b in range(bits):
        parts.append(f"((({x} >> {b}) & 1) << {2 * b})")
        parts.append(f"((({y} >> {b}) & 1) << {2 * b + 1})")
    return "(" + " | ".join(parts) + ")"
