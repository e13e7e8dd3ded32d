"""Shared column-expression helpers.

All helpers are pure pyspark.sql.functions compositions (JVM-side, codegen'd,
no Python UDFs) so every operator built on them stays inside whole-stage
codegen. The decimal-sum helpers exist for oracle determinism: summing
doubles is order-dependent, so float measures are first cast to an exact
DECIMAL, summed exactly, and converted back to double once - bit-identical
in Spark and DuckDB regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# deterministic numeric aggregation


def dsum(col: str | Column, scale: int = 2, alias: str | None = None) -> Column:
    """Order-independent sum of a double column: exact DECIMAL accumulation,
    one final decimal->double conversion.

    Contract (part of each query's semantics, shared with its oracle): inputs
    are quantized to DECIMAL(30, scale) BEFORE summing, so the result is the
    exact sum of the rounded inputs, not the IEEE sum of the raw doubles.
    `scale` must cover the measure's generated precision (fixtures: money
    values carry 2 fractional digits -> scale=2 is lossless; events.value
    carries 6 -> callers pass scale=6). Precision 30 leaves >=24 integral
    digits, unreachable by any realistic sum of the fixtures' magnitudes; on
    overflow Spark (non-ANSI) yields NULL while DuckDB errors, surfacing as a
    loud parity break rather than silent corruption."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(f"decimal(30,{scale})")).cast("double")
    return out.alias(alias) if alias else out


def davg(col: str | Column, scale: int = 2, alias: str | None = None) -> Column:
    """Order-independent mean: exact decimal sum / count, single IEEE divide.
    Same quantization contract as dsum(): the mean of inputs rounded to
    `scale` fractional digits."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(f"decimal(30,{scale})")).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def oracle_dsum(expr: str, scale: int = 2) -> str:
    """DuckDB SQL fragment matching dsum()."""
    return f"CAST(sum(CAST({expr} AS DECIMAL(30,{scale}))) AS DOUBLE)"


def oracle_davg(expr: str, scale: int = 2) -> str:
    """DuckDB SQL fragment matching davg()."""
    return f"CAST(sum(CAST({expr} AS DECIMAL(30,{scale}))) AS DOUBLE) / count({expr})"


# ---------------------------------------------------------------------------
# dates (reference D3: Spotify emits yyyy | yyyy-MM | yyyy-MM-dd)


def to_date_cascade(col: str | Column) -> Column:
    """Mixed-precision string->date (reference P:109 pd.to_datetime analog).

    try_to_date (not to_date) so the cascade is ANSI-mode safe: a narrower
    pattern failing to parse must yield NULL for coalesce, not an error.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(
        F.try_to_date(c, "yyyy-MM-dd"),
        F.try_to_date(c, "yyyy-MM"),
        F.try_to_date(c, "yyyy"),
    )


# ---------------------------------------------------------------------------
# vectors (stored array<float>; all math in double for cross-engine parity)


def vec_double(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Dot product via zip_with + left-fold aggregate (JVM-side, sequential
    fold => deterministic order, matching DuckDB's sequential list ops)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


# DuckDB fragments matching the above fold order exactly (list_transform +
# sequential list_sum): used by similarity/dedup oracles.
def oracle_dot(a: str, b: str) -> str:
    # list_zip yields an unnamed struct in current DuckDB: index numerically
    return f"list_sum(list_transform(list_zip({a}, {b}), s -> s[1] * s[2]))"


def oracle_norm(a: str) -> str:
    return f"sqrt(list_sum(list_transform({a}, x -> x * x)))"


def oracle_cosine(a: str, b: str) -> str:
    return f"({oracle_dot(a, b)} / ({oracle_norm(a)} * {oracle_norm(b)}))"


# ---------------------------------------------------------------------------
# text


def tokens(col: str | Column) -> Column:
    """Lowercased word tokens; [a-z0-9]+ runs, matching ORACLE_TOKENS."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), r"[^a-z0-9]+"), lambda t: t != F.lit(""))


ORACLE_TOKENS = (
    "list_filter(string_split_regex(lower({col}), '[^a-z0-9]+'), x -> x <> '')"
)
