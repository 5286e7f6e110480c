"""Cross-engine-exact numeric helpers.

The engine's exactness contract (identical values from Spark and the
DuckDB oracle) breaks in one subtle place: converting a wide-integer
aggregate (DECIMAL(38,0) in Spark, HUGEINT in DuckDB) to double. For
values above 2^53 the conversion must round, and the two engines round
differently (Spark via BigDecimal half-even, DuckDB via its hugeint
float path — observed one ulp apart on sum(price_cents^2) at sf0.1).

`split_cast_double` sidesteps the divergent cast: hi = v div 2^40 and
lo = v mod 2^40 are each exactly representable doubles (for v < 2^93),
hi * 2^40 is an exact power-of-two scale, and the single recombining
add rounds identically under IEEE-754 in every engine. The matching
SQL spelling for the oracle is `sql_split_cast_double`.

Only valid for NONNEGATIVE values (integer div == floor there), which
all sum-of-squares / cross-product accumulators are.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TWO40 = 1 << 40


def split_cast_double(col_name: str) -> Column:
    """Engine-stable double of a nonnegative DECIMAL(38,0)/BIGINT column."""
    return (
        F.expr(f"CAST({col_name} div {TWO40} AS DOUBLE)") * TWO40
        + F.expr(f"CAST({col_name} % {TWO40} AS DOUBLE)")
    )


def sql_split_cast_double(expr: str) -> str:
    """DuckDB spelling of split_cast_double (// is floor division —
    equal to Spark's truncating div for the nonnegative inputs this
    helper is specified for)."""
    return (
        f"(CAST(({expr}) // {TWO40} AS DOUBLE) * {TWO40} "
        f"+ CAST(({expr}) % {TWO40} AS DOUBLE))"
    )


def unscaled_split_cast_double(col_name: str, scale: int) -> Column:
    """Engine-stable double of value = col / 10**scale for a caller that
    already holds the NONNEGATIVE exact UNSCALED integer (BIGINT or
    DECIMAL(38,0)) — the unscaled twin of scaled_split_cast_double,
    byte-for-byte the same arithmetic once that helper has multiplied
    its decimal input up to the unscaled integer. Used by the
    long-cents aggregate formulations (see plans/analytics.py): the
    split, the two exact casts, and the single recombining add + one
    IEEE division are the identical expression the oracle SQL spells
    via sql_scaled_split_cast_double, so parity is preserved wherever
    the integers are exact."""
    return (
        F.expr(f"CAST({col_name} div {TWO40} AS DOUBLE)") * TWO40
        + F.expr(f"CAST({col_name} % {TWO40} AS DOUBLE)")
    ) / float(10 ** scale)


def cent_grid_long(col: Column, scale: int = 2) -> Column:
    """Exact fixed-point integer of a nonnegative double that lies ON
    the 10^-scale grid (the generator/TPC-H money invariant: prices are
    whole cents, discount/tax are whole hundredths, quantities whole
    units). For grid values |x| <= 2^52 / 10^scale, x * 10^scale lands
    within a half-ulp of the true integer, so floor(x*10^scale + 0.5)
    recovers it exactly — no BigDecimal allocation per row, unlike
    CAST(x AS DECIMAL). NOT equivalent to the decimal cast for values
    OFF the grid (a true half-way 3rd decimal rounds differently);
    callers own that domain argument."""
    return F.floor(col * (10 ** scale) + F.lit(0.5)).cast("long")


def scaled_split_cast_double(col_name: str, scale: int) -> Column:
    """Engine-stable double of a nonnegative DECIMAL(p, scale) column.

    The round-7 sf1 sweep caught the scaled twin of the 2^53 bug: a
    DECIMAL(18,6) sum whose UNSCALED integer tops 2^53 (value > ~9e9)
    casts to double differently in Spark vs DuckDB. Route: multiply to
    the exact unscaled integer (DECIMAL arithmetic, exact), split-cast
    that (identical in both engines), then ONE IEEE division by
    10^scale — deterministic everywhere, unlike the engines' internal
    decimal→double paths."""
    unscaled = f"CAST({col_name} * {10 ** scale} AS DECIMAL(38,0))"
    return (
        F.expr(f"CAST({unscaled} div {TWO40} AS DOUBLE)") * TWO40
        + F.expr(f"CAST({unscaled} % {TWO40} AS DOUBLE)")
    ) / float(10 ** scale)


def sql_scaled_split_cast_double(expr: str, scale: int) -> str:
    """DuckDB spelling of scaled_split_cast_double.

    The unscaled integer goes through HUGEINT, not DECIMAL(38,0):
    DuckDB's `//` on DECIMAL operands is decimal division (it keeps
    fractional scale, so hi would reconstruct the whole value and the
    split would double-count — caught by the round-7 parity run);
    HUGEINT `//` is true integer floor division, matching Spark's
    `div`."""
    unscaled = f"CAST(({expr}) * {10 ** scale} AS HUGEINT)"
    return (
        f"((CAST(({unscaled}) // {TWO40} AS DOUBLE) * {TWO40} "
        f"+ CAST(({unscaled}) % {TWO40} AS DOUBLE)) / {float(10 ** scale)!r})"
    )
