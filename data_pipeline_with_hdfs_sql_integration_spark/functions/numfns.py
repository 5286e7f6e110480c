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
