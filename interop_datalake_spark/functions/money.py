"""Deterministic money aggregation: decimal-typed sums.

Why this exists: ``round(sum(double), 2)`` is order-dependent in the
last ulp, and a group whose true sum lands on a ``.xx5`` rounding
boundary can round differently between Spark (partial-agg merge order)
and the DuckDB oracle (sequential scan order). Round 1's
``q7_nation_volume`` failed exactly this way — 4/1445 groups off by
0.01 at sf0.01.

The fix is to leave IEEE double arithmetic entirely for money:

1. cast each 2-decimal source column to DECIMAL — exact, because the
   stored doubles ARE 2-decimal values, so nearest-double→decimal(…,2)
   round-trips identically in both engines;
2. do products/sums in decimal — exact and order-independent;
3. ``round(…, 2)`` while still decimal — both engines round decimals
   half-away-from-zero (Spark HALF_UP; verified for DuckDB 1.0:
   2.675→2.68, -2.675→-2.68);
4. cast the final rounded value to double — an exact 2-decimal value
   maps to the identical IEEE double everywhere.

Averages keep the round-1 policy (memory: spark-duckdb-float-
determinism): emit ``money_sum(x) / count`` with NO outer round — the
division of bit-identical doubles is bit-identical.

Precision budget: DECIMAL(12,2) covers |x| < 10^10 at cent precision
(every money column in the schema tops out near 10^6). A triple
product (12,2)×(3,2)×(3,2) is (20,6); Spark widens sums by 10 digits
→ (30,6), well under the 38 cap, so no precision-loss truncation
fires at any SF. At 100 TB the decimal hash-agg costs ~2× the double
path per row — the price of a deterministic answer, and the sums stay
exact up to 10^28 so no overflow at any realistic row count.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: exact cents for prices/balances (|x| < 1e10)
MONEY = "decimal(12,2)"
#: exact 2-dec rates in [-9.99, 9.99] (discount/tax and their 1±x factors)
RATE = "decimal(3,2)"


def money(col: Column | str) -> Column:
    """A 2-decimal money column as exact DECIMAL(12,2)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def one_minus(rate_col: Column | str) -> Column:
    """(1 - rate) computed in decimal: exact for 2-dec rates."""
    c = F.col(rate_col) if isinstance(rate_col, str) else rate_col
    return F.lit(1).cast(RATE) - c.cast(RATE)


def one_plus(rate_col: Column | str) -> Column:
    """(1 + rate) computed in decimal: exact for 2-dec rates."""
    c = F.col(rate_col) if isinstance(rate_col, str) else rate_col
    return F.lit(1).cast(RATE) + c.cast(RATE)


def money_sum(expr: Column | str, scale: int = 2) -> Column:
    """Deterministic ``round(sum(x), scale)`` over a decimal expression,
    emitted as double. ``expr`` must already be decimal-typed (via
    :func:`money` / products of it)."""
    c = F.col(expr) if isinstance(expr, str) else expr
    return F.round(F.sum(c), scale).cast("double")


#: oracle-side spellings of the same policy (DuckDB SQL fragments)
#: e.g. money_sum SQL:  round(sum(l_extendedprice::DECIMAL(12,2)
#:                      * (1 - l_discount::DECIMAL(3,2))), 2)::DOUBLE
SQL_MONEY = "::DECIMAL(12,2)"
SQL_RATE = "::DECIMAL(3,2)"
