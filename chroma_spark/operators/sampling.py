"""Deterministic stratified sampling — reproducible dataset mixing.

A training-data pipeline mixes sources at configured rates ("50% of src A,
10% of everything else"). ``DataFrame.sample``/``sampleBy`` are
seed-dependent on partitioning and irreproducible across engines; the
standard reproducible trick is HASH sampling: keep a row iff
``md5(salt || id) % M < rate * M``. The decision is a pure function of the
row's id — stable across runs, engines, cluster sizes, and incremental
re-runs (a row's membership never flips when other rows arrive), and the
same row set falls out of the DuckDB oracle.

One scan, no shuffle, no state. Rates are exact in expectation with md5
uniformity; at 100 TB the per-group counts concentrate tightly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_long, md5_long_sql, sql_lit

_M = 1_000_000  # rate resolution: 1e-6


def _keep_expr(id_col: str, rate: Column, salt: str) -> Column:
    h = md5_long(F.concat(F.lit(salt), F.col(id_col).cast("string"))) % _M
    # round, don't truncate: 0.6 * 1e6 is 599999.999... in binary floating
    # point — truncation would disagree with the SQL twin's decimal rounding
    return h < F.round(rate * _M).cast("long")


def hash_sample(
    df: DataFrame,
    rate: float | None = None,
    rates_by_group: dict[str, float] | None = None,
    default_rate: float = 0.0,
    group_col: str = "source",
    id_col: str = "id",
    salt: str = "",
) -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows (or per-group rates).

    ``rates_by_group`` maps group values to rates; unlisted groups get
    ``default_rate``. ``salt`` decorrelates independent samples drawn from
    the same corpus (two salts give independent subsets)."""
    if (rate is None) == (rates_by_group is None):
        raise ValueError("pass exactly one of rate / rates_by_group")
    if rate is not None:
        r: Column = F.lit(float(rate))
    else:
        r = F.lit(float(default_rate))
        for g, gr in sorted(rates_by_group.items()):
            r = F.when(F.col(group_col) == g, F.lit(float(gr))).otherwise(r)
    return df.filter(_keep_expr(id_col, r, salt))


def hash_sample_sql(
    src_sql: str,
    rate: float | None = None,
    rates_by_group: dict[str, float] | None = None,
    default_rate: float = 0.0,
    group_col: str = "source",
    id_col: str = "id",
    salt: str = "",
) -> str:
    if (rate is None) == (rates_by_group is None):
        raise ValueError("pass exactly one of rate / rates_by_group")
    if rate is not None:
        r = repr(float(rate))
    else:
        r = repr(float(default_rate))
        for g, gr in sorted(rates_by_group.items()):
            r = f'CASE WHEN "{group_col}" = {sql_lit(g)} THEN {float(gr)!r} ELSE {r} END'
    h = md5_long_sql(f'{sql_lit(salt)} || CAST("{id_col}" AS VARCHAR)')
    return (
        f"SELECT * FROM ({src_sql}) "
        f"WHERE {h} % {_M} < CAST(round(CAST(({r}) AS DOUBLE) * {_M}) AS BIGINT)"
    )
