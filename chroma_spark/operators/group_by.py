"""RankedGroupBy — group ranked results, keep MinK/MaxK per group, flatten.

Reference: client ``GroupBy``/``MinK``/``MaxK``
(``chromadb/execution/expression/operator.py:1378-1535``), physical
``rust/worker/src/execution/operators/ranked_group_by.rs:104``: group records
by metadata key(s), keep the k records with min (MinK) or max (MaxK) values
of the sort-key chain within each group, then flatten and re-sort the
survivors globally by score ascending.

This is Spark's canonical top-k-per-group: ``Window.partitionBy(group_keys)``
+ ``row_number``. Group cardinality is the metadata key's cardinality (not
the query count), so the shuffle is evenly keyed; for very hot groups the
two-stage top-k in :mod:`.topk` applies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .topk import topk_per_group


def ranked_group_by(
    df: DataFrame,
    group_keys: list[str],
    k: int,
    sort_keys: list[str] | None = None,
    mode: str = "min_k",
    id_col: str = "id",
) -> DataFrame:
    """Keep ``k`` rows per ``group_keys`` by the ``sort_keys`` chain.

    ``sort_keys`` defaults to ``["score"]``; ``id_col`` is always the final
    tiebreak (the reference tiebreaks on internal offset id). ``mode`` is
    ``min_k`` (ascending) or ``max_k`` (descending; id tiebreak stays
    ascending for determinism parity with the oracle).
    """
    if mode not in ("min_k", "max_k"):
        raise ValueError(f"mode must be min_k or max_k, got {mode!r}")
    sort_keys = sort_keys or ["score"]
    order: list[Column] = [
        F.col(s).asc() if mode == "min_k" else F.col(s).desc() for s in sort_keys
    ]
    order.append(F.col(id_col).asc())
    return topk_per_group(df, group_keys, order, k)
