"""Grouped-map operators (``groupBy().applyInPandas``): per-group
vectorized transforms that need the whole group in one pandas frame.

``zscore_by_group`` — the canonical shape: per-key standardization
(here: event values per event_type). Oracle-able because the math is
also expressible relationally (avg/stddev window), which the DuckDB
twin uses — the operator exists for transforms that AREN'T (per-group
model fits, rank-based transforms, resampling), with the simple case
proving the plumbing.
"""

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zscore_by_group(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """One row per input row: (id, group, zscore) where zscore is
    standardized within the group (population stddev; 0.0 for
    zero-variance groups).

    Non-finite values (±inf, NaN — one corrupt crawl metric) are
    treated as NULL: excluded from the group's mean/stddev and given a
    NULL zscore, instead of NaN-poisoning the WHOLE group's statistics
    (and the DuckDB twin's stddev_pop raises outright on infinity)."""
    import numpy as np

    def standardize(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pd.to_numeric(pdf[value_col], errors="coerce")
        v = v.where(np.isfinite(v))
        std = v.std(ddof=0)
        z = (v - v.mean()) / std if std > 0 else v * 0.0
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                group_col: pdf[group_col],
                "zscore": z.round(6),
            }
        )

    schema = f"{id_col} long, {group_col} string, zscore double"
    return df.groupBy(group_col).applyInPandas(standardize, schema=schema)


def sql_zscore_by_group(
    table: str = "events",
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
) -> str:
    # isfinite gate mirrors the operator: non-finite values drop out of
    # the window stats and score NULL
    fv = f"CASE WHEN isfinite({value_col}) THEN {value_col} END"
    return (
        f"SELECT {id_col}, {group_col}, "
        f"round(CASE WHEN stddev_pop({fv}) OVER (PARTITION BY {group_col}) > 0 "
        f"THEN ({fv} - avg({fv}) OVER (PARTITION BY {group_col})) / "
        f"stddev_pop({fv}) OVER (PARTITION BY {group_col}) "
        f"ELSE 0.0 * ({fv}) END, 6) AS zscore FROM {table}"
    )
