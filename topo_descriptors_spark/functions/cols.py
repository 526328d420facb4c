"""Small column helpers shared by operators."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def axis_seconds(df: DataFrame, order: str) -> Column:
    """Numeric (fractional-seconds) axis for a time or position column.

    TIMESTAMP casts straight to double; TIMESTAMP_NTZ must hop through
    TIMESTAMP first (the session timezone is pinned to UTC so the hop is
    numerically a no-op); numeric columns pass through as double.
    """
    dtype = dict(df.dtypes).get(order, "")
    if not dtype and "." in order:
        # dotted path into a struct column (e.g. "_back.matched_ts"):
        # resolve the leaf field's type so TIMESTAMP_NTZ still hops
        try:
            t = df.schema[order.split(".")[0]].dataType
            for part in order.split(".")[1:]:
                t = t[part].dataType
            dtype = t.simpleString()
        except Exception:
            dtype = ""
    c = F.col(order)
    if dtype.startswith("timestamp") or dtype == "date":
        # DATE cannot cast to double directly under ANSI; hop via
        # timestamp (midnight UTC — the session timezone is pinned)
        return c.cast("timestamp").cast("double")
    return c.cast("double")
