"""Shared pandas/Arrow ↔ Spark-state compatibility helpers.

One definition for the guard every applyInPandasWithState harness
needs: ``pd.concat`` against an (object-dtype) empty tail upcasts ints
and bools to float, and the typed state encoder then silently NULLs
the mismatched values — so values are cast back to their
Spark-declared python type right before they enter state.
"""

from __future__ import annotations

from collections.abc import Callable


def state_caster(dt) -> Callable:
    """Caster from a pandas cell to the python type the Spark state
    encoder expects for ``dt`` (NaN/NaT-safe)."""
    import pandas as pd
    from pyspark.sql.types import (
        BooleanType,
        ByteType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        ShortType,
    )

    if isinstance(dt, (ByteType, ShortType, IntegerType, LongType)):
        return lambda x: None if pd.isna(x) else int(x)
    if isinstance(dt, BooleanType):
        return lambda x: None if pd.isna(x) else bool(x)
    if isinstance(dt, (FloatType, DoubleType)):
        return lambda x: None if pd.isna(x) else float(x)
    return lambda x: None if (x is None or x is pd.NaT) else x
