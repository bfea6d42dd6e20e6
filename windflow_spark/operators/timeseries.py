"""Time-series gap-fill + linear interpolation.

Not in the reference (WindFlow has no notion of a dense time grid — empty
TB windows fire with empty content, wf/window_replica.hpp:306-317, which is
the spine half of this; see operators/windows.window_spine_tb). This adds
the other half every metrics/sensor pipeline needs: resample observations
onto a regular grid and linearly interpolate interior gaps.

Scale shape: the spine is generated per key with sequence+explode (no
driver loop), the observation join is a co-partitioned left join on
(key, bucket), and the prev/next lookups are two window passes — everything
distributed, state bounded by one key's span.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def gap_fill_interpolate(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    grid_us: int,
    out_ts: str = "ts",
    out_val: str = "value",
) -> DataFrame:
    """Resample to a ``grid_us`` grid per key (observation = MIN of the
    bucket's values — order-independent, so cross-engine exact) and fill
    every interior gap by linear interpolation between the nearest
    observations; leading/trailing gaps take the nearest single value.
    Output: key cols + ``out_ts`` (grid timestamp) + ``out_val`` — RAW
    double: the lerp lands on systematic decimal midpoints (.xxxx5) where
    HALF_UP and float-round disagree, so rounding here breaks cross-engine
    parity; identical IEEE expressions are bit-identical unrounded."""
    keys = list(key_cols)
    from windflow_spark.operators.timeutil import event_micros

    us = event_micros(df, ts_col)
    obs = (
        df.select(*keys, (us - us % F.lit(grid_us)).alias("_t"), F.col(value_col))
        .groupBy(*keys, "_t")
        .agg(F.min(value_col).alias("_v"))
    )
    # Segment form: lead() pairs consecutive observations (a window over the
    # SMALL observation table), then each segment explodes straight to its
    # grid points with the lerp — the dense spine is never sorted or joined,
    # so the cost is O(observations log observations + output rows).
    w = W.partitionBy(*keys).orderBy("_t")
    seg = obs.withColumn("_nt", F.lead("_t").over(w)).withColumn(
        "_nv", F.lead("_v").over(w)
    )
    pts = seg.withColumn(
        "_p",
        F.explode(
            F.when(
                F.col("_nt").isNotNull(),
                F.sequence("_t", F.col("_nt") - F.lit(grid_us), F.lit(grid_us)),
            ).otherwise(F.array(F.col("_t")))
        ),
    )
    lerp = F.col("_v") + (F.col("_nv") - F.col("_v")) * (F.col("_p") - F.col("_t")) / (
        F.col("_nt") - F.col("_t")
    )
    filled = F.when(F.col("_p") == F.col("_t"), F.col("_v")).otherwise(lerp)
    return pts.select(
        *keys,
        F.timestamp_micros(F.col("_p")).alias(out_ts),
        filled.alias(out_val),
    )
