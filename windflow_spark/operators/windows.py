"""Window aggregations — WindFlow's four window operators, Spark-first.

Reference semantics (SURVEY.md §2.5; reference wf/window_replica.hpp:267-352,
wf/builders.hpp:743-781): count-based (CB) or time-based (TB) windows with
length + slide; tumbling (len==slide), sliding (len>slide), hopping-with-gaps
(len<slide); all windows of a key processed together; window id ``wid`` is the
progressive window index per key (CB) or global (TB aligned to epoch).

WindFlow's Keyed/Parallel/Paned/MapReduce/Ffat variants are *physical*
strategies for the same logical result (reference wf/paned_windows.hpp:140-141,
wf/mapreduce_windows.hpp:140-141, wf/ffat_windows.hpp:63): Spark's partial
aggregation + shuffle-by-key already implements the Paned/MapReduce sharing,
and whole-stage codegen does the fusion, so here every variant produces the
same plan-or-better. ``paned_window_tb`` keeps an explicit two-level pane form
for dense sliding windows where it provably reduces row replication.

Scale notes (100 TB):
- Window assignment is pure integer arithmetic on the event-time column →
  stays inside whole-stage codegen; no UDFs.
- Sliding windows replicate each row ``len/slide`` times BEFORE the shuffle,
  but partial aggregation collapses them map-side, so shuffle volume is
  O(#keys × #windows), not O(rows × len/slide).
- CB windows need a per-key ordering (row_number) — one shuffle by key, same
  cost as the aggregation shuffle it feeds.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _us(df: DataFrame, ts_col: str) -> Column:
    """Event-time in microseconds since epoch (matches WindFlow's µs model,
    reference wf/basic.hpp:49-61). Dispatches on the column's timestamp
    flavor — TIMESTAMP_NTZ frames work too (operators/timeutil.py)."""
    from windflow_spark.operators.timeutil import event_micros

    return event_micros(df, ts_col)


def _floordiv(col: Column, d: int) -> Column:
    """Exact floor-division for NON-NEGATIVE long columns.

    Avoids double-precision division on µs-magnitude longs (~1.7e15), where a
    quotient landing epsilon below an integer would floor off-by-one. The
    subtraction makes the dividend an exact multiple, so the double division
    is exact for quotients < 2^53.
    """
    lit = F.lit(d)
    return ((col - (col % lit)) / lit).cast("long")


def tumbling_window_tb(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    length_us: int,
    aggs: Sequence[Column],
    window_col: str = "w_start",
    offset_us: int = 0,
) -> DataFrame:
    """Time-based tumbling windows: wid = floor((ts_us − offset) / len),
    epoch-aligned by default; a non-zero ``offset_us`` shifts the window
    grid (e.g. hour windows opening at :15, or a timezone-local midnight
    for day windows — Spark's own ``window()`` startTime parameter).

    Equivalent of Keyed_Windows withTBWindows(len, len)
    (reference wf/keyed_windows.hpp:65). Emits the window start as a
    timestamp column named ``window_col``.
    """
    us = _us(df, ts_col)
    if offset_us:
        # floor-mod so a ts BEFORE the offset still lands in the correct
        # (negative-indexed) window
        off = F.lit(offset_us)
        w_start_us = us - F.pmod(us - off, F.lit(length_us))
    else:
        # pmod (floor-mod) so pre-epoch timestamps bin into the preceding
        # window, matching the offset branch's semantics; identical to `%`
        # for the non-negative case.
        w_start_us = us - F.pmod(us, F.lit(length_us))
    return (
        df.withColumn("_w_start_us", w_start_us)
        .groupBy(*key_cols, "_w_start_us")
        .agg(*aggs)
        .withColumn(window_col, F.timestamp_micros(F.col("_w_start_us")))
        .drop("_w_start_us")
    )


def sliding_window_tb(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    length_us: int,
    slide_us: int,
    aggs: Sequence[Column],
    window_col: str = "w_start",
) -> DataFrame:
    """Time-based sliding/hopping windows.

    A row at time t belongs to every window w (start = w*slide) with
    w*slide <= t < w*slide + len, i.e. w in
    [ceil((t - len + 1)/slide), floor(t/slide)] (integer µs). For hopping
    windows with gaps (len < slide) the range can be empty — an empty array
    explodes to nothing. Rows are exploded into their windows, then
    aggregated (partial agg collapses the replication map-side).
    """
    us = _us(df, ts_col)
    # ceil(x/slide) on non-negative ints = (x + slide - 1) // slide;
    # clamped at 0 — the reference's first window is gwid 0 covering
    # [0, len), so tuples with ts < len join FEWER than len/slide windows
    # (wf/window_replica.hpp:267-273; caught by the hypothesis parity test)
    lo = F.greatest(
        _floordiv(us - F.lit(length_us) + F.lit(slide_us), slide_us), F.lit(0)
    )
    hi = _floordiv(us, slide_us)
    wids = F.when(lo <= hi, F.sequence(lo, hi)).otherwise(F.array().cast("array<long>"))
    exploded = df.withColumn("_wid", F.explode(wids))
    return (
        exploded.groupBy(*key_cols, "_wid")
        .agg(*aggs)
        .withColumn(window_col, F.timestamp_micros(F.col("_wid") * F.lit(slide_us)))
        .drop("_wid")
    )


def tumbling_window_cb(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    length: int,
    aggs: Sequence[Column],
    wid_col: str = "wid",
) -> DataFrame:
    """Count-based tumbling windows: per-key progressive id, wid = id // len.

    Reproduces WindFlow's per-key progressive identifier for CB windows
    (reference wf/window_replica.hpp:250-251). ``order_cols`` must be a
    deterministic total order per key (e.g. (ts, event_id)) — the reference
    relies on arrival order, which is only defined per key; we pin it to data.
    Partial (incomplete) trailing windows ARE emitted, matching WindFlow's
    EOS flush (reference wf/window_replica.hpp:356-400).
    """
    from pyspark.sql import Window as W

    win = W.partitionBy(*key_cols).orderBy(*[F.col(c) for c in order_cols])
    rid = F.row_number().over(win) - F.lit(1)
    return (
        df.withColumn("_rid", rid)
        .withColumn(wid_col, _floordiv(F.col("_rid"), length))
        .groupBy(*key_cols, wid_col)
        .agg(*aggs)
    )


def sliding_window_cb(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    length: int,
    slide: int,
    aggs: Sequence[Column],
    wid_col: str = "wid",
) -> DataFrame:
    """Count-based sliding windows: row with per-key id i belongs to windows
    w in [floor((i - len)/slide) + 1, floor(i/slide)], w >= 0.

    Only COMPLETE windows plus the trailing partials that WindFlow fires at
    EOS are emitted — i.e. every window with at least one row, same as the
    reference's flush semantics.
    """
    from pyspark.sql import Window as W

    win = W.partitionBy(*key_cols).orderBy(*[F.col(c) for c in order_cols])
    # materialize the per-key progressive id first — window functions can't
    # nest inside the explode expression
    with_rid = df.withColumn("_rid", F.row_number().over(win) - F.lit(1))
    rid = F.col("_rid")
    # row rid ∈ window w iff w*slide <= rid <= w*slide+len-1:
    # lo = ceil(max(rid-len+1, 0)/slide), hi = rid // slide — all non-negative
    y = F.greatest(rid - F.lit(length) + F.lit(1), F.lit(0))
    lo = _floordiv(y + F.lit(slide) - F.lit(1), slide)
    hi = _floordiv(rid, slide)
    wids = F.when(lo <= hi, F.sequence(lo, hi)).otherwise(F.array().cast("array<long>"))
    return (
        with_rid.withColumn(wid_col, F.explode(wids))
        .groupBy(*key_cols, wid_col)
        .agg(*aggs)
    )


def paned_window_tb(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    length_us: int,
    slide_us: int,
    pane_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
    window_col: str = "w_start",
) -> DataFrame:
    """Explicit pane optimization (Paned_Windows, reference
    wf/paned_windows.hpp:67,140-141): stage 1 aggregates gcd(len, slide)-sized
    panes (PLQ), stage 2 combines panes into windows (WLQ).

    For a 1h window sliding by 1m, the naive form replicates each row 60×;
    panes aggregate each row once and replicate only the 60×-smaller pane
    aggregates. ``pane_aggs`` produce partials; ``final_aggs`` combine them
    (e.g. pane: sum(x) as s, count: count(*) as c → final: sum(s), sum(c)).
    """
    import math

    pane_us = math.gcd(length_us, slide_us)
    us = _us(df, ts_col)
    panes = (
        df.withColumn("_pane", _floordiv(us, pane_us))
        .groupBy(*key_cols, "_pane")
        .agg(*pane_aggs)
    )
    # A pane p (covering [p*pane, (p+1)*pane)) belongs to window w iff
    # w*slide <= p*pane and (p+1)*pane <= w*slide + len. Since pane_us divides
    # both len and slide, lo = (p_start + pane - len)/slide rounded up == the
    # exact integer (p_start + pane - len + slide - 1) // slide.
    p_start = F.col("_pane") * F.lit(pane_us)
    # clamped at 0 like sliding_window_tb: the reference's first window is
    # gwid 0, so early panes join fewer windows
    lo = F.greatest(
        _floordiv(
            p_start + F.lit(pane_us) - F.lit(length_us) + F.lit(slide_us) - F.lit(1),
            slide_us,
        ),
        F.lit(0),
    )
    hi = _floordiv(p_start, slide_us)
    # hopping configs (length_us < slide_us) leave gaps: a pane can belong to
    # ZERO windows, where lo > hi and F.sequence would generate a DESCENDING
    # sequence assigning the pane to windows it is not in (ADVICE r1). Same
    # empty-range guard as sliding_window_tb.
    wids = F.when(lo <= hi, F.sequence(lo, hi)).otherwise(F.array().cast("array<long>"))
    return (
        panes.withColumn("_wid", F.explode(wids))
        .groupBy(*key_cols, "_wid")
        .agg(*final_aggs)
        .withColumn(window_col, F.timestamp_micros(F.col("_wid") * F.lit(slide_us)))
        .drop("_wid")
    )


# Aggregates with a known pane decomposition (partial op per pane, final
# combine over panes) — the lift/combine algebra of Ffat_Windows applied to
# the pane rewrite (reference wf/paned_windows.hpp:140-141: PLQ runs the
# lift-fold per pane, WLQ the combine per window).
_PANE_DECOMPOSABLE = ("sum", "count", "min", "max", "avg")


def spec_aggs(spec: Sequence[tuple]) -> list[Column]:
    """Compile a declarative agg spec [(op, col, alias), ...] to direct
    aggregate Columns. op in {sum, count, min, max, avg}; col "*" (count)."""
    out = []
    for op, col, alias in spec:
        if op == "count":
            out.append(F.count(F.lit(1) if col in ("*", None) else col).alias(alias))
        elif op in ("sum", "min", "max", "avg"):
            out.append(getattr(F, op)(col).alias(alias))
        else:
            raise ValueError(f"unknown agg op {op!r}")
    return out


def decompose_pane_aggs(spec: Sequence[tuple]) -> tuple[list[Column], list[Column]]:
    """Split a declarative agg spec into (pane_aggs, final_aggs) for
    paned_window_tb: sum→(sum, sum), count→(count, sum), min/max→(op, op),
    avg→(sum+count panes, sum/sum final). Raises ValueError for ops with no
    pane decomposition (median, collect_*, ...) — callers fall back to the
    direct explode form."""
    pane: list[Column] = []
    final: list[Column] = []
    pane_names: set[str] = set()

    def _pane(col: Column, name: str) -> str:
        if name not in pane_names:
            pane_names.add(name)
            pane.append(col.alias(name))
        return name

    for op, col, alias in spec:
        if op == "sum":
            p = _pane(F.sum(col), f"_ps_{col}")
            final.append(F.sum(p).alias(alias))
        elif op == "count":
            p = _pane(
                F.count(F.lit(1) if col in ("*", None) else col),
                f"_pc_{'all' if col in ('*', None) else col}",
            )
            final.append(F.sum(p).cast("long").alias(alias))
        elif op in ("min", "max"):
            p = _pane(getattr(F, op)(col), f"_p{op}_{col}")
            final.append(getattr(F, op)(p).alias(alias))
        elif op == "avg":
            ps = _pane(F.sum(col), f"_ps_{col}")
            pc = _pane(F.count(col), f"_pcnn_{col}")
            final.append((F.sum(ps) / F.sum(pc)).alias(alias))
        else:
            raise ValueError(f"agg op {op!r} has no pane decomposition")
    return pane, final


def sliding_window_tb_auto(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    length_us: int,
    slide_us: int,
    spec: Sequence[tuple],
    aggs: Sequence[Column] | None = None,
    window_col: str = "w_start",
    dense_threshold: int = 8,
) -> DataFrame:
    """Cost-gated sliding-window form selection (r4 VERDICT #2; the
    reference builds Paned_Windows explicitly, wf/paned_windows.hpp:67 —
    here the engine picks the pane rewrite automatically).

    The direct form explodes each row into ``ceil(len/slide)`` covering
    windows; at a dense config (1h/1m = 60×) that is 60× pre-shuffle row
    replication — partial aggregation collapses it map-side, but the
    assignment work itself scales with the replication. The paned form
    aggregates gcd(len, slide)-sized panes first (each row touched ONCE)
    and replicates only the pane aggregates, at the cost of a second keyed
    exchange. Gate: replication >= ``dense_threshold`` AND every agg is
    pane-decomposable → paned; otherwise direct. ``spec`` is the
    declarative [(op, col, alias), ...] form with STRING column names;
    ``aggs`` optionally supplies pre-built direct Columns (must match
    spec) to keep exotic expressions (e.g. rounding wrappers) in the
    sparse path.

    The pane win additionally assumes per-pane DENSITY: with fewer than
    ~1 row per (key, pane) the pane step compresses nothing and its extra
    exchange is pure overhead (measured +12 % on a 30-day-sparse toy
    table; −25 % and growing with scale once panes hold several rows —
    density rises linearly with data size while explode replication stays
    len/slide). Raise ``dense_threshold`` or pass prebuilt ``aggs`` with a
    huge threshold to force the direct form on known-sparse data.
    """
    replication = -(-length_us // slide_us) if slide_us < length_us else 1
    if replication >= dense_threshold:
        try:
            pane_aggs, final_aggs = decompose_pane_aggs(spec)
        except ValueError:
            pane_aggs = None
        if pane_aggs is not None:
            return paned_window_tb(
                df, key_cols, ts_col, length_us, slide_us,
                pane_aggs, final_aggs, window_col=window_col,
            )
    return sliding_window_tb(
        df, key_cols, ts_col, length_us, slide_us,
        list(aggs) if aggs is not None else spec_aggs(spec),
        window_col=window_col,
    )


def non_incremental_window_tb(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    length_us: int,
    fn,
    output_schema: str,
    slide_us: int | None = None,
) -> DataFrame:
    """Non-incremental window processing — the reference's second UDF form:
    the user function receives the WHOLE window buffer at fire time
    (Iterable<tuple_t>, reference wf/builders.hpp:800-805, archive
    wf/win_archive.hpp:65-135).

    Spark-first: rows are assigned to windows (tumbling or sliding), then
    ``applyInPandas`` runs ``fn(pdf)`` once per (key..., window) group with
    the group's rows as a pandas DataFrame SORTED BY ``ts_col`` (matching
    the reference's sorted archive). ``fn`` must return a pandas DataFrame
    matching ``output_schema`` (include the key and window columns).

    The group columns (key..., _wid) ride in the input pdf. Arrow-batched;
    state is bounded by the largest single window per key — same bound as
    the reference's archive.
    """
    us = _us(df, ts_col)
    if slide_us is None or slide_us == length_us:
        assigned = df.withColumn("_wid", _floordiv(us, length_us))
    else:
        lo = _floordiv(us - F.lit(length_us) + F.lit(slide_us), slide_us)
        hi = _floordiv(us, slide_us)
        wids = F.when(lo <= hi, F.sequence(lo, hi)).otherwise(
            F.array().cast("array<long>")
        )
        assigned = df.withColumn("_wid", F.explode(wids))

    def run(pdf):
        return fn(pdf.sort_values(ts_col))

    return assigned.groupBy(*key_cols, "_wid").applyInPandas(run, output_schema)


def non_incremental_window_tb_batched(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    length_us: int,
    batch_fn,
    output_schema: str,
    slide_us: int | None = None,
) -> DataFrame:
    """Scalable non-incremental window processing.

    ``applyInPandas`` pays one Python/Arrow round trip PER GROUP — ruinous
    when windows are small and numerous (measured 85 s vs 1 s at sf0.1 for
    ~90k one-row windows). This form instead:

    1. hash-partitions by the full (key..., _wid) group key — groups never
       straddle partitions,
    2. sorts within partitions by (group, ts),
    3. runs ``mapInPandas`` where each call receives THOUSANDS of complete
       groups and applies ``batch_fn`` (vectorized pandas groupby) once per
       Arrow batch, carrying boundary groups between batches.

    ``batch_fn(pdf, group_cols)`` gets rows sorted by (group, ts) with the
    window id in ``_wid`` and must return one pandas DataFrame matching
    ``output_schema``.
    """
    import pandas as pd

    us = _us(df, ts_col)
    if slide_us is None or slide_us == length_us:
        assigned = df.withColumn("_wid", _floordiv(us, length_us))
    else:
        lo = _floordiv(us - F.lit(length_us) + F.lit(slide_us), slide_us)
        hi = _floordiv(us, slide_us)
        wids = F.when(lo <= hi, F.sequence(lo, hi)).otherwise(
            F.array().cast("array<long>")
        )
        assigned = df.withColumn("_wid", F.explode(wids))

    group_cols = list(key_cols) + ["_wid"]
    part = assigned.repartition(*group_cols).sortWithinPartitions(*group_cols, ts_col)

    def run(batches):
        carry = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                carry = None
                continue
            # the last group may continue into the next Arrow batch — hold it
            last = pdf.iloc[-1]
            mask = pd.Series(True, index=pdf.index)
            for gc in group_cols:
                mask &= pdf[gc] == last[gc]
            carry = pdf[mask]
            done = pdf[~mask]
            if len(done):
                yield batch_fn(done, group_cols)
        if carry is not None and len(carry):
            yield batch_fn(carry, group_cols)

    return part.mapInPandas(run, output_schema)


def session_window_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    order_cols: Sequence[str],
    gap_us: int,
    aggs: Sequence[Column],
    sid_col: str = "sid",
) -> DataFrame:
    """Session windows: rows of a key belong to the same session while the
    gap between consecutive events is <= gap_us; a larger gap opens a new
    session (classic gaps-and-islands, computed distributed via lag+cumsum).

    Not in the reference (WindFlow has no session windows) — a Spark-first
    extension; semantics match Spark's session_window / Flink session
    windows. Batch form here; streaming form uses F.session_window.
    One shuffle by key; both window functions share the same sort.
    """
    from pyspark.sql import Window as W

    order = [F.col(c) for c in order_cols]
    w = W.partitionBy(*key_cols).orderBy(*order)
    us = _us(df, ts_col)
    prev = F.lag(us).over(w)
    is_new = F.when(prev.isNull() | (us - prev > F.lit(gap_us)), 1).otherwise(0)
    run = (
        W.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        df.withColumn("_new", is_new)
        .withColumn(sid_col, F.sum("_new").over(run).cast("long"))
        .groupBy(*key_cols, sid_col)
        .agg(*aggs)
    )


def window_spine_tb(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    length_us: int,
    window_col: str = "w_start",
) -> DataFrame:
    """Generate the full window spine per key — every tumbling window between
    the key's min and max event time, including EMPTY windows.

    WindFlow fires empty TB windows (reference wf/window_replica.hpp:306-317);
    Spark's groupBy never emits them. Left-joining aggregates onto this spine
    restores parity. Distributed: the spine is built per key from min/max
    aggregates, not on the driver.
    """
    us = _us(df, ts_col)
    bounds = df.groupBy(*key_cols).agg(
        _floordiv(F.min(us), length_us).alias("_w_min"),
        _floordiv(F.max(us), length_us).alias("_w_max"),
    )
    return (
        bounds.withColumn("_wid", F.explode(F.sequence("_w_min", "_w_max")))
        .withColumn(window_col, F.timestamp_micros(F.col("_wid") * F.lit(length_us)))
        .drop("_w_min", "_w_max", "_wid")
    )


def rollup_partials(
    partials: DataFrame,
    key_cols: Sequence[str],
    window_col: str,
    length_us: int,
    aggs: Sequence[Column],
    out_window_col: str | None = None,
) -> DataFrame:
    """Re-aggregate FINER window partials onto a COARSER grid — the
    hypertable continuous-aggregate cascade (the batch
    rollup_hierarchy_hourly_daily shape, and TimescaleDB's rollup-from-
    rollup rule): hour partials from minute partials, days from hours,
    never rescanning raw events. ``aggs`` must re-aggregate the partial
    columns (SUM of counts/sums, MIN of mins, ... — the lift+combine
    discipline of Ffat_Windows, reference wf/ffat_windows.hpp): only
    aggregates with a merge form cascade losslessly.

    Delegates to tumbling_window_tb over the partials frame keyed on its
    window-start column; at 100 TB each coarser level reads ~(ratio)×
    fewer rows than the one below, so a minute→hour→day cascade costs a
    single raw scan plus two tiny re-aggregations."""
    return tumbling_window_tb(
        partials,
        key_cols,
        window_col,
        length_us,
        aggs,
        window_col=out_window_col or window_col,
    )
