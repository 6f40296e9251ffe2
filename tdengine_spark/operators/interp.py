"""TimeSlice / interp — resample a series to exact instants.

Reference: ``SELECT interp(col) ... RANGE(t1,t2) EVERY(d) FILL(mode)``
(executor/src/timesliceoperator.c; grammar sql.y:3018-3026), with
pseudo-columns ``_irowts`` (the instant) and ``_isfilled``.

Spark-first design — the union + ordered-window kernel shared with the
as-of join (operators/asofjoin.py):
  1. generate the instant spine per group (``sequence`` + explode —
     a pure expression, no driver loop);
  2. union instants (side=1) with samples (side=0);
  3. one window per key ordered by (ts, side) carries the previous
     sample's (t, v) onto each instant; the reverse window carries the
     next sample's. Samples sort before instants at equal ts, so an
     exact-ts sample is seen by its instant (→ _isfilled = false).

Cost: one shuffle on the group keys + two ordered window passes over
|samples| + |instants| rows — the same asymptotics as the reference's
single merge pass, and it parallelizes per key across executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tdengine_spark.durations import Duration, parse_duration

IROWTS = "_irowts"
ISFILLED = "_isfilled"

INTERP_MODES = ("prev", "next", "linear", "near", "null", "value", "none")


def interp(
    df: DataFrame,
    ts_col: str,
    val_col: str,
    range_start,
    range_end,
    every: "str | int | Duration",
    mode: str = "linear",
    partition_by: "list[str] | None" = None,
    fill_value: "float | None" = None,
    out_col: "str | None" = None,
    group_values: "list | DataFrame | None" = None,
) -> DataFrame:
    """Resample ``val_col`` to instants range_start, +every, ... ≤ range_end.

    Returns (partition..., _irowts, <out_col>, _isfilled) ordered by
    (partition, _irowts). NULL results outside the data range follow the
    reference: PREV holds nothing before the first sample, NEXT nothing
    after the last, LINEAR needs both sides, NEAR takes whichever exists.

    ``group_values``: the distinct partition-key values, as a list of
    tuples (single-key: scalars) or a DataFrame. When omitted they are
    derived with ``df.select(keys).distinct()`` — a second scan of the
    input. At scale, pass the known key set (tags usually live in a tiny
    dimension table) so the fact table is scanned exactly once.
    """
    mode = mode.lower()
    if mode not in INTERP_MODES:
        raise ValueError(f"unknown interp fill mode {mode!r}")
    keys = list(partition_by or [])
    out_col = out_col or val_col
    every_d = parse_duration(every)

    lo = F.lit(range_start).cast("timestamp")
    hi = F.lit(range_end).cast("timestamp")
    step = F.expr(f"interval {every_d.interval_string()}")

    if keys and group_values is not None:
        if isinstance(group_values, DataFrame):
            groups = group_values.select(*keys)
        else:
            rows = [
                v if isinstance(v, (tuple, list)) else (v,) for v in group_values
            ]
            groups = df.sparkSession.createDataFrame(
                rows, df.select(*keys).schema
            )
    elif keys:
        groups = df.select(*keys).distinct()
    else:
        groups = df.select(F.lit(1).alias("_g")).limit(1)
    spine = groups.select(
        *(keys or []),
        F.explode(F.sequence(lo, hi, step)).alias("_t"),
    ).withColumn("_side", F.lit(1))

    samples = df.select(
        *keys,
        F.col(ts_col).alias("_t"),
        F.lit(0).alias("_side"),
        F.col(val_col).cast("double").alias("_v"),
    )
    u = samples.unionByName(spine.withColumn("_v", F.lit(None).cast("double")))

    # both directions ride ONE (partition, asc-order) sort: the
    # previous-sample tracker uses an unboundedPreceding→current frame,
    # the next-sample tracker a current→unboundedFollowing frame over
    # the SAME ordering — Spark evaluates both in a single Window node,
    # so the plan has one exchange + one sort instead of two of each
    # (the desc-ordered formulation forced a second sort pass)
    asc = Window.partitionBy(*keys).orderBy(
        F.col("_t").asc(), F.col("_side").asc()
    )
    fwd = asc.rowsBetween(Window.unboundedPreceding, 0)
    nxt = asc.rowsBetween(0, Window.unboundedFollowing)
    t_us = F.unix_micros(F.col("_t"))
    # both trackers must be gated on value presence: a NULL-valued sample
    # would otherwise advance _pt but not _pv, giving linear/near a
    # mismatched (t, v) pair and an exact-ts NULL a stale "exact" hit.
    # Equal-ts samples sort before instants (side 0 < 1), so an exact
    # sample lands in the preceding frame and not the following one —
    # the same tie rule the desc window encoded.
    is_sample = (F.col("_side") == 0) & F.col("_v").isNotNull()
    sample_t = F.when(is_sample, t_us)
    sample_v = F.when(is_sample, F.col("_v"))

    staged = u.select(
        "*",
        # one select → the optimizer collapses same-spec functions into
        # two adjacent Window nodes (chained withColumn left four)
        F.last(sample_t, ignorenulls=True).over(fwd).alias("_pt"),
        F.last(sample_v, ignorenulls=True).over(fwd).alias("_pv"),
        F.first(sample_t, ignorenulls=True).over(nxt).alias("_nt"),
        F.first(sample_v, ignorenulls=True).over(nxt).alias("_nv"),
    ).where(F.col("_side") == 1)

    pt, pv, nt, nv = (F.col(c) for c in ("_pt", "_pv", "_nt", "_nv"))
    exact = pt == t_us
    if mode == "prev":
        val = pv
    elif mode == "next":
        val = nv
    elif mode == "near":
        val = (
            F.when(exact, pv)
            .when(pt.isNull(), nv)
            .when(nt.isNull(), pv)
            .when((t_us - pt) <= (nt - t_us), pv)
            .otherwise(nv)
        )
    elif mode == "linear":
        frac = (t_us - pt).cast("double") / (nt - pt).cast("double")
        val = (
            F.when(exact, pv)
            .when(pt.isNull() | nt.isNull(), F.lit(None))
            .otherwise(pv + (nv - pv) * frac)
        )
    elif mode in ("null", "none"):
        val = F.when(exact, pv)
    else:  # value
        val = F.when(exact, pv).otherwise(F.lit(fill_value))

    if mode == "none":
        # reference FILL_MODE_NONE (parTranslater.c createDefaultFillNode):
        # emit ONLY instants that coincide with a sample — no filling
        staged = staged.where(exact)

    return (
        staged.select(
            *keys,
            F.col("_t").alias(IROWTS),
            val.alias(out_col),
            (~exact | exact.isNull()).alias(ISFILLED),
        )
        .orderBy(*keys, IROWTS)
    )
