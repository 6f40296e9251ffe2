"""ASOF JOIN and WINDOW JOIN — the reference's ts-inequality join family
(grammar sql.y:2766-2780; JOIN_STYPE_ASOF / JOIN_STYPE_WIN executed inside
mergejoinoperator.c).

Spark has no native as-of join; the classic distributed strategies are:

  A. **union + ordered window** (implemented here): tag both sides, union
     on the key space, and carry the most recent right-side row forward
     with ``last(..., ignorenulls=True)`` over (keys, ts, side). One
     shuffle on the join keys, one per-key sort — the exact cost profile
     of the reference's sort-merge as-of. Scales linearly; no O(n²) risk.
     Handles JLIMIT=1 (the reference default).

  B. **bucketed range join** (window_join below): for bounded ts windows,
     bucket both sides by the window width and join on (key, bucket ∈
     {b-1, b, b+1}) then filter the exact range — turns an O(n·m) theta
     join into an equi-join with 3× fan-out.

Direction/strictness variants (>=, >, <=, <) map to sort-order + tiebreak
choices in strategy A.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tdengine_spark.durations import Duration, parse_duration


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: "list[str] | None",
    ts_col: str = "ts",
    right_ts_col: "str | None" = None,
    direction: str = "backward",
    strict: bool = False,
    tolerance: "str | int | Duration | None" = None,
    right_prefix: str = "r_",
    jlimit: int = 1,
) -> DataFrame:
    """LEFT ASOF JOIN: for each left row, the single right row with the
    largest right.ts <= left.ts (direction='backward', operator >=) or the
    smallest right.ts >= left.ts (direction='forward', operator <=).
    ``strict`` excludes ts equality (> / <). ``tolerance`` bounds the match
    distance (reference: as-of condition ANDed with a range).

    ``jlimit=k`` returns the k closest eligible right rows per left row
    (reference grammar ``JLIMIT n``, sql.y:2797-2798), with ``_jrank``
    1..k (1 = closest); unmatched left rows keep one row of NULLs.

    Right columns come back prefixed with ``right_prefix`` (right ts as
    ``{prefix}{right_ts_col}``). Unmatched left rows keep NULLs (LEFT
    outer semantics).
    """
    on = on or []
    if jlimit > 1:
        return _asof_join_k(
            left, right, on, ts_col, right_ts_col or ts_col, direction,
            strict, tolerance, right_prefix, jlimit,
        )
    right_ts_col = right_ts_col or ts_col
    rcols = [c for c in right.columns if c not in on]

    # Tag and union: left rows carry NULL right-payload; right rows carry
    # their payload. Sorting by (ts, side) with right first at ties makes
    # `last(payload) ignorenulls` pick up ts-equal right rows for >=
    # (non-strict); left-first at ties excludes them for > (strict).
    payload = F.struct(*[F.col(c) for c in rcols]).alias("_rpay")
    l_tag = left.select(
        *on,
        F.col(ts_col).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(
            right.select(payload).schema["_rpay"].dataType.simpleString()
        ).alias("_rpay"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lpay"),
    )
    r_tag = right.select(
        *on,
        F.col(right_ts_col).alias("_t"),
        F.lit(0).alias("_side"),
        payload,
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left.columns]).alias("x"))
            .schema["x"].dataType.simpleString()
        ).alias("_lpay"),
    )
    u = l_tag.unionByName(r_tag)

    if direction == "backward":
        # right rows must sort before a ts-equal left row to be visible
        side_order = F.col("_side").asc() if not strict else F.col("_side").desc()
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("_t").asc(), side_order)
            .rowsBetween(Window.unboundedPreceding, -1 if strict else 0)
        )
    elif direction == "forward":
        side_order = F.col("_side").asc() if not strict else F.col("_side").desc()
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("_t").desc(), side_order)
            .rowsBetween(Window.unboundedPreceding, -1 if strict else 0)
        )
    else:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    # For non-strict, a right row at the same _t must be visible to the left
    # row in the frame ending at 0 — ordering puts right (side=0) first.
    matched = u.withColumn("_m", F.last("_rpay", ignorenulls=True).over(w))
    out = matched.where(F.col("_side") == 1)

    if tolerance is not None:
        tol_us = parse_duration(tolerance).microseconds
        # need matched right ts to test tolerance
        mts = F.col(f"_m.{right_ts_col}")
        dist = F.abs(F.unix_micros(F.col("_t")) - F.unix_micros(mts))
        out = out.withColumn("_m", F.when(dist <= tol_us, F.col("_m")))

    lcols = left.columns
    return out.select(
        *[F.col(f"_lpay.{c}").alias(c) for c in lcols],
        *[F.col(c) for c in on if c not in lcols],
        *[F.col(f"_m.{c}").alias(f"{right_prefix}{c}") for c in rcols],
    )


def _asof_join_k(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    right_ts_col: str,
    direction: str,
    strict: bool,
    tolerance: "str | int | Duration | None",
    right_prefix: str,
    k: int,
) -> DataFrame:
    """JLIMIT k>1 kernel: number the right side per key in ts order, find
    each left row's closest match *index* with the union+window pass
    (same cost as k=1), then explode the k candidate indices and fetch
    their payloads with one equi-join. Everything stays equi-join /
    window — no theta join, no per-row k-scan.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    rcols = [c for c in right.columns if c not in on]
    # deterministic numbering: ts plus all payload columns as tiebreak
    order = [F.col(right_ts_col).asc()] + [
        F.col(c).asc() for c in rcols if c != right_ts_col
    ]
    rnum = right.withColumn(
        "_rn", F.row_number().over(Window.partitionBy(*on).orderBy(*order))
    )

    # surrogate per-left-row id: the tolerance restore below must
    # re-identify exactly the left ROWS (not left values) that lost all
    # their matches — value-based anti-joins break on NULL columns
    # (NULL never equals itself) and collapse duplicate left rows.
    # DETERMINISTIC id (vs monotonically_increasing_id, which is
    # documented-nondeterministic under recomputation and could desync
    # the two branches of the anti-join): row_number per key over
    # (ts, row-hash); truly identical duplicate rows may swap ids,
    # which is harmless — they are interchangeable. Key columns ride
    # inside a struct so NULL keys still self-match in the anti-join.
    lcols = left.columns
    row_hash = F.xxhash64(F.struct(*[F.col(c) for c in lcols]))
    # numbering within (key, exact ts): groups are duplicates at one
    # instant — tiny by construction, so this window adds no skew even
    # for keyless joins
    lnum = left.withColumn(
        "_lrn",
        F.row_number().over(
            Window.partitionBy(*on, ts_col).orderBy(row_hash.asc())
        ),
    )
    lid = F.struct(
        *[F.col(c) for c in on], F.col(ts_col), F.col("_lrn")
    ).alias("_lid")
    lid_type = lnum.select(lid).schema["_lid"].dataType.simpleString()
    l_tag = lnum.select(
        *on,
        F.col(ts_col).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("int").alias("_rn"),
        F.struct(*[F.col(c) for c in lcols]).alias("_lpay"),
        lid,
    )
    r_tag = rnum.select(
        *on,
        F.col(right_ts_col).alias("_t"),
        F.lit(0).alias("_side"),
        F.col("_rn").cast("int").alias("_rn"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in lcols]).alias("x"))
            .schema["x"].dataType.simpleString()
        ).alias("_lpay"),
        F.lit(None).cast(lid_type).alias("_lid"),
    )
    u = l_tag.unionByName(r_tag)

    backward = direction == "backward"
    t_order = F.col("_t").asc() if backward else F.col("_t").desc()
    side_order = F.col("_side").asc() if not strict else F.col("_side").desc()
    # within ts-equal right rows, keep the numbering order so last() is
    # the extreme (max rn backward / min rn forward) eligible row
    rn_order = F.col("_rn").asc_nulls_last() if backward else F.col("_rn").desc_nulls_last()
    w = (
        Window.partitionBy(*on)
        .orderBy(t_order, side_order, rn_order)
        .rowsBetween(Window.unboundedPreceding, -1 if strict else 0)
    )
    staged = u.withColumn("_mrn", F.last("_rn", ignorenulls=True).over(w)).where(
        F.col("_side") == 1
    )

    l_out = [F.col(f"_lpay.{c}").alias(c) for c in lcols]
    null_out = [
        F.lit(None).cast(right.schema[c].dataType).alias(f"{right_prefix}{c}")
        for c in rcols
    ]
    unmatched = staged.where(F.col("_mrn").isNull()).select(
        *l_out, *null_out, F.lit(None).cast("int").alias("_jrank")
    )

    if backward:
        fetch = F.explode(
            F.sequence(F.greatest(F.col("_mrn") - (k - 1), F.lit(1)), F.col("_mrn"))
        )
        jrank = F.col("_mrn") - F.col("_rn") + 1
    else:
        fetch = F.explode(F.sequence(F.col("_mrn"), F.col("_mrn") + (k - 1)))
        jrank = F.col("_rn") - F.col("_mrn") + 1
    cand = (
        staged.where(F.col("_mrn").isNotNull())
        .withColumn("_fetch", fetch)
        .withColumn("_rn", F.col("_fetch").cast("int"))
        .select(*on, "_t", "_lpay", "_lid", "_mrn", "_rn")
    )
    fetched = cand.join(rnum, on=[*on, "_rn"], how="inner")
    if tolerance is not None:
        tol_us = parse_duration(tolerance).microseconds
        dist = F.abs(
            F.unix_micros(F.col("_t")) - F.unix_micros(F.col(right_ts_col))
        )
        fetched = fetched.where(dist <= tol_us)
    matched = fetched.select(
        *l_out,
        *[F.col(c).alias(f"{right_prefix}{c}") for c in rcols],
        jrank.cast("int").alias("_jrank"),
    )
    if tolerance is not None:
        # tolerance may have emptied some left rows' matches — restore
        # LEFT semantics for those rows, re-identified by surrogate id
        # (NULL-safe, duplicate-safe)
        lost = (
            staged.where(F.col("_mrn").isNotNull())
            .join(fetched.select("_lid").distinct(), on="_lid", how="left_anti")
            .select(*l_out, *null_out, F.lit(None).cast("int").alias("_jrank"))
        )
        unmatched = unmatched.unionByName(lost)
    return matched.unionByName(unmatched)


def window_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    lower: "str | int | Duration",
    upper: "str | int | Duration",
    ts_col: str = "ts",
    right_ts_col: "str | None" = None,
    jlimit: "int | None" = None,
    right_prefix: str = "r_",
    how: str = "left",
) -> DataFrame:
    """WINDOW JOIN ... WINDOW_OFFSET(lower, upper) [JLIMIT k]: for each
    left row, all right rows with r.ts ∈ [l.ts+lower, l.ts+upper].

    Implemented as a *bucketed* range join: both sides bucketed at the
    window width; the right side is exploded into the (at most 3)
    candidate buckets; the join is a pure equi-join on (keys, bucket),
    then the exact range filter is applied. Keeps Catalyst on the
    sort-merge/shuffled-hash equi-join path — no BroadcastNestedLoopJoin.
    """
    right_ts_col = right_ts_col or ts_col
    lo_us = _signed_us(lower)
    hi_us = _signed_us(upper)
    if hi_us < lo_us:
        raise ValueError("WINDOW_OFFSET upper < lower")
    width = max(hi_us - lo_us, 1)

    l_us = F.unix_micros(F.col(ts_col))
    r_us = F.unix_micros(F.col(right_ts_col))

    if jlimit:
        # JLIMIT ranks the matches of each left ROW — a (keys, ts) window
        # would make two left rows sharing (key, ts) but differing in
        # payload split one rank sequence; a surrogate id keeps each left
        # row's k-budget its own. Deterministic (row_number within
        # (key, exact ts) ordered by row-hash) so the rank window
        # survives nondeterministic recomputation, unlike
        # monotonically_increasing_id; the numbering groups are
        # same-instant duplicates — tiny, no skew even keyless.
        row_hash = F.xxhash64(F.struct(*[F.col(c) for c in left.columns]))
        left = left.withColumn(
            "_lid",
            F.row_number().over(
                Window.partitionBy(*on, ts_col).orderBy(row_hash.asc())
            ),
        )
    lb = left.withColumn("_lb", F.floor((l_us + lo_us) / width)).alias("l")
    rcols = [c for c in right.columns if c not in on]
    rb = (
        right.withColumn("_b0", F.floor(r_us / width))
        .withColumn("_cand", F.explode(F.sequence(F.col("_b0") - 1, F.col("_b0") + 1)))
        .select(*on, F.col("_cand").alias("_lb"), *[F.col(c).alias(f"{right_prefix}{c}") for c in rcols])
        .alias("r")
    )
    # LEFT semantics come from the join itself: the exact-range predicate
    # rides along as a join condition on the bucket equi-join, so
    # unmatched left rows null-extend in the same single join — no
    # second scan of `left`, no distinct + anti-join reattachment (the
    # old path re-computed the whole left lineage and shuffled 3 extra
    # times). Each right row can satisfy a given left row's bucket in at
    # most one of its 3 candidate buckets, so no duplicates arise.
    pr_us = F.unix_micros(F.col(f"r.{right_prefix}{right_ts_col}"))
    pl_us = F.unix_micros(F.col(f"l.{ts_col}"))
    cond = F.col("l._lb") == F.col("r._lb")
    for c in on:
        cond &= F.col(f"l.{c}") == F.col(f"r.{c}")
    cond &= (pr_us >= pl_us + lo_us) & (pr_us <= pl_us + hi_us)
    joined = lb.join(rb, cond, how="left" if how == "left" else "inner").select(
        *[F.col(f"l.{c}") for c in left.columns],
        *[F.col(f"r.{right_prefix}{c}") for c in rcols],
    )
    if jlimit:
        # deterministic rank: right ts first, remaining right payload as
        # tiebreak among ts-equal matches
        order = [F.col(f"{right_prefix}{right_ts_col}").asc()] + [
            F.col(f"{right_prefix}{c}").asc()
            for c in rcols
            if c != right_ts_col
        ]
        # _lid numbers within (key, ts) — those columns complete the
        # per-left-row identity
        w = Window.partitionBy(*on, ts_col, "_lid").orderBy(*order)
        joined = (
            joined.withColumn("_jrn", F.row_number().over(w))
            .where(F.col("_jrn") <= jlimit)
            .drop("_jrn", "_lid")
        )
    return joined


def _signed_us(spec: "str | int | Duration") -> int:
    if isinstance(spec, str) and spec.strip().startswith("-"):
        return -parse_duration(spec.strip()[1:]).microseconds
    if isinstance(spec, int) and spec < 0:
        return -parse_duration(-spec).microseconds
    return parse_duration(spec).microseconds
