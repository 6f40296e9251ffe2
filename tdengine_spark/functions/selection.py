"""Selection functions — first/last/last_row, top/bottom, tail, unique,
mode, sample (reference builtins.c §2.4; the functions that return *rows*
or ts-anchored values rather than scalars).

All are single-shuffle shapes: either a groupBy with min_by/max_by (which
Spark executes with map-side partial aggregation — the distributed analog
of the reference's per-vgroup partial + qnode merge), or one ranked window
per key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def first_value(ts_col: str, val_col: "str | Column") -> Column:
    """first(x): oldest non-null value by ts (builtins.c:3852)."""
    v = F.col(val_col) if isinstance(val_col, str) else val_col
    return F.min_by(v, F.when(v.isNotNull(), F.col(ts_col)))


def last_value(ts_col: str, val_col: "str | Column") -> Column:
    """last(x): newest non-null value by ts (builtins.c:3930)."""
    v = F.col(val_col) if isinstance(val_col, str) else val_col
    return F.max_by(v, F.when(v.isNotNull(), F.col(ts_col)))


def last_row(df: DataFrame, ts_col: str, partition_by: "list[str] | None" = None) -> DataFrame:
    """last_row(*): the newest row per key regardless of nulls
    (builtins.c:3736; the CACHEMODEL last-row fast path is a materialized
    copy of exactly this aggregate — see streaming/latest.py).
    """
    keys = list(partition_by or [])
    others = [c for c in df.columns if c not in keys]
    packed = df.groupBy(*keys).agg(
        F.max_by(F.struct(*[F.col(c) for c in others]), F.col(ts_col)).alias("_r")
    )
    return packed.select(*keys, *[F.col(f"_r.{c}").alias(c) for c in others])


def top(
    df: DataFrame,
    val_col: str,
    k: int,
    ts_col: str = "ts",
    partition_by: "list[str] | None" = None,
    ordered: bool = True,
) -> DataFrame:
    """top(col, k): the k largest values with their ts (builtins.c:3371).
    Ties broken by newer ts first (reference keeps ts with each value).
    ``ordered=False`` skips the terminal heap-presentation sort (a
    range-partition exchange on output-sized data) for callers whose
    consumers are order-insensitive — the registry gate; the dialect
    keeps the reference's presentation contract (default True)."""
    return _ranked(df, val_col, k, ts_col, partition_by, descending=True,
                   ordered=ordered)


def bottom(
    df: DataFrame,
    val_col: str,
    k: int,
    ts_col: str = "ts",
    partition_by: "list[str] | None" = None,
    ordered: bool = True,
) -> DataFrame:
    """bottom(col, k): the k smallest values with their ts (builtins.c:3406)."""
    return _ranked(df, val_col, k, ts_col, partition_by, descending=False,
                   ordered=ordered)


def _ranked(df, val_col, k, ts_col, partition_by, descending, ordered=True):
    keys = list(partition_by or [])
    order = [
        F.col(val_col).desc() if descending else F.col(val_col).asc(),
        F.col(ts_col).desc(),
    ]
    w = Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(1))
    w = w.orderBy(*order)
    out = (
        df.where(F.col(val_col).isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )
    if not ordered:
        return out
    # presentation: the reference emits the k-heap's array layout
    # (builtinsimpl.c topBotFinalize walks pItems) — a min-heap for top
    # / max-heap for bottom, so top prints values ASCENDING and bottom
    # DESCENDING (exact for the heap root; the reference's own tests
    # only pin full order at k ≤ 2)
    return out.orderBy(
        *keys,
        F.col(val_col).asc() if descending else F.col(val_col).desc(),
        F.col(ts_col).asc(),
    )


def tail(
    df: DataFrame,
    k: int,
    offset: int = 0,
    ts_col: str = "ts",
    partition_by: "list[str] | None" = None,
    pk_col: "str | None" = None,
) -> DataFrame:
    """tail(k[, offset]): last k rows per key, skipping the newest
    ``offset`` rows (builtins.c:4431). ``pk_col``: composite-pk tables
    break duplicate-ts ties on the pk (test_pk_baseline.ans: tail(2)
    over t_dup selects the (ts2, pk2) row)."""
    keys = list(partition_by or [])
    w = Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(1))
    ordc = [F.col(ts_col).desc()]
    if pk_col:
        ordc.append(F.col(pk_col).desc())
    w = w.orderBy(*ordc)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where((F.col("_rn") > offset) & (F.col("_rn") <= offset + k))
        .drop("_rn")
    )


def unique(
    df: DataFrame,
    val_col: str,
    ts_col: str = "ts",
    partition_by: "list[str] | None" = None,
) -> DataFrame:
    """unique(col): first (oldest) occurrence of each distinct value
    (builtins.c:4471)."""
    keys = list(partition_by or [])
    w = Window.partitionBy(*keys, val_col).orderBy(F.col(ts_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def mode(col: "str | Column") -> Column:
    """mode(col): most frequent value (builtins.c:4493)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.mode(c)


def sample(
    df: DataFrame,
    k: int,
    partition_by: "list[str] | None" = None,
    seed: int = 42,
) -> DataFrame:
    """sample(k): k uniformly random rows per key (builtins.c:4400).
    Deterministic under a fixed seed for testability."""
    keys = list(partition_by or [])
    w = Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(1))
    w = w.orderBy(F.rand(seed))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def cols(
    anchor: "str | Column",
    *out_cols: "str | Column",
    how: str = "max",
    prefix: str = "",
) -> "list[Column]":
    """reference ``cols(selector(expr), c1, c2, …)`` (builtins.c:6831):
    values of c1…cn taken from the row the selector picks. ``how='max'``
    ≙ cols(last/max(anchor), …), ``how='min'`` ≙ cols(first/min(…), …).
    Returns aggregate Columns usable in any groupBy — implemented as
    max_by/min_by so Spark runs it as one hash aggregate."""
    a = F.col(anchor) if isinstance(anchor, str) else anchor
    fn = F.max_by if how == "max" else F.min_by
    out = []
    for c in out_cols:
        col = F.col(c) if isinstance(c, str) else c
        name = c if isinstance(c, str) else "col"
        out.append(fn(col, a).alias(f"{prefix}{name}"))
    return out
