"""TSMA — time-range materialized pre-aggregation with transparent query
rewrite (reference: CREATE TSMA grammar sql.y:1505; optimizer rule `Tsma`
planOptimizer.c:13157; RSMA rollup taosdef.h:74-84).

Spark-first design: a TSMA is a Parquet table of *algebraic partial
aggregates* (sum/count/min/max per metric) at a base interval width,
partitioned by time bucket. A query for INTERVAL(W) with W a multiple of
the base width re-aggregates the TSMA instead of the raw table:

    avg  = sum(sum_x) / sum(cnt_x)      min = min(min_x)
    sum  = sum(sum_x)                   max = max(max_x)
    count = sum(cnt_x)

Because the TSMA has bucket_width/raw_density fewer rows, the rewrite
reads orders of magnitude less data — the same reason the reference
answers block-SMA queries without touching data. The rewrite lives in
the plan-construction layer (we control plan building; no Catalyst rule
needed), exactly as SURVEY §4.1 prescribes.

RSMA/retention analog: ``rollup_tiers`` materializes coarser TSMAs from
finer ones (L0→L1→L2), never rescanning raw data.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tdengine_spark.durations import parse_duration
from tdengine_spark.operators.timewindow import WSTART, window_start


@dataclass
class TsmaSpec:
    name: str
    path: str
    width_us: int
    keys: list[str]
    metrics: list[str]


def create_tsma(
    spark: SparkSession,
    source: DataFrame,
    path: str,
    width: str,
    ts_col: str = "ts",
    keys: "list[str] | None" = None,
    metrics: "list[str] | None" = None,
) -> TsmaSpec:
    """Materialize the pre-agg table. One shuffle over the raw data, then
    never again for compatible queries."""
    keys = list(keys or [])
    metrics = list(metrics or [])
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for m in metrics:
        aggs += [
            F.sum(m).alias(f"sum_{m}"),
            F.count(m).alias(f"cnt_{m}"),
            F.min(m).alias(f"min_{m}"),
            F.max(m).alias(f"max_{m}"),
        ]
    agg = source.groupBy(
        window_start(ts_col, width).alias(WSTART), *keys
    ).agg(*aggs)
    agg.write.mode("overwrite").parquet(path)
    return TsmaSpec(
        name=path.rsplit("/", 1)[-1],
        path=path,
        width_us=parse_duration(width).microseconds,
        keys=keys,
        metrics=metrics,
    )


class TsmaCatalog:
    """Registered TSMAs for one source table + the transparent rewrite."""

    def __init__(self):
        self._tsmas: list[TsmaSpec] = []

    def register(self, spec: TsmaSpec) -> None:
        self._tsmas.append(spec)

    def best_for(self, width, keys: list[str], metrics: list[str]) -> "TsmaSpec | None":
        """Coarsest TSMA whose width divides the requested width and that
        covers the requested keys+metrics — fewer rows read wins."""
        w = parse_duration(width)
        if w.is_calendar:
            return None
        candidates = [
            s
            for s in self._tsmas
            if w.microseconds % s.width_us == 0
            and set(keys) <= set(s.keys)
            and set(metrics) <= set(s.metrics)
        ]
        return max(candidates, key=lambda s: s.width_us, default=None)

    def interval_agg(
        self,
        spark: SparkSession,
        raw: DataFrame,
        width,
        keys: list[str],
        metric_aggs: dict[str, list[str]],
        ts_col: str = "ts",
    ) -> DataFrame:
        """INTERVAL(width) aggregation, rewritten onto a TSMA when one is
        compatible, else computed from raw. ``metric_aggs`` maps metric →
        subset of {avg,sum,count,min,max}; output columns `<agg>_<metric>`.
        """
        metrics = list(metric_aggs)
        spec = self.best_for(width, keys, metrics)
        if spec is None:
            aggs = []
            for m, ops in metric_aggs.items():
                for op in ops:
                    aggs.append(_raw_agg(op, m))
            return raw.groupBy(
                window_start(ts_col, width).alias(WSTART), *keys
            ).agg(*aggs)
        pre = spark.read.parquet(spec.path)
        aggs = []
        for m, ops in metric_aggs.items():
            for op in ops:
                aggs.append(_rollup_agg(op, m))
        return pre.groupBy(
            window_start(WSTART, width).alias(WSTART), *keys
        ).agg(*aggs)


def _raw_agg(op: str, m: str):
    col = F.col(m)
    fn = {
        "avg": F.avg,
        "sum": F.sum,
        "count": F.count,
        "min": F.min,
        "max": F.max,
    }[op]
    return fn(col).alias(f"{op}_{m}")


def _rollup_agg(op: str, m: str):
    """Re-aggregate algebraic partials (the _merge function pairs of the
    reference's partial/final split, functionMgt.c)."""
    if op == "avg":
        return (F.sum(f"sum_{m}") / F.sum(f"cnt_{m}")).alias(f"avg_{m}")
    if op == "sum":
        return F.sum(f"sum_{m}").alias(f"sum_{m}")
    if op == "count":
        return F.sum(f"cnt_{m}").alias(f"count_{m}")
    if op == "min":
        return F.min(f"min_{m}").alias(f"min_{m}")
    if op == "max":
        return F.max(f"max_{m}").alias(f"max_{m}")
    raise ValueError(f"op {op!r} is not TSMA-rewritable")


def rollup_tiers(
    spark: SparkSession,
    base: TsmaSpec,
    tier_widths: list[str],
    out_root: str,
) -> list[TsmaSpec]:
    """RSMA retention tiers: L1/L2 rollups built FROM the previous tier
    (sum-of-sums etc.), never from raw."""
    specs = [base]
    prev = base
    for i, width in enumerate(tier_widths, start=1):
        w_us = parse_duration(width).microseconds
        if w_us % prev.width_us != 0:
            raise ValueError(f"tier {width} not a multiple of previous tier")
        pre = spark.read.parquet(prev.path)
        aggs = [F.sum("_rows").alias("_rows")]
        for m in prev.metrics:
            aggs += [
                F.sum(f"sum_{m}").alias(f"sum_{m}"),
                F.sum(f"cnt_{m}").alias(f"cnt_{m}"),
                F.min(f"min_{m}").alias(f"min_{m}"),
                F.max(f"max_{m}").alias(f"max_{m}"),
            ]
        out_path = f"{out_root}/L{i}"
        pre.groupBy(
            window_start(WSTART, width).alias(WSTART), *prev.keys
        ).agg(*aggs).write.mode("overwrite").parquet(out_path)
        prev = TsmaSpec(f"L{i}", out_path, w_us, prev.keys, prev.metrics)
        specs.append(prev)
    return specs
