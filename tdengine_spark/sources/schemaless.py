"""Schemaless ingest protocols (reference client/src/clientSml*.c):
InfluxDB line protocol, OpenTSDB telnet, OpenTSDB JSON.

Parsing is done with JVM-side regex/split expressions over a DataFrame
of raw lines — so a 100 TB backfill of line-protocol files is one
distributed scan, not a driver loop. Tag/field maps come back as
MapType columns; ``explode_fields`` pivots chosen fields into typed
columns (the reference auto-creates child tables per tag set — here the
tag map IS the tbname/tags).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: line protocol: measurement[,tag=v...] field=v[,field=v...] [ts]
_MEASUREMENT_RE = r"^([^,\s]+)"


def parse_influx_lines(
    lines: DataFrame, line_col: str = "value", precision: str = "ns"
) -> DataFrame:
    """InfluxDB line protocol → (measurement, tags map, fields map, ts).

    Numeric field suffixes (``i`` for ints) and quoted strings follow the
    protocol; the field map keeps raw strings and ``field_double`` casts
    on demand.
    """
    c = F.col(line_col)
    measurement = F.regexp_extract(c, _MEASUREMENT_RE, 1)
    # split into the 3 space-separated sections (tags glued to measurement)
    head = F.regexp_extract(c, r"^(\S+)", 1)
    fields_str = F.regexp_extract(c, r"^\S+\s+(\S+)", 1)
    ts_str = F.regexp_extract(c, r"^\S+\s+\S+\s+(\d+)\s*$", 1)
    tags_str = F.when(
        head.contains(","), F.regexp_replace(head, r"^[^,]+,", "")
    ).otherwise(F.lit(""))

    def kv_map(col, is_fields=False):
        pairs = F.filter(F.split(col, ","), lambda p: p.contains("="))

        def clean(v):
            if is_fields:
                # drop the protocol's integer suffix ONLY on int-shaped
                # values (42i → 42) — a bare `i$` rule would truncate
                # string values ending in 'i' (host=raspi → 'rasp')
                v = F.regexp_replace(v, r"^(-?\d+)[iu]$", "$1")
                v = F.regexp_replace(v, r'^"|"$', "")
            return v

        return F.map_from_arrays(
            F.transform(pairs, lambda p: F.split(p, "=")[0]),
            F.transform(pairs, lambda p: clean(F.split(p, "=")[1])),
        )

    staged = lines.select(
        measurement.alias("measurement"),
        kv_map(tags_str).alias("tags"),
        kv_map(fields_str, is_fields=True).alias("fields"),
        F.when(ts_str == "", F.lit(None)).otherwise(ts_str.cast("long")).alias(
            "_ts_raw"
        ),
    ).where(F.col("measurement") != "")
    if precision == "ns":
        # integer `div`: float division loses precision on ns-scale int64
        ts = F.timestamp_micros(F.expr("_ts_raw div 1000"))
    elif precision == "us":
        ts = F.timestamp_micros(F.col("_ts_raw"))
    else:
        ts = F.timestamp_millis(F.col("_ts_raw"))
    return staged.withColumn("ts", ts).drop("_ts_raw")


def parse_opentsdb_telnet(lines: DataFrame, line_col: str = "value") -> DataFrame:
    """``put <metric> <ts> <value> <tagk=tagv> ...`` → typed rows."""
    c = F.col(line_col)
    parts = F.split(F.trim(c), r"\s+")
    tag_pairs = F.filter(
        F.slice(parts, 4, 1000), lambda p: p.contains("=")
    )
    ts_raw = parts[2].cast("long")
    # seconds vs milliseconds by magnitude (OpenTSDB convention)
    ts = F.when(ts_raw < 10_000_000_000, F.timestamp_seconds(ts_raw)).otherwise(
        F.timestamp_millis(ts_raw)
    )
    return lines.where(parts[0] == "put").select(
        parts[1].alias("metric"),
        ts.alias("ts"),
        parts[3].cast("double").alias("value"),
        F.map_from_arrays(
            F.transform(tag_pairs, lambda p: F.split(p, "=")[0]),
            F.transform(tag_pairs, lambda p: F.split(p, "=")[1]),
        ).alias("tags"),
    )


def parse_opentsdb_json(lines: DataFrame, line_col: str = "value") -> DataFrame:
    """OpenTSDB JSON protocol (clientSmlJson.c): each line is one object
    ``{"metric": m, "timestamp": t, "value": v, "tags": {...}}`` or an
    ARRAY of such objects — arrays are exploded so mixed files work.
    Seconds vs milliseconds resolved by magnitude like the telnet path.
    All JVM-side (from_json + explode): a backfill is one scan."""
    c = F.trim(F.col(line_col))
    schema = "array<struct<metric:string, timestamp:long, value:double, tags:map<string,string>>>"
    # normalize single objects to 1-element arrays so one from_json serves both
    arr = F.when(c.startswith("["), c).otherwise(F.concat(F.lit("["), c, F.lit("]")))
    rows = lines.select(
        F.explode(F.from_json(arr, schema)).alias("r")
    ).select("r.metric", "r.timestamp", "r.value", "r.tags")
    ts_raw = F.col("timestamp")
    ts = F.when(ts_raw < 10_000_000_000, F.timestamp_seconds(ts_raw)).otherwise(
        F.timestamp_millis(ts_raw)
    )
    return rows.where(F.col("metric").isNotNull()).select(
        "metric", ts.alias("ts"), "value", "tags"
    )


def explode_fields(
    parsed: DataFrame, fields: list[str], tags: "list[str] | None" = None
) -> DataFrame:
    """Pivot selected fields/tags out of the maps into typed columns —
    the super-table projection of a schemaless batch."""
    cols = [F.col("measurement"), F.col("ts")]
    for tg in tags or []:
        cols.append(F.col("tags").getItem(tg).alias(tg))
    for fl in fields:
        cols.append(F.col("fields").getItem(fl).cast("double").alias(fl))
    return parsed.select(*cols)
