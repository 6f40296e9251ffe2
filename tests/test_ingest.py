"""Ingest path: partitioned append, keep-last dedup across batches,
compaction, and the schemaless line protocols."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from tdengine_spark.sources.ingest import append_batch, compact_partition, read_table
from tdengine_spark.sources.schemaless import (
    explode_fields,
    parse_influx_lines,
    parse_opentsdb_telnet,
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="tds_ingest_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "tbname string, ts timestamp, v double"
    ).select("tbname", F.col("ts").cast("timestamp").alias("ts"), "v")


def test_append_dedup_across_batches(spark, tmpdir):
    path = f"{tmpdir}/meters"
    b1 = spark.createDataFrame(
        [("d0", "2024-01-01 00:00:00", 1.0), ("d0", "2024-01-02 00:00:00", 2.0)],
        "tbname string, ts string, v double",
    ).select("tbname", F.col("ts").cast("timestamp").alias("ts"), "v")
    append_batch(b1, path, version=1)
    # second batch overwrites the first row (same tbname+ts, newer version)
    b2 = spark.createDataFrame(
        [("d0", "2024-01-01 00:00:00", 99.0)], "tbname string, ts string, v double"
    ).select("tbname", F.col("ts").cast("timestamp").alias("ts"), "v")
    append_batch(b2, path, version=2)

    got = {(r.tbname, str(r.ts)): r.v for r in read_table(spark, path).collect()}
    assert got[("d0", "2024-01-01 00:00:00")] == 99.0
    assert got[("d0", "2024-01-02 00:00:00")] == 2.0
    # raw storage still holds 3 physical rows until compaction
    assert spark.read.parquet(path).count() == 3
    # time partitioning materialized as ts_bucket dirs
    import os

    assert any(d.startswith("ts_bucket=") for d in os.listdir(path))


def test_compaction(spark, tmpdir):
    path = f"{tmpdir}/meters"
    for ver in (1, 2, 3):
        b = spark.createDataFrame(
            [("d0", "2024-01-01 00:00:00", float(ver))],
            "tbname string, ts string, v double",
        ).select("tbname", F.col("ts").cast("timestamp").alias("ts"), "v")
        append_batch(b, path, version=ver)
    assert spark.read.parquet(path).count() == 3
    compact_partition(spark, path, "20240101000000")
    assert spark.read.parquet(path).count() == 1
    assert read_table(spark, path).first().v == 3.0


def test_influx_line_protocol(spark):
    lines = spark.createDataFrame(
        [
            ('meters,location=SF,groupid=2 current=10.3,voltage=219i,phase=0.31 1714530000000000000',),
            ('meters,location=LA current=12.6,voltage=218i 1714530001000000000',),
            ('bad line without fields',),
        ],
        "value string",
    )
    parsed = parse_influx_lines(lines, precision="ns")
    rows = parsed.collect()
    assert len(rows) == 3  # malformed line parses to empty maps, null ts
    good = [r for r in rows if r.ts is not None]
    assert len(good) == 2
    m = good[0]
    assert m.measurement == "meters"
    assert m.tags["location"] == "SF"
    assert m.fields["voltage"] == "219"  # i-suffix stripped

    typed = explode_fields(parsed.where(F.col("ts").isNotNull()),
                           ["current", "voltage"], ["location"])
    got = {r.location: (r.current, r.voltage) for r in typed.collect()}
    assert got["SF"] == (10.3, 219.0)
    assert got["LA"] == (12.6, 218.0)


def test_opentsdb_telnet(spark):
    lines = spark.createDataFrame(
        [
            ("put sys.cpu.user 1714530000 42.5 host=web01 dc=lga",),
            ("put sys.cpu.user 1714530000123 43.0 host=web02",),
            ("get not_a_put_line 0 0",),
        ],
        "value string",
    )
    rows = parse_opentsdb_telnet(lines).collect()
    assert len(rows) == 2
    by_host = {r.tags["host"]: r for r in rows}
    assert by_host["web01"].value == 42.5
    assert str(by_host["web01"].ts) == "2024-05-01 02:20:00"  # seconds heuristic
    assert str(by_host["web02"].ts) == "2024-05-01 02:20:00.123000"  # ms heuristic


def test_opentsdb_json(spark):
    from tdengine_spark.sources.schemaless import parse_opentsdb_json

    lines = spark.createDataFrame(
        [
            ('{"metric": "cpu", "timestamp": 1700000000, "value": 0.5, '
             '"tags": {"host": "a"}}',),
            ('[{"metric": "mem", "timestamp": 1700000000000, "value": 1.5, '
             '"tags": {"host": "b"}}, '
             '{"metric": "mem", "timestamp": 1700000001000, "value": 2.5, '
             '"tags": {"host": "c"}}]',),
            ("not json",),
        ],
        "value string",
    )
    out = parse_opentsdb_json(lines).collect()
    assert len(out) == 3
    got = {(r.metric, r.tags["host"]): (str(r.ts), r.value) for r in out}
    # seconds and milliseconds resolve to the same instant
    assert got[("cpu", "a")] == ("2023-11-14 22:13:20", 0.5)
    assert got[("mem", "b")] == ("2023-11-14 22:13:20", 1.5)
    assert got[("mem", "c")] == ("2023-11-14 22:13:21", 2.5)
