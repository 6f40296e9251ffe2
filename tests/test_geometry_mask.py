"""Geometry POINT subset + masking/security scalar functions."""

import pytest
from pyspark.sql import functions as F

from tdengine_spark.functions import geometry as G
from tdengine_spark.functions.masking import mask_full, mask_none, mask_partial


def test_point_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, "POINT (1.5 -2.25)"), (2, "POINT(3 4)"), (3, "LINESTRING (0 0, 1 1)")],
        "id int, wkt string",
    )
    out = {
        r.id: r.txt
        for r in df.select(
            "id", G.st_astext(G.st_geomfromtext("wkt"), 2).alias("txt")
        ).collect()
    }
    assert out[1] == "POINT (1.50 -2.25)"
    assert out[2] == "POINT (3.00 4.00)"
    assert out[3] is None  # unsupported shape gates to NULL


def test_point_predicates(spark):
    df = spark.createDataFrame([(3.0, 4.0)], "x double, y double")
    row = df.select(
        G.st_equals(
            G.st_makepoint(F.col("x"), F.col("y")), G.st_makepoint(3.0, 4.0)
        ).alias("eq"),
        G.st_intersects(
            G.st_makepoint(F.col("x"), F.col("y")), G.st_makepoint(0.0, 0.0)
        ).alias("inter"),
        G.st_distance(G.st_makepoint(0.0, 0.0), G.st_makepoint(F.col("x"), F.col("y"))).alias("d"),
        G.st_x(G.st_makepoint(F.col("x"), F.col("y"))).alias("px"),
    ).first()
    assert row.eq is True
    assert row.inter is False
    assert row.d == 5.0
    assert row.px == 3.0


def test_unsupported_shape_gate():
    with pytest.raises(NotImplementedError):
        G.unsupported_shape()


def test_masking(spark):
    df = spark.createDataFrame(
        [("4111111111111111",), ("ab",), (None,)], "s string"
    )
    out = df.select(
        mask_full("s").alias("full"),
        mask_partial("s", 4, 4).alias("part"),
        mask_none("s").alias("none"),
    ).collect()
    assert out[0].full == "****************"
    assert out[0].part == "4111********1111"
    assert out[0].none == "4111111111111111"
    assert out[1].part == "ab"  # shorter than keep-width: unchanged
    assert out[2].full is None
