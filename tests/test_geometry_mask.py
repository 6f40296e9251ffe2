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


def test_geom_polygon_roundtrip_and_predicates(spark):
    from tdengine_spark.functions.geometry import (
        geom_as_text,
        geom_contains,
        geom_from_text,
        geom_intersects,
    )

    rows = [
        (0, "POINT (2 2)", "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"),      # inside
        (1, "POINT (5 5)", "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"),      # outside
        (2, "POINT (0 0)", "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"),      # on corner
        (3, "LINESTRING (0 5, 5 0)", "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"),  # crosses
        (4, "LINESTRING (10 10, 12 12)", "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"),
        (5, "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))",
            "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"),                      # nested
    ]
    df = spark.createDataFrame(rows, "i long, a string, b string")
    out = df.select(
        "i",
        geom_intersects(geom_from_text("a"), geom_from_text("b")).alias("ix"),
        geom_contains(geom_from_text("b"), geom_from_text("a")).alias("ct"),
        geom_as_text(geom_from_text("a")).alias("wkt"),
    ).collect()
    got = {r.i: (r.ix, r.ct) for r in out}
    assert got[0] == (True, True)
    assert got[1] == (False, False)
    assert got[2] == (True, True)   # boundary counts as contained
    assert got[3] == (True, False)  # crosses but not contained
    assert got[4] == (False, False)
    assert got[5] == (True, True)   # nested polygon contained
    wkts = {r.i: r.wkt for r in out}
    assert wkts[0] == "POINT (2.000000 2.000000)"
    assert wkts[3].startswith("LINESTRING (0.000000 5.000000")
    assert wkts[5].startswith("POLYGON ((1.000000 1.000000")


def test_geom_polygon_with_hole(spark):
    from tdengine_spark.functions.geometry import geom_contains, geom_from_text

    donut = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"
    rows = [(0, "POINT (2 2)", donut), (1, "POINT (5 5)", donut)]
    df = spark.createDataFrame(rows, "i long, p string, g string")
    out = {
        r.i: r.c
        for r in df.select(
            "i", geom_contains(geom_from_text("g"), geom_from_text("p")).alias("c")
        ).collect()
    }
    assert out[0] is True    # in the ring
    assert out[1] is False   # in the hole


def test_totp_rfc6238_vectors(spark):
    """Official RFC 6238 SHA-1 test vectors (secret '12345678901234567890')."""
    import base64

    from pyspark.sql import functions as F

    from tdengine_spark.functions.masking import totp

    secret = base64.b32encode(b"12345678901234567890").decode()
    vectors = [(59, "94287082"), (1111111109, "07081804"), (1234567890, "89005924")]
    df = spark.createDataFrame(
        [(secret, t * 1_000_000) for t, _ in vectors], "k string, us long"
    ).select("k", F.timestamp_micros("us").alias("ts"))
    got = [r.c for r in df.select(totp("k", "ts", 8).alias("c")).collect()]
    assert sorted(got) == sorted(v for _, v in vectors)
    # NULL key → NULL code
    nulls = spark.createDataFrame(
        [(None, 59_000_000)], "k string, us long"
    ).select("k", F.timestamp_micros("us").alias("ts"))
    assert nulls.select(totp("k", "ts").alias("c")).first().c is None


def test_cols_selector(spark):
    from pyspark.sql import functions as F

    from tdengine_spark.functions.selection import cols

    ev = spark.createDataFrame(
        [("a", 1, 10.0, "x"), ("a", 2, 20.0, "y"), ("b", 1, 5.0, "z")],
        "k string, ts long, v double, tag string",
    )
    got = {
        r.k: (r.v, r.tag)
        for r in ev.groupBy("k").agg(*cols("ts", "v", "tag")).collect()
    }
    assert got == {"a": (20.0, "y"), "b": (5.0, "z")}
    first = {
        r.k: r.v
        for r in ev.groupBy("k").agg(*cols("ts", "v", how="min")).collect()
    }
    assert first == {"a": 10.0, "b": 5.0}


def test_sm4_vector_and_roundtrip(spark):
    from pyspark.sql import functions as F

    from tdengine_spark.functions.sm4 import sm4_decrypt, sm4_encrypt

    key = bytes.fromhex("0123456789ABCDEFFEDCBA9876543210")
    df = spark.createDataFrame(
        [(1, "attack at dawn"), (2, ""), (3, None)], "i long, msg string"
    )
    enc = df.select("i", sm4_encrypt("msg", key).alias("ct"))
    dec = enc.select("i", sm4_decrypt("ct", key).alias("pt"))
    got = {r.i: (bytes(r.pt).decode() if r.pt is not None else None)
           for r in dec.collect()}
    assert got == {1: "attack at dawn", 2: "", 3: None}
    # CBC differs from ECB for multi-block input and round-trips
    long = spark.createDataFrame(
        [(0, "x" * 64)], "i long, msg string"
    )
    iv = bytes(range(16))
    ecb = bytes(long.select(sm4_encrypt("msg", key).alias("c")).first().c)
    cbc = bytes(
        long.select(sm4_encrypt("msg", key, mode="CBC", iv=iv).alias("c")).first().c
    )
    assert ecb != cbc
    back = long.select(
        sm4_decrypt(sm4_encrypt("msg", key, mode="CBC", iv=iv), key,
                    mode="CBC", iv=iv).alias("p")
    ).first().p
    assert bytes(back).decode() == "x" * 64
    # ECB of identical blocks repeats (the known ECB weakness — proves
    # real block-cipher behavior, not a stub)
    assert ecb[:16] == ecb[16:32]


def test_block_dist(spark):
    from tdengine_spark.catalog import block_dist

    out = block_dist(spark, "/root/testdata/sf0.001/events.parquet")
    rows = out.collect()
    assert len(rows) >= 1
    assert sum(r.num_rows for r in rows) == spark.read.parquet(
        "/root/testdata/sf0.001/events.parquet"
    ).count()
    assert all(r.compressed_bytes > 0 and r.total_bytes > 0 for r in rows)


def test_sm4_official_vector():
    """GB/T 32907-2016 appendix A known-answer test (no Spark needed)."""
    import numpy as np

    from tdengine_spark.functions.sm4 import _crypt_blocks, _round_keys

    key = bytes.fromhex("0123456789ABCDEFFEDCBA9876543210")
    pt = bytes.fromhex("0123456789ABCDEFFEDCBA9876543210")
    rk = _round_keys(key)
    blocks = np.frombuffer(pt, dtype=">u4").astype(np.uint32).reshape(-1, 4)
    ct = _crypt_blocks(blocks, rk).astype(">u4").tobytes()
    assert ct.hex() == "681edf34d206965e86b3e94f536e4246"
    # decrypt = reversed round keys
    back = _crypt_blocks(
        np.frombuffer(ct, dtype=">u4").astype(np.uint32).reshape(-1, 4), rk[::-1]
    ).astype(">u4").tobytes()
    assert back == pt


def test_geom_equals_touches_covers_containsproperly(spark):
    from tdengine_spark.functions.geometry import (
        geom_containsproperly,
        geom_covers,
        geom_equals,
        geom_from_text,
        geom_touches,
    )

    sq = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
    rows = [
        # (i, a, b) — expected (equals, touches, covers a⊇b, containsproperly)
        (0, sq, "POLYGON ((4 0, 4 4, 0 4, 0 0, 4 0))"),  # same ring rotated
        (1, sq, "POLYGON ((0 0, 0 4, 4 4, 4 0, 0 0))"),  # same ring reversed
        (2, sq, "POLYGON ((4 0, 8 0, 8 4, 4 4, 4 0))"),  # shares edge x=4
        (3, sq, "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))"),  # strictly inside
        (4, sq, "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"),  # inside, shares corner
        (5, sq, "POINT (4 2)"),                          # on boundary
        (6, sq, "POINT (2 2)"),                          # interior point
        (7, sq, "POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))"),  # overlapping
        (8, "LINESTRING (0 0, 2 2, 4 4)", "LINESTRING (4 4, 2 2, 0 0)"),  # reversed line
        (9, "LINESTRING (0 0, 4 4)", "POINT (0 0)"),     # line endpoint
    ]
    df = spark.createDataFrame(rows, "i long, a string, b string")
    out = {
        r.i: (r.eq, r.tc, r.cv, r.cp)
        for r in df.select(
            "i",
            geom_equals(geom_from_text("a"), geom_from_text("b")).alias("eq"),
            geom_touches(geom_from_text("a"), geom_from_text("b")).alias("tc"),
            geom_covers(geom_from_text("a"), geom_from_text("b")).alias("cv"),
            geom_containsproperly(
                geom_from_text("a"), geom_from_text("b")
            ).alias("cp"),
        ).collect()
    }
    assert out[0] == (True, False, True, False)   # equal: covers, no touch
    assert out[1] == (True, False, True, False)
    assert out[2] == (False, True, False, False)  # edge-adjacent squares
    assert out[3] == (False, False, True, True)   # proper containment
    assert out[4] == (False, False, True, False)  # corner contact blocks proper
    assert out[5] == (False, True, True, False)   # boundary point
    assert out[6] == (False, False, True, True)   # interior point
    assert out[7] == (False, False, False, False) # overlap: none of these
    assert out[8] == (True, False, True, False)   # reversed linestring equal
    assert out[9] == (False, True, True, False)   # endpoint touches line
