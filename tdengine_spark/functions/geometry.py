"""Geometry functions (reference source/libs/geometry/, builtins.c
st_* registry). The reference links libgeos; this container has no
geometry library, so the POINT subset — which covers the reference's
own test corpus shapes — is implemented as pure Catalyst expressions
over WKT strings and little-endian WKB bytes. Polygon/linestring
predicates raise NotImplementedError behind a clear gate.

Representation: geometry = WKB BinaryType (the reference stores WKB
too, SURVEY §1.2 GEOMETRY row). POINT WKB layout (little-endian):
  byte 0   : 0x01 (LE)
  bytes 1-4: type = 1 (point)
  bytes 5-12 / 13-20: x, y as IEEE-754 doubles
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_POINT_WKT_RE = r"^\s*POINT\s*\(\s*(-?[0-9.eE+]+)\s+(-?[0-9.eE+]+)\s*\)\s*$"


def st_makepoint(x: "Column | float", y: "Column | float") -> Column:
    """st_makepoint(x, y) → WKB point (builtins.c:5525)."""
    xc = x if isinstance(x, Column) else F.lit(float(x))
    yc = y if isinstance(y, Column) else F.lit(float(y))
    header = F.lit(bytes([1, 1, 0, 0, 0]))

    def le_double(c: Column) -> Column:
        # double → IEEE-754 bits via JVM reflection (no double→binary
        # builtin exists), then hex → bytes, reversed to little-endian
        bits = F.call_function(
            "reflect",
            F.lit("java.lang.Double"),
            F.lit("doubleToRawLongBits"),
            c.cast("double"),
        ).cast("long")
        return F.reverse(F.unhex(F.lpad(F.hex(bits), 16, "0")))

    return F.concat(header, le_double(xc), le_double(yc))


def st_geomfromtext(wkt: "Column | str") -> Column:
    """st_geomfromtext('POINT (x y)') → WKB (builtins.c:5483).
    Non-point WKT yields NULL (gate for unsupported shapes)."""
    c = F.col(wkt) if isinstance(wkt, str) else wkt
    # try_cast: non-point WKT regexes to '' which ANSI cast rejects
    x = F.regexp_extract(c, _POINT_WKT_RE, 1).try_cast("double")
    y = F.regexp_extract(c, _POINT_WKT_RE, 2).try_cast("double")
    return F.when(x.isNotNull() & y.isNotNull(), st_makepoint(x, y))


def st_x(geom: "Column | str") -> Column:
    """x coordinate of a WKB point."""
    c = F.col(geom) if isinstance(geom, str) else geom
    return _wkb_double(c, 6)


def st_y(geom: "Column | str") -> Column:
    c = F.col(geom) if isinstance(geom, str) else geom
    return _wkb_double(c, 14)


def _wkb_double(c: Column, pos: int) -> Column:
    """Read a little-endian double at 1-based byte offset ``pos``:
    reverse to big-endian, reassemble the bits, longBitsToDouble."""
    hx = F.hex(F.reverse(F.substring(c, pos, 8)))
    # conv() can't produce the sign bit; split top nibble + low 60 bits
    low = F.conv(F.substring(hx, 2, 15), 16, 10).cast("long")
    top = F.conv(F.substring(hx, 1, 1), 16, 10).cast("long")
    bits = low + F.shiftleft(top, 60)
    # NULL guard: reflect() throws IllegalArgumentException on null args
    return F.when(
        c.isNotNull(),
        F.call_function(
            "reflect", F.lit("java.lang.Double"), F.lit("longBitsToDouble"), bits
        ).cast("double"),
    )


def st_astext(geom: "Column | str", decimals: int = 6) -> Column:
    """st_astext(wkb) → 'POINT (x y)' (builtins.c:5504)."""
    c = F.col(geom) if isinstance(geom, str) else geom
    fmt = f"%.{decimals}f"
    return F.when(
        _wkb_is_point(c),
        F.concat(
            F.lit("POINT ("),
            F.format_string(fmt, st_x(c)),
            F.lit(" "),
            F.format_string(fmt, st_y(c)),
            F.lit(")"),
        ),
    )


def _wkb_is_point(c: Column) -> Column:
    return (F.length(c) == 21) & (F.substring(c, 2, 1) == F.lit(bytes([1])))


def st_equals(a: Column, b: Column) -> Column:
    """st_equals for points: coordinate equality (builtins.c:5567)."""
    return (st_x(a) == st_x(b)) & (st_y(a) == st_y(b))


def st_intersects(a: Column, b: Column) -> Column:
    """st_intersects for points ≡ equality (builtins.c:5546)."""
    return st_equals(a, b)


def st_contains(a: Column, b: Column) -> Column:
    """st_contains point⊇point ≡ equality (builtins.c:5630)."""
    return st_equals(a, b)


def st_distance(a: Column, b: Column) -> Column:
    """Euclidean distance between two points (beyond-reference helper,
    useful for geo bucketing)."""
    dx = st_x(a) - st_x(b)
    dy = st_y(a) - st_y(b)
    return F.sqrt(dx * dx + dy * dy)


def unsupported_shape(*_args, **_kwargs):
    """Gate for non-point geometry predicates (needs libgeos/Sedona)."""
    raise NotImplementedError(
        "only POINT geometries are supported without a geometry library; "
        "install Apache Sedona for full predicates"
    )
