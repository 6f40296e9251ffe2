"""Geometry functions (reference source/libs/geometry/, builtins.c
st_* registry). The reference links libgeos; this container has no
geometry library, so:

  - the POINT fast path is pure Catalyst expressions over WKT strings
    and little-endian WKB bytes (scan-speed, no Python);
  - LINESTRING / POLYGON constructors and predicates are Arrow-batched
    numpy kernels (``geom_from_text``/``geom_intersects``/…): WKB
    parse + ray-casting / segment-orientation math per shape. Geometry
    predicates are inherently per-shape; the batched UDF amortizes the
    Arrow transfer and keeps the vertex loops in numpy.

Representation: geometry = WKB BinaryType (the reference stores WKB
too, SURVEY §1.2 GEOMETRY row), little-endian:
  byte 0   : 0x01 (LE)
  bytes 1-4: type (1 point, 2 linestring, 3 polygon)
  point: x, y doubles; linestring: n + n·(x,y); polygon: nrings +
  per ring (n + n·(x,y)), first ring = shell, rest = holes.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

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


# ---------------------------------------------------------------------------
# full-shape path: WKT/WKB parse + predicates in numpy (no geos needed)
# ---------------------------------------------------------------------------


def _parse_wkt(s: str):
    """WKT → (type, coords). point: (x,y); linestring: (n,2) array;
    polygon: [ring arrays] (first = shell). Returns None on bad WKT."""
    if s is None:
        return None
    s = s.strip()
    up = s.upper()

    def ring(txt: str) -> np.ndarray:
        pts = [p.split() for p in txt.split(",")]
        return np.array([[float(a), float(b)] for a, b, *_ in pts])

    try:
        if up.startswith("POINT"):
            inner = s[s.index("(") + 1 : s.rindex(")")]
            x, y, *_ = inner.split()
            return ("point", (float(x), float(y)))
        if up.startswith("LINESTRING"):
            inner = s[s.index("(") + 1 : s.rindex(")")]
            return ("linestring", ring(inner))
        if up.startswith("POLYGON"):
            inner = s[s.index("(") + 1 : s.rindex(")")]
            rings = []
            depth, start = 0, None
            for i, ch in enumerate(inner):
                if ch == "(":
                    if depth == 0:
                        start = i + 1
                    depth += 1
                elif ch == ")":
                    depth -= 1
                    if depth == 0:
                        rings.append(ring(inner[start:i]))
            return ("polygon", rings)
    except (ValueError, IndexError):
        return None
    return None


_TYPE_CODE = {"point": 1, "linestring": 2, "polygon": 3}


def _geom_to_wkb(g) -> "bytes | None":
    if g is None:
        return None
    kind, data = g
    out = [struct.pack("<BI", 1, _TYPE_CODE[kind])]
    if kind == "point":
        out.append(struct.pack("<dd", *data))
    elif kind == "linestring":
        out.append(struct.pack("<I", len(data)))
        out.append(np.asarray(data, dtype="<f8").tobytes())
    else:
        out.append(struct.pack("<I", len(data)))
        for r in data:
            out.append(struct.pack("<I", len(r)))
            out.append(np.asarray(r, dtype="<f8").tobytes())
    return b"".join(out)


def _wkb_to_geom(b: "bytes | None"):
    if b is None or len(b) < 5:
        return None
    code = struct.unpack_from("<I", b, 1)[0]
    if code == 1:
        return ("point", struct.unpack_from("<dd", b, 5))
    if code == 2:
        n = struct.unpack_from("<I", b, 5)[0]
        arr = np.frombuffer(b, dtype="<f8", count=2 * n, offset=9)
        return ("linestring", arr.reshape(n, 2))
    if code == 3:
        nrings = struct.unpack_from("<I", b, 5)[0]
        off, rings = 9, []
        for _ in range(nrings):
            n = struct.unpack_from("<I", b, off)[0]
            off += 4
            rings.append(
                np.frombuffer(b, dtype="<f8", count=2 * n, offset=off).reshape(n, 2)
            )
            off += 16 * n
        return ("polygon", rings)
    return None


def _pt_in_ring(x: float, y: float, ring: np.ndarray) -> bool:
    """Ray casting, boundary counts as inside (vectorized over edges)."""
    x1, y1 = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    # on-edge check: collinear + within bbox
    cross = (x2 - x1) * (y - y1) - (y2 - y1) * (x - x1)
    on = (np.abs(cross) < 1e-12) & (
        (np.minimum(x1, x2) - 1e-12 <= x) & (x <= np.maximum(x1, x2) + 1e-12)
        & (np.minimum(y1, y2) - 1e-12 <= y) & (y <= np.maximum(y1, y2) + 1e-12)
    )
    if on.any():
        return True
    straddle = (y1 > y) != (y2 > y)
    with np.errstate(divide="ignore", invalid="ignore"):
        xin = x1 + (y - y1) / (y2 - y1) * (x2 - x1)
    return int(np.count_nonzero(straddle & (x < xin))) % 2 == 1


def _pt_in_polygon(x: float, y: float, rings) -> bool:
    if not rings or not _pt_in_ring(x, y, rings[0]):
        return False
    return not any(_pt_in_ring(x, y, hole) for hole in rings[1:])


def _segs(g):
    """All boundary segments of a geometry as (m,2,2)."""
    kind, data = g
    if kind == "point":
        return np.empty((0, 2, 2))
    if kind == "linestring":
        return np.stack([data[:-1], data[1:]], axis=1) if len(data) > 1 else np.empty((0, 2, 2))
    segs = []
    for r in data:
        if len(r) > 1:
            segs.append(np.stack([r[:-1], r[1:]], axis=1))
    return np.concatenate(segs) if segs else np.empty((0, 2, 2))


def _segs_relate(sa: np.ndarray, sb: np.ndarray) -> "tuple[bool, bool]":
    """(proper, touching): any segment of sa properly crosses any of sb
    (interiors intersect transversally) / any endpoint lies on the other
    segment — one vectorized orientation test over the m×n pair grid."""
    if not len(sa) or not len(sb):
        return False, False
    p1 = sa[:, None, 0]; p2 = sa[:, None, 1]
    q1 = sb[None, :, 0]; q2 = sb[None, :, 1]

    def orient(a, b, c):
        return (b[..., 0] - a[..., 0]) * (c[..., 1] - a[..., 1]) - (
            b[..., 1] - a[..., 1]
        ) * (c[..., 0] - a[..., 0])

    d1, d2 = orient(p1, p2, q1), orient(p1, p2, q2)
    d3, d4 = orient(q1, q2, p1), orient(q1, q2, p2)
    proper = ((d1 * d2) < 0) & ((d3 * d4) < 0)

    def on_seg(a, b, c, d):
        return (np.abs(d) < 1e-12) & (
            (np.minimum(a[..., 0], b[..., 0]) - 1e-12 <= c[..., 0])
            & (c[..., 0] <= np.maximum(a[..., 0], b[..., 0]) + 1e-12)
            & (np.minimum(a[..., 1], b[..., 1]) - 1e-12 <= c[..., 1])
            & (c[..., 1] <= np.maximum(a[..., 1], b[..., 1]) + 1e-12)
        )

    touch = (
        on_seg(p1, p2, q1, d1) | on_seg(p1, p2, q2, d2)
        | on_seg(q1, q2, p1, d3) | on_seg(q1, q2, p2, d4)
    )
    return bool(proper.any()), bool(touch.any())


def _segs_cross(sa: np.ndarray, sb: np.ndarray) -> bool:
    """Any segment of sa properly or improperly intersects any of sb."""
    proper, touch = _segs_relate(sa, sb)
    return proper or touch


def _vertices(g) -> np.ndarray:
    kind, data = g
    if kind == "point":
        return np.array([data])
    if kind == "linestring":
        return data
    return np.concatenate(data) if data else np.empty((0, 2))


def _geom_intersects(a, b) -> "bool | None":
    if a is None or b is None:
        return None
    for x, y in ((a, b), (b, a)):
        if x[0] == "point":
            px, py = x[1]
            if y[0] == "point":
                return px == y[1][0] and py == y[1][1]
            if y[0] == "polygon":
                return _pt_in_polygon(px, py, y[1])
            return bool(
                _segs_cross(np.array([[[px, py], [px, py]]]), _segs(y))
            )
    if _segs_cross(_segs(a), _segs(b)):
        return True
    # no boundary crossing: containment (one inside the other)
    for outer, inner in ((a, b), (b, a)):
        if outer[0] == "polygon" and len(_vertices(inner)):
            vx, vy = _vertices(inner)[0]
            if _pt_in_polygon(vx, vy, outer[1]):
                return True
    return False


def _geom_contains(a, b) -> "bool | None":
    """a ⊇ b for simple shapes: every vertex of b inside a, and b's
    boundary does not properly cross a's (shared edges allowed)."""
    if a is None or b is None:
        return None
    if a[0] == "point":
        return b[0] == "point" and tuple(a[1]) == tuple(b[1])
    if a[0] == "linestring":
        if b[0] != "point":
            return False  # linestring containment beyond points: not needed
        return bool(
            _segs_cross(np.array([[list(b[1]), list(b[1])]]), _segs(a))
        )
    verts = _vertices(b)
    if not len(verts):
        return False
    return all(_pt_in_polygon(vx, vy, a[1]) for vx, vy in verts)


def geom_from_text(wkt: "Column | str") -> Column:
    """Full st_geomfromtext: POINT / LINESTRING / POLYGON (with holes) →
    WKB. Use ``st_geomfromtext`` for the expression-only POINT path."""
    c = F.col(wkt) if isinstance(wkt, str) else wkt

    @pandas_udf("binary")
    def _p(s: pd.Series) -> pd.Series:
        return s.map(lambda v: _geom_to_wkb(_parse_wkt(v)))

    return _p(c)


def geom_as_text(geom: "Column | str", decimals: int = 6) -> Column:
    """Full st_astext: WKB → canonical WKT for all three shape types."""
    c = F.col(geom) if isinstance(geom, str) else geom
    fmt = f"%.{decimals}f"

    def render(b):
        g = _wkb_to_geom(bytes(b) if b is not None else None)
        if g is None:
            return None
        kind, data = g
        pt = lambda p: f"{p[0]:.{decimals}f} {p[1]:.{decimals}f}"
        if kind == "point":
            return f"POINT ({pt(data)})"
        if kind == "linestring":
            return "LINESTRING (" + ", ".join(pt(p) for p in data) + ")"
        rings = ", ".join(
            "(" + ", ".join(pt(p) for p in r) + ")" for r in data
        )
        return f"POLYGON ({rings})"

    @pandas_udf("string")
    def _p(s: pd.Series) -> pd.Series:
        return s.map(render)

    return _p(c)


def _binary_predicate(fn):
    def wrapper(a: Column, b: Column) -> Column:
        @pandas_udf("boolean")
        def _p(sa: pd.Series, sb: pd.Series) -> pd.Series:
            return pd.Series(
                [
                    fn(
                        _wkb_to_geom(bytes(x) if x is not None else None),
                        _wkb_to_geom(bytes(y) if y is not None else None),
                    )
                    for x, y in zip(sa, sb)
                ],
                dtype=object,
            )

        return _p(a, b)

    return wrapper


def _pt_on_boundary(x: float, y: float, g) -> bool:
    """Point lies on the geometry's boundary segments (polygon rings /
    linestring path)."""
    segs = _segs(g)
    if not len(segs):
        kind, data = g
        return kind == "point" and x == data[0] and y == data[1]
    proper, touch = _segs_relate(np.array([[[x, y], [x, y]]]), segs)
    return proper or touch


def _strictly_in_polygon(x: float, y: float, rings) -> bool:
    return _pt_in_polygon(x, y, rings) and not _pt_on_boundary(
        x, y, ("polygon", rings)
    )


def _ring_canon(r: np.ndarray) -> tuple:
    """Rotation- and direction-invariant canonical form of a closed
    ring (drop the closing duplicate, rotate to the lexicographic
    minimum vertex, pick the smaller of the two directions)."""
    pts = [tuple(p) for p in r]
    if len(pts) > 1 and pts[0] == pts[-1]:
        pts = pts[:-1]
    if not pts:
        return ()

    def rot_min(seq):
        i = min(range(len(seq)), key=lambda j: seq[j])
        return tuple(seq[i:] + seq[:i])

    return min(rot_min(pts), rot_min(list(reversed(pts))))


def _geom_equals(a, b) -> "bool | None":
    """Full-shape geometric equality (builtins.c st_equals — GEOS
    Equals): same point set. Linestrings match either direction;
    polygon rings match up to rotation and direction."""
    if a is None or b is None:
        return None
    if a[0] != b[0]:
        return False
    if a[0] == "point":
        return tuple(a[1]) == tuple(b[1])
    if a[0] == "linestring":
        fa = [tuple(p) for p in a[1]]
        fb = [tuple(p) for p in b[1]]
        return fa == fb or fa == list(reversed(fb))
    ra = sorted(_ring_canon(r) for r in a[1])
    rb = sorted(_ring_canon(r) for r in b[1])
    return ra == rb


def _geom_touches(a, b) -> "bool | None":
    """Boundaries intersect, interiors do not (builtins.c st_touches —
    GEOS Touches), at vertex/segment resolution for the supported
    simple shapes."""
    if a is None or b is None:
        return None
    if a[0] == "point" and b[0] == "point":
        return False  # two points have no boundary to share
    for pt, other in ((a, b), (b, a)):
        if pt[0] == "point":
            x, y = pt[1]
            if other[0] == "polygon":
                return _pt_on_boundary(x, y, other)
            if other[0] == "linestring":
                # a linestring's boundary is its two endpoints
                return tuple(other[1][0]) == (x, y) or tuple(
                    other[1][-1]
                ) == (x, y)
    proper, touch = _segs_relate(_segs(a), _segs(b))
    if proper or not touch:
        return False  # transversal crossing → interiors meet; or disjoint
    if a[0] == "linestring" and b[0] == "linestring":
        # collinear overlap = interior∩interior: a segment midpoint of
        # one lying on the other (a midpoint is never its own boundary;
        # T-junction endpoints don't trigger this)
        for u, v in ((a, b), (b, a)):
            mids = (_segs(u)[:, 0] + _segs(u)[:, 1]) / 2.0
            if any(_pt_on_boundary(mx, my, v) for mx, my in mids):
                return False
    # boundary contact only — reject if either has a vertex strictly
    # inside the other (interior overlap)
    for outer, inner in ((a, b), (b, a)):
        if outer[0] == "polygon":
            for vx, vy in _vertices(inner):
                if _strictly_in_polygon(vx, vy, outer[1]):
                    return False
    # coincident / covering polygons share their 2-D interior even when
    # every vertex sits on a boundary (equal rings) — not touching
    if a[0] == "polygon" and b[0] == "polygon" and (
        _geom_covers(a, b) or _geom_covers(b, a)
    ):
        return False
    return True


def _geom_covers(a, b) -> "bool | None":
    """No point of b outside a (builtins.c st_covers — GEOS Covers):
    boundary contact allowed, unlike containsproperly."""
    if a is None or b is None:
        return None
    if a[0] == "point":
        return b[0] == "point" and tuple(a[1]) == tuple(b[1])
    if a[0] == "linestring":
        if b[0] == "point":
            x, y = b[1]
            return _pt_on_boundary(x, y, a)
        if b[0] == "linestring":
            # every vertex of b on a, no proper crossing
            proper, _ = _segs_relate(_segs(a), _segs(b))
            return not proper and all(
                _pt_on_boundary(x, y, a) for x, y in b[1]
            )
        return False
    if b[0] == "point":
        return _pt_in_polygon(b[1][0], b[1][1], a[1])
    proper, _ = _segs_relate(_segs(a), _segs(b))
    if proper:
        return False  # b's boundary exits a
    verts = _vertices(b)
    return bool(len(verts)) and all(
        _pt_in_polygon(vx, vy, a[1]) for vx, vy in verts
    )


def _geom_containsproperly(a, b) -> "bool | None":
    """Every point of b in a's INTERIOR — no boundary contact at all
    (builtins.c st_containsproperly — GEOS ContainsProperly)."""
    if a is None or b is None:
        return None
    if a[0] != "polygon":
        return False  # only a polygon has a 2-D interior to contain into
    if b[0] == "point":
        return _strictly_in_polygon(b[1][0], b[1][1], a[1])
    proper, touch = _segs_relate(_segs(a), _segs(b))
    if proper or touch:
        return False  # any boundary contact disqualifies
    verts = _vertices(b)
    return bool(len(verts)) and all(
        _strictly_in_polygon(vx, vy, a[1]) for vx, vy in verts
    )


#: full-shape st_intersects / st_contains / st_equals / st_touches /
#: st_covers / st_containsproperly (builtins.c:5546-5651) — point fast
#: paths above stay expression-only; these handle all shapes
geom_intersects = _binary_predicate(_geom_intersects)
geom_contains = _binary_predicate(_geom_contains)
geom_equals = _binary_predicate(_geom_equals)
geom_touches = _binary_predicate(_geom_touches)
geom_covers = _binary_predicate(_geom_covers)
geom_containsproperly = _binary_predicate(_geom_containsproperly)


def unsupported_shape(*_args, **_kwargs):
    """Legacy gate, kept for callers that probed it; the full-shape
    kernels above now cover LINESTRING/POLYGON."""
    raise NotImplementedError(
        "use geom_from_text/geom_intersects/geom_contains for non-point "
        "shapes (numpy kernels); st_* expression functions are point-only"
    )
