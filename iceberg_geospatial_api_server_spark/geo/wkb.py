"""WKB/WKT codec — pure numpy/struct, no external geo libs.

Replaces the reference's shapely usage (``query/geometry.py:17-108``:
wkb.loads → GeoJSON/coords/type detection) with a from-scratch ISO WKB
reader/writer for Point, LineString, Polygon and their Multi* forms.

Scalar functions here are driver-side / per-row kernels; the vectorized
entry points (`points_to_wkb_np`, `bbox_of_wkb_series`) operate on whole
numpy/pandas batches and back the Arrow-batched pandas UDFs in
``geo.functions``.
"""

from __future__ import annotations

import math
import struct

import numpy as np

# geometry type codes (ISO WKB)
POINT, LINESTRING, POLYGON = 1, 2, 3
MULTIPOINT, MULTILINESTRING, MULTIPOLYGON = 4, 5, 6

_TYPE_NAMES = {
    POINT: "Point",
    LINESTRING: "LineString",
    POLYGON: "Polygon",
    MULTIPOINT: "MultiPoint",
    MULTILINESTRING: "MultiLineString",
    MULTIPOLYGON: "MultiPolygon",
}
_NAME_TYPES = {v.upper(): k for k, v in _TYPE_NAMES.items()}


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def encode_point(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, POINT, x, y)


def _pack_coords(coords) -> bytes:
    arr = np.asarray(coords, dtype="<f8")
    return struct.pack("<I", len(arr)) + arr.tobytes()


def encode_linestring(coords) -> bytes:
    """coords: sequence of (x, y)."""
    return struct.pack("<BI", 1, LINESTRING) + _pack_coords(coords)


def encode_polygon(rings) -> bytes:
    """rings: list of coordinate sequences (exterior first, closed)."""
    out = [struct.pack("<BII", 1, POLYGON, len(rings))]
    out.extend(_pack_coords(r) for r in rings)
    return b"".join(out)


def encode_multi(kind: int, parts: list[bytes]) -> bytes:
    return struct.pack("<BII", 1, kind, len(parts)) + b"".join(parts)


def encode_multipoint(coords) -> bytes:
    return encode_multi(MULTIPOINT, [encode_point(x, y) for x, y in coords])


def rects_to_wkb_np(
    xmin: np.ndarray, ymin: np.ndarray, xmax: np.ndarray, ymax: np.ndarray
) -> list[bytes]:
    """Vectorized axis-aligned-rectangle polygon encoder: one (n, 93)
    byte matrix (header + 1 ring + 5 closed vertices), no per-row pack."""
    n = len(xmin)
    buf = np.empty((n, 93), dtype=np.uint8)
    buf[:, 0] = 1
    buf[:, 1:5] = np.frombuffer(struct.pack("<I", POLYGON), dtype=np.uint8)
    buf[:, 5:9] = np.frombuffer(struct.pack("<I", 1), dtype=np.uint8)
    buf[:, 9:13] = np.frombuffer(struct.pack("<I", 5), dtype=np.uint8)
    ring = np.empty((n, 5, 2), dtype="<f8")
    ring[:, 0, 0] = xmin; ring[:, 0, 1] = ymin
    ring[:, 1, 0] = xmax; ring[:, 1, 1] = ymin
    ring[:, 2, 0] = xmax; ring[:, 2, 1] = ymax
    ring[:, 3, 0] = xmin; ring[:, 3, 1] = ymax
    ring[:, 4, 0] = xmin; ring[:, 4, 1] = ymin
    buf[:, 13:93] = ring.view(np.uint8).reshape(n, 80)
    return [r.tobytes() for r in buf]


def points_to_wkb_np(xs: np.ndarray, ys: np.ndarray) -> list[bytes]:
    """Vectorized point encoder: one (n, 21) byte matrix, no per-row pack."""
    n = len(xs)
    buf = np.empty((n, 21), dtype=np.uint8)
    buf[:, 0] = 1
    buf[:, 1:5] = np.frombuffer(struct.pack("<I", POINT), dtype=np.uint8)
    buf[:, 5:13] = np.asarray(xs, dtype="<f8").view(np.uint8).reshape(n, 8)
    buf[:, 13:21] = np.asarray(ys, dtype="<f8").view(np.uint8).reshape(n, 8)
    return [r.tobytes() for r in buf]


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def geometry(self):
        """Return (type_code, payload) where payload is
        point: (x, y) | line: ndarray(n,2) | polygon: [ndarray(n,2), ...] |
        multi: list of child payloads (with child type implied by parent)."""
        order = self.buf[self.pos]
        self.pos += 1
        endian = "<" if order == 1 else ">"
        (code,) = struct.unpack_from(endian + "I", self.buf, self.pos)
        self.pos += 4
        code = code % 1000  # tolerate EWKB/Z flags in the low digits form
        if code == POINT:
            x, y = struct.unpack_from(endian + "dd", self.buf, self.pos)
            self.pos += 16
            return code, (x, y)
        if code == LINESTRING:
            return code, self._coords(endian)
        if code == POLYGON:
            (nrings,) = struct.unpack_from(endian + "I", self.buf, self.pos)
            self.pos += 4
            return code, [self._coords(endian) for _ in range(nrings)]
        if code in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON):
            (nparts,) = struct.unpack_from(endian + "I", self.buf, self.pos)
            self.pos += 4
            return code, [self.geometry()[1] for _ in range(nparts)]
        raise ValueError(f"unsupported WKB geometry type {code}")

    def _coords(self, endian: str) -> np.ndarray:
        (n,) = struct.unpack_from(endian + "I", self.buf, self.pos)
        self.pos += 4
        arr = np.frombuffer(self.buf, dtype=endian + "f8", count=2 * n, offset=self.pos)
        self.pos += 16 * n
        return arr.reshape(n, 2)


def decode(buf: bytes):
    """Decode a WKB buffer → (type_code, payload). See _Reader.geometry."""
    return _Reader(buf).geometry()


def geometry_type_code(buf: bytes) -> int:
    endian = "<" if buf[0] == 1 else ">"
    (code,) = struct.unpack_from(endian + "I", buf, 1)
    return code % 1000


def geometry_type_name(buf: bytes) -> str:
    """Ref query/geometry.py:105-108 detect_geometry_type."""
    return _TYPE_NAMES[geometry_type_code(buf)]


def _all_coords(buf: bytes) -> np.ndarray:
    """Every vertex of the geometry as an (n, 2) array."""
    code, payload = decode(buf)
    if code == POINT:
        return np.array([payload])
    if code == LINESTRING:
        return payload
    if code == POLYGON:
        return np.concatenate(payload) if payload else np.empty((0, 2))
    # multi*
    parts = []
    for child in payload:
        if code == MULTIPOINT:
            parts.append(np.array([child]))
        elif code == MULTILINESTRING:
            parts.append(child)
        else:  # MULTIPOLYGON: child is a list of rings
            parts.extend(child)
    return np.concatenate(parts) if parts else np.empty((0, 2))


def bbox(buf: bytes) -> tuple[float, float, float, float]:
    c = _all_coords(buf)
    return (c[:, 0].min(), c[:, 1].min(), c[:, 0].max(), c[:, 1].max())


def bbox_of_wkb_series(values) -> np.ndarray:
    """Vectorized bbox: (n, 4) float array [xmin ymin xmax ymax].

    Fast path: if every buffer is a little-endian 2-D point (21 bytes,
    the overwhelmingly common case at scale), bboxes come from one
    frombuffer reinterpretation with zero per-row parsing.
    """
    n = len(values)
    out = np.full((n, 4), np.nan)
    vals = list(values)
    if n and all(v is not None and len(v) == 21 and v[0] == 1 for v in vals):
        flat = np.frombuffer(b"".join(vals), dtype=np.uint8).reshape(n, 21)
        xs = flat[:, 5:13].copy().view("<f8").ravel()
        ys = flat[:, 13:21].copy().view("<f8").ravel()
        out[:, 0] = xs
        out[:, 1] = ys
        out[:, 2] = xs
        out[:, 3] = ys
        return out
    for i, v in enumerate(vals):
        if v is not None:
            out[i] = bbox(v)
    return out


# ---------------------------------------------------------------------------
# GeoJSON bridge (ref query/geometry.py:17-77 wkb_to_geojson / wkb_to_coords)
# ---------------------------------------------------------------------------


def to_geojson(buf: bytes) -> dict:
    code, payload = decode(buf)
    if code == POINT:
        return {"type": "Point", "coordinates": list(payload)}
    if code == LINESTRING:
        return {"type": "LineString", "coordinates": payload.tolist()}
    if code == POLYGON:
        return {"type": "Polygon", "coordinates": [r.tolist() for r in payload]}
    if code == MULTIPOINT:
        return {"type": "MultiPoint", "coordinates": [list(p) for p in payload]}
    if code == MULTILINESTRING:
        return {"type": "MultiLineString", "coordinates": [p.tolist() for p in payload]}
    return {
        "type": "MultiPolygon",
        "coordinates": [[r.tolist() for r in poly] for poly in payload],
    }


def from_geojson(geom: dict) -> bytes:
    t = geom["type"]
    c = geom["coordinates"]
    if t == "Point":
        return encode_point(c[0], c[1])
    if t == "LineString":
        return encode_linestring(c)
    if t == "Polygon":
        return encode_polygon(c)
    if t == "MultiPoint":
        return encode_multipoint(c)
    if t == "MultiLineString":
        return encode_multi(MULTILINESTRING, [encode_linestring(p) for p in c])
    if t == "MultiPolygon":
        return encode_multi(MULTIPOLYGON, [encode_polygon(p) for p in c])
    raise ValueError(f"unsupported GeoJSON type {t}")


# ---------------------------------------------------------------------------
# WKT bridge (filter geometries arrive as WKT, ref query/models.py:17)
# ---------------------------------------------------------------------------


def _parse_coord_seq(body: str) -> list[tuple[float, float]]:
    pts = []
    for pair in body.split(","):
        xs = pair.split()
        pts.append((float(xs[0]), float(xs[1])))
    return pts


def from_wkt(wkt: str) -> bytes:
    s = wkt.strip()
    head = s.split("(", 1)[0].strip().upper()
    body = s[s.index("(") + 1 : s.rindex(")")]
    if head == "POINT":
        x, y = body.split()
        return encode_point(float(x), float(y))
    if head == "LINESTRING":
        return encode_linestring(_parse_coord_seq(body))
    if head == "POLYGON":
        rings = [
            _parse_coord_seq(r.strip().strip("()"))
            for r in body.replace("), (", ")|(").replace("),(", ")|(").split("|")
        ]
        return encode_polygon(rings)
    if head == "MULTIPOINT":
        body = body.replace("(", "").replace(")", "")
        return encode_multipoint(_parse_coord_seq(body))
    raise ValueError(f"unsupported WKT: {head}")


def to_wkt(buf: bytes) -> str:
    code, payload = decode(buf)
    if code == POINT:
        return f"POINT ({_fmt(payload[0])} {_fmt(payload[1])})"
    if code == LINESTRING:
        return f"LINESTRING ({_seq(payload)})"
    if code == POLYGON:
        return "POLYGON (" + ", ".join(f"({_seq(r)})" for r in payload) + ")"
    if code == MULTIPOINT:
        return "MULTIPOINT (" + ", ".join(f"({_fmt(x)} {_fmt(y)})" for x, y in payload) + ")"
    if code == MULTILINESTRING:
        return "MULTILINESTRING (" + ", ".join(f"({_seq(p)})" for p in payload) + ")"
    return (
        "MULTIPOLYGON ("
        + ", ".join("(" + ", ".join(f"({_seq(r)})" for r in poly) + ")" for poly in payload)
        + ")"
    )


def _fmt(v: float) -> str:
    return repr(float(v)) if not float(v).is_integer() else str(int(v))


def _seq(arr) -> str:
    return ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in arr)


# ---------------------------------------------------------------------------
# scalar geometry kernels (used by pandas-UDF wrappers in geo.functions)
# ---------------------------------------------------------------------------


def centroid(buf: bytes) -> tuple[float, float]:
    """Centroid. Points/lines: vertex mean weighted appropriately;
    polygons: area-weighted (standard shoelace centroid)."""
    code, payload = decode(buf)
    if code == POINT:
        return payload
    if code in (LINESTRING, MULTILINESTRING):
        lines = [payload] if code == LINESTRING else payload
        sx = sy = total = 0.0
        for line in lines:
            seg = np.diff(line, axis=0)
            lens = np.hypot(seg[:, 0], seg[:, 1])
            mids = (line[:-1] + line[1:]) / 2.0
            sx += float((mids[:, 0] * lens).sum())
            sy += float((mids[:, 1] * lens).sum())
            total += float(lens.sum())
        if total == 0:
            c = _all_coords(buf)
            return float(c[:, 0].mean()), float(c[:, 1].mean())
        return sx / total, sy / total
    if code in (POLYGON, MULTIPOLYGON):
        polys = [payload] if code == POLYGON else payload
        sx = sy = sa = 0.0
        for rings in polys:
            for j, ring in enumerate(rings):
                a, cx, cy = _ring_centroid(ring)
                sign = 1.0 if j == 0 else -1.0
                sa += sign * abs(a)
                sx += sign * abs(a) * cx
                sy += sign * abs(a) * cy
        if sa == 0:
            c = _all_coords(buf)
            return float(c[:, 0].mean()), float(c[:, 1].mean())
        return sx / sa, sy / sa
    # MultiPoint
    c = _all_coords(buf)
    return float(c[:, 0].mean()), float(c[:, 1].mean())


def _ring_centroid(ring: np.ndarray) -> tuple[float, float, float]:
    x, y = ring[:, 0], ring[:, 1]
    cross = x[:-1] * y[1:] - x[1:] * y[:-1]
    a = cross.sum() / 2.0
    if a == 0:
        return 0.0, float(x.mean()), float(y.mean())
    cx = float(((x[:-1] + x[1:]) * cross).sum() / (6.0 * a))
    cy = float(((y[:-1] + y[1:]) * cross).sum() / (6.0 * a))
    return float(a), cx, cy


def area(buf: bytes) -> float:
    """Planar area (shoelace; holes subtracted)."""
    code, payload = decode(buf)
    if code == POLYGON:
        polys = [payload]
    elif code == MULTIPOLYGON:
        polys = payload
    else:
        return 0.0
    total = 0.0
    for rings in polys:
        for j, ring in enumerate(rings):
            a, _, _ = _ring_centroid(ring)
            total += abs(a) if j == 0 else -abs(a)
    return total


def point_in_polygon(px: float, py: float, rings: list[np.ndarray]) -> bool:
    """Ray casting with hole support (even-odd rule)."""
    inside = False
    for ring in rings:
        x, y = ring[:, 0], ring[:, 1]
        x0, y0, x1, y1 = x[:-1], y[:-1], x[1:], y[1:]
        with np.errstate(divide="ignore", invalid="ignore"):
            # horizontal edges divide by zero but are masked out by the
            # (y0 > py) != (y1 > py) crossing test
            crosses = ((y0 > py) != (y1 > py)) & (
                px < (x1 - x0) * (py - y0) / (y1 - y0) + x0
            )
        if int(crosses.sum()) % 2:
            inside = not inside
    return inside


def contains(poly_buf: bytes, px: float, py: float) -> bool:
    code, payload = decode(poly_buf)
    if code == POLYGON:
        return point_in_polygon(px, py, payload)
    if code == MULTIPOLYGON:
        return any(point_in_polygon(px, py, rings) for rings in payload)
    raise ValueError("contains() needs a polygonal filter geometry")


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain. Input (n,2) → hull vertices CCW, closed."""
    pts = np.unique(points, axis=0)
    if len(pts) <= 2:
        return pts
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(seq):
        hull = []
        for p in seq:
            while len(hull) >= 2 and np.cross(hull[-1] - hull[-2], p - hull[-2]) <= 0:
                hull.pop()
            hull.append(p)
        return hull

    lower = half(pts)
    upper = half(pts[::-1])
    hull = np.array(lower[:-1] + upper[:-1])
    return np.vstack([hull, hull[:1]])  # close the ring


def simplify_dp(coords: np.ndarray, tolerance: float) -> np.ndarray:
    """Douglas-Peucker (ref main.py:368-378 ST_Simplify path), iterative."""
    n = len(coords)
    if n <= 2:
        return coords
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        lo, hi = stack.pop()
        if hi <= lo + 1:
            continue
        seg = coords[hi] - coords[lo]
        seg_len = math.hypot(seg[0], seg[1])
        pts = coords[lo + 1 : hi]
        if seg_len == 0:
            d = np.hypot(pts[:, 0] - coords[lo][0], pts[:, 1] - coords[lo][1])
        else:
            d = np.abs(np.cross(pts - coords[lo], seg)) / seg_len
        imax = int(np.argmax(d))
        if d[imax] > tolerance:
            idx = lo + 1 + imax
            keep[idx] = True
            stack.extend([(lo, idx), (idx, hi)])
    return coords[keep]


def buffer_point(x: float, y: float, radius: float, segments: int = 16) -> bytes:
    """Approximate ST_Buffer of a point: regular polygon (cookbook §1.6)."""
    ang = np.linspace(0.0, 2.0 * math.pi, segments + 1)
    ring = np.column_stack([x + radius * np.cos(ang), y + radius * np.sin(ang)])
    ring[-1] = ring[0]
    return encode_polygon([ring])


# Web Mercator (EPSG:3857) closed forms — replaces the reference's pyproj
# reprojection (query/geometry.py:80-102) for the 4326<->3857 pair that the
# webmap actually uses.
_R = 6378137.0


def lonlat_to_mercator(lon, lat):
    x = np.asarray(lon, dtype="f8") * (math.pi * _R / 180.0)
    y = np.log(np.tan((90.0 + np.asarray(lat, dtype="f8")) * (math.pi / 360.0))) * _R
    return x, y


def mercator_to_lonlat(x, y):
    lon = np.asarray(x, dtype="f8") / (math.pi * _R / 180.0)
    lat = np.degrees(2.0 * np.arctan(np.exp(np.asarray(y, dtype="f8") / _R)) - math.pi / 2.0)
    return lon, lat


# Ellipsoidal transverse Mercator (UTM, EPSG:326xx/327xx) via the standard
# Krüger flattening series (order n³ — sub-mm inside a zone), extending the
# reference's pyproj-backed arbitrary-EPSG reprojection (query/geometry.py:
# 80-102) to the UTM family without a projection library.
_WGS84_A = 6378137.0
_WGS84_F = 1.0 / 298.257223563
_TM_N = _WGS84_F / (2.0 - _WGS84_F)
_TM_A = (_WGS84_A / (1.0 + _TM_N)) * (
    1.0 + _TM_N**2 / 4.0 + _TM_N**4 / 64.0 + _TM_N**6 / 256.0
)
_TM_ALPHA = (
    _TM_N / 2.0 - 2.0 * _TM_N**2 / 3.0 + 5.0 * _TM_N**3 / 16.0,
    13.0 * _TM_N**2 / 48.0 - 3.0 * _TM_N**3 / 5.0,
    61.0 * _TM_N**3 / 240.0,
)
_TM_BETA = (
    _TM_N / 2.0 - 2.0 * _TM_N**2 / 3.0 + 37.0 * _TM_N**3 / 96.0,
    _TM_N**2 / 48.0 + _TM_N**3 / 15.0,
    17.0 * _TM_N**3 / 480.0,
)
_TM_DELTA = (
    2.0 * _TM_N - 2.0 * _TM_N**2 / 3.0 - 2.0 * _TM_N**3,
    7.0 * _TM_N**2 / 3.0 - 8.0 * _TM_N**3 / 5.0,
    56.0 * _TM_N**3 / 15.0,
)
_UTM_K0 = 0.9996
_UTM_FE = 500000.0
_UTM_FN_SOUTH = 10000000.0


def utm_zone_lon0(zone: int) -> float:
    """Central meridian of a UTM zone, degrees."""
    if not 1 <= zone <= 60:
        raise ValueError(f"UTM zone out of range: {zone}")
    return -183.0 + 6.0 * zone


def lonlat_to_utm(lon, lat, zone: int, north: bool = True):
    """Forward UTM: arrays of lon/lat degrees → easting/northing meters."""
    lam = np.radians(np.asarray(lon, dtype="f8") - utm_zone_lon0(zone))
    phi = np.radians(np.asarray(lat, dtype="f8"))
    two_rtn = 2.0 * math.sqrt(_TM_N) / (1.0 + _TM_N)
    t = np.sinh(
        np.arctanh(np.sin(phi)) - two_rtn * np.arctanh(two_rtn * np.sin(phi))
    )
    xi = np.arctan2(t, np.cos(lam))
    eta = np.arctanh(np.sin(lam) / np.sqrt(1.0 + t * t))
    e_acc = eta.copy()
    n_acc = xi.copy()
    for j, a in enumerate(_TM_ALPHA, start=1):
        e_acc += a * np.cos(2.0 * j * xi) * np.sinh(2.0 * j * eta)
        n_acc += a * np.sin(2.0 * j * xi) * np.cosh(2.0 * j * eta)
    easting = _UTM_FE + _UTM_K0 * _TM_A * e_acc
    northing = _UTM_K0 * _TM_A * n_acc + (0.0 if north else _UTM_FN_SOUTH)
    return easting, northing


def utm_to_lonlat(easting, northing, zone: int, north: bool = True):
    """Inverse UTM: easting/northing meters → lon/lat degrees."""
    xi = (
        np.asarray(northing, dtype="f8")
        - (0.0 if north else _UTM_FN_SOUTH)
    ) / (_UTM_K0 * _TM_A)
    eta = (np.asarray(easting, dtype="f8") - _UTM_FE) / (_UTM_K0 * _TM_A)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j, b in enumerate(_TM_BETA, start=1):
        xi_p -= b * np.sin(2.0 * j * xi) * np.cosh(2.0 * j * eta)
        eta_p -= b * np.cos(2.0 * j * xi) * np.sinh(2.0 * j * eta)
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
    phi = chi.copy()
    for j, d in enumerate(_TM_DELTA, start=1):
        phi += d * np.sin(2.0 * j * chi)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return np.degrees(lam) + utm_zone_lon0(zone), np.degrees(phi)


def utm_wkid_params(wkid: int) -> tuple[int, bool] | None:
    """Decode an EPSG UTM code to (zone, north); None when the code is
    not a UTM CRS. Families: WGS84 (32601-60 N / 32701-60 S), NAD83
    (26901-23 — US/Canada zones 1-23), ETRS89 (25828-38 — Europe zones
    28-38). The datum ellipsoids (GRS80 vs WGS84) differ by <0.1 mm in
    axes, so one Krüger kernel serves all three — the same
    datum-identity assumption pyproj makes absent an explicit
    transformation pipeline (and geo/projections.py documents)."""
    if 32601 <= wkid <= 32660:
        return wkid - 32600, True
    if 32701 <= wkid <= 32760:
        return wkid - 32700, False
    if 26901 <= wkid <= 26923:  # NAD83 / UTM zone 1N-23N
        return wkid - 26900, True
    if 25828 <= wkid <= 25838:  # ETRS89 / UTM zone 28N-38N
        return wkid - 25800, True
    return None
