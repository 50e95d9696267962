"""Numpy-only ESRI shapefile I/O + LCC reprojection (SURVEY S11 support).

The reference loads its 10 km grid from a shapefile zip with
pyshp/shapely/pyproj (`collectors/grid.py:188-313`). None of those are in
this container, so this module implements the minimum from public specs:

* `.shp` — ESRI shapefile main file (public ESRI whitepaper): point (1)
  and polygon (5) records;
* `.dbf` — dBASE III attribute table: C (char) and N (numeric) fields;
* `.prj` — WKT1 `PROJCS` parsing for the Lambert Conformal Conic (2SP)
  method, with forward/inverse from EPSG Guidance Note 7-2 (method 9802)
  — the projection family the reference grid (India NSF LCC) uses. Other
  projections raise with a clear message;
* polygon shoelace centroid + WKT emit.

A small polygon *writer* is included so tests can fabricate real
shapefile bytes without any geo library.
"""

from __future__ import annotations

import math
import re
import struct
from dataclasses import dataclass

import numpy as np

# --------------------------------------------------------------------------
# .shp / .dbf parsing


@dataclass
class ShapeRecord:
    shape_type: int
    # list of rings (polygon) or a single (1,2) array (point)
    parts: list[np.ndarray]
    attrs: dict


def read_shp(path: str) -> list[tuple[int, list[np.ndarray]]]:
    """Parse a .shp main file -> [(shape_type, [ring arrays (n,2)])]."""
    with open(path, "rb") as fh:
        buf = fh.read()
    (code,) = struct.unpack(">i", buf[0:4])
    if code != 9994:
        raise ValueError(f"not a shapefile: file code {code}")
    out = []
    pos = 100  # fixed-size header
    while pos < len(buf):
        (_recno, clen) = struct.unpack(">ii", buf[pos : pos + 8])
        pos += 8
        content = buf[pos : pos + 2 * clen]
        pos += 2 * clen
        (stype,) = struct.unpack("<i", content[0:4])
        if stype == 0:  # null shape
            out.append((0, []))
        elif stype == 1:  # point
            x, y = struct.unpack("<2d", content[4:20])
            out.append((1, [np.array([[x, y]])]))
        elif stype == 5:  # polygon
            nparts, npoints = struct.unpack("<2i", content[36:44])
            parts = np.frombuffer(
                content, dtype="<i4", count=nparts, offset=44
            )
            pts = np.frombuffer(
                content, dtype="<f8", count=2 * npoints, offset=44 + 4 * nparts
            ).reshape(npoints, 2)
            bounds = list(parts) + [npoints]
            rings = [
                pts[bounds[i] : bounds[i + 1]].copy() for i in range(nparts)
            ]
            out.append((5, rings))
        else:
            raise ValueError(f"unsupported shape type {stype}")
    return out


def read_dbf(path: str) -> list[dict]:
    """Parse a dBASE III .dbf attribute table -> list of row dicts."""
    with open(path, "rb") as fh:
        buf = fh.read()
    nrec, hsize, rsize = struct.unpack("<ihh", buf[4:12])
    fields = []
    pos = 32
    while buf[pos] != 0x0D:
        name = buf[pos : pos + 11].split(b"\x00")[0].decode()
        ftype = chr(buf[pos + 11])
        flen = buf[pos + 16]
        fdec = buf[pos + 17]
        fields.append((name, ftype, flen, fdec))
        pos += 32
    rows = []
    pos = hsize
    for _ in range(nrec):
        rec = buf[pos : pos + rsize]
        pos += rsize
        if rec[:1] == b"*":  # deleted
            continue
        row = {}
        off = 1
        for name, ftype, flen, fdec in fields:
            raw = rec[off : off + flen].decode(errors="replace").strip()
            off += flen
            if ftype == "N":
                row[name] = (
                    (float(raw) if fdec or "." in raw else int(raw))
                    if raw
                    else None
                )
            else:
                row[name] = raw
        rows.append(row)
    return rows


def read_shapefile(shp_path: str) -> list[ShapeRecord]:
    """Read .shp + sibling .dbf into shape records with attributes."""
    shapes = read_shp(shp_path)
    dbf_path = re.sub(r"\.shp$", ".dbf", shp_path)
    attrs = read_dbf(dbf_path)
    if len(attrs) != len(shapes):
        raise ValueError(
            f"shp/dbf record mismatch: {len(shapes)} vs {len(attrs)}"
        )
    return [
        ShapeRecord(stype, rings, row)
        for (stype, rings), row in zip(shapes, attrs)
    ]


# --------------------------------------------------------------------------
# minimal polygon writer (tests fabricate granule-free fixtures with it)


def write_shapefile_polygons(
    base_path: str,
    polygons: list[np.ndarray],
    attrs: list[dict],
    prj_wkt: str | None = None,
) -> None:
    """Write `<base>.shp`, `.dbf` (+ `.prj`) for single-ring polygons.

    Attribute schema is inferred from the first row: int/float -> N,
    str -> C. Rings are closed automatically.
    """
    recs = []
    all_pts = []
    for ring in polygons:
        ring = np.asarray(ring, dtype=np.float64)
        if not np.array_equal(ring[0], ring[-1]):
            ring = np.vstack([ring, ring[0]])
        all_pts.append(ring)
        lo, hi = ring.min(0), ring.max(0)
        content = (
            struct.pack("<i", 5)
            + struct.pack("<4d", lo[0], lo[1], hi[0], hi[1])
            + struct.pack("<2i", 1, len(ring))
            + struct.pack("<i", 0)
            + ring.astype("<f8").tobytes()
        )
        recs.append(content)
    glo = np.vstack(all_pts).min(0)
    ghi = np.vstack(all_pts).max(0)
    body = b"".join(
        struct.pack(">ii", i + 1, len(c) // 2) + c for i, c in enumerate(recs)
    )
    header = (
        struct.pack(">i", 9994)
        + b"\x00" * 20
        + struct.pack(">i", (100 + len(body)) // 2)
        + struct.pack("<ii", 1000, 5)
        + struct.pack("<4d", glo[0], glo[1], ghi[0], ghi[1])
        + struct.pack("<4d", 0, 0, 0, 0)
    )
    with open(base_path + ".shp", "wb") as fh:
        fh.write(header + body)

    fields = []
    for key, val in attrs[0].items():
        if isinstance(val, str):
            fields.append((key, "C", 32, 0))
        elif isinstance(val, float):
            fields.append((key, "N", 19, 6))
        else:
            fields.append((key, "N", 18, 0))
    rsize = 1 + sum(f[2] for f in fields)
    hsize = 32 + 32 * len(fields) + 1
    out = [
        struct.pack(
            "<B3Bihh20x", 3, 24, 1, 1, len(attrs), hsize, rsize
        )
    ]
    for name, ftype, flen, fdec in fields:
        out.append(
            struct.pack(
                "<11sc4xBB14x", name.encode()[:11], ftype.encode(), flen, fdec
            )
        )
    out.append(b"\x0d")
    for row in attrs:
        out.append(b" ")
        for name, ftype, flen, fdec in fields:
            val = row[name]
            if ftype == "C":
                out.append(str(val).encode()[:flen].ljust(flen))
            elif fdec:
                out.append(f"{val:{flen}.{fdec}f}".encode()[:flen])
            else:
                out.append(f"{val:{flen}d}".encode()[:flen])
    out.append(b"\x1a")
    with open(base_path + ".dbf", "wb") as fh:
        fh.write(b"".join(out))
    if prj_wkt is not None:
        with open(base_path + ".prj", "w") as fh:
            fh.write(prj_wkt)


# --------------------------------------------------------------------------
# geometry helpers


def polygon_centroid(ring: np.ndarray) -> tuple[float, float]:
    """Shoelace area centroid of one (closed or open) ring."""
    ring = np.asarray(ring, dtype=np.float64)
    if np.array_equal(ring[0], ring[-1]):
        ring = ring[:-1]
    x, y = ring[:, 0], ring[:, 1]
    xn, yn = np.roll(x, -1), np.roll(y, -1)
    cross = x * yn - xn * y
    area = cross.sum() / 2.0
    if abs(area) < 1e-12:  # degenerate: fall back to vertex mean
        return float(x.mean()), float(y.mean())
    cx = ((x + xn) * cross).sum() / (6.0 * area)
    cy = ((y + yn) * cross).sum() / (6.0 * area)
    return float(cx), float(cy)


def polygon_wkt(ring: np.ndarray) -> str:
    ring = np.asarray(ring, dtype=np.float64)
    if not np.array_equal(ring[0], ring[-1]):
        ring = np.vstack([ring, ring[0]])
    pts = ", ".join(f"{p[0]:.6f} {p[1]:.6f}" for p in ring)
    return f"POLYGON (({pts}))"


# --------------------------------------------------------------------------
# Lambert Conformal Conic 2SP (EPSG method 9802), from Guidance Note 7-2


@dataclass(frozen=True)
class LambertConformalConic2SP:
    a: float  # semi-major axis
    inv_f: float  # inverse flattening
    lat_origin: float  # latitude of false origin (degrees)
    lon_origin: float  # longitude of false origin (degrees)
    lat_1: float  # first standard parallel (degrees)
    lat_2: float  # second standard parallel (degrees)
    false_easting: float
    false_northing: float

    @property
    def e(self) -> float:
        f = 1.0 / self.inv_f
        return math.sqrt(2.0 * f - f * f)

    def _m(self, phi: float) -> float:
        e = self.e
        return math.cos(phi) / math.sqrt(1 - (e * math.sin(phi)) ** 2)

    def _t(self, phi: float) -> float:
        e = self.e
        return math.tan(math.pi / 4 - phi / 2) / (
            (1 - e * math.sin(phi)) / (1 + e * math.sin(phi))
        ) ** (e / 2)

    def _constants(self):
        p1, p2 = math.radians(self.lat_1), math.radians(self.lat_2)
        pf = math.radians(self.lat_origin)
        m1, m2 = self._m(p1), self._m(p2)
        t1, t2, tf = self._t(p1), self._t(p2), self._t(pf)
        if abs(p1 - p2) < 1e-12:
            n = math.sin(p1)
        else:
            n = (math.log(m1) - math.log(m2)) / (
                math.log(t1) - math.log(t2)
            )
        F = m1 / (n * t1**n)
        r_f = self.a * F * tf**n
        return n, F, r_f

    def forward(self, lon_deg: float, lat_deg: float) -> tuple[float, float]:
        """(lon, lat) degrees -> (easting, northing) metres."""
        n, F, r_f = self._constants()
        t = self._t(math.radians(lat_deg))
        r = self.a * F * t**n
        theta = n * (math.radians(lon_deg) - math.radians(self.lon_origin))
        return (
            self.false_easting + r * math.sin(theta),
            self.false_northing + r_f - r * math.cos(theta),
        )

    def inverse(self, x: float, y: float) -> tuple[float, float]:
        """(easting, northing) metres -> (lon, lat) degrees."""
        n, F, r_f = self._constants()
        e = self.e
        dx = x - self.false_easting
        dy = r_f - (y - self.false_northing)
        r = math.copysign(math.hypot(dx, dy), n)
        t = (r / (self.a * F)) ** (1.0 / n)
        theta = math.atan2(dx, dy)
        lon = theta / n + math.radians(self.lon_origin)
        phi = math.pi / 2 - 2 * math.atan(t)
        for _ in range(15):  # converges in ~4 iterations
            prev = phi
            phi = math.pi / 2 - 2 * math.atan(
                t * ((1 - e * math.sin(phi)) / (1 + e * math.sin(phi)))
                ** (e / 2)
            )
            if abs(phi - prev) < 1e-14:
                break
        return math.degrees(lon), math.degrees(phi)


def _wkt_param(wkt: str, name: str) -> float | None:
    m = re.search(
        rf'PARAMETER\s*\[\s*"{name}"\s*,\s*([-0-9.eE+]+)', wkt, re.IGNORECASE
    )
    return float(m.group(1)) if m else None


def parse_prj_lcc(wkt: str) -> LambertConformalConic2SP:
    """Parse a WKT1 PROJCS string for the LCC (2SP) method. Raises with a
    clear message for other projections (that's the pyproj seam)."""
    if not re.search(r"Lambert[_ ]Conformal[_ ]Conic", wkt, re.IGNORECASE):
        raise NotImplementedError(
            "only Lambert_Conformal_Conic(_2SP) .prj files are supported "
            "without pyproj; got: " + wkt[:120]
        )
    sph = re.search(
        r'SPHEROID\s*\[\s*"[^"]*"\s*,\s*([-0-9.eE+]+)\s*,\s*([-0-9.eE+]+)',
        wkt,
        re.IGNORECASE,
    )
    if not sph:
        raise ValueError("no SPHEROID in .prj WKT")
    get = lambda *names: next(  # noqa: E731
        (v for v in (_wkt_param(wkt, n) for n in names) if v is not None),
        None,
    )
    lat1 = get("Standard_Parallel_1", "standard_parallel_1")
    lat2 = get("Standard_Parallel_2", "standard_parallel_2")
    return LambertConformalConic2SP(
        a=float(sph.group(1)),
        inv_f=float(sph.group(2)),
        lat_origin=get("Latitude_Of_Origin", "latitude_of_origin") or 0.0,
        lon_origin=get("Central_Meridian", "central_meridian") or 0.0,
        lat_1=lat1 if lat1 is not None else 0.0,
        lat_2=lat2 if lat2 is not None else (lat1 or 0.0),
        false_easting=get("False_Easting", "false_easting") or 0.0,
        false_northing=get("False_Northing", "false_northing") or 0.0,
    )
