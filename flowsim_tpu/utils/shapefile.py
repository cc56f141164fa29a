"""Minimal ESRI Shapefile polyline writer (no geopandas/shapely needed).

The reference exports channel bank outlines via geopandas/shapely
(ref: cases/gerd_roseires/custom_functions.py:68-98); those libraries are not
in this image, so the writer speaks the (simple, stable) shapefile binary
format directly: .shp (geometry), .shx (index), .dbf (attributes),
.prj (CRS WKT), .cpg (codepage).
"""

from __future__ import annotations

import os
import struct

SHAPE_POLYLINE = 3

# WKT for EPSG:20136 (Adindan / UTM 36N), the reference's default CRS
_EPSG_20136_WKT = (
    'PROJCS["Adindan / UTM zone 36N",GEOGCS["Adindan",DATUM["Adindan",'
    'SPHEROID["Clarke 1880 (RGS)",6378249.145,293.465]],'
    'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
    'PROJECTION["Transverse_Mercator"],PARAMETER["latitude_of_origin",0],'
    'PARAMETER["central_meridian",33],PARAMETER["scale_factor",0.9996],'
    'PARAMETER["false_easting",500000],PARAMETER["false_northing",0],'
    'UNIT["metre",1]]'
)


def _polyline_record(points) -> bytes:
    xs = [p[0] for p in points]
    ys = [p[1] for p in points]
    content = struct.pack("<i", SHAPE_POLYLINE)
    content += struct.pack("<4d", min(xs), min(ys), max(xs), max(ys))
    content += struct.pack("<2i", 1, len(points))   # one part
    content += struct.pack("<i", 0)                 # part start index
    for x, y in points:
        content += struct.pack("<2d", x, y)
    return content


def write_polylines(path: str, lines, attributes=None, field_name="bank", crs_wkt=_EPSG_20136_WKT):
    """Write polylines (list of [(x, y), ...]) to ``path`` (.shp basename).

    ``attributes``: one string per line for the dbf attribute column.
    """
    base = path[:-4] if path.endswith(".shp") else path
    if not lines:
        raise ValueError("write_polylines needs at least one polyline")
    attributes = attributes or [str(i) for i in range(len(lines))]
    if len(attributes) != len(lines):
        # the .dbf header's record count comes from the lines while the
        # record bodies come from attributes — a mismatch silently corrupts
        # the file for strict readers
        raise ValueError(
            f"{len(attributes)} attributes for {len(lines)} polylines")

    records = [_polyline_record(pts) for pts in lines]
    all_x = [p[0] for pts in lines for p in pts]
    all_y = [p[1] for pts in lines for p in pts]
    bbox = (min(all_x), min(all_y), max(all_x), max(all_y))

    def header(file_len_words):
        h = struct.pack(">i", 9994) + b"\x00" * 20 + struct.pack(">i", file_len_words)
        h += struct.pack("<2i", 1000, SHAPE_POLYLINE)
        h += struct.pack("<4d", *bbox)
        h += struct.pack("<4d", 0, 0, 0, 0)  # z/m ranges
        return h

    # .shp
    shp_len = 50 + sum(4 + len(r) // 2 for r in records)
    with open(base + ".shp", "wb") as f:
        f.write(header(shp_len))
        for i, r in enumerate(records):
            f.write(struct.pack(">2i", i + 1, len(r) // 2))
            f.write(r)

    # .shx
    shx_len = 50 + 4 * len(records)
    with open(base + ".shx", "wb") as f:
        f.write(header(shx_len))
        offset = 50
        for r in records:
            f.write(struct.pack(">2i", offset, len(r) // 2))
            offset += 4 + len(r) // 2

    # .dbf (one character field)
    width = max(8, max(len(a) for a in attributes))
    n_rec = len(records)
    with open(base + ".dbf", "wb") as f:
        hdr_len = 32 + 32 + 1
        rec_len = 1 + width
        f.write(struct.pack("<B3B", 0x03, 24, 1, 1))
        f.write(struct.pack("<I2H", n_rec, hdr_len, rec_len))
        f.write(b"\x00" * 20)
        name = field_name.encode()[:10].ljust(11, b"\x00")
        f.write(name + b"C" + b"\x00" * 4 + struct.pack("<BB", width, 0) + b"\x00" * 14)
        f.write(b"\x0d")
        for a in attributes:
            f.write(b" " + a.encode()[:width].ljust(width, b" "))
        f.write(b"\x1a")

    with open(base + ".prj", "w") as f:
        f.write(crs_wkt)
    with open(base + ".cpg", "w") as f:
        f.write("UTF-8")
    return base + ".shp"
