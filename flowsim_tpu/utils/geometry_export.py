"""Planform geometry export: centerline reconstruction and bank outlines.

Functional equivalents of the reference's custom GIS helpers
(ref: cases/gerd_roseires/custom_functions.py:6-98): rebuild the channel
centerline from per-node curvature by arc-length integration, offset the
top widths to left/right bank polylines, and export them as an ESRI
shapefile (via the dependency-free writer in utils.shapefile, since
geopandas/shapely are not available here).
"""

from __future__ import annotations

import numpy as np

from flowsim_tpu.utils.shapefile import write_polylines


def reconstruct_centerline(chainages, curvature, x0, y0, theta0):
    """Integrate heading/position from curvature (ref custom_functions.py:6-39)."""
    s = np.asarray(chainages, dtype=float)
    k = np.asarray(curvature, dtype=float)
    if s.ndim != 1 or k.ndim != 1 or s.size != k.size:
        raise ValueError("chainages and curvature must be 1D arrays of same length")

    theta = np.empty_like(k)
    theta[0] = theta0
    ds = np.diff(s)
    theta[1:] = theta0 + np.cumsum(0.5 * (k[:-1] + k[1:]) * ds)

    x = np.empty_like(k)
    y = np.empty_like(k)
    x[0], y[0] = x0, y0
    x[1:] = x0 + np.cumsum(0.5 * (np.cos(theta[:-1]) + np.cos(theta[1:])) * ds)
    y[1:] = y0 + np.cumsum(0.5 * (np.sin(theta[:-1]) + np.sin(theta[1:])) * ds)
    return x, y, theta


def bank_outlines(x, y, theta, widths):
    """Offset the centerline by half the top width along the local normal
    (ref custom_functions.py:41-62, without the matplotlib display)."""
    widths = np.asarray(widths, dtype=float)
    nx = -np.sin(theta)
    ny = np.cos(theta)
    left = np.column_stack([x + 0.5 * widths * nx, y + 0.5 * widths * ny])
    right = np.column_stack([x - 0.5 * widths * nx, y - 0.5 * widths * ny])
    return left, right


def export_banks(left, right, outfile="banks.shp", crs_wkt=None):
    """Write left/right bank polylines to a shapefile
    (ref custom_functions.py:68-98)."""
    kw = {} if crs_wkt is None else {"crs_wkt": crs_wkt}
    return write_polylines(outfile, [list(map(tuple, left)), list(map(tuple, right))],
                           attributes=["left", "right"], **kw)


def draw_channel(chainages, widths, curvature, x0, y0, theta0, outfile=None):
    """Centerline + banks; optionally export a shapefile (ref model.py:115-125)."""
    x, y, theta = reconstruct_centerline(chainages, curvature, x0, y0, theta0)
    left, right = bank_outlines(x, y, theta, widths)
    if outfile is not None:
        export_banks(left, right, outfile)
    return x, y, theta, left, right
