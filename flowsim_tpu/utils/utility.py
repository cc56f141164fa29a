"""Reference ``utility`` module surface (ref: src/hydromodel/utility.py).

Host-side helpers; the solvers use vectorized in-graph equivalents (the L2
norm lives inside the Newton scan, hms formatting in utils/results.py), but
the public functions are kept for API parity with the reference.
"""

from __future__ import annotations

import os

import numpy as np


def create_directory_if_not_exists(directory: str) -> None:
    """ref utility.py:3-14."""
    if not os.path.exists(directory):
        os.makedirs(directory)


def manhattan_norm(vector) -> float:
    """L1 norm (ref utility.py:16-18)."""
    vector = np.asarray(vector, dtype=np.float64)
    return float(np.sum(np.abs(vector)))


def euclidean_norm(vector) -> float:
    """L2 norm — the Newton convergence norm (ref utility.py:20-22;
    used at ref preissmann.py:149)."""
    vector = np.asarray(vector, dtype=np.float64)
    return float(np.sqrt(np.sum(np.square(vector))))


def seconds_to_hms(seconds) -> str:
    """ref utility.py:24-33."""
    if seconds < 0:
        return "0:00:00"
    total = int(seconds)
    return f"{total // 3600}:{(total % 3600) // 60:02d}:{total % 60:02d}"


def compute_curv(x_coords, y_coords) -> np.ndarray:
    """Arc-length-parametric signed curvature of a planform centerline
    (ref utility.py:35-49 — defined but never called by the reference,
    which uses the 3-point turning-angle estimate instead; the production
    path here is :func:`flowsim_tpu.geometry.planform_curvature`)."""
    x = np.asarray(x_coords, dtype=np.float64)
    y = np.asarray(y_coords, dtype=np.float64)
    ds = np.hypot(np.diff(x), np.diff(y))
    s = np.insert(np.cumsum(ds), 0, 0.0)
    dx = np.gradient(x, s)
    dy = np.gradient(y, s)
    ddx = np.gradient(dx, s)
    ddy = np.gradient(dy, s)
    return (dx * ddy - dy * ddx) / (dx ** 2 + dy ** 2) ** 1.5
