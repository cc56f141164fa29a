"""CSV loaders for case data.

Functional equivalents of the reference's
``cases/gerd_roseires/custom_functions.py:100-157`` loaders, returning
NumPy arrays / station lists for the geometry builders.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from flowsim_tpu.geometry import TrapezoidStation


def import_table(path: str, header: bool = True, sort_by: str = None) -> np.ndarray:
    """Generic CSV -> float array (ref custom_functions.py:120-126)."""
    table = pd.read_csv(path, header=(0 if header else None)).dropna(axis=1, how="all").dropna()
    if sort_by is not None:
        table = table.astype(np.float64).sort_values(by=sort_by)
    return table.to_numpy(dtype=np.float64)


def import_hydrograph(path: str, hr_to_s_conversion: bool = True) -> np.ndarray:
    """(time, flow) table, hours -> seconds (ref custom_functions.py:109-118)."""
    table = pd.read_csv(path, skiprows=[1]).astype(np.float64).sort_values(by="time")
    arr = table.to_numpy()
    if hr_to_s_conversion:
        arr[:, 0] *= 3600.0
    return arr


def import_area_curve(path: str) -> np.ndarray:
    """(stage, area) curve with km^2 -> m^2 (ref custom_functions.py:100-107)."""
    table = pd.read_csv(path, skiprows=[1]).astype(np.float64).sort_values(by="stage")
    arr = table.to_numpy()[:, :2]
    arr[:, 1] *= 1e6
    return arr


def load_trapezoid_stations(file_path: str, n_main=None, n_fp=None, skip_files=("53.csv",)):
    """Fitted compound-trapezoid stations from composite_trapezoids.csv.

    Mirrors ref custom_functions.py:128-157 (including the hard-coded skip of
    cross-section 53, ref :137-139) but returns TrapezoidStation configs for
    the struct-of-arrays geometry builder.
    """
    table = pd.read_csv(file_path)
    chainages, stations = [], []
    for _, row in table.iterrows():
        if row["file"] in skip_files:
            continue
        chainages.append(float(row["chainage"]))
        stations.append(
            TrapezoidStation(
                z_bed=float(row["z_min"]),
                b_main=float(row["b_main"]),
                m_main=float(row["m_main"]),
                n_main=float(row["n_main"]) if n_main is None else float(n_main),
                h_bank=float(row["h_bankfull"]),
                b_fp_left=float(row["b_fp_left"]),
                b_fp_right=float(row["b_fp_right"]),
                m_fp=float(row["m_fp"]),
                n_left=float(row["n_left"]) if n_fp is None else float(n_fp),
                n_right=float(row["n_right"]) if n_fp is None else float(n_fp),
            )
        )
    return chainages, stations
