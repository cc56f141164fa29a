"""GERD->Roseires flood-routing model (the flagship application).

Mirrors ref cases/gerd_roseires/model.py:10-125: build the GERD release
hydrograph (reservoir routing), load the 21 fitted compound-trapezoid
stations (cross-section 53 skipped), attach the Roseires rating-curve
boundary, assemble the channel with planform curvature, run the Preissmann
solver, and optionally return interpolated upstream stages for calibration
or export the bank polylines.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from flowsim_tpu.api import Boundary, Channel, Hydrograph, PreissmannSolver
from flowsim_tpu.models.gerd_roseires import settings
from flowsim_tpu.models.gerd_roseires.gerd_discharge import GerdHydrograph
from flowsim_tpu.models.gerd_roseires.roseires_rating_curve import RoseiresRatingCurve
from flowsim_tpu.utils.io import import_hydrograph, import_table, load_trapezoid_stations


def build(
    n_main=None,
    n_fp=None,
    initial_roseires_level=settings.initial_roseires_level,
    theta=settings.theta,
    spatial_step=settings.spatial_step,
    time_step=settings.time_step,
    sim_duration=settings.sim_duration,
    inflow_hyd_path=settings.inflow_hyd_path,
    inflow_hyd_func=settings.inflow_hyd_func,
    coords_path=settings.coords_path,
    cross_sections_path=settings.cross_sections_path,
    jammed_spillways=settings.JAMMED_SPILLWAYS,
    jammed_sluice_gates=settings.JAMMED_SLUICEGATES,
    gerd_level=settings.initial_gerd_level,
    with_gerd=True,
    smooth=True,
    **solver_kw,
):
    """Construct the solver (ref model.py:33-87); returns (solver, channel)."""
    if inflow_hyd_func is None:
        gerd_inflow_hyd = Hydrograph(table=import_hydrograph(inflow_hyd_path))
    else:
        gerd_inflow_hyd = Hydrograph(function=inflow_hyd_func)

    if sim_duration is None:
        if gerd_inflow_hyd.table is None:
            raise ValueError("Simulation duration must be specified.")
        duration = int(gerd_inflow_hyd.table[-1, 0])
    else:
        duration = int(sim_duration)

    gerd_discharge_hyd = GerdHydrograph()
    gerd_discharge_hyd.build(
        inflow_hydrograph=gerd_inflow_hyd, time_step=time_step,
        duration=duration, initial_stage=gerd_level,
    )
    initial_flow = gerd_discharge_hyd.get_at(0)

    xs_chainages, stations = load_trapezoid_stations(cross_sections_path, n_main=n_main, n_fp=n_fp)
    roseires_ch = xs_chainages[-1]
    roseires_bed = stations[-1].z_bed
    upstream_ch = xs_chainages[0]

    upstream_bc = Boundary(
        condition="flow_hydrograph",
        hydrograph=gerd_discharge_hyd if with_gerd else gerd_inflow_hyd,
        chainage=upstream_ch,
    )
    roseires = Boundary(
        initial_depth=initial_roseires_level - roseires_bed,
        bed_level=roseires_bed,
        condition="rating_curve",
        rating_curve=RoseiresRatingCurve(
            initial_stage=initial_roseires_level,
            initial_flow=initial_flow,
            jammed_sluice_gates=jammed_sluice_gates,
            jammed_spillways=jammed_spillways,
            smooth=smooth,
        ),
        chainage=roseires_ch,
    )

    channel = Channel(
        initial_flow=initial_flow,
        upstream_boundary=upstream_bc,
        downstream_boundary=roseires,
    )
    if coords_path is not None:
        coords = import_table(coords_path, sort_by="chainage")
        channel.set_coords(coords=coords[:, 1:], chainages=coords[:, 0])
    channel.set_cross_sections(chainages=xs_chainages, sections=stations)

    solver = PreissmannSolver(
        channel=channel, theta=theta, time_step=time_step,
        spatial_step=spatial_step, simulation_time=duration, **solver_kw,
    )
    return solver, channel


def run(
    Q=None,
    tolerance=settings.tolerance,
    verbose=1,
    folder=settings.folder,
    file=settings.file,
    banks_file="banks.shp",
    **build_kw,
):
    """Run the case (ref model.py:10-113).

    With ``Q`` given, returns upstream stages interpolated at those
    discharges (the calibration hook, ref model.py:105-113); otherwise
    exports the bank polylines (GIS shapefile, ref model.py:115-125 —
    disable with ``banks_file=None``) and returns the solver.

    Calibration-hook caveat, faithful to the reference: the interpolation
    runs np.interp over the upstream flow SERIES, which rises and falls —
    a non-monotonic xp.  For a Q reached on both limbs, np.interp's sorted
    assumption picks an arbitrary crossing; the reference calibration
    inflow (inflow_hydrograph_small.csv) is monotone over the fitted range,
    which is why the quirk is inherited rather than fixed.
    """
    solver, channel = build(**build_kw)
    if verbose > 0:
        print("Simulation started.")
    solver.run(verbose=max(0, verbose - 1), tolerance=tolerance)
    if folder is not None and file is not None:
        solver.save_results(folder_path=folder, file_name=file)
    if verbose > 0:
        print("Done.")

    if Q is not None:
        z0 = float(channel.geometry.z_bed[0])
        return np.interp(np.asarray(Q), solver.flow[:, 0], solver.depth[:, 0] + z0)

    if folder is not None and banks_file is not None:
        # bank polylines from planform curvature + initial-condition top
        # widths (ref model.py:115-125 exports these unconditionally)
        import os

        from flowsim_tpu.utils.geometry_export import draw_channel

        widths = [
            channel.top_width(i, hw=channel.initial_conditions[i, 0]
                              + channel.bed_level_at(i))
            for i in range(len(channel.ch_at_node))
        ]
        curv = np.asarray(channel.geometry.curvature)
        draw_channel(channel.ch_at_node, widths, curv,
                     x0=726833.0, y0=1240801.0, theta0=2 * np.pi,
                     outfile=os.path.join(folder, banks_file))
    return solver


if __name__ == "__main__":
    # Mirrors ref cases/gerd_roseires/main.py:1-7: regulated (GERD releases)
    # vs natural (inflow passed straight through) scenarios back to back.
    print("Start.")
    run(verbose=0, file="gerd.xlsx", inflow_hyd_func=None)
    print("Finished regulated scenario.")
    run(verbose=0, file="no_gerd.xlsx", inflow_hyd_func=None, with_gerd=False)
    print("Finished natural scenario.")
