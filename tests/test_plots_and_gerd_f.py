"""Visualization module + gerd_f Darcy table (SURVEY §2.C8 plots, §2.C9)."""

import math
import os

import numpy as np
import pytest

pytestmark = pytest.mark.fast


def test_gerd_f_matches_reference_formulas():
    """Vectorized Swamee-Jain / Colebrook vs the reference's scalar loop
    (ref cases/gerd_roseires/gerd_f.py:5-44)."""
    from flowsim_tpu.models.gerd_roseires.gerd_f import (
        DIAMETER, NU, friction_table,
    )

    def ref_swamee_jain(Re, eps, D):
        return 0.25 / (math.log10(eps / (3.7 * D) + 5.74 / (Re**0.9)) ** 2)

    def ref_colebrook(Re, eps, D, tol=1e-8, max_iter=200):
        if Re < 2000:
            return 64.0 / Re
        f = ref_swamee_jain(Re, eps, D)
        for _ in range(max_iter):
            rhs = -2.0 * math.log10(eps / (3.7 * D) + 2.51 / (Re * math.sqrt(f)))
            f_new = 1.0 / (rhs**2)
            if abs(f_new - f) < tol:
                return f_new
            f = f_new
        return f

    t = friction_table()
    for i in range(len(t["Q_total"])):
        Qb = t["Q_total"][i] / 2.0
        A = math.pi * DIAMETER**2 / 4.0
        V = Qb / A
        Re = V * DIAMETER / NU
        np.testing.assert_allclose(t["V"][i], V, rtol=1e-12)
        np.testing.assert_allclose(t["Re"][i], Re, rtol=1e-12)
        np.testing.assert_allclose(t["f_swamee_jain"][i],
                                   ref_swamee_jain(Re, t["eps"][i], DIAMETER), rtol=1e-10)
        # the reference stops at |df| < 1e-8 (absolute, f ~ 0.01) while ours
        # runs to the machine fixed point -> compare at the ref's accuracy
        np.testing.assert_allclose(t["f_colebrook"][i],
                                   ref_colebrook(Re, t["eps"][i], DIAMETER), rtol=1e-5)


def test_gerd_f_laminar_branch():
    from flowsim_tpu.models.gerd_roseires.gerd_f import colebrook

    f = float(colebrook(1000.0, 1e-4))
    np.testing.assert_allclose(f, 64.0 / 1000.0, rtol=1e-12)


def test_cross_section_plot_renders_all_sections(tmp_path):
    pytest.importorskip("matplotlib")
    from flowsim_tpu.utils.plots import (
        plot_all_section_approximations,
        plot_cross_section_approximation,
    )

    fig = plot_cross_section_approximation(0)
    ax = fig.axes[0]
    labels = [line.get_label() for line in ax.get_lines()]
    for expected in ["Original cross-section", "Floodplain", "Main channel",
                     "Bankfull elevation"]:
        assert expected in labels, expected

    out = str(tmp_path / "figs")
    paths = plot_all_section_approximations(out)
    assert len(paths) == 22  # all gerd sections (ref visual.py:123-124)
    assert all(p.endswith("_approx.png") and os.path.getsize(p) > 0 for p in paths)


def test_channel_top_plot(tmp_path):
    pytest.importorskip("matplotlib")
    from flowsim_tpu.utils.plots import plot_channel_top

    ch = np.linspace(0.0, 20000.0, 21)
    widths = np.full(21, 250.0)
    curv = np.where((ch > 5000) & (ch < 15000), 1e-4, 0.0)
    path = str(tmp_path / "top.png")
    fig = plot_channel_top(ch, widths, curv, save_path=path)
    assert os.path.getsize(path) > 0
    assert len(fig.axes[0].get_lines()) == 3  # centerline + 2 banks
