"""Smoke + physics tests for the secondary analytic cases."""

import jax
import numpy as np
import pytest

from roms_tpu.models import cases
from roms_tpu import stepping


def interior(cfg, a):
    H = cfg.halo
    return np.asarray(a[..., H:H + cfg.Mm, H:H + cfg.Lm])


def run_steps(cfg, grid, s, ffn, n):
    stepf = stepping.make_stepper(cfg, grid, s and None or None)  # noqa
    stepf = stepping.make_stepper(cfg, grid, ffn, donate=False)
    for _ in range(n):
        s = stepf(s)
    return s


def test_seamount_rest_pgrad_error():
    """The classic sigma-coordinate PG error test: stratified rest over a
    steep seamount; spurious currents must stay small."""
    cfg, grid, s0, ffn = cases.seamount(Lm=32, Mm=32, N=10)
    s = run_steps(cfg, grid, s0, ffn, 10)
    umax = np.abs(interior(cfg, s.u)).max()
    assert np.isfinite(umax)
    # splines density Jacobian keeps the error at mm/s-cm/s level even on
    # this intentionally brutal test
    assert umax < 0.05


def test_grav_adj_fronts_propagate():
    cfg, grid, s0, ffn = cases.grav_adj(Lm=64, Mm=4, N=20)
    s = run_steps(cfg, grid, s0, ffn, 30)
    T = interior(cfg, s.t[0])
    u = interior(cfg, s.u)
    assert np.isfinite(T).all()
    # gravity currents: warm water spreads along the surface toward +x,
    # cold along the bottom toward -x => opposite-signed u at top/bottom
    mid = T.shape[2] // 2
    assert u[-1, :, mid].mean() > 1e-3     # surface flow rightward
    assert u[0, :, mid].mean() < -1e-3     # bottom flow leftward


def test_double_gyre_spins_up():
    cfg, grid, s0, ffn = cases.double_gyre(Lm=27, Mm=54, N=4, dt=1800.0)
    s = run_steps(cfg, grid, s0, ffn, 24)
    assert np.isfinite(interior(cfg, s.zeta)).all()
    ke = (interior(cfg, s.u) ** 2).mean()
    assert 0 < ke < 1.0


def test_basin_runs():
    cfg, grid, s0, ffn = cases.basin(Lm=45, Mm=35, N=6)
    s = run_steps(cfg, grid, s0, ffn, 10)
    assert np.isfinite(interior(cfg, s.t[0])).all()
    assert np.abs(interior(cfg, s.u)).max() < 1.0


def test_canyon_runs():
    cfg, grid, s0, ffn = cases.canyon3d(Lm=33, Mm=24, N=8)
    s = run_steps(cfg, grid, s0, ffn, 10)
    assert np.isfinite(interior(cfg, s.u)).all()


def test_kelvin_wave_enters_and_propagates():
    cfg, grid, s0, ffn = cases.kelvin()
    s = run_steps(cfg, grid, s0, ffn, 24)     # 6 h: wave enters from west
    z = interior(cfg, s.zeta)
    assert np.isfinite(z).all()
    # coastal amplitude (south wall, near west) larger than offshore
    assert np.abs(z[2, :10]).max() > 2.0 * np.abs(z[-3, :10]).max()
    assert np.abs(z).max() < 2.0
