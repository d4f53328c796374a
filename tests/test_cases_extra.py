"""Second batch of analytic cases (models/cases.py): OVERFLOW,
WINDBASIN, LAKE_SIGNELL, ESTUARY_TEST, RIVERPLUME1 - short integrations
with physics assertions tied to what each case exercises."""

import jax.numpy as jnp
import numpy as np

from roms_tpu.models import cases
from roms_tpu import stepping, vgrid
from roms_tpu.grid import hc_of


def _run(cfg, grid, s, ffn, n):
    step = stepping.make_stepper(cfg, grid, ffn, donate=False)
    for _ in range(n):
        s = step(s)
    return s


def _interior(cfg):
    H = cfg.halo
    return slice(H, H + cfg.Mm), slice(H, H + cfg.Lm)


def test_overflow_downslope_density_current():
    cfg, grid, s0, ffn = cases.overflow(Mm=64, N=12)
    jj, ii = _interior(cfg)

    def cold_com_depth(s):
        # depth of the center of mass of the cold anomaly
        _, _, Hz = vgrid.set_depth(grid.h, s.zeta, hc_of(cfg),
                                   grid.sc_r, grid.Cs_r, grid.sc_w,
                                   grid.Cs_w, cfg.vtransform)
        z_r, _, _ = vgrid.set_depth(grid.h, s.zeta, hc_of(cfg),
                                    grid.sc_r, grid.Cs_r, grid.sc_w,
                                    grid.Cs_w, cfg.vtransform)
        cold = jnp.maximum(5.0 - s.t[0], 0.0)[:, jj, ii] * Hz[:, jj, ii]
        return float((cold * z_r[:, jj, ii]).sum() / cold.sum())

    z0 = cold_com_depth(s0)
    s = _run(cfg, grid, s0, ffn, 240)      # 80 min
    z1 = cold_com_depth(s)
    assert np.isfinite(np.asarray(s.t)).all()
    assert z1 < z0 - 5.0        # dense water slid downslope
    assert float(np.abs(np.asarray(s.v)).max()) > 0.05


def test_windbasin_downwind_surface_return_flow_at_depth():
    cfg, grid, s0, ffn = cases.windbasin(Lm=40, Mm=20, N=12)
    s = _run(cfg, grid, s0, ffn, 400)      # 13 h, wind fully ramped
    jj, ii = _interior(cfg)
    u = np.asarray(s.u[:, jj, ii])
    assert np.isfinite(u).all()
    # basin-mean: surface flows downwind (westward, wind<0), bottom
    # return flow opposes it
    assert u[-1].mean() < 0.0
    assert u[0].mean() > 0.0
    # closed basin: near-zero net column transport
    ub = np.asarray(s.ubar[jj, ii])
    assert np.abs(ub).max() < 0.5 * np.abs(u[-1]).max()


def test_lake_signell_rest_before_ramp_and_spinup():
    cfg, grid, s0, ffn = cases.lake_signell(Lm=50, Mm=10, sediment=True)
    # hour 0-2: wind/waves are ~0, the lake must stay essentially at rest
    s = _run(cfg, grid, s0, ffn, 120)
    assert float(np.abs(np.asarray(s.u)).max()) < 1.0e-4
    jj, ii = _interior(cfg)
    assert float(np.asarray(s.t[2][:, jj, ii]).max()) < 1.0e-8
    assert np.isfinite(np.asarray(s.tke)).all()


def test_estuary_tide_and_salt_bounds():
    cfg, grid, s0, ffn = cases.estuary(Lm=100, N=10)
    s = _run(cfg, grid, s0, ffn, 720)      # 6 h = half M2 cycle
    jj, ii = _interior(cfg)
    z = np.asarray(s.zeta[jj, ii])
    salt = np.asarray(s.t[1][:, jj, ii])
    assert np.isfinite(z).all() and np.isfinite(salt).all()
    # tide entered: head of the estuary moves; salt stays in [0, 30+]
    assert np.abs(z).max() > 0.05
    assert salt.min() > -0.5 and salt.max() < 30.5
    # tidal currents developed
    assert float(np.abs(np.asarray(s.u)).max()) > 0.05


def test_riverplume_freshwater_and_mask():
    cfg, grid, s0, ffn = cases.riverplume(N=8)
    s = _run(cfg, grid, s0, ffn, 120)      # 4 h
    jj, ii = _interior(cfg)
    salt = np.asarray(s.t[1][:, jj, ii])
    assert np.isfinite(salt).all()
    # fresh water appeared near the source
    assert salt.min() < cfg.S0 - 1.0
    # away from the source channel the ocean stays at S0 (the channel
    # cell upstream of the river face legitimately concentrates while
    # it drains - its volume export carries zero salt flux by the
    # LuvSrc override, exactly as in the reference)
    assert salt[:, :, 4:].max() < cfg.S0 + 0.5
    # land mask honored: u = 0 on masked faces
    u = np.asarray(s.u)
    um = np.asarray(grid.umask)
    assert np.abs(u * (1.0 - um)).max() == 0.0
