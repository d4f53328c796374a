"""Radiation-stress (NEARSHORE_MELLOR05) kernel: ops/nearshore.py vs
physical invariants, plus integration into the step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from roms_tpu import constants as C
from roms_tpu import stepping, vgrid
from roms_tpu.grid import hc_of
from roms_tpu.models import upwelling
from roms_tpu.ops.nearshore import radiation_stress


@pytest.fixture(scope="module")
def setup():
    cfg = upwelling.make_config(Lm=16, Mm=14, N=6, ndtfast=6)
    cfg, grid, s0, ffn = upwelling.build(cfg)
    hc = hc_of(cfg)
    z_r, z_w, Hz = vgrid.set_depth(grid.h, s0.zeta, hc, grid.sc_r,
                                   grid.Cs_r, grid.sc_w, grid.Cs_w,
                                   cfg.vtransform)
    return cfg, grid, s0, ffn, Hz


def _waves(cfg, grid, Hw=1.0, Lw=80.0, toward_x=True):
    Hwave = jnp.full_like(grid.h, Hw)
    # Dwave is the TO direction in the reference's nautical convention;
    # cdir = 1.5*pi - Dwave - angler, so Dwave = 1.5*pi gives
    # cos(cdir)=1 (waves toward +x)
    Dwave = jnp.full_like(grid.h, 1.5 * jnp.pi if toward_x else jnp.pi)
    Lwave = jnp.full_like(grid.h, Lw)
    return Hwave, Dwave, Lwave


def test_uniform_waves_no_force(setup):
    """Spatially uniform waves over our flat-alongshore channel produce
    zero alongshore force; with flat bathymetry rows the cross terms
    vanish where depth is uniform."""
    cfg, grid, s0, ffn, Hz = setup
    Hwave, Dwave, Lwave = _waves(cfg, grid)
    ns = radiation_stress(cfg, grid, s0.zeta, Hz, grid.Cs_r, grid.Cs_w,
                          Hwave, Dwave, Lwave)
    H = cfg.halo
    # xi is periodic and uniform (upwelling channel): all xi-derivative
    # contributions must vanish identically
    ru = np.asarray(ns.rustr3d)[:, H:H + cfg.Mm, H:H + cfg.Lm]
    assert np.abs(ru).max() < 1e-10
    assert np.isfinite(np.asarray(ns.rvstr3d)).all()


def test_stokes_transport_classic(setup):
    """Depth-integrated Stokes transport = E/c for waves toward +x
    (Longuet-Higgins; the Mellor05 profile integrates to it exactly in
    the continuum)."""
    cfg, grid, s0, ffn, Hz = setup
    # Lwave long enough that kD = k*D < kDmax=5 (the reference clips kD,
    # which breaks the classic transport identity in deep water)
    Hwave, Dwave, Lwave = _waves(cfg, grid, Hw=0.8, Lw=500.0)
    ns = radiation_stress(cfg, grid, s0.zeta, Hz, grid.Cs_r, grid.Cs_w,
                          Hwave, Dwave, Lwave)
    H = cfg.halo
    j, i = H + 7, H + 8
    Hz_u = 0.5 * (np.asarray(Hz)[:, j, i - 1] + np.asarray(Hz)[:, j, i])
    transport = float(np.sum(Hz_u * np.asarray(ns.u_stokes)[:, j, i]))
    waveE = 0.0625 * C.g * 0.8 ** 2
    k = 2 * np.pi / 500.0
    D = float(np.asarray(grid.h)[j, i] + np.asarray(s0.zeta)[j, i])
    kD = min(k * D, 5.0)
    c = np.sqrt(C.g / k * np.tanh(kD))
    assert transport == pytest.approx(waveE / c, rel=0.12)
    # surface-intensified profile
    ust = np.asarray(ns.u_stokes)[:, j, i]
    assert ust[-1] > ust[0] > 0.0


def test_shoaling_gradient_force_sign(setup):
    """Hwave decaying toward +y: d(Syy)/dy < 0 so the flux-form force
    -rvstr accelerates +v (wave-breaking-like momentum deposition)."""
    cfg, grid, s0, ffn, Hz = setup
    H = cfg.halo
    yy = jnp.arange(cfg.ny_tot, dtype=grid.h.dtype)[:, None]
    Hwave = 1.2 - 0.05 * (yy - H) * jnp.ones_like(grid.h)
    Hwave = jnp.clip(Hwave, 0.2, None)
    Dwave = jnp.full_like(grid.h, jnp.pi)      # toward +y
    Lwave = jnp.full_like(grid.h, 80.0)
    ns = radiation_stress(cfg, grid, s0.zeta, Hz, grid.Cs_r, grid.Cs_w,
                          Hwave, Dwave, Lwave)
    rv = np.asarray(ns.rvstr2d)[H + 4:H + cfg.Mm - 4, H + 2:H + cfg.Lm - 2]
    # column sum of the flux-form force: -rvstr > 0 on average
    assert rv.mean() < 0.0


def test_step_integration(setup):
    cfg, grid, s0, ffn, Hz = setup
    import dataclasses
    cfg_ns = dataclasses.replace(cfg, nearshore="mellor05")

    def ffn_waves(c, g, t):
        out = dict(ffn(c, g, t)) if ffn else {}
        yy = jnp.arange(g.h.shape[-2], dtype=g.h.dtype)[:, None]
        out["Hwave"] = jnp.clip(
            1.0 - 0.04 * (yy - c.halo) * jnp.ones_like(g.h), 0.2, None)
        out["Dwave"] = jnp.full_like(g.h, jnp.pi)
        out["Lwave"] = jnp.full_like(g.h, 80.0)
        return out

    run = jax.jit(lambda s: stepping.run(cfg_ns, grid, s, 3, ffn_waves))
    s1 = run(s0)
    assert np.isfinite(np.asarray(s1.zeta)).all()
    run0 = jax.jit(lambda s: stepping.run(cfg, grid, s, 3, ffn))
    s2 = run0(s0)
    # the wave forcing must move momentum
    dv = np.abs(np.asarray(s1.v) - np.asarray(s2.v)).max()
    assert dv > 1e-7


def test_stokes_transport_consistency_and_constancy():
    """Stokes advection (NEARSHORE_MELLOR set_massflux.F:140-160 +
    step2d DUSon): with the frozen-transport closure a constant tracer
    under a steady oblique wave field stays constant to ~1e-6/step (the
    residual is the documented first-corrector fast-filter
    inconsistency acting on the wave transport; the reference's
    instantaneous-depth DUSon carries the same structure)."""
    import numpy as np
    import jax.numpy as jnp
    from roms_tpu.models import upwelling
    from roms_tpu import stepping
    import roms_tpu.constants as C

    cfg = upwelling.make_config(Lm=24, Mm=16, N=8, dtype="float64")
    cfg = cfg.replace(nearshore="mellor05", vmix=None)
    cfg, grid, s, ffn0 = upwelling.build(cfg)
    one = jnp.ones_like(grid.h)

    def ffn(cfg_, grid_, time):
        base = dict(ffn0(cfg_, grid_, time) or {}) if ffn0 else {}
        base.update({"Hwave": 0.8 * one, "Pwave": 8.0 * one,
                     "Dwave": 225.0 * C.deg2rad * one,
                     "Lwave": 60.0 * one})
        return base

    s = s.replace(t=s.t.at[0].set(17.0))
    nst = 10
    for _ in range(nst):
        s = stepping.step(cfg, grid, s, ffn)
    H = cfg.halo
    t = np.asarray(s.t[0])[:, H:H + cfg.Mm, H:H + cfg.Lm]
    assert np.isfinite(t).all()
    assert np.abs(t - 17.0).max() < 1.0e-5 * nst
    # the waves actually transport: mean flow responds to the oblique
    # wave forcing
    assert np.abs(np.asarray(s.vbar)).max() > 1.0e-5


def test_mellor08_variant(setup):
    """Mellor (2008) kernel (nearshore_mellor08.h): same physical
    invariants as the 2005 form - shoaling-gradient force sign,
    comparable magnitude - plus full-step integration."""
    from roms_tpu.ops.nearshore import radiation_stress08
    cfg, grid, s0, ffn, Hz = setup
    hc = hc_of(cfg)
    z_r, z_w, _ = vgrid.set_depth(grid.h, s0.zeta, hc, grid.sc_r,
                                  grid.Cs_r, grid.sc_w, grid.Cs_w,
                                  cfg.vtransform)
    H = cfg.halo
    yy = jnp.arange(cfg.ny_tot, dtype=grid.h.dtype)[:, None]
    Hwave = jnp.clip(1.2 - 0.05 * (yy - H) * jnp.ones_like(grid.h),
                     0.2, None)
    Dwave = jnp.full_like(grid.h, jnp.pi)
    Lwave = jnp.full_like(grid.h, 80.0)
    ns05 = radiation_stress(cfg, grid, s0.zeta, Hz, grid.Cs_r,
                            grid.Cs_w, Hwave, Dwave, Lwave)
    ns08 = radiation_stress08(cfg, grid, s0.zeta, Hz, z_r, grid.Cs_r,
                              grid.Cs_w, Hwave, Dwave, Lwave)
    sl = np.s_[H + 4:H + cfg.Mm - 4, H + 2:H + cfg.Lm - 2]
    rv05 = np.asarray(ns05.rvstr2d)[sl]
    rv08 = np.asarray(ns08.rvstr2d)[sl]
    assert np.isfinite(np.asarray(ns08.rvstr3d)).all()
    assert rv08.mean() < 0.0                  # same force direction
    # same order of magnitude as the 2005 form
    assert 0.1 < abs(rv08.mean() / rv05.mean()) < 10.0
    # depth-integrated stress is the Hz-weighted sum of levels
    np.testing.assert_allclose(
        np.asarray(ns08.rustr2d), np.asarray(ns08.rustr3d).sum(0),
        rtol=1e-12, atol=1e-12)

    # full-step integration under cfg.nearshore="mellor08"
    import dataclasses
    cfg_ns = dataclasses.replace(cfg, nearshore="mellor08")

    def ffn_waves(c, g, t):
        out = dict(ffn(c, g, t)) if ffn else {}
        yyl = jnp.arange(g.h.shape[-2], dtype=g.h.dtype)[:, None]
        out["Hwave"] = jnp.clip(
            1.0 - 0.04 * (yyl - c.halo) * jnp.ones_like(g.h), 0.2, None)
        out["Dwave"] = jnp.full_like(g.h, jnp.pi)
        out["Lwave"] = jnp.full_like(g.h, 80.0)
        return out

    run = jax.jit(lambda s: stepping.run(cfg_ns, grid, s, 3, ffn_waves))
    s1 = run(s0)
    assert np.isfinite(np.asarray(s1.zeta)).all()
    assert np.isfinite(np.asarray(s1.t)).all()
