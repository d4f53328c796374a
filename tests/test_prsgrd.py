"""Pressure-gradient variants (prsgrd31/32/40/42/44 equivalents).

Two invariants every scheme must satisfy:
 * a homogeneous ocean (constant rho, flat free surface) exerts exactly
   zero lateral force, even over steep bathymetry;
 * with realistic stratification over the upwelling shelf all schemes
   agree with the default splines density Jacobian to leading order.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from roms_tpu import stepping, vgrid
from roms_tpu.grid import hc_of
from roms_tpu.models import upwelling
from roms_tpu.ops import eos, prsgrd

pytestmark = pytest.mark.smoke

SCHEMES = ["djs", "dj", "pj", "pjq2", "pjq4"]


@pytest.fixture(scope="module")
def setup():
    cfg = upwelling.make_config(Lm=16, Mm=24, N=8, ndtfast=10)
    cfg, grid, s0, _ = (cfg,) + upwelling.build(cfg)[1:]
    hc = hc_of(cfg)
    z_r, z_w, Hz = vgrid.set_depth(grid.h, s0.zeta, hc, grid.sc_r,
                                   grid.Cs_r, grid.sc_w, grid.Cs_w,
                                   cfg.vtransform)
    return cfg, grid, s0, z_r, z_w, Hz


def interior(cfg, a):
    H = cfg.halo
    return np.asarray(a[..., H:H + cfg.Mm - 1, H:H + cfg.Lm - 1])


@pytest.mark.parametrize("scheme", SCHEMES)
def test_homogeneous_ocean_zero_force(setup, scheme):
    cfg, grid, s0, z_r, z_w, Hz = setup
    cfg = cfg.replace(prsgrd_scheme=scheme)
    rho = jnp.zeros_like(z_r)
    ru, rv = prsgrd.prsgrd(cfg, grid, rho, z_r, z_w, Hz)
    assert np.abs(interior(cfg, ru)).max() < 1e-9
    assert np.abs(interior(cfg, rv)).max() < 1e-9


@pytest.mark.parametrize("scheme", SCHEMES)
def test_flat_bottom_stratification_exact(setup, scheme):
    """1-D stratification over a FLAT bottom: all columns identical, so
    every scheme's lateral differences cancel exactly - the true PG is
    zero and so must be the discrete one."""
    cfg, grid, s0, *_ = setup
    cfg = cfg.replace(prsgrd_scheme=scheme)
    from roms_tpu.grid import hc_of
    h_flat = jnp.full_like(grid.h, 150.0)
    gridf = grid.replace(h=h_flat)
    z_r, z_w, Hz = vgrid.set_depth(gridf.h, s0.zeta, hc_of(cfg),
                                   grid.sc_r, grid.Cs_r, grid.sc_w,
                                   grid.Cs_w, cfg.vtransform)
    # horizontally-uniform stratification as a function of the FLAT z_r
    t = jnp.stack([14.0 + 8.0 * jnp.exp(z_r / 50.0),
                   jnp.full_like(z_r, 35.0)])
    rho, _ = eos.rho_eos_pden(cfg, t, z_r)
    ru, rv = prsgrd.prsgrd(cfg, gridf, rho, z_r, z_w, Hz)
    assert np.abs(interior(cfg, ru)).max() < 1e-7
    assert np.abs(interior(cfg, rv)).max() < 1e-7


@pytest.mark.parametrize("scheme", [s for s in SCHEMES if s != "djs"])
def test_slope_error_bounded(setup, scheme):
    """Over the (badly under-resolved N=8) upwelling shelf the PG error
    of every variant stays the same order as the default scheme's -
    schemes differ by design, but none may be wildly unstable."""
    cfg, grid, s0, z_r, z_w, Hz = setup
    rho, _ = eos.rho_eos_pden(cfg, s0.t, z_r)
    _, rv0 = prsgrd.prsgrd(cfg, grid, rho, z_r, z_w, Hz)
    _, rv = prsgrd.prsgrd(cfg.replace(prsgrd_scheme=scheme), grid, rho,
                          z_r, z_w, Hz)
    scale = np.abs(interior(cfg, rv0)).max()
    assert np.abs(interior(cfg, rv)).max() < 10.0 * scale


@pytest.mark.parametrize("scheme", ["pj", "pjq2", "pjq4"])
def test_short_run_stability(setup, scheme):
    cfg, grid, s0, *_ = setup
    cfg = cfg.replace(prsgrd_scheme=scheme)
    cfg, grid2, s, ffn = upwelling.build(cfg)
    stepf = stepping.make_stepper(cfg, grid2, ffn, donate=False)
    for _ in range(10):
        s = stepf(s)
    H = cfg.halo
    u = np.asarray(s.u[..., H:H + cfg.Mm, H:H + cfg.Lm])
    assert np.isfinite(u).all()
    assert np.abs(u).max() < 1.0
