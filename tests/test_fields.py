"""Field diagnostics and filters (utils/fields.py: vorticity.F,
shapiro.F, interpolate.F analogs)."""

import numpy as np
import jax.numpy as jnp
import pytest

from roms_tpu.models import upwelling
from roms_tpu.utils import fields
from roms_tpu import vgrid
from roms_tpu.grid import hc_of


@pytest.mark.smoke
def test_vorticity_solid_body_rotation():
    """A solid-body-rotation velocity field u=-w0*y, v=w0*x has uniform
    relative vorticity 2*w0."""
    cfg = upwelling.make_config(Lm=20, Mm=20, N=4, dtype="float64")
    cfg, grid, s, _ = upwelling.build(cfg)
    w0 = 1.0e-5
    yc = float(np.asarray(grid.yr).mean())
    xc = float(np.asarray(grid.xr).mean())
    yu = np.asarray(grid.yr)
    ubar = jnp.asarray(-w0 * (yu - yc))
    vbar = jnp.asarray(w0 * (np.asarray(grid.xr) - xc))
    rvor, pvor = fields.vorticity_bar(cfg, grid, s.zeta, ubar, vbar)
    H = cfg.halo
    r = np.asarray(rvor)[H + 2:-H - 2, H + 2:-H - 2]
    assert np.allclose(r, 2.0 * w0, rtol=0.05)
    # pvor ~ (f + 2w0)/D
    h = np.asarray(grid.h)[H + 2:-H - 2, H + 2:-H - 2]
    f = np.asarray(grid.f)[H + 2:-H - 2, H + 2:-H - 2]
    p = np.asarray(pvor)[H + 2:-H - 2, H + 2:-H - 2]
    assert np.allclose(p, (f + 2 * w0) / h, rtol=0.08)


@pytest.mark.smoke
def test_vorticity3d_matches_bar_for_depth_uniform_flow():
    cfg = upwelling.make_config(Lm=16, Mm=16, N=6, dtype="float64")
    cfg, grid, s, _ = upwelling.build(cfg)
    w0 = 2.0e-5
    yc = float(np.asarray(grid.yr).mean())
    xc = float(np.asarray(grid.xr).mean())
    ub = jnp.asarray(-w0 * (np.asarray(grid.yr) - yc))
    vb = jnp.asarray(w0 * (np.asarray(grid.xr) - xc))
    u = jnp.broadcast_to(ub, (cfg.N,) + ub.shape)
    v = jnp.broadcast_to(vb, (cfg.N,) + vb.shape)
    hc = hc_of(cfg)
    z_r, _, _ = vgrid.set_depth(grid.h, s.zeta, hc, grid.sc_r,
                                grid.Cs_r, grid.sc_w, grid.Cs_w,
                                cfg.vtransform)
    pden = 26.0 - 0.01 * z_r
    rvor, pvor = fields.vorticity3d(cfg, grid, u, v, pden, z_r)
    H = cfg.halo
    r = np.asarray(rvor)[:, H + 2:-H - 2, H + 2:-H - 2]
    assert np.allclose(r, 2.0 * w0, rtol=0.05)
    assert np.isfinite(np.asarray(pvor)).all()


@pytest.mark.smoke
def test_shapiro_damps_checkerboard_keeps_constant():
    a = jnp.ones((12, 16))
    assert np.allclose(np.asarray(fields.shapiro2d(a)), 1.0)
    ij = np.add.outer(np.arange(12), np.arange(16))
    chk = jnp.asarray(1.0 * (-1.0) ** ij)
    out = np.asarray(fields.shapiro2d(chk))[2:-2, 2:-2]
    assert np.abs(out).max() < 1e-12      # 2-dx signal annihilated


@pytest.mark.smoke
def test_linterp2d_recovers_linear_field():
    a = jnp.asarray(np.add.outer(np.arange(10.0), 2.0 * np.arange(12.0)))
    gi = jnp.asarray([2.5, 7.25])
    gj = jnp.asarray([3.5, 1.75])
    got = np.asarray(fields.linterp2d(a, gi, gj))
    want = 1.0 * np.asarray(gj) + 2.0 * np.asarray(gi)
    assert np.allclose(got, want)
