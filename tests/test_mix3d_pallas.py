"""Fused Pallas h-mix kernels (ops/mix3d_pallas.py): interpreter-mode
equivalence against the jnp reference operators."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from roms_tpu.models import benchmark
from roms_tpu import vgrid
from roms_tpu.grid import hc_of
from roms_tpu.ops import mix3d, mix3d_pallas


@pytest.mark.smoke
def test_fused_hmix_matches_reference():
    cfg = benchmark.make_config(Lm=24, Mm=16, N=8, ndtfast=6,
                                dtype="float64")
    cfg, grid, s, ffn = benchmark.build(cfg)
    hc = hc_of(cfg)
    z_r, z_w, Hz = vgrid.set_depth(grid.h, s.zeta, hc, grid.sc_r,
                                   grid.Cs_r, grid.sc_w, grid.Cs_w,
                                   cfg.vtransform)
    key = jax.random.PRNGKey(0)
    t = s.t + 0.1 * jax.random.normal(key, s.t.shape, s.t.dtype)
    tn = t * Hz[None]
    ref = mix3d.t3dmix2_geo(cfg, grid, t, Hz, z_r, tn, cfg.dt)
    fus = mix3d_pallas.t3dmix2_geo_fused(cfg, grid, t, Hz, z_r, tn,
                                         cfg.dt, interpret=True)
    np.testing.assert_allclose(np.asarray(fus), np.asarray(ref),
                               rtol=0, atol=1e-12)

    u = 0.1 * jax.random.normal(key, s.u.shape, s.u.dtype)
    v = 0.1 * jax.random.normal(key, s.v.shape, s.v.dtype)
    args = (u, v, Hz, u * Hz, v * Hz,
            jnp.zeros_like(s.zeta), jnp.zeros_like(s.zeta), cfg.dt)
    r1 = mix3d.uv3dmix2(cfg, grid, *args)
    r2 = mix3d_pallas.uv3dmix2_fused(cfg, grid, *args, interpret=True)
    for a, b, name in zip(r1, r2, ("u_nnew", "v_nnew", "rufrc",
                                   "rvfrc")):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=0, atol=1e-7, err_msg=name)


@pytest.mark.smoke
def test_fused_prsgrd_matches_reference():
    from roms_tpu.ops import prsgrd, prsgrd_pallas, eos
    cfg = benchmark.make_config(Lm=24, Mm=16, N=8, ndtfast=6,
                                dtype="float64")
    cfg, grid, s, _ = benchmark.build(cfg)
    hc = hc_of(cfg)
    z_r, z_w, Hz = vgrid.set_depth(grid.h, s.zeta, hc, grid.sc_r,
                                   grid.Cs_r, grid.sc_w, grid.Cs_w,
                                   cfg.vtransform)
    rho, _ = eos.rho_eos_pden(cfg, s.t, z_r)
    for tide in (None, 0.01 * jnp.ones_like(grid.h)):
        r1 = prsgrd.prsgrd32(cfg, grid, rho, z_r, z_w, Hz, eq_tide=tide)
        r2 = prsgrd_pallas.prsgrd32_fused(cfg, grid, rho, z_r, z_w, Hz,
                                          eq_tide=tide, interpret=True)
        for a, b, name in zip(r1, r2, ("ru", "rv")):
            scale = float(jnp.abs(a).max())
            np.testing.assert_allclose(
                np.asarray(b) / scale, np.asarray(a) / scale,
                rtol=0, atol=1e-12, err_msg=name)
