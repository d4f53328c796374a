"""Fused Pallas momentum-rhs kernel (ops/rhs3d_pallas.py):
interpreter-mode equivalence against the unfused jnp stage chain."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from roms_tpu.models import benchmark
from roms_tpu import vgrid
from roms_tpu.grid import hc_of
from roms_tpu.ops import eos, mix3d, prsgrd, rhs3d_pallas
from roms_tpu.ops.omega import set_massflux, omega
from roms_tpu.ops.pre_step3d import momentum_init, ab3_start_coefs
from roms_tpu.ops.rhs3d import rhs3d_momentum


@pytest.mark.smoke
@pytest.mark.parametrize("tide", [False, True])
def test_fused_momentum_rhs_matches_reference(tide):
    cfg = benchmark.make_config(Lm=24, Mm=16, N=8, ndtfast=6,
                                dtype="float64")
    cfg, grid, s, ffn = benchmark.build(cfg)
    hc = hc_of(cfg)
    key = jax.random.PRNGKey(1)
    ku, kv, kt = jax.random.split(key, 3)
    u = 0.1 * jax.random.normal(ku, s.u.shape, s.u.dtype)
    v = 0.1 * jax.random.normal(kv, s.v.shape, s.v.dtype)
    t = s.t + 0.1 * jax.random.normal(kt, s.t.shape, s.t.dtype)
    z_r, z_w, Hz = vgrid.set_depth(grid.h, s.zeta, hc, grid.sc_r,
                                   grid.Cs_r, grid.sc_w, grid.Cs_w,
                                   cfg.vtransform)
    rho, _ = eos.rho_eos_pden(cfg, t, z_r)
    Huon, Hvom = set_massflux(cfg, grid, u, v, Hz)
    W = omega(cfg, grid, Huon, Hvom, z_w)
    zero2 = jnp.zeros_like(s.zeta)
    sustr = 1e-4 * jnp.ones_like(zero2)
    svstr = 2e-5 * jnp.ones_like(zero2)
    bustr = 1e-5 * jnp.ones_like(zero2)
    bvstr = 1e-5 * jnp.ones_like(zero2)
    rup = 0.01 * jax.random.normal(ku, s.u.shape, s.u.dtype)
    rup2 = 0.01 * jax.random.normal(kv, s.u.shape, s.u.dtype)
    rvp = 0.01 * jax.random.normal(kt, s.v.shape, s.v.dtype)
    rvp2 = 0.01 * jax.random.normal(key, s.v.shape, s.v.dtype)
    iic = jnp.asarray(5)
    eq = 0.01 * jnp.ones_like(zero2) if tide else None

    # ---- unfused chain ----
    a1, a2 = ab3_start_coefs(iic, u.dtype)
    un_ref, vn_ref = momentum_init(cfg, grid.pm, grid.pn, a1, a2, u, v,
                                   Hz, rup, rup2, rvp, rvp2,
                                   sustr, svstr, bustr, bvstr)
    ru, rv = prsgrd.prsgrd32(cfg, grid, rho, z_r, z_w, Hz, eq_tide=eq)
    ru_ref, rv_ref, ruf_ref, rvf_ref = rhs3d_momentum(
        cfg, grid, u, v, Huon, Hvom, W, Hz, ru, rv,
        sustr, svstr, bustr, bvstr)
    un_ref, vn_ref, ruf_ref, rvf_ref = mix3d.uv3dmix2(
        cfg, grid, u, v, Hz, un_ref, vn_ref, ruf_ref, rvf_ref, cfg.dt)

    # ---- fused kernel (interpret mode) ----
    un, vn, ru2, rv2, ruf, rvf = rhs3d_pallas.momentum_rhs_fused(
        cfg, grid, iic, u, v, Hz, z_r, z_w, rho, Huon, Hvom, W,
        rup, rup2, rvp, rvp2, sustr, svstr, bustr, bvstr,
        eq_tide=eq, interpret=True)

    for a, b, name in ((un_ref, un, "u_nnew"), (vn_ref, vn, "v_nnew"),
                       (ru_ref, ru2, "ru"), (rv_ref, rv2, "rv"),
                       (ruf_ref, ruf, "rufrc"), (rvf_ref, rvf, "rvfrc")):
        # tolerance scaled by the field magnitude: ru/rv are O(1e9) on
        # this grid and the scratch accumulator reassociates the column
        # sum vs jnp.cumsum (float64 roundoff ~1e-13 relative)
        scale = max(np.abs(np.asarray(a)).max(), 1.0)
        np.testing.assert_allclose(np.asarray(b) / scale,
                                   np.asarray(a) / scale,
                                   rtol=0, atol=1e-11, err_msg=name)


@pytest.mark.smoke
def test_fused_step_matches_xla_step():
    """Full-step equivalence: ROMS_PALLAS_INTERPRET fused step vs the
    pure-XLA step on the benchmark case."""
    import os
    from roms_tpu import stepping
    cfg = benchmark.make_config(Lm=24, Mm=16, N=8, ndtfast=6,
                                dtype="float64")
    cfg, grid, s, ffn = benchmark.build(cfg)
    s_ref = s
    for _ in range(3):
        s_ref = stepping.step(cfg, grid, s_ref, ffn)
    os.environ["ROMS_PALLAS_INTERPRET"] = "1"
    try:
        s_fus = s
        for _ in range(3):
            s_fus = stepping.step(cfg, grid, s_fus, ffn)
    finally:
        del os.environ["ROMS_PALLAS_INTERPRET"]
    for name in ("zeta", "ubar", "vbar", "u", "v", "t"):
        np.testing.assert_allclose(
            np.asarray(getattr(s_fus, name)),
            np.asarray(getattr(s_ref, name)), rtol=0, atol=1e-9,
            err_msg=name)
