"""Vertical mixing closures: KPP mixed-layer deepening, bvf_mix."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from roms_tpu.config import Config, LBC
from roms_tpu.grid import build_grid, hc_of
from roms_tpu import vgrid, stepping
from roms_tpu.state import initial_state
from roms_tpu.ops import bc, eos, vmix


def make_ml_case(vmix_scheme):
    """MIXED_LAYER-style case: flat 50 m, doubly periodic, stratified,
    steady wind -> boundary layer must deepen."""
    per = LBC.doubly_periodic()
    cfg = Config(
        name="mixed_layer", Lm=8, Mm=8, N=16, ntracers=2,
        ew_periodic=True, ns_periodic=True,
        dt=600.0, ndtfast=12, solve3d=True,
        vtransform=2, vstretching=4, theta_s=3.0, theta_b=0.0, tcline=10.0,
        uv_adv=True, uv_cor=True, uv_vis2=False, visc2=0.0,
        bottom_drag="linear", rdrg=3.0e-4,
        akv_bak=1.0e-5, akt_bak=(1.0e-6, 1.0e-6),
        eos="linear", R0=1027.0, T0=14.0, S0=35.0, Tcoef=1.7e-4, Scoef=0.0,
        vmix=vmix_scheme,
        lbc_zeta=per, lbc_ubar=per, lbc_vbar=per, lbc_u=per, lbc_v=per,
        lbc_t=per)
    grid, cfg = build_grid(cfg, 8e3, 8e3, f0=1e-4, beta=0.0,
                           depth_fn=lambda x, y, i, j, c: 50.0 + 0 * x)
    hc = hc_of(cfg)
    z_r, z_w, Hz = vgrid.set_depth(grid.h, jnp.zeros_like(grid.h), hc,
                                   grid.sc_r, grid.Cs_r, grid.sc_w,
                                   grid.Cs_w, cfg.vtransform)
    temp = 14.0 + 0.2 * (z_r + 50.0)          # stable stratification
    salt = jnp.full_like(temp, 35.0)
    t0 = jnp.stack([bc.fill_halo(cfg, temp), bc.fill_halo(cfg, salt)])
    s0 = initial_state(cfg, t=t0)

    def ffn(cfg, grid, time):
        return {"sustr": jnp.full_like(grid.h, 0.1 / 1025.0)}

    return cfg, grid, s0, ffn


def test_kpp_boundary_layer_deepens():
    cfg, grid, s0, ffn = make_ml_case("kpp")
    stepf = stepping.make_stepper(cfg, grid, ffn, donate=False)
    s = s0
    for _ in range(30):      # 5 hours of 0.1 N/m2 wind
        s = stepf(s)
    H = cfg.halo
    hsbl = np.asarray(s.hsbl[H:H + cfg.Mm, H:H + cfg.Lm])
    akv = np.asarray(s.Akv[:, H + 4, H + 4])
    assert np.isfinite(hsbl).all()
    # boundary layer below the surface but above the bottom
    assert (hsbl < -0.5).all() and (hsbl > -50.0).all()
    # boundary-layer viscosity well above background somewhere
    assert akv.max() > 1e-3
    # flow stays finite and bounded
    u = np.asarray(s.u)
    assert np.isfinite(u).all() and np.abs(u).max() < 1.0


def test_bvf_mix_convective_enhancement():
    cfg, grid, s0, ffn = make_ml_case("bvf")
    # unstable stratification -> convective diffusivity bvf_nu0c
    H = cfg.halo
    hc = hc_of(cfg)
    z_r, z_w, Hz = vgrid.set_depth(grid.h, jnp.zeros_like(grid.h), hc,
                                   grid.sc_r, grid.Cs_r, grid.sc_w,
                                   grid.Cs_w, cfg.vtransform)
    temp_unstable = 14.0 - 0.2 * (z_r + 50.0)
    t0 = jnp.stack([bc.fill_halo(cfg, temp_unstable), s0.t[1]])
    bvf = eos.brunt_vaisala(cfg, t0, z_r, z_w)
    akv, akt = vmix.bvf_mix(cfg, bvf)
    assert float(akv[1:-1].max()) == vmix.bvf_nu0c
    # stable case -> bounded by bvf_numax
    bvf_s = eos.brunt_vaisala(cfg, s0.t, z_r, z_w)
    akv_s, _ = vmix.bvf_mix(cfg, bvf_s)
    assert float(akv_s[1:-1].max()) <= vmix.bvf_numax + 1e-12


def test_kpp_full_step_runs_stable():
    cfg, grid, s0, ffn = make_ml_case("kpp")
    run5 = jax.jit(lambda s: stepping.run(cfg, grid, s, 5, ffn))
    s = run5(s0)
    for x in jax.tree_util.tree_leaves(s):
        assert np.isfinite(np.asarray(x)).all()


def test_bkpp_bottom_layer():
    """LMD_BKPP: bottom stress under a bottom current must generate a
    bottom boundary layer (elevated Akv near the bottom; hbbl above the
    bed), and never degrade the surface-layer mixing (max-blend)."""
    cfg, grid, s0, ffn = make_ml_case("kpp")
    cfg = cfg.replace(kpp_bottom=True, bottom_drag="quadratic",
                      rdrg2=3.0e-3)
    # barotropic current over the bed drives bottom stress
    u0 = jnp.full((cfg.N, cfg.ny_tot, cfg.nx_tot), 0.3)
    s = s0.replace(u=u0, ubar=jnp.full_like(s0.ubar, 0.3))
    stepf = stepping.make_stepper(cfg, grid, ffn, donate=False)
    for _ in range(20):
        s = stepf(s)
    H = cfg.halo
    hbbl = np.asarray(s.hbbl[H:H + cfg.Mm, H:H + cfg.Lm])
    akv_col = np.asarray(s.Akv[:, H + 4, H + 4])
    assert np.isfinite(hbbl).all()
    # bottom layer extends above the bed
    assert (hbbl > -50.0).all()
    assert hbbl.mean() > -49.0
    # near-bottom viscosity well above background
    assert akv_col[1:4].max() > 1e-4

    # surface layer must be at least as mixed as without bkpp
    cfg_n = cfg.replace(kpp_bottom=False)
    sn = s0.replace(u=u0, ubar=jnp.full_like(s0.ubar, 0.3))
    stepn = stepping.make_stepper(cfg_n, grid, ffn, donate=False)
    for _ in range(20):
        sn = stepn(sn)
    akv_n = np.asarray(sn.Akv[:, H + 4, H + 4])
    assert (akv_col >= akv_n - 1e-12).all()
