"""SSW wave-current bottom boundary layer (ops/bbl.py): dispersion
solver accuracy, Madsen-94 limits, wave enhancement of bottom stress,
and the sediment coupling end-to-end."""

import jax.numpy as jnp
import numpy as np

from roms_tpu import constants as C
from roms_tpu.ops.bbl import (BBLParams, bblm, madsen94, wave_number_kh,
                              ripple_geometry)


def test_wave_number_matches_dispersion():
    # kh from the Dean-Dalrymple Pade fit vs exact kh*tanh(kh)=w^2 h/g
    g = C.g
    for h, T in [(5.0, 6.0), (10.0, 8.0), (50.0, 10.0), (200.0, 12.0)]:
        w = 2 * np.pi / T
        target = w * w * h / g
        kh = float(wave_number_kh(jnp.asarray(h), jnp.asarray(w)))
        resid = kh * np.tanh(kh)
        np.testing.assert_allclose(resid, target, rtol=2e-3)


def test_madsen94_current_limit_and_wave_enhancement():
    zr, kN = 1.0, 0.005
    zo = kN / 30.0
    ucr = 0.4
    # weak waves: ustrc approaches the pure log-law friction velocity
    ustrc, ustrwm, ustrr, zoa = madsen94(
        jnp.asarray(1e-3), jnp.asarray(1.0), jnp.asarray(ucr),
        jnp.asarray(zr), jnp.asarray(0.0), jnp.asarray(kN))
    loglaw = 0.41 * ucr / np.log(zr / zo)
    np.testing.assert_allclose(float(ustrc), loglaw, rtol=0.05)
    # strong waves: combined max stress exceeds both pure components,
    # and the current friction velocity is enhanced vs the log law
    ustrc2, ustrwm2, ustrr2, zoa2 = madsen94(
        jnp.asarray(0.5), jnp.asarray(2 * np.pi / 8.0), jnp.asarray(ucr),
        jnp.asarray(zr), jnp.asarray(0.0), jnp.asarray(kN))
    assert float(ustrr2) > float(ustrc2)
    assert float(ustrr2) > float(ustrwm2)
    assert float(ustrc2) > loglaw              # apparent roughness drag
    assert float(zoa2) > zo                    # apparent roughness grows
    # monotone in wave forcing
    assert float(ustrwm2) > float(ustrwm)


def test_ripple_geometry_motion_and_relict():
    p = BBLParams()
    Ab = jnp.asarray([[0.15]])
    rh0 = jnp.asarray([[0.011]])
    rl0 = jnp.asarray([[0.33]])
    # below threshold: relict geometry preserved
    rh, rl = ripple_geometry(p, Ab, jnp.asarray([[0.5]]), rh0, rl0)
    np.testing.assert_allclose(np.asarray(rh), np.asarray(rh0))
    np.testing.assert_allclose(np.asarray(rl), np.asarray(rl0))
    # above threshold: anorbital ripples with sane steepness
    rh, rl = ripple_geometry(p, Ab, jnp.asarray([[2.0]]), rh0, rl0)
    steep = float(rh[0, 0] / rl[0, 0])
    assert 0.01 < steep < 0.25
    # sheet flow: ripples washed out
    rh, rl = ripple_geometry(p, jnp.asarray([[2.0]]),
                             jnp.asarray([[50.0]]), rh0, rl0)
    assert float(rh[0, 0]) == 0.0


def test_bblm_waves_enhance_stress_field():
    from roms_tpu.models import sed_toy
    from roms_tpu.models.upwelling import hc_of
    from roms_tpu import vgrid
    cfg = sed_toy.make_config(Lm=8, Mm=10, N=8)
    cfg, grid, s, ffn = sed_toy.build(cfg)
    z_r, z_w, _ = vgrid.set_depth(grid.h, s.zeta, hc_of(cfg), grid.sc_r,
                                  grid.Cs_r, grid.sc_w, grid.Cs_w,
                                  cfg.vtransform)
    p = BBLParams()
    u = s.u.at[:].set(0.2)
    v = s.v
    zero = jnp.zeros_like(grid.h)
    out_nw = bblm(cfg, grid, p, u, v, z_r, z_w,
                  zero, zero + 8.0, zero,
                  s.rheight, s.rlength, s.tau_cwmax)
    out_w = bblm(cfg, grid, p, u, v, z_r, z_w,
                 zero + 2.0, zero + 8.0, zero,
                 s.rheight, s.rlength, s.tau_cwmax)
    H = cfg.halo
    jj, ii = slice(H, H + cfg.Mm), slice(H, H + cfg.Lm)
    tau_nw = np.asarray(out_nw[4][jj, ii])     # tau_cwmax
    tau_w = np.asarray(out_w[4][jj, ii])
    assert np.isfinite(tau_w).all()
    assert (tau_w > tau_nw).all()              # waves add stress
    # no waves: combined max equals the pure-current stress
    np.testing.assert_allclose(tau_nw, np.asarray(out_nw[2][jj, ii]),
                               rtol=1e-8)


def test_sed_toy_with_bbl_resuspends():
    # waves over a weak current: erosion only happens with the BBL's
    # combined stress (pure current is below critical)
    from roms_tpu.models import sed_toy
    from roms_tpu.ops.sediment import SedParams
    from roms_tpu import stepping
    p = SedParams(Wsed=(0.0005,), Erate=(5.0e-5,))
    cfg = sed_toy.make_config(Lm=8, Mm=10, N=8, params=p)
    cfg = cfg.replace(bbl="ssw", bbl_params=BBLParams())
    cfg, grid, s0, ffn = sed_toy.build(cfg, conc=0.0)

    def wavy(cfg_, grid_, time):
        base = ffn(cfg_, grid_, time)
        one = jnp.ones_like(grid_.h)
        base.update(Hwave=1.5 * one, Pwave=8.0 * one,
                    Dwave=jnp.zeros_like(one))
        return base

    step = stepping.make_stepper(cfg, grid, wavy, donate=False)
    s = s0
    for _ in range(20):
        s = step(s)
    H = cfg.halo
    jj, ii = slice(H, H + cfg.Mm), slice(H, H + cfg.Lm)
    conc = np.asarray(s.t[2][:, jj, ii])
    assert np.isfinite(conc).all()
    assert conc.max() > 1.0e-6                 # wave resuspension
    assert np.asarray(s.bed_mass[:, :, jj, ii]).min() >= 0.0
    assert np.isfinite(np.asarray(s.tau_cwmax)).all()
    # without waves the same setup stays clean
    cfg2, grid2, s2, ffn2 = sed_toy.build(cfg.replace(bbl=None),
                                          conc=0.0)
    step2 = stepping.make_stepper(cfg2, grid2, ffn2, donate=False)
    for _ in range(20):
        s2 = step2(s2)
    conc2 = np.asarray(s2.t[2][:, jj, ii])
    assert conc2.max() < 1.0e-8


# =====================================================================
# MB_BBL (mb_bbl.h)
# =====================================================================

from roms_tpu.ops.bbl import MBBBLParams, bblm_mb


class _GridStub:
    pass


def _mb_setup(Ny=6, Nx=8, depth=10.0, N=5):
    g = _GridStub()
    g.h = jnp.full((Ny, Nx), depth)
    g.umask = jnp.ones((Ny, Nx))
    g.vmask = jnp.ones((Ny, Nx))
    g.angler = jnp.zeros((Ny, Nx))
    z_w = jnp.linspace(-depth, 0.0, N + 1)[:, None, None] * \
        jnp.ones((1, Ny, Nx))
    z_r = 0.5 * (z_w[1:] + z_w[:-1])
    return g, z_r, z_w


def test_mb_bbl_wave_enhancement_and_regimes():
    import roms_tpu.config as _c
    cfg = None   # bblm_mb only reads arrays, cfg unused fields
    p = MBBBLParams()
    g, z_r, z_w = _mb_setup()
    shp = g.h.shape
    u = jnp.full((5,) + shp, 0.3)
    v = jnp.zeros((5,) + shp)
    rho = jnp.full(shp, 25.0)
    rh0 = jnp.full(shp, 0.01)
    rl0 = jnp.full(shp, 0.10)

    # no waves: pure log-law current stress, tau_w = 0
    out0 = bblm_mb(cfg, g, p, u, v, z_r, z_w, rho,
                   jnp.zeros(shp), jnp.full(shp, 8.0),
                   jnp.zeros(shp), rh0, rl0)
    bustr0, _, taucw0, tauw0, taumax0, _, _ = out0
    assert float(tauw0.max()) == 0.0
    assert float(bustr0.min()) > 0.0
    # waves crank up both the max stress and the mean stress
    out1 = bblm_mb(cfg, g, p, u, v, z_r, z_w, rho,
                   jnp.full(shp, 2.0), jnp.full(shp, 8.0),
                   jnp.zeros(shp), rh0, rl0)
    _, _, taucw1, tauw1, taumax1, rh1, rl1 = out1
    assert float(tauw1.min()) > 0.0
    assert float(taumax1.min()) > float(taumax0.max())
    assert float(taucw1.min()) > float(taucw0.max())
    # energetic waves over sand move the bed: ripples respond
    assert not np.allclose(np.asarray(rh1), np.asarray(rh0))
    assert np.isfinite(np.asarray(taumax1)).all()


def test_mb_bbl_sheet_flow_flattens_ripples():
    cfg = None
    p = MBBBLParams()
    g, z_r, z_w = _mb_setup(depth=5.0)
    shp = g.h.shape
    u = jnp.full((5,) + shp, 1.0)
    v = jnp.zeros((5,) + shp)
    rho = jnp.full(shp, 25.0)
    # huge waves -> tau_cwb above the washout threshold -> plane bed
    out = bblm_mb(cfg, g, p, u, v, z_r, z_w, rho,
                  jnp.full(shp, 4.0), jnp.full(shp, 10.0),
                  jnp.zeros(shp), jnp.full(shp, 0.01),
                  jnp.full(shp, 0.10))
    _, _, _, _, _, rh, rl = out
    np.testing.assert_allclose(np.asarray(rh), 0.0, atol=1e-12)


# =====================================================================
# SG_BBL (sg_bbl.h)
# =====================================================================

from roms_tpu.ops.bbl import SGBBLParams, bblm_sg, _kelvin8m, _kelvin8p


def test_kelvin_functions_check_values():
    # Abramowitz & Stegun 9.11 small-argument values at x=1
    ber, bei, ker, kei, berp, beip, kerp, keip = _kelvin8m(
        jnp.asarray(1.0))
    np.testing.assert_allclose(float(ber), 0.98438, atol=2e-5)
    np.testing.assert_allclose(float(bei), 0.24957, atol=2e-5)
    np.testing.assert_allclose(float(ker), 0.28671, atol=2e-5)
    np.testing.assert_allclose(float(kei), -0.49499, atol=2e-5)
    # the two branches agree at the x=8 splice
    m = _kelvin8m(jnp.asarray(8.0))
    p = _kelvin8p(jnp.asarray(8.0))
    for a, b in zip(m[2:4], p[2:4]):        # ker/kei (decaying: tight)
        np.testing.assert_allclose(float(a), float(b), rtol=2e-3,
                                   atol=1e-6)


def test_sg_bbl_wave_enhancement():
    cfg = None
    p = SGBBLParams()
    g, z_r, z_w = _mb_setup(depth=10.0)
    shp = g.h.shape
    u = jnp.full((5,) + shp, 0.3)
    v = jnp.zeros((5,) + shp)
    rho = jnp.full(shp, 25.0)
    out0 = bblm_sg(cfg, g, p, u, v, z_r, z_w, rho,
                   jnp.zeros(shp), jnp.full(shp, 8.0), jnp.zeros(shp))
    out1 = bblm_sg(cfg, g, p, u, v, z_r, z_w, rho,
                   jnp.full(shp, 2.0), jnp.full(shp, 8.0),
                   jnp.zeros(shp))
    for o in out1:
        assert np.isfinite(np.asarray(o)).all()
    # combined max stress with waves beats the current-only stress
    assert float(out1[4].min()) > float(out0[2].max())
    # wave stress present and ripples predicted on a mobile sandy bed
    assert float(out1[3].min()) > 0.0
    assert float(out1[5].max()) > 0.0
