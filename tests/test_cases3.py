"""Third batch of analytic cases (models/cases2.py) plus the round-4
physics additions they exercise: LMD_DDMIX double diffusion,
Craig-Banner/Charnok GLS surface wave forcing, the SSW bottom-stress
limiter, and WET_DRY beaches under radiation-stress forcing."""

import jax.numpy as jnp
import numpy as np
import pytest

from roms_tpu.models import cases2
from roms_tpu import stepping, vgrid, floats
from roms_tpu.grid import hc_of
from roms_tpu.config import GLSParams


def _run(cfg, grid, s, ffn, n):
    step = stepping.make_stepper(cfg, grid, ffn, donate=False)
    for _ in range(n):
        s = step(s)
    return s


def _interior(cfg):
    H = cfg.halo
    return slice(H, H + cfg.Mm), slice(H, H + cfg.Lm)


def _finite(s, fields=("zeta", "ubar", "vbar", "u", "v", "t")):
    return all(np.isfinite(np.asarray(getattr(s, f))).all()
               for f in fields)


@pytest.mark.smoke
def test_channel_jet_in_balance():
    """The CHANNEL jet is initialized in thermal-wind balance: over an
    inertial period the jet structure must persist (no geostrophic
    adjustment shock) and stay centered."""
    cfg, grid, s0, ffn = cases2.channel()
    jj, ii = _interior(cfg)
    u0 = np.asarray(s0.u)[:, jj, ii]
    s = _run(cfg, grid, s0, ffn, 35)    # ~ one inertial period / dt=1800
    assert _finite(s)
    u1 = np.asarray(s.u)[:, jj, ii]
    # surface jet amplitude preserved within 15%
    assert abs(u1.max() - u0.max()) < 0.15 * u0.max()
    # jet center stays on the centerline row
    j0 = np.unravel_index(u0[-1].argmax(), u0[-1].shape)[0]
    j1 = np.unravel_index(u1[-1].argmax(), u1[-1].shape)[0]
    assert abs(j1 - j0) <= 1


def test_flt_test_floats_follow_gyre():
    """FLT_TEST: wind over a walled basin with an island; floats seeded
    mid-depth stay inside the basin and move with the flow."""
    cfg, grid, s0, ffn = cases2.flt_test()
    H = cfg.halo
    # 3x3 float cluster away from the island
    x0, y0 = np.meshgrid(np.arange(3.0, 6.0), np.arange(4.0, 7.0))
    fl = floats.init_floats(x0.ravel() + H - 0.5, y0.ravel() + H - 0.5,
                            np.full(9, -5.0))
    step = stepping.make_stepper(cfg, grid, ffn, donate=False)
    s = s0
    hc = hc_of(cfg)
    for _ in range(40):
        s = step(s)
        z_r, z_w, Hz = vgrid.set_depth(grid.h, s.zeta, hc, grid.sc_r,
                                       grid.Cs_r, grid.sc_w, grid.Cs_w,
                                       cfg.vtransform)
        from roms_tpu.ops.omega import set_massflux, omega
        Huon, Hvom = set_massflux(cfg, grid, s.u, s.v, Hz)
        W = omega(cfg, grid, Huon, Hvom, z_w)
        fl = floats.step_floats(cfg, grid, s.u, s.v, W, Hz, fl)
    assert _finite(s)
    xg = np.asarray(fl.xg[0])
    yg = np.asarray(fl.yg[0])
    assert np.isfinite(xg).all() and np.isfinite(yg).all()
    # floats stayed inside the interior
    assert (xg > H - 1).all() and (xg < H + cfg.Lm).all()
    assert (yg > H - 1).all() and (yg < H + cfg.Mm).all()
    # the wind-driven flow moved them
    assert np.abs(xg - np.asarray(x0).ravel() - H + 0.5).max() > 1.0e-3


def test_lmd_test_kpp_deepens_and_ddmix_active():
    """LMD_TEST: the wind burst deepens the surface boundary layer;
    the double-diffusion term adds salt diffusivity where the salt
    stratification is destabilizing."""
    cfg, grid, s0, ffn = cases2.lmd_test(N=30)
    jj, ii = _interior(cfg)
    s = _run(cfg, grid, s0, ffn, 240)   # 8 h, past the 16-h burst peak
    assert _finite(s)
    hsbl = np.asarray(s.hsbl)[jj, ii]   # z of the BL base (negative)
    assert (-hsbl).mean() > 3.0         # boundary layer deepened
    # DDMIX path ran: compare salt vs heat diffusivity shapes stay
    # finite & positive
    assert np.isfinite(np.asarray(s.Akt)).all()
    assert (np.asarray(s.Akt) >= 0).all()


def test_ddmix_salt_fingering_enhances_salt_diffusivity():
    """Unit check of the lmd_vmix DDMIX block: warm+salty over cold+
    fresh (stable in T, unstable in S) must produce nu_dds > nu_ddt > 0
    in the salt-fingering regime (lmd_vmix.F:360-428)."""
    from roms_tpu.ops import vmix
    from roms_tpu.models import upwelling
    cfg = upwelling.make_config(Lm=8, Mm=8, N=12, ndtfast=6,
                                dtype="float64")
    cfg = cfg.replace(vmix="kpp", lmd_ddmix=True, ntracers=2,
                      eos="jm95", tnu2=(0.0, 0.0),
                      akt_bak=(1e-6, 1e-6),
                      t_hadv=("U3", "U3"), t_vadv=("C4", "C4"))
    cfg, grid, s, ffn = upwelling.build(cfg)
    hc = hc_of(cfg)
    z_r, z_w, Hz = vgrid.set_depth(grid.h, s.zeta, hc, grid.sc_r,
                                   grid.Cs_r, grid.sc_w, grid.Cs_w,
                                   cfg.vtransform)
    # warm+salty surface over cold+fresh deep: T stable, S unstable
    # (salt-finger regime, Rrho = alpha dT / (beta dS) in (1, 1.9))
    t = 14.0 + 8.0 * z_r / 150.0           # z_r<0: colder below
    salt = 35.0 + 1.5 * z_r / 150.0        # fresher below
    tr = jnp.stack([t, salt])
    from roms_tpu.ops import eos
    rho, pden = eos.rho_eos_pden(cfg, tr, z_r)
    bvf = eos.brunt_vaisala(cfg, tr, z_r, z_w)
    zero = jnp.zeros_like(s.zeta)
    stflx = jnp.zeros((2,) + s.zeta.shape, tr.dtype)
    Akv, Akt, hsbl, hbbl, ghats = vmix.lmd_vmix(
        cfg, grid, s.u, s.v, tr, rho, pden, bvf, Hz, z_r, z_w,
        zero, zero, zero, zero, stflx, zero, s.hsbl)
    cfg_off = cfg.replace(lmd_ddmix=False)
    Akv0, Akt0, *_ = vmix.lmd_vmix(
        cfg_off, grid, s.u, s.v, tr, rho, pden, bvf, Hz, z_r, z_w,
        zero, zero, zero, zero, stflx, zero, s.hsbl)
    H = cfg.halo
    dS = np.asarray(Akt[1] - Akt0[1])[3:-3, H + 2, H + 2]
    dT = np.asarray(Akt[0] - Akt0[0])[3:-3, H + 2, H + 2]
    assert dS.max() > 1.0e-5            # salt fingering adds ~1e-4
    assert dT.max() > 1.0e-6
    assert dS.max() > dT.max()          # nu_dds = nu_ddt / 0.7


def test_mixed_layer_craig_banner_deepening():
    """MIXED_LAYER: Craig-Banner wave-breaking TKE injection makes the
    surface tke much larger than the no-wave closure, and the mixed
    layer deepens."""
    cfg, grid, s0, ffn = cases2.mixed_layer()
    jj, ii = _interior(cfg)
    s = _run(cfg, grid, s0, ffn, 240)   # 2 h
    assert _finite(s)
    tke_cb = float(np.asarray(s.tke)[-1, jj, ii].mean())

    cfg2 = cfg.replace(gls_params=GLSParams())
    s2 = _run(cfg2, grid, s0, ffn, 240)
    tke_plain = float(np.asarray(s2.tke)[-1, jj, ii].mean())
    # wave breaking raises the surface TKE by far more than the
    # stress-only Dirichlet value
    assert tke_cb > 3.0 * tke_plain
    # and the initially linear T profile develops a surface mixed layer:
    # surface-minus-5m temperature difference shrinks
    hc = hc_of(cfg)
    z_r, _, _ = vgrid.set_depth(grid.h, s.zeta, hc, grid.sc_r,
                                grid.Cs_r, grid.sc_w, grid.Cs_w,
                                cfg.vtransform)
    t1 = np.asarray(s.t[0])[:, jj, ii]
    t0 = np.asarray(s0.t[0])[:, jj, ii]
    assert (t0[-1] - t0[-6]).mean() > 2.0 * (t1[-1] - t1[-6]).mean()


def test_test_chan_ramped_flume_flow():
    """TEST_CHAN: the ramped east-surface drop accelerates a downslope
    flow through the flume; transport is single-signed and grows with
    the ramp."""
    cfg, grid, s0, ffn = cases2.test_chan()
    jj, ii = _interior(cfg)
    s = _run(cfg, grid, s0, ffn, 300)   # 3000 s of the 150000 s ramp
    assert _finite(s)
    ub = np.asarray(s.ubar)[jj, ii]
    assert ub.mean() > 0.005            # flow toward the east (positive)
    zeta = np.asarray(s.zeta)[jj, ii]
    assert zeta[:, -1].mean() < zeta[:, 0].mean()   # surface tilts down


def test_sed_test1_suspended_load_profile():
    """SED_TEST1: steady -1 m/s channel flow with MY2.5 mixing erodes
    sand into suspension with a bottom-heavy concentration profile."""
    cfg, grid, s0, ffn = cases2.sed_test1(Lm=40)
    jj, ii = _interior(cfg)
    s = _run(cfg, grid, s0, ffn, 400)
    assert _finite(s)
    c = np.asarray(s.t[2])[:, jj, ii]
    # HSIMT keeps the advected field essentially positive (small
    # settling undershoot tolerated)
    assert c.min() >= -0.2
    mid = c[:, :, 15:25]                # away from the open ends
    assert mid.max() > 1.0e-4           # erosion happened
    assert mid[0].mean() > 2.0 * mid[-1].mean()   # bottom-heavy


def test_shoreface_wave_setup():
    """SHOREFACE: shore-normal shoaling waves over a planar WET_DRY
    beach produce a positive wave setup at the shoreline (Mellor05
    radiation stress balance) and remain stable."""
    cfg, grid, s0, ffn = cases2.shoreface()
    s = _run(cfg, grid, s0, ffn, 400)
    assert _finite(s, fields=("zeta", "ubar", "vbar", "u", "v", "t",
                              "tke", "gls"))
    H = cfg.halo
    z = np.asarray(s.zeta)
    h = np.asarray(grid.h)
    jj = slice(H, H + cfg.Mm)
    # mean surface in the shoaling zone (wet, shallow) vs offshore
    wet = h > 0.5
    inner = z[jj, H + 40:H + 50][wet[jj, H + 40:H + 50]].mean()
    outer = z[jj, H:H + 10].mean()
    assert inner > outer + 1.0e-4       # setup


def test_riverplume2_plume_and_ambient_current():
    """RIVERPLUME2: the fresh river inflow forms a buoyant plume in an
    ambient southward coastal current fed by wall sources."""
    cfg, grid, s0, ffn = cases2.riverplume2()
    jj, ii = _interior(cfg)
    s = _run(cfg, grid, s0, ffn, 120)   # 4 h
    assert _finite(s)
    salt = np.asarray(s.t[1])[-1, jj, ii]     # surface salinity
    wet = np.asarray(grid.rmask)[jj, ii] > 0
    assert salt[wet].min() < cfg.S0 - 0.5     # fresh water entered
    v = np.asarray(s.vbar)[jj, ii]
    assert v[wet].mean() < -0.005             # ambient southward flow


def test_weddell_iceshelf_tide_enters_cavity():
    """WEDDELL (ICESHELF): the M2 boundary tide propagates under the
    ice shelf; the reduced-pressure floating-ice formulation holds the
    cavity near rest apart from the tidal signal."""
    cfg, grid, s0, ffn = cases2.weddell(Lm=150)
    H = cfg.halo
    step = stepping.make_stepper(cfg, grid, ffn, donate=False)
    s = s0
    z_cav = []
    for n in range(500):
        s = step(s)
        z_cav.append(float(np.asarray(s.zeta)[H, H + 2]))
    assert _finite(s)
    z_cav = np.asarray(z_cav)
    # tidal signal reached the cavity: the 25000 s record spans half an
    # M2 cycle, so the series swings O(0.1 m); no runaway
    assert z_cav.std() > 0.03
    assert np.abs(z_cav).max() < 2.0
    assert np.abs(np.asarray(s.ubar)).max() < 1.0
    # the ice-base drag keeps the under-ice surface currents bounded
    u_cav = np.asarray(s.u)[-1, H:H + cfg.Mm, H:H + 16]
    assert np.abs(u_cav).max() < 1.0


def test_iceshelf_rest_state_balance():
    """A closed ice-shelf cavity at rest stays near rest: the ice-load
    surface pressure balances the displaced water column (residual is
    sigma-PG-error scale over the 340 m ice front)."""
    from roms_tpu.config import LBC
    cfg, grid, s0, ffn = cases2.weddell(Lm=80)
    clo = LBC("Clo", "Per", "Clo", "Per")
    cfg = cfg.replace(lbc_zeta=clo, lbc_ubar=clo, lbc_vbar=clo,
                      lbc_u=clo, lbc_v=clo, lbc_t=clo)
    s = s0
    for n in range(20):
        s = stepping.step(cfg, grid, s, None)
    H = cfg.halo
    ub = np.asarray(s.ubar)[H:-H, H:-H]
    assert np.abs(ub).max() < 0.3
    assert np.abs(np.asarray(s.zeta)[H:-H, H:-H]).max() < 0.5


def test_bl_test_boundary_layer_column():
    """BL_TEST: the northward wind over the shelf spins up an along-
    shore current and a KPP surface boundary layer; full KPP suite
    (incl. DDMIX) stays stable over 5 h."""
    cfg, grid, s0, ffn = cases2.bl_test()
    s = _run(cfg, grid, s0, ffn, 120)
    assert _finite(s)
    H = cfg.halo
    hsbl = -np.asarray(s.hsbl)[H:-H, H:-H]
    assert hsbl.mean() > 2.0            # boundary layer developed
    vb = np.asarray(s.vbar)[H:-H, H:-H]
    # along-shore (northward) jet over the inner shelf
    assert vb.max() > 0.2 and vb.mean() > 0.02
