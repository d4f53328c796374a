"""Third batch of analytic test cases (reference ROMS/Include/<app>.h +
ana_grid/ana_initial/ana_smflux/ana_fsobc fixtures; runtime values from
the matching roms_*.in scripts).

Each builder returns (cfg, grid, state0, forcing_fn).  Documented deltas
from the reference are noted per case (e.g. rest-depth boundary
cross-sections where the reference uses the instantaneous free surface).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax.scipy.special import erf

from .. import constants as C
from ..config import (Config, GLSParams, LBC, BC_CHAPMAN_EXPLICIT,
                      BC_CLAMPED, BC_CLOSED, BC_FLATHER, BC_GRADIENT,
                      BC_RADIATION)
from ..grid import build_grid, hc_of
from .. import vgrid
from ..state import initial_state
from ..ops import bc


def _depths_at_rest(cfg, grid):
    hc = hc_of(cfg)
    return vgrid.set_depth(grid.h, jnp.zeros_like(grid.h), hc,
                           grid.sc_r, grid.Cs_r, grid.sc_w,
                           grid.Cs_w, cfg.vtransform)


def channel(Lm=41, Mm=25, N=10, dt=1800.0, ndtfast=18, dtype="float64"):
    """CHANNEL: periodic zonal channel with a geostrophically balanced
    Gaussian jet (channel.h; roms_channel.in: 41x25x10, DT=1800 s).
    600x360 km, 500 m flat depth, f=1e-4 (ana_grid.h:255-260); the
    initial jet u = u0*(1/2 + s + s^2/2)*exp(-((y-y0)/guscale)^2) with
    its erf-balanced temperature field (ana_initial.h:217-227,422-436,
    560-573); MIX_S harmonic mixing, linear drag with RDRG=0."""
    per = LBC.periodic_ew()
    cfg = Config(
        name="channel", Lm=Lm, Mm=Mm, N=N, ntracers=1,
        ew_periodic=True, ns_periodic=False,
        dt=dt, ndtfast=ndtfast,
        uv_vis2=True, visc2=100.0, ts_dif2=True, tnu2=(100.0,),
        t_hadv=("U3",), t_vadv=("C4",),
        akv_bak=1.0e-5, akt_bak=(1.0e-5,),
        bottom_drag="linear", rdrg=0.0,
        eos="linear", R0=1025.0, T0=10.0, Tcoef=1.6e-4, Scoef=0.0,
        theta_s=0.0, theta_b=0.0, tcline=1e16, vtransform=2,
        vstretching=4,
        lbc_zeta=per, lbc_ubar=per, lbc_vbar=per, lbc_u=per, lbc_v=per,
        lbc_t=per, dtype=dtype)
    Esize = 360.0e3
    grid, cfg = build_grid(cfg, 600.0e3, Esize, f0=1.0e-4, beta=0.0,
                           depth_fn=lambda x, y, i, j, c: 500.0 + 0 * x)
    z_r, _, _ = _depths_at_rest(cfg, grid)

    guscale, u0 = 40.0e3, 1.6
    y0 = 0.5 * Esize
    h3 = jnp.broadcast_to(grid.h, z_r.shape)
    # temperature in balance with the jet (ana_initial.h:560-573)
    val1 = (grid.yr - y0) / guscale
    val2 = -0.5 * u0 * guscale * grid.f * np.sqrt(np.pi) / \
        (cfg.Tcoef * C.g * grid.h)
    temp = (val2 * erf(val1) + cfg.T0)[None] * (1.0 + z_r / h3)
    # u jet: val2u = z_u/h, profile 0.5 + s + s^2/2 (vertical mean 1/6)
    yu = 0.5 * (grid.yr + jnp.roll(grid.yr, 1, axis=-1))
    v1u = (yu - y0) / guscale
    s = z_r / h3     # approx at u-points (flat depth: exact)
    u3 = u0 * (0.5 + s + 0.5 * s * s) * jnp.exp(-v1u * v1u)[None]
    ubar = u0 * jnp.exp(-v1u * v1u) / 6.0
    fh = lambda a: bc.fill_halo(cfg, a)
    state0 = initial_state(cfg, t=jnp.stack([fh(temp)]), u=fh(u3),
                           ubar=fh(ubar))
    return cfg, grid, state0, None


def flt_test(Lm=14, Mm=12, N=4, dt=512.0, ndtfast=9, dtype="float64"):
    """FLT_TEST: Lagrangian-floats test basin (flt_test.h;
    roms_flt_test3d.in: 14x12x4, DT=512 s).  1 km cells, 10 m depth,
    f=0; wall rows at j=1 and j=Mm plus a 2x2 island in the center
    (ana_mask.h:137-148); constant eastward wind sustr=1e-3 m2/s2
    (ana_smflux.h:210-218); quadratic drag, both stresses applied as
    BODYFORCE over the whole column (roms_flt_test3d.in LEVSFRC=1,
    LEVBFRC=N).  Floats are released by the caller
    (floats.init_floats); see tests/test_cases3.py."""
    clo = LBC()
    cfg = Config(
        name="flt_test", Lm=Lm, Mm=Mm, N=N, ntracers=1,
        ew_periodic=False, ns_periodic=False,
        dt=dt, ndtfast=ndtfast,
        uv_vis2=True, visc2=0.0,
        tnu2=(0.0,), t_hadv=("U3",), t_vadv=("C4",),
        splines_vdiff=True, splines_vvisc=True,
        akv_bak=1.0e-5, akt_bak=(1.0e-6,),
        bottom_drag="quadratic", rdrg2=3.0e-3,
        bodyforce=True, levsfrc=1, levbfrc=N,
        eos="linear", R0=1027.0, T0=14.0, Tcoef=1.7e-4, Scoef=0.0,
        theta_s=0.0, theta_b=0.0, tcline=1e16, vtransform=1,
        vstretching=1,
        lbc_zeta=clo, lbc_ubar=clo, lbc_vbar=clo, lbc_u=clo, lbc_v=clo,
        lbc_t=clo, dtype=dtype)

    def mask_fn(x, y, i, j, c):
        land = (j == 1) | (j == c.Mm)
        ic, jc = (c.Lm + 1) // 2, (c.Mm + 1) // 2
        island = (i >= ic) & (i <= ic + 1) & (j >= jc) & (j <= jc + 1)
        return np.where(land | island, 0.0, 1.0)

    grid, cfg = build_grid(cfg, 1.0e3 * Lm, 1.0e3 * Mm, f0=0.0, beta=0.0,
                           depth_fn=lambda x, y, i, j, c: 10.0 + 0 * x,
                           mask_fn=mask_fn)
    z_r, _, _ = _depths_at_rest(cfg, grid)
    state0 = initial_state(
        cfg, t=jnp.stack([jnp.full_like(z_r, cfg.T0)]))

    def forcing_fn(cfg_, grid_, time):
        return {"sustr": jnp.full_like(grid_.h, 1.0e-3)}

    return cfg, grid, state0, forcing_fn


def lmd_test(Lm=10, Mm=10, N=50, dt=120.0, ndtfast=10, dtype="float64"):
    """LMD_TEST: doubly periodic KPP column test (lmd_test.h;
    roms_lmd_test.in: 10x10x50, DT=120 s).  100x100 km, 50 m depth,
    f=1.09e-4; full LMD suite: Ri mixing, convection, double diffusion
    (LMD_DDMIX), surface+bottom boundary layers, nonlocal transport;
    JM95 EOS.  Initial t=min(13, 7+0.2(z+50)), s=35
    (ana_initial.h:700-711); wind burst for 16 h
    (ana_smflux.h:236-249)."""
    per = LBC("Per", "Per", "Per", "Per")
    cfg = Config(
        name="lmd_test", Lm=Lm, Mm=Mm, N=N, ntracers=2,
        ew_periodic=True, ns_periodic=True,
        dt=dt, ndtfast=ndtfast,
        uv_vis2=False, visc2=0.0, tnu2=(0.0, 0.0),
        t_hadv=("U3", "U3"), t_vadv=("C4", "C4"),
        splines_vdiff=True, splines_vvisc=True,
        akv_bak=1.0e-5, akt_bak=(1.0e-6, 1.0e-6),
        bottom_drag="quadratic", rdrg2=3.0e-3,
        vmix="kpp", kpp_bottom=True, lmd_ddmix=True,
        eos="jm95", T0=10.0, S0=35.0,
        theta_s=0.0, theta_b=0.0, tcline=1e16, vtransform=2,
        vstretching=4,
        lbc_zeta=per, lbc_ubar=per, lbc_vbar=per, lbc_u=per, lbc_v=per,
        lbc_t=per, dtype=dtype)
    grid, cfg = build_grid(cfg, 100.0e3, 100.0e3, f0=1.09e-4, beta=0.0,
                           depth_fn=lambda x, y, i, j, c: 50.0 + 0 * x)
    z_r, _, _ = _depths_at_rest(cfg, grid)
    temp = jnp.minimum(13.0, 7.0 + 0.2 * (z_r + 50.0))
    salt = jnp.full_like(temp, 35.0)
    fh = lambda a: bc.fill_halo(cfg, a)
    state0 = initial_state(cfg, t=jnp.stack([fh(temp), fh(salt)]))

    def forcing_fn(cfg_, grid_, time):
        amp = jnp.where(
            time <= 57600.0,
            -0.6 * jnp.sin(np.pi * time / 57600.0) *
            jnp.sin(2.0 * np.pi * time / 57600.0) / cfg_.rho0,
            0.0)
        return {"sustr": amp * jnp.ones_like(grid_.h)}

    return cfg, grid, state0, forcing_fn


def mixed_layer(Lm=10, Mm=8, N=30, dt=30.0, ndtfast=20,
                dtype="float64"):
    """MIXED_LAYER: wind-stirred mixed-layer deepening in a tiny box
    (mixed_layer.h).  500x400 m, 50 m deep; GLS k-epsilon with
    CRAIG_BANNER wave-breaking TKE flux and CHARNOK roughness;
    logarithmic drag; constant sustr=1e-4 m2/s2 (ana_smflux.h:189-197).
    Initial t = 10 + 3(z+h)/h (ana_initial.h:712-723).  Lm/Mm/N/DT are
    not pinned by a reference .in (none exists); values chosen to keep
    the column well resolved."""
    clo = LBC()
    cfg = Config(
        name="mixed_layer", Lm=Lm, Mm=Mm, N=N, ntracers=2,
        ew_periodic=False, ns_periodic=False,
        dt=dt, ndtfast=ndtfast,
        uv_vis2=False, visc2=0.0, tnu2=(0.0, 0.0),
        t_hadv=("U3", "U3"), t_vadv=("C4", "C4"),
        splines_vdiff=True, splines_vvisc=True,
        akv_bak=1.0e-5, akt_bak=(1.0e-6, 1.0e-6),
        bottom_drag="logarithmic", zob=0.02,
        vmix="gls",
        gls_params=GLSParams(craig_banner=True, charnok=True),
        eos="linear", R0=1027.0, T0=10.0, S0=35.0,
        Tcoef=1.7e-4, Scoef=7.6e-4,
        theta_s=0.0, theta_b=0.0, tcline=1e16, vtransform=1,
        vstretching=1,
        lbc_zeta=clo, lbc_ubar=clo, lbc_vbar=clo, lbc_u=clo, lbc_v=clo,
        lbc_t=clo, dtype=dtype)
    grid, cfg = build_grid(cfg, 500.0, 400.0, f0=0.0, beta=0.0,
                           depth_fn=lambda x, y, i, j, c: 50.0 + 0 * x)
    z_r, _, _ = _depths_at_rest(cfg, grid)
    h3 = jnp.broadcast_to(grid.h, z_r.shape)
    temp = 10.0 + 3.0 * (z_r + h3) / h3
    fh = lambda a: bc.fill_halo(cfg, a)
    state0 = initial_state(cfg, t=jnp.stack(
        [fh(temp), fh(jnp.full_like(temp, cfg.S0))]))

    def forcing_fn(cfg_, grid_, time):
        return {"sustr": jnp.full_like(grid_.h, 1.0e-4)}

    return cfg, grid, state0, forcing_fn


def test_chan(Lm=100, Mm=3, N=20, dt=10.0, ndtfast=20, dtype="float64"):
    """TEST_CHAN: flow down a sloping flume driven by a ramped
    free-surface drop (test_chan.h; roms_test_chan.in: 100x3x20,
    DT=10 s).  10 km x 1 km, h = 10 + 0.404*i/(Lm+1)
    (ana_grid.h:1041-1046); initial zeta mirrors -h slope
    (ana_initial.h:392-397); west inflow ubar from a fixed transport,
    east zeta clamped ramping to -0.404 m over 150000 s
    (ana_fsobc.h:139-151, ana_m2obc.h:229-260; the boundary
    cross-sections are evaluated at the rest depth - documented
    delta)."""
    cfg = Config(
        name="test_chan", Lm=Lm, Mm=Mm, N=N, ntracers=1,
        ew_periodic=False, ns_periodic=False,
        dt=dt, ndtfast=ndtfast,
        uv_vis2=False, visc2=0.0, tnu2=(0.0,),
        t_hadv=("U3",), t_vadv=("C4",),
        splines_vdiff=True, splines_vvisc=True,
        akv_bak=5.0e-5, akt_bak=(5.0e-6,),
        bottom_drag=None,
        eos="linear", R0=1000.0, T0=20.0, Tcoef=-1.0e-4, Scoef=0.0,
        theta_s=3.0, theta_b=1.0, tcline=1e16, vtransform=1,
        vstretching=1,
        lbc_zeta=LBC(BC_CHAPMAN_EXPLICIT, BC_CLOSED,
                     BC_CHAPMAN_EXPLICIT, BC_CLOSED),
        lbc_ubar=LBC(BC_FLATHER, BC_CLOSED, BC_CLAMPED, BC_CLOSED),
        lbc_vbar=LBC(BC_FLATHER, BC_CLOSED, BC_CLAMPED, BC_CLOSED),
        lbc_u=LBC(BC_GRADIENT, BC_CLOSED, BC_GRADIENT, BC_CLOSED),
        lbc_v=LBC(BC_GRADIENT, BC_CLOSED, BC_GRADIENT, BC_CLOSED),
        lbc_t=LBC(BC_GRADIENT, BC_CLOSED, BC_GRADIENT, BC_CLOSED),
        dtype=dtype)

    def depth_fn(x, y, i, j, c):
        return 10.0 + 0.4040 * i / (c.Lm + 1.0)

    grid, cfg = build_grid(cfg, 10000.0, 1000.0, f0=0.0, beta=0.0,
                           depth_fn=depth_fn)
    H = cfg.halo
    i_idx = jnp.arange(cfg.nx_tot) - H + 1
    zeta0 = jnp.broadcast_to(-0.4040 * i_idx / (cfg.Lm + 1.0),
                             grid.h.shape)
    # reference starts from zeta(1)=... i index; start from rest surface
    # (zeta=0) and let the boundary ramp drive the flow: the pinned
    # solution is the steady channel flow either way
    state0 = initial_state(
        cfg, t=jnp.stack([jnp.full((cfg.N,) + grid.h.shape, 20.0,
                                   jnp.dtype(dtype))]))
    ny = cfg.ny_tot
    h_np = np.asarray(grid.h)
    on_np = 1.0 / np.asarray(grid.pn)
    jj = slice(H, H + Mm)
    area_w = float((h_np[jj, H] * on_np[jj, H]).sum())
    width_w = float(on_np[jj, H].sum())
    dtt = jnp.dtype(dtype)

    def forcing_fn(cfg_, grid_, time):
        ramp = jnp.minimum(time / 150000.0, 1.0)
        ub_w = (width_w * 10.0 * 1.0 / area_w) * ramp
        ze = -0.4040 * ramp
        return {"bry": {
            "zeta_west": jnp.zeros((ny,), dtt),
            "ubar_west": ub_w * jnp.ones((ny,), dtt),
            "vbar_west": jnp.zeros((ny,), dtt),
            "zeta_east": ze * jnp.ones((ny,), dtt),
            "ubar_east": (width_w * 10.0 / area_w) * ramp *
            jnp.ones((ny,), dtt),
            "vbar_east": jnp.zeros((ny,), dtt)}}

    return cfg, grid, state0, forcing_fn


def sed_test1(Lm=100, Mm=12, N=10, dt=1.0, ndtfast=20, dtype="float64"):
    """SED_TEST1: suspended-sediment flux in a steady open channel
    (sed_test1.h; roms_sed_test1.in: 100x12x10, DT=1 s).  300x36 m
    flume, 10 m depth; steady -1 m/s flow maintained by clamped inflow
    at the east and radiation at the west (the reference drives it with
    distributed u-face point sources totalling -360 m3/s at both ends,
    ana_psource.h:192-205,386-455 - here the equivalent rest-depth
    boundary ubar is imposed directly, documented delta); MY2.5 mixing
    (my25 GLS k-kl instance), logarithmic drag, one sand class
    (sediment_sed_test1.in: d50=1 mm, ws=1 mm/s, Erate=5e-4,
    tau_ce=0.1 N/m2; the reference also carries 2 mud classes).  The
    sand class advects with HSIMT-TVD (positivity; the reference's U3
    develops an unstable negative-concentration front at the clamped
    inflow - documented delta).  Initial u is the log-layer profile
    (ana_initial.h:455-468)."""
    from ..ops.sediment import SedParams
    sed = SedParams(ised0=2, Sd50=(0.001,), Srho=(2650.0,),
                    Wsed=(1.0e-3,), Erate=(5.0e-4,),
                    tau_ce=(0.1 / 1025.0,), tau_cd=(0.1 / 1025.0,),
                    poros=0.5)
    nt = 3
    cfg = Config(
        name="sed_test1", Lm=Lm, Mm=Mm, N=N, ntracers=nt,
        ew_periodic=False, ns_periodic=False,
        dt=dt, ndtfast=ndtfast,
        uv_vis2=False, visc2=0.0, tnu2=nt * (0.0,),
        t_hadv=("U3", "U3", "HSIMT"), t_vadv=("C4", "C4", "HSIMT"),
        splines_vdiff=True, splines_vvisc=True,
        akv_bak=5.0e-5, akt_bak=(5.0e-6, 5.0e-6),
        bottom_drag="logarithmic", zob=0.005,
        vmix="my25",
        eos="linear", R0=1027.0, T0=20.0, S0=0.0,
        Tcoef=1.7e-4, Scoef=7.6e-4,
        theta_s=1.0, theta_b=1.0, tcline=1.0, vtransform=1,
        vstretching=1,
        lbc_zeta=LBC(BC_RADIATION, BC_CLOSED, BC_CLAMPED, BC_CLOSED),
        lbc_ubar=LBC(BC_CLAMPED, BC_CLOSED, BC_CLAMPED, BC_CLOSED),
        lbc_vbar=LBC(BC_CLAMPED, BC_CLOSED, BC_CLAMPED, BC_CLOSED),
        lbc_u=LBC(BC_GRADIENT, BC_CLOSED, BC_GRADIENT, BC_CLOSED),
        lbc_v=LBC(BC_GRADIENT, BC_CLOSED, BC_GRADIENT, BC_CLOSED),
        lbc_t=LBC(BC_GRADIENT, BC_CLOSED, BC_CLAMPED, BC_CLOSED),
        sediment=True, sed_params=sed,
        dtype=dtype)
    grid, cfg = build_grid(cfg, 300.0, 36.0, f0=0.0, beta=0.0,
                           depth_fn=lambda x, y, i, j, c: 10.0 + 0 * x)
    z_r, _, _ = _depths_at_rest(cfg, grid)
    h3 = jnp.broadcast_to(grid.h, z_r.shape)
    zob = cfg.zob
    u_log = -1.0 * jnp.log((h3 + z_r) / zob) / \
        (jnp.log(h3 / zob) - 1.0 + zob / h3)
    fh = lambda a: bc.fill_halo(cfg, a)
    t0 = jnp.stack([fh(jnp.full_like(z_r, 20.0)),
                    fh(jnp.zeros_like(z_r)),
                    fh(jnp.zeros_like(z_r))])
    state0 = initial_state(cfg, t=t0, u=fh(u_log),
                           ubar=fh(jnp.full_like(grid.h, -1.0)))
    ny = cfg.ny_tot
    dtt = jnp.dtype(dtype)

    def forcing_fn(cfg_, grid_, time):
        ub = -1.0 * jnp.ones((ny,), dtt)
        zero = jnp.zeros((ny,), dtt)
        t_e = jnp.stack([jnp.full((cfg_.N, ny), 20.0, dtt),
                         jnp.zeros((cfg_.N, ny), dtt),
                         jnp.zeros((cfg_.N, ny), dtt)])
        return {"bry": {"ubar_west": ub, "vbar_west": zero,
                        "ubar_east": ub, "vbar_east": zero,
                        "zeta_east": zero, "t_east": t_e}}

    return cfg, grid, state0, forcing_fn


def shoreface(Lm=59, Mm=7, N=20, dt=5.0, ndtfast=20, dtype="float64"):
    """SHOREFACE: planar-beach surf zone with wave-driven currents
    (shoreface.h; roms_shoreface.in: 59x7x20, DT=5 s).  1180x140 m,
    h = 11.75 - 0.0125*x (ana_grid.h:1035-1040); NS periodic, west
    Chapman/Flather, east closed (shoreline); NEARSHORE_MELLOR
    radiation-stress forcing (reference uses the Mellor-08 variant and
    SWAN wave input - here the Mellor-05 kernels with an analytic
    shoaling wave field, documented delta), SSW wave-current BBL, GLS
    k-epsilon, one sand class (sediment_shoreface.in: d50=1 mm,
    ws=1 mm/s, tau_ce=0.07 N/m2), WET_DRY."""
    from ..ops.sediment import SedParams
    from ..ops.bbl import BBLParams
    sed = SedParams(ised0=2, Sd50=(0.001,), Srho=(2650.0,),
                    Wsed=(1.0e-3,), Erate=(1.0e-5,),
                    tau_ce=(0.07 / 1025.0,), tau_cd=(0.07 / 1025.0,),
                    poros=0.5)
    nt = 3
    per = "Per"
    cfg = Config(
        name="shoreface", Lm=Lm, Mm=Mm, N=N, ntracers=nt,
        ew_periodic=False, ns_periodic=True,
        dt=dt, ndtfast=ndtfast,
        uv_vis2=True, visc2=0.0, tnu2=nt * (0.0,),
        t_hadv=nt * ("U3",), t_vadv=nt * ("C4",),
        splines_vdiff=True, splines_vvisc=True,
        akv_bak=5.0e-5, akt_bak=(5.0e-6, 5.0e-6),
        bottom_drag="quadratic", rdrg2=0.0015, zob=0.015,
        vmix="gls",
        nearshore="mellor05",
        sediment=True, sed_params=sed,
        bbl="ssw", bbl_params=BBLParams(d50=0.001,
                                        tau_ce=0.07 / 1025.0),
        wetdry=True, dcrit=0.1,
        eos="linear", R0=1027.0, T0=10.0, S0=30.0,
        Tcoef=1.7e-4, Scoef=7.6e-4,
        theta_s=0.0, theta_b=0.0, tcline=1e16, vtransform=1,
        vstretching=1,
        lbc_zeta=LBC(BC_CHAPMAN_EXPLICIT, per, BC_CLOSED, per),
        lbc_ubar=LBC(BC_FLATHER, per, BC_CLOSED, per),
        lbc_vbar=LBC(BC_FLATHER, per, BC_CLOSED, per),
        lbc_u=LBC(BC_GRADIENT, per, BC_CLOSED, per),
        lbc_v=LBC(BC_GRADIENT, per, BC_CLOSED, per),
        lbc_t=LBC(BC_GRADIENT, per, BC_CLOSED, per),
        dtype=dtype)
    Xsize = 1180.0

    def depth_fn(x, y, i, j, c):
        return 11.75 - 0.0125 * Xsize / (c.Lm + 1.0) * i

    grid, cfg = build_grid(cfg, Xsize, 140.0, f0=0.0, beta=0.0,
                           depth_fn=depth_fn)
    z_r, _, _ = _depths_at_rest(cfg, grid)
    fh = lambda a: bc.fill_halo(cfg, a)
    t0 = jnp.stack([fh(jnp.full_like(z_r, 10.0)),
                    fh(jnp.full_like(z_r, 30.0)),
                    fh(jnp.zeros_like(z_r))])
    # WET_DRY initial surface: dry beach cells start at the critical
    # depth (ana_initial wet/dry convention: total depth >= Dcrit)
    zeta0 = jnp.maximum(0.0, cfg.dcrit - grid.h)
    state0 = initial_state(cfg, t=t0, zeta=fh(zeta0))
    ny = cfg.ny_tot
    dtt = jnp.dtype(dtype)

    # analytic shoaling wave field: 1 m offshore wave, depth-limited
    # (gamma=0.5) toward the shoreline, 10 s period, shore-normal
    Hw = jnp.minimum(1.0, 0.5 * jnp.maximum(grid.h, 0.05))
    one = jnp.ones_like(grid.h)

    def forcing_fn(cfg_, grid_, time):
        ramp = jnp.minimum(time / 600.0, 1.0)
        return {"Hwave": jnp.maximum(Hw * ramp, 0.01),
                "Pwave": 10.0 * one,
                "Dwave": 270.0 * C.deg2rad * one,
                "Lwave": 50.0 * one,
                "bry": {"zeta_west": jnp.zeros((ny,), dtt),
                        "ubar_west": jnp.zeros((ny,), dtt),
                        "vbar_west": jnp.zeros((ny,), dtt)}}

    return cfg, grid, state0, forcing_fn


def riverplume2(Lm=50, Mm=70, N=13, dt=120.0, ndtfast=20,
                dtype="float64"):
    """RIVERPLUME2: river discharge into an along-shore coastal current
    (riverplume2.h; roms_riverplume2.in: 50x70x13, DT=120 s).  100x210
    km shelf from 190 m to 15 m with a coastal land strip i<=5 opened
    by a channel at j=Mm-10 (ana_mask.h:189-202); ambient -0.05 m/s
    along-shore flow maintained by 2*Lm v-face sources along the north
    and south walls (Qbar = -0.05*om_v*h, rest depth - documented
    delta) plus the 1500 m3/s river at the west-wall u-face (1,60)
    (ana_psource.h:175-191,358-382); KPP with bottom layer, JM95 EOS,
    MIX_GEO_TS; Chapman/gradient open north and south boundaries."""
    from ..ops.sources import PointSources
    cfg = Config(
        name="riverplume2", Lm=Lm, Mm=Mm, N=N, ntracers=2,
        ew_periodic=False, ns_periodic=False,
        dt=dt, ndtfast=ndtfast,
        uv_vis2=False, visc2=0.0,
        ts_dif2=True, tnu2=(0.0, 0.0), ts_mix_geo=True,
        t_hadv=("U3", "U3"), t_vadv=("C4", "C4"),
        splines_vdiff=True, splines_vvisc=True,
        akv_bak=5.0e-6, akt_bak=(5.0e-6, 5.0e-6),
        bottom_drag="quadratic", rdrg2=3.0e-3,
        vmix="kpp", kpp_bottom=True,
        eos="jm95", T0=4.0, S0=32.0,
        theta_s=3.0, theta_b=1.0, tcline=30.0, vtransform=2,
        vstretching=4,
        lbc_zeta=LBC(BC_CLOSED, BC_CHAPMAN_EXPLICIT, BC_CLOSED,
                     BC_CHAPMAN_EXPLICIT),
        lbc_ubar=LBC(BC_CLOSED, BC_GRADIENT, BC_CLOSED, BC_GRADIENT),
        lbc_vbar=LBC(BC_CLOSED, BC_GRADIENT, BC_CLOSED, BC_GRADIENT),
        lbc_u=LBC(BC_CLOSED, BC_GRADIENT, BC_CLOSED, BC_GRADIENT),
        lbc_v=LBC(BC_CLOSED, BC_GRADIENT, BC_CLOSED, BC_GRADIENT),
        lbc_t=LBC(BC_CLOSED, BC_GRADIENT, BC_CLOSED, BC_GRADIENT),
        dtype=dtype)
    depth = 190.0

    def depth_fn(x, y, i, j, c):
        return np.where(i <= 5, 15.0,
                        depth + (c.Lm - i) * (15.0 - depth) /
                        (c.Lm - 6.0))

    def mask_fn(x, y, i, j, c):
        land = (i <= 5) & ((j <= c.Mm - 11) | (j >= c.Mm - 9))
        return np.where(land, 0.0, 1.0)

    grid, cfg = build_grid(cfg, 100.0e3, 210.0e3, f0=1.0e-4, beta=0.0,
                           depth_fn=depth_fn, mask_fn=mask_fn)
    z_r, _, _ = _depths_at_rest(cfg, grid)
    h3 = jnp.broadcast_to(grid.h, z_r.shape)
    zob = cfg.zob
    v_log = -0.05 * jnp.log((h3 + z_r) / zob) / \
        (jnp.log(h3 / zob) - 1.0 + zob / h3)
    fh = lambda a: bc.fill_halo(cfg, a)
    t0 = jnp.stack([fh(jnp.full_like(z_r, cfg.T0)),
                    fh(jnp.full_like(z_r, cfg.S0))])
    state0 = initial_state(cfg, t=t0, v=fh(v_log),
                           vbar=fh(jnp.full_like(grid.h, -0.05)))

    # point sources: ambient-flow v-faces along j=1 (south) and j=Mm+1
    # (north) for i=6..Lm (open water), plus the river u-face at (1,60)
    H = cfg.halo
    h_np = np.asarray(grid.h)
    om_np = 1.0 / np.asarray(grid.pm)
    isrc, jsrc, dsrc, qbar = [], [], [], []
    for i in range(6, Lm + 1):
        a = i + H - 1
        for jroms in (1, Mm + 1):
            b = jroms + H - 1
            hv = 0.5 * (h_np[b - 1, a] + h_np[b, a])
            isrc.append(a)
            jsrc.append(b)
            dsrc.append(1)
            qbar.append(-0.05 * om_np[b, a] * hv)
    isrc.append(6 + H - 1)      # river at the first open-water u-face
    jsrc.append(60 + H - 1)
    dsrc.append(0)
    qbar.append(1500.0)
    nsrc = len(qbar)
    # uniform-by-thickness Qshape at rest (the reference weights by the
    # instantaneous v/vbar ratio - rest-depth approximation)
    _, _, Hz0 = _depths_at_rest(cfg, grid)
    Hz_np = np.asarray(Hz0)
    qshape = np.zeros((cfg.N, nsrc))
    for k in range(cfg.N):
        for s_i in range(nsrc):
            a, b = isrc[s_i], jsrc[s_i]
            qshape[k, s_i] = Hz_np[k, b, a] / h_np[b, a]
    qshape /= qshape.sum(axis=0, keepdims=True)
    dtt = jnp.dtype(dtype)
    tsrc = np.zeros((2, cfg.N, nsrc))
    tsrc[0] = cfg.T0
    tsrc[1] = cfg.S0
    tsrc[1, :, -1] = 0.0        # river is fresh
    src = PointSources(
        isrc=jnp.asarray(isrc), jsrc=jnp.asarray(jsrc),
        dsrc=jnp.asarray(dsrc), Qbar=jnp.asarray(qbar, dtt),
        Qshape=jnp.asarray(qshape, dtt), Tsrc=jnp.asarray(tsrc, dtt))

    def forcing_fn(cfg_, grid_, time):
        return {"sources": src}

    return cfg, grid, state0, forcing_fn


def weddell(Lm=300, Mm=10, N=30, dt=50.0, ndtfast=20, dtype="float64"):
    """WEDDELL: idealized Weddell Sea ice-shelf cavity section
    (weddell.h; roms_weddell.in: 300x10x30, DT=50 s).  4 km cells; the
    bathymetry follows the reference's piecewise shelf-to-deep profile
    (ana_grid.h:1073-1100), the ice-shelf draft ramps from -340 m under
    the cavity (i<=4) to zero at i=20 (ana_grid.h:1157-1170); latitude-
    dependent f (from -79 deg) and angler=90 deg (CURVGRID); M2 tidal
    ellipse at the west/east Chapman/Flather boundaries
    (ana_fsobc.h:155-180, ana_m2obc.h:300-345, evaluated with the
    reference's linear along-channel interpolation collapsed to the
    boundary values - documented delta); JM95 EOS, quadratic drag (also
    applied as the ice-base drag), constant T0/S0 water mass."""
    per = "Per"
    cfg = Config(
        name="weddell", Lm=Lm, Mm=Mm, N=N, ntracers=2,
        ew_periodic=False, ns_periodic=True,
        dt=dt, ndtfast=ndtfast,
        uv_vis2=True, visc2=50.0,
        ts_dif2=True, tnu2=(10.0, 10.0),
        t_hadv=("U3", "U3"), t_vadv=("C4", "C4"),
        splines_vdiff=True, splines_vvisc=True,
        akv_bak=1.0e-5, akt_bak=(1.0e-6, 1.0e-6),
        bottom_drag="quadratic", rdrg2=3.0e-3,
        eos="jm95", T0=-0.2775, S0=34.6489,
        theta_s=3.0, theta_b=0.0, tcline=50.0, vtransform=1,
        vstretching=1,
        lbc_zeta=LBC(BC_CHAPMAN_EXPLICIT, per, BC_CHAPMAN_EXPLICIT,
                     per),
        lbc_ubar=LBC(BC_FLATHER, per, BC_FLATHER, per),
        lbc_vbar=LBC(BC_FLATHER, per, BC_FLATHER, per),
        lbc_u=LBC(BC_RADIATION, per, BC_RADIATION, per),
        lbc_v=LBC(BC_RADIATION, per, BC_RADIATION, per),
        lbc_t=LBC(BC_RADIATION, per, BC_RADIATION, per),
        dtype=dtype)
    Xsize, Esize = 4000.0 * Lm, 4000.0 * Mm

    # piecewise bathymetry profile (ana_grid.h:1073-1100)
    val1, val2 = 98.80, 0.8270
    ks = np.arange(-1, 236)
    xwrk = np.empty(ks.shape)
    hwrk = np.empty(ks.shape)
    for idx, k in enumerate(ks):
        if k <= 26:
            xwrk[idx] = (k - 1) * 15.0e3
            hwrk[idx] = 375.0
        elif k <= 232:
            zwrk = -2.0 + (k - 1) * 0.020
            xwrk[idx] = (520.0 + val1 + zwrk * val1 +
                         val1 * val2 * np.log(np.cosh(zwrk))) * 1.0e3
            hwrk[idx] = -75.0 + 2198.0 * (1.0 + val2 * np.tanh(zwrk))
        else:
            xwrk[idx] = (850.0 + (k - 228) * 50.0) * 1.0e3
            hwrk[idx] = 4000.0

    # ice draft ramp (ana_grid.h:1157-1170), needed inside depth_fn:
    # roms_tpu stores h as the resting WATER-COLUMN thickness (bottom
    # depth minus |zice|; see vgrid.set_depth)
    def zice_of(i):
        return np.minimum(
            np.where(i > 20, 0.0,
                     np.where(i > 4, -340.0 + (i - 1) * (340.0 / 16.0),
                              -340.0)), 0.0)

    def depth_fn(x, y, i, j, c):
        hbot = np.interp(x, xwrk, hwrk, left=375.0, right=4000.0)
        return hbot - np.abs(zice_of(i))

    grid, cfg = build_grid(cfg, Xsize, Esize, f0=0.0, beta=0.0,
                           depth_fn=depth_fn)
    # latitude-varying Coriolis keyed on i (ana_grid.h:874-880) and the
    # 90-degree grid rotation
    H = cfg.halo
    i_idx = np.arange(cfg.nx_tot)[None, :] - H + 1
    dlat = 10.4 / Lm
    f = 2.0 * 7.2e-5 * np.sin((-79.0 + (i_idx - 1) * dlat) *
                              np.pi / 180.0)
    f = np.broadcast_to(f, grid.h.shape)
    zice = np.broadcast_to(zice_of(i_idx), grid.h.shape)
    dtt = jnp.dtype(dtype)
    grid = grid.replace(
        f=jnp.asarray(f, dtt),
        angler=jnp.full_like(grid.h, 0.5 * np.pi),
        zice=jnp.asarray(zice, dtt))

    z_r, _, _ = vgrid.set_depth(grid.h, jnp.zeros_like(grid.h),
                                hc_of(cfg), grid.sc_r, grid.Cs_r,
                                grid.sc_w, grid.Cs_w, cfg.vtransform,
                                zice=grid.zice)
    fh = lambda a: bc.fill_halo(cfg, a)
    # reduced-pressure floating-ice form (see stepping ice_load): the
    # rest state is zeta = 0 everywhere; the reference instead rings
    # through a full |zice| free-surface adjustment from its zeta=0
    # start (documented delta: same equilibrium, no transient)
    state0 = initial_state(cfg, t=jnp.stack(
        [fh(jnp.full_like(z_r, cfg.T0)), fh(jnp.full_like(z_r, cfg.S0))]))
    ny = cfg.ny_tot
    deg2rad = np.pi / 180.0
    omega_m2 = 2.0 * np.pi / (12.42 * 3600.0)

    def forcing_fn(cfg_, grid_, time):
        fac = jnp.tanh(time / 86400.0)
        om_t = omega_m2 * time
        ones = jnp.ones((ny,), dtt)
        # west boundary ellipse (boundary-value limit of the reference's
        # along-channel interpolation)
        val_w = 0.53
        ph_w = 277.0 * deg2rad
        zw = fac * val_w * jnp.cos(om_t - ph_w)
        major, minor = 0.1144, 0.0143
        ph_u = 318.0 * deg2rad
        ang = 125.0 * deg2rad - 0.5 * np.pi     # minus angler
        ubw = fac * (major * jnp.cos(ang) * jnp.cos(om_t - ph_u) -
                     minor * jnp.sin(ang) * jnp.sin(om_t - ph_u))
        vbw = fac * (major * jnp.sin(ang) * jnp.cos(om_t - ph_u))
        # east boundary (the reference doubles the linear increments)
        val_e = 0.53 + (0.53 - 0.48)
        ph_we = (277.0 + 37.0) * deg2rad
        ze = fac * val_e * jnp.cos(om_t - ph_we)
        maj_e = 0.1144 + (0.1144 - 0.013)
        min_e = 0.0143 + (0.0143 + 0.010)
        ph_ue = (318.0 - 37.0) * deg2rad
        ang_e = (125.0 + 100.0) * deg2rad - 0.5 * np.pi
        ube = fac * (maj_e * jnp.cos(ang_e) * jnp.cos(om_t - ph_ue) -
                     min_e * jnp.sin(ang_e) * jnp.sin(om_t - ph_ue))
        vbe = fac * (maj_e * jnp.sin(ang_e) * jnp.cos(om_t - ph_ue))
        return {"bry": {
            "zeta_west": zw * ones, "ubar_west": ubw * ones,
            "vbar_west": vbw * ones,
            "zeta_east": ze * ones, "ubar_east": ube * ones,
            "vbar_east": vbe * ones}}

    return cfg, grid, state0, forcing_fn


def bl_test(Lm=39, Mm=4, N=30, dt=150.0, ndtfast=30, dtype="float64"):
    """BL_TEST: coastal boundary-layer test column (bl_test.h;
    roms_bl_test.in: 39x4x30, DT=150 s).  100x5 km shelf,
    h = 14 + 25(1-exp(-pi*x*1e-5)) - 8*exp(-((x+500)/15000)^2)
    (ana_grid.h:926-934), f=9.25e-4; NS periodic, east radiation; full
    KPP (Ri mixing + convection + double diffusion + surface/bottom
    layers + nonlocal); JM95 EOS; northward wind svstr=0.3 N/m2
    (ana_smflux.h:153-163) and the diurnal-albedo shortwave cycle.
    Initial t = T0 + 6.25*tanh(1.1 z + 11), s = S0 - 0.75*tanh(...)
    (ana_initial.h:546-558).  Documented deltas: uniform dx (the
    reference stretches dx from 675 m near shore), direct wind stress
    instead of the COARE analytic-atmosphere chain."""
    per = "Per"
    cfg = Config(
        name="bl_test", Lm=Lm, Mm=Mm, N=N, ntracers=2,
        ew_periodic=False, ns_periodic=True,
        dt=dt, ndtfast=ndtfast,
        uv_vis2=True, visc2=0.0, tnu2=(0.0, 0.0),
        t_hadv=("U3", "U3"), t_vadv=("C4", "C4"),
        splines_vdiff=True, splines_vvisc=True,
        akv_bak=1.0e-5, akt_bak=(1.0e-6, 1.0e-6),
        bottom_drag="quadratic", rdrg2=3.0e-3,
        vmix="kpp", kpp_bottom=True, lmd_ddmix=True,
        eos="jm95", T0=17.25, S0=31.0,
        theta_s=5.0, theta_b=1.5, tcline=20.0, vtransform=2,
        vstretching=4,
        lbc_zeta=LBC(BC_CLOSED, per, BC_GRADIENT, per),
        lbc_ubar=LBC(BC_CLOSED, per, BC_RADIATION, per),
        lbc_vbar=LBC(BC_CLOSED, per, BC_RADIATION, per),
        lbc_u=LBC(BC_CLOSED, per, BC_RADIATION, per),
        lbc_v=LBC(BC_CLOSED, per, BC_RADIATION, per),
        lbc_t=LBC(BC_CLOSED, per, BC_RADIATION, per),
        dtype=dtype)

    def depth_fn(x, y, i, j, c):
        val1 = (x + 500.0) / 15000.0
        return 14.0 + 25.0 * (1.0 - np.exp(-np.pi * x * 1.0e-5)) - \
            8.0 * np.exp(-val1 * val1)

    grid, cfg = build_grid(cfg, 100.0e3, 5.0e3, f0=9.25e-4, beta=0.0,
                           depth_fn=depth_fn)
    z_r, _, _ = _depths_at_rest(cfg, grid)
    val1 = jnp.tanh(1.1 * z_r + 11.0)
    temp = cfg.T0 + 6.25 * val1
    salt = cfg.S0 - 0.75 * val1
    fh = lambda a: bc.fill_halo(cfg, a)
    state0 = initial_state(cfg, t=jnp.stack([fh(temp), fh(salt)]))

    from ..ops.bulk_flux import ana_srflux_albedo

    def forcing_fn(cfg_, grid_, time):
        zero = jnp.zeros_like(grid_.h)
        srflx = ana_srflux_albedo(
            cfg_, zero - 70.0, zero + 35.0, zero + 20.0, zero + 0.8,
            zero + 0.3, time / 86400.0)
        return {"svstr": jnp.full_like(grid_.h, 0.3 / cfg_.rho0),
                "srflx": srflx,
                "stflux": jnp.stack([srflx, zero])}

    return cfg, grid, state0, forcing_fn
