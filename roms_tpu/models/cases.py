"""Additional analytic test cases (reference ROMS/Include/<app>.h +
ana_grid/ana_initial/ana_smflux fixtures; runtime values from the matching
roms_*.in scripts).

Each builder returns (cfg, grid, state0, forcing_fn).  Biharmonic cases
use the biharmonic operators (uv_vis4/visc4, ts_dif4/tnu4 wired to
ops/mix3d.uv3dmix4/t3dmix4); coefficients noted per case.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import constants as C
from ..config import Config, LBC
from ..grid import build_grid, hc_of
from .. import vgrid
from ..state import initial_state
from ..ops import bc


def _stratification_800(cfg, z_r, scale=800.0):
    """BASIN/BENCHMARK-family stratification (ana_initial.h:523-547)."""
    val1 = (44.69 / 39.382) ** 2
    val2 = val1 * (cfg.rho0 * scale / C.g) * \
        (5.0e-5 / ((42.689 / 44.69) ** 2))
    return val2 * jnp.exp(z_r / scale) * \
        (0.6 - 0.4 * jnp.tanh(z_r / scale))


def _build_flat(cfg, Xsize, Esize, f0, beta, depth):
    return build_grid(cfg, Xsize, Esize, f0=f0, beta=beta,
                      depth_fn=lambda x, y, i, j, c: depth + 0 * x)


def _rest_state(cfg, grid, temp_fn, salt=None):
    hc = hc_of(cfg)
    z_r, z_w, Hz = vgrid.set_depth(grid.h, jnp.zeros_like(grid.h), hc,
                                   grid.sc_r, grid.Cs_r, grid.sc_w,
                                   grid.Cs_w, cfg.vtransform)
    temp = temp_fn(z_r)
    fields = [bc.fill_halo(cfg, temp)]
    if cfg.ntracers >= 2:
        s = salt if salt is not None else jnp.full_like(temp, cfg.S0)
        fields.append(bc.fill_halo(cfg, s))
    return initial_state(cfg, t=jnp.stack(fields, axis=0)), z_r


def basin(Lm=180, Mm=140, N=12, dt=800.0, ndtfast=20, dtype="float64"):
    """BASIN: rectangular beta-plane box (basin.h; roms_basin.in) with
    biharmonic viscosity/diffusion as in the reference (stress applied at
    the surface rather than as BODYFORCE layers)."""
    clo = LBC()
    cfg = Config(
        name="basin", Lm=Lm, Mm=Mm, N=N, ntracers=1,
        ew_periodic=False, ns_periodic=False,
        dt=dt, ndtfast=ndtfast,
        uv_vis2=False, visc2=0.0, uv_vis4=True, visc4=8.0e10,
        ts_dif4=True, tnu4=(2.0e10,), tnu2=(0.0,), t_hadv=("U3",),
        t_vadv=("C4",), akt_bak=(1.0e-7,), akv_bak=1.0e-5,
        bottom_drag="quadratic", rdrg2=3.0e-3,
        eos="linear", R0=1028.0, T0=10.0, Tcoef=1.7e-4, Scoef=0.0,
        theta_s=3.3, theta_b=0.0, tcline=1e16, vtransform=1,
        vstretching=1,
        lbc_zeta=clo, lbc_ubar=clo, lbc_vbar=clo, lbc_u=clo, lbc_v=clo,
        lbc_t=clo, dtype=dtype)
    grid, cfg = _build_flat(cfg, 3600e3, 2800e3, 1.0e-4, 2.0e-11, 5000.0)
    state0, _ = _rest_state(cfg, grid,
                            lambda z: _stratification_800(cfg, z))
    Esize = 2800e3

    def forcing_fn(cfg, grid, time):
        # ana_smflux.h BASIN: ramped double-gyre wind
        val1 = 5.0e-5 * (1.0 + jnp.tanh((time - 6.0 * 86400.0) /
                                        (3.0 * 86400.0)))
        sustr = -val1 * jnp.cos(2.0 * np.pi * grid.yr / Esize)
        return {"sustr": sustr.astype(grid.h.dtype)}

    return cfg, grid, state0, forcing_fn


def double_gyre(Lm=54, Mm=108, N=4, dt=3600.0, ndtfast=20,
                dtype="float64"):
    """DOUBLE_GYRE: wind-driven gyres (double_gyre.h; roms_double_gyre.in)."""
    clo = LBC()
    cfg = Config(
        name="double_gyre", Lm=Lm, Mm=Mm, N=N, ntracers=2,
        ew_periodic=False, ns_periodic=False,
        dt=dt, ndtfast=ndtfast,
        uv_vis2=True, visc2=1280.0, tnu2=(1280.0, 1280.0),
        bottom_drag="linear", rdrg=3.0e-4,
        eos="linear", R0=1028.0, T0=10.0, S0=34.5,
        Tcoef=1.7e-4, Scoef=0.0,
        theta_s=1.0, theta_b=1.0, tcline=1e16, vtransform=1,
        vstretching=1,
        lbc_zeta=clo, lbc_ubar=clo, lbc_vbar=clo, lbc_u=clo, lbc_v=clo,
        lbc_t=clo, dtype=dtype)
    grid, cfg = _build_flat(cfg, 1000e3, 2000e3, 7.3e-5, 2.0e-11, 500.0)
    Esize = 2000e3

    def temp_fn(z_r):
        val1 = (44.69 / 39.382) ** 2
        val2 = val1 * (cfg.rho0 * 100.0 / C.g) * \
            (5.0e-5 / ((42.689 / 44.69) ** 2))
        y_frac = grid.yr / Esize
        return cfg.T0 + val2 * jnp.exp(z_r / 100.0) * \
            (10.0 - 0.4 * jnp.tanh(z_r / 100.0)) - 3.0 * y_frac

    def salt_mk():
        return None

    hc = hc_of(cfg)
    z_r, z_w, Hz = vgrid.set_depth(grid.h, jnp.zeros_like(grid.h), hc,
                                   grid.sc_r, grid.Cs_r, grid.sc_w,
                                   grid.Cs_w, cfg.vtransform)
    salt = 34.5 - 0.001 * z_r - grid.yr / Esize
    state0, _ = _rest_state(cfg, grid, temp_fn, salt=salt)

    def forcing_fn(cfg, grid, time):
        windamp = -0.05 / cfg.rho0
        sustr = windamp * jnp.cos(2.0 * np.pi * grid.yr / Esize)
        return {"sustr": sustr.astype(grid.h.dtype)}

    return cfg, grid, state0, forcing_fn


def grav_adj(Lm=128, Mm=4, N=40, dt=50.0, ndtfast=20, dtype="float64"):
    """GRAV_ADJ: lock-exchange gravitational adjustment (grav_adj.h)."""
    per = LBC.periodic_ns()
    cfg = Config(
        name="grav_adj", Lm=Lm, Mm=Mm, N=N, ntracers=1,
        ew_periodic=False, ns_periodic=True,
        dt=dt, ndtfast=ndtfast,
        uv_cor=False, uv_vis2=True, visc2=5.0, tnu2=(0.0,),
        t_hadv=("U3",), t_vadv=("C4",),
        akv_bak=1.0e-5, akt_bak=(1.0e-7,),
        bottom_drag=None,
        eos="linear", R0=1028.0, T0=10.0, Tcoef=1.7e-4, Scoef=0.0,
        theta_s=0.0, theta_b=0.0, tcline=1e16, vtransform=1,
        vstretching=1,
        lbc_zeta=per, lbc_ubar=per, lbc_vbar=per, lbc_u=per, lbc_v=per,
        lbc_t=per, dtype=dtype)
    grid, cfg = _build_flat(cfg, 64e3, 2e3, 0.0, 0.0, 20.0)

    H = cfg.halo

    def temp_fn(z_r):
        i = jnp.arange(cfg.nx_tot) - H + 1     # roms i index
        left = (i <= (cfg.Lm + 1) // 2)
        return jnp.where(left[None, None, :], cfg.T0 + 5.0, cfg.T0) + \
            0.0 * z_r

    state0, _ = _rest_state(cfg, grid, temp_fn)
    return cfg, grid, state0, None


def seamount(Lm=49, Mm=48, N=13, dt=60.0, ndtfast=20, dtype="float64"):
    """SEAMOUNT: pressure-gradient error benchmark over a tall Gaussian
    seamount (seamount.h); the exact solution is rest."""
    clo = LBC()
    cfg = Config(
        name="seamount", Lm=Lm, Mm=Mm, N=N, ntracers=1,
        ew_periodic=False, ns_periodic=False,
        dt=dt, ndtfast=ndtfast,
        uv_vis2=False, visc2=0.0, tnu2=(0.0,),
        t_hadv=("U3",), t_vadv=("C4",),
        akv_bak=1.0e-5, akt_bak=(1.0e-7,),
        bottom_drag="linear", rdrg=3.0e-4,
        eos="linear", R0=1028.0, T0=10.0, Tcoef=1.7e-4, Scoef=0.0,
        theta_s=5.0, theta_b=0.4, tcline=50.0, vtransform=1,
        vstretching=1,
        lbc_zeta=clo, lbc_ubar=clo, lbc_vbar=clo, lbc_u=clo, lbc_v=clo,
        lbc_t=clo, dtype=dtype)
    Xsize = Esize = 320e3

    def depth_fn(x, y, i, j, c):
        v1 = (x - 0.5 * Xsize) / 40e3
        v2 = (y - 0.5 * Esize) / 40e3
        return 5000.0 - 4500.0 * np.exp(-(v1 * v1 + v2 * v2))

    grid, cfg = build_grid(cfg, Xsize, Esize, f0=1.0e-4, beta=0.0,
                           depth_fn=depth_fn)
    state0, _ = _rest_state(
        cfg, grid, lambda z: cfg.T0 + 7.5 * jnp.exp(z / 1000.0))
    return cfg, grid, state0, None


def canyon3d(Lm=65, Mm=48, N=15, dt=100.0, ndtfast=20, dtype="float64"):
    """CANYON: coastal canyon, 3-D stratified (canyon.h)."""
    per = LBC.periodic_ew()
    cfg = Config(
        name="canyon3d", Lm=Lm, Mm=Mm, N=N, ntracers=1,
        ew_periodic=True, ns_periodic=False,
        dt=dt, ndtfast=ndtfast,
        uv_vis2=True, visc2=5.0, tnu2=(5.0,),
        t_hadv=("U3",), t_vadv=("C4",),
        akv_bak=1.0e-5, akt_bak=(1.0e-7,),
        bottom_drag="linear", rdrg=3.0e-4,
        eos="linear", R0=1028.0, T0=10.0, Tcoef=1.7e-4, Scoef=0.0,
        theta_s=3.5, theta_b=0.0, tcline=1e16, vtransform=1,
        vstretching=1,
        lbc_zeta=per, lbc_ubar=per, lbc_vbar=per, lbc_u=per, lbc_v=per,
        lbc_t=per, dtype=dtype)
    Xsize, Esize = 128e3, 96e3

    def depth_fn(x, y, i, j, c):
        val1 = 32000.0 - 16000.0 * (np.sin(np.pi * x / Xsize)) ** 24
        return 20.0 + 0.5 * (4000.0 - 20.0) * \
            (1.0 + np.tanh((y - val1) / 10000.0))

    grid, cfg = build_grid(cfg, Xsize, Esize, f0=1.0e-4, beta=0.0,
                           depth_fn=depth_fn)
    state0, _ = _rest_state(
        cfg, grid,
        lambda z: 3.488 * jnp.exp(z / 800.0) *
        (1.0 - (2.0 / 3.0) * jnp.tanh(z / 800.0)))
    return cfg, grid, state0, None


def kelvin(Lm=50, Mm=30, N=10, dt=900.0, ndtfast=60, dtype="float64"):
    """KELVIN: coastal Kelvin wave with radiation open boundaries
    (kelvin.h; roms_kelvin.in).  West boundary clamped to an M2 Kelvin
    wave; east radiation."""
    from ..config import BC_RADIATION, BC_CLAMPED, BC_CLOSED, BC_GRADIENT
    cfg = Config(
        name="kelvin", Lm=Lm, Mm=Mm, N=N, ntracers=2,
        ew_periodic=False, ns_periodic=False,
        dt=dt, ndtfast=ndtfast,
        uv_vis2=False, visc2=0.0, tnu2=(20.0, 0.0),
        t_hadv=("U3", "U3"), t_vadv=("C4", "C4"),
        akv_bak=1.0e-5, akt_bak=(1.0e-6, 1.0e-6),
        bottom_drag=None,
        eos="linear", R0=1027.0, T0=14.0, S0=35.0, Tcoef=1.7e-4,
        Scoef=0.0,
        theta_s=3.0, theta_b=0.0, tcline=25.0,
        lbc_zeta=LBC(BC_CLAMPED, BC_CLOSED, BC_RADIATION, BC_CLOSED),
        lbc_ubar=LBC(BC_CLAMPED, BC_CLOSED, BC_RADIATION, BC_CLOSED),
        lbc_vbar=LBC(BC_CLAMPED, BC_CLOSED, BC_RADIATION, BC_CLOSED),
        lbc_u=LBC(BC_RADIATION, BC_GRADIENT, BC_RADIATION, BC_GRADIENT),
        lbc_v=LBC(BC_RADIATION, BC_GRADIENT, BC_RADIATION, BC_GRADIENT),
        lbc_t=LBC(BC_RADIATION, BC_GRADIENT, BC_RADIATION, BC_GRADIENT),
        dtype=dtype)
    grid, cfg = _build_flat(cfg, 20e3 * Lm, 20e3 * Mm, 1.0e-4, 0.0, 100.0)
    state0, _ = _rest_state(cfg, grid,
                            lambda z: jnp.full_like(z, cfg.T0))
    H = cfg.halo
    f0, depth, zeta0 = 1.0e-4, 100.0, 1.0
    omega_m2 = 2.0 * np.pi / (12.42 * 3600.0)
    cph = np.sqrt(C.g * depth)

    def forcing_fn(cfg, grid, time):
        # western boundary: analytic Kelvin wave (ana_fsobc/ana_m2obc).
        # y taken from the grid ARGUMENT (not a closure) so the same fn
        # builds each shard's local boundary segment under parallel/smap
        y_west = grid.yr[:, cfg.halo]
        zw = zeta0 * jnp.exp(-f0 * y_west / cph) * \
            jnp.cos(omega_m2 * time)
        ubw = zw * cph / depth
        return {"bry": {"zeta_west": zw.astype(grid.h.dtype),
                        "ubar_west": ubw.astype(grid.h.dtype)}}

    return cfg, grid, state0, forcing_fn


def overflow(Lm=4, Mm=128, N=20, dt=20.0, ndtfast=20, dtype="float64"):
    """OVERFLOW: dense gravity current down a slope (overflow.h;
    roms_overflow.in: 4x128x20, DT=20 s).  tanh shelf-to-deep bathymetry
    in eta (ana_grid.h:993-1000), cold dense water on the shelf
    (ana_initial.h:756-763), isopycnal-rotated harmonic diffusion
    (overflow.h MIX_ISO_TS), quadratic drag; NS periodic / EW closed
    (roms_overflow.in:184-191)."""
    per = LBC.periodic_ns()
    cfg = Config(
        name="overflow", Lm=Lm, Mm=Mm, N=N, ntracers=1,
        ew_periodic=False, ns_periodic=True,
        dt=dt, ndtfast=ndtfast,
        uv_cor=False, uv_vis2=True, visc2=1.0,
        ts_dif2=True, tnu2=(1.0,), ts_mix_iso=True,
        t_hadv=("U3",), t_vadv=("C4",),
        splines_vdiff=True, splines_vvisc=True,
        akv_bak=1.0e-5, akt_bak=(1.0e-7,),
        bottom_drag="quadratic", rdrg2=3.0e-3,
        eos="linear", R0=1028.0, T0=10.0, Tcoef=1.7e-4, Scoef=0.0,
        theta_s=0.0, theta_b=0.0, tcline=1e16, vtransform=1,
        vstretching=1,
        lbc_zeta=per, lbc_ubar=per, lbc_vbar=per, lbc_u=per, lbc_v=per,
        lbc_t=per, dtype=dtype)

    def depth_fn(x, y, i, j, c):
        return 200.0 + 0.5 * (4000.0 - 200.0) * \
            (1.0 + np.tanh((y - 100.0e3) / 20.0e3))

    grid, cfg = build_grid(cfg, 4.0e3, 200.0e3, f0=0.0, beta=0.0,
                           depth_fn=depth_fn)

    def temp_fn(z_r):
        return cfg.T0 - 0.5 * cfg.T0 * (
            1.0 + jnp.tanh((grid.yr - 60.0e3) / 2.0e3)) + 0.0 * z_r

    state0, _ = _rest_state(cfg, grid, temp_fn)
    return cfg, grid, state0, None


def windbasin(Lm=101, Mm=52, N=25, dt=120.0, ndtfast=30,
              dtype="float64"):
    """WINDBASIN: wind-driven homogeneous closed basin (windbasin.h;
    roms_windbasin.in: 101x52x25, DT=120 s).  2x1 km cells, 50 m flat
    depth, f=1e-4; no momentum advection (no UV_ADV in windbasin.h);
    upwelling-style 2-day wind ramp (ana_smflux.h:331-343)."""
    clo = LBC()
    cfg = Config(
        name="windbasin", Lm=Lm, Mm=Mm, N=N, ntracers=1,
        ew_periodic=False, ns_periodic=False,
        dt=dt, ndtfast=ndtfast,
        uv_adv=False, uv_cor=True, uv_vis2=False, visc2=0.0,
        tnu2=(0.0,), t_hadv=("U3",), t_vadv=("C4",),
        splines_vdiff=True, splines_vvisc=True,
        akv_bak=1.0e-5, akt_bak=(1.0e-6,),
        bottom_drag="quadratic", rdrg2=3.0e-3,
        eos="linear", R0=1027.0, T0=20.0, Tcoef=1.7e-4, Scoef=0.0,
        theta_s=0.0, theta_b=0.0, tcline=1e16, vtransform=1,
        vstretching=1,
        lbc_zeta=clo, lbc_ubar=clo, lbc_vbar=clo, lbc_u=clo, lbc_v=clo,
        lbc_t=clo, dtype=dtype)
    grid, cfg = _build_flat(cfg, 2000.0 * Lm, 1000.0 * Mm, 1.0e-4, 0.0,
                            50.0)
    state0, _ = _rest_state(cfg, grid,
                            lambda z: jnp.full_like(z, 20.0))

    def forcing_fn(cfg, grid, time):
        tdays = time / C.day2sec
        windamp = jnp.where(tdays <= 2.0,
                            -0.1 * jnp.sin(np.pi * tdays / 4.0),
                            -0.1) / cfg.rho0
        return {"sustr": (windamp *
                          jnp.ones_like(grid.h)).astype(grid.h.dtype)}

    return cfg, grid, state0, forcing_fn


def lake_signell(Lm=100, Mm=20, N=8, dt=60.0, ndtfast=20,
                 dtype="float64", sediment=True):
    """LAKE_SIGNELL: wind/wave-driven closed lake with the SSW BBL and
    suspended sediment (lake_signell.h; roms_lake_signell.in:
    100x20x8, DT=60 s).  Linear 2-18 m depth in eta
    (ana_grid.h:981-986); GLS k-epsilon mixing; wind stress and wave
    field ramp up at hour 15 and down at hour 50
    (ana_smflux.h:219-236, ana_wwave.h:191-202).  Sand class from
    sediment_lake_signell.in:207-232 (bedload: reference uses Soulsby,
    here MPM - documented delta)."""
    from ..ops.sediment import SedParams
    from ..ops.bbl import BBLParams
    clo = LBC()
    nt = 2 + (1 if sediment else 0)
    sed = SedParams(ised0=2, Sd50=(0.001,), Srho=(2650.0,),
                    Wsed=(1.0e-3,), Erate=(1.0e-5,),
                    tau_ce=(0.07 / 1025.0,), tau_cd=(0.07 / 1025.0,),
                    poros=0.5) if sediment else None
    cfg = Config(
        name="lake_signell", Lm=Lm, Mm=Mm, N=N, ntracers=nt,
        ew_periodic=False, ns_periodic=False,
        dt=dt, ndtfast=ndtfast,
        uv_vis2=False, visc2=0.0, tnu2=nt * (0.0,),
        t_hadv=nt * ("MPDATA",), t_vadv=nt * ("MPDATA",),
        splines_vdiff=True, splines_vvisc=True,
        akv_bak=5.0e-6, akt_bak=(5.0e-6,) * min(nt, 2),
        bottom_drag="logarithmic", zob=0.005,
        vmix="gls",
        eos="linear", R0=1027.0, T0=10.0, S0=30.0,
        Tcoef=1.7e-4, Scoef=7.6e-4,
        theta_s=0.0, theta_b=0.0, tcline=1e16, vtransform=1,
        vstretching=1,
        lbc_zeta=clo, lbc_ubar=clo, lbc_vbar=clo, lbc_u=clo, lbc_v=clo,
        lbc_t=clo,
        sediment=sediment, sed_params=sed,
        bbl="ssw",
        bbl_params=BBLParams(d50=0.001, tau_ce=0.07 / 1025.0),
        dtype=dtype)

    def depth_fn(x, y, i, j, c):
        return 18.0 - 16.0 * (c.Mm - j) / (c.Mm - 1.0)

    grid, cfg = build_grid(cfg, 50.0e3, 10.0e3, f0=0.0, beta=0.0,
                           depth_fn=depth_fn)
    hc = hc_of(cfg)
    z_r, _, _ = vgrid.set_depth(grid.h, jnp.zeros_like(grid.h), hc,
                                grid.sc_r, grid.Cs_r, grid.sc_w,
                                grid.Cs_w, cfg.vtransform)
    fields = [bc.fill_halo(cfg, jnp.full_like(z_r, 10.0)),
              bc.fill_halo(cfg, jnp.full_like(z_r, 30.0))]
    if sediment:
        fields.append(jnp.zeros_like(z_r))
    state0 = initial_state(cfg, t=jnp.stack(fields, axis=0))

    def forcing_fn(cfg_, grid_, time):
        th = time / 3600.0
        ramp = jnp.minimum(
            0.5 * (jnp.tanh((th - 15.0) / 2.0) + 1.0),
            1.0 - 0.5 * (jnp.tanh((th - 50.0) / 2.0) + 1.0))
        one = jnp.ones_like(grid_.h)
        return {"sustr": (0.25 / cfg_.rho0 * ramp * one
                          ).astype(grid_.h.dtype),
                "Hwave": jnp.maximum(2.0 * 0.25 * ramp, 0.01) * one,
                "Pwave": 5.0 * one,
                "Dwave": 270.0 * C.deg2rad * one}

    return cfg, grid, state0, forcing_fn


def estuary(Lm=200, Mm=3, N=20, dt=30.0, ndtfast=20, dtype="float64"):
    """ESTUARY_TEST: tidal salt-wedge estuary (estuary_test.h;
    roms_estuary_test.in: 200x3x20, DT=30 s).  Linear 10->5 m depth
    over 100 km (ana_grid.h:943-948), ocean salinity 30 at the west
    grading to river water at the east (ana_initial.h:625-641); M2
    tide + river outflow imposed at the west (ana_fsobc.h:106-113,
    ana_m2obc.h:127-147, with the flux/area evaluated at the rest
    depth - documented delta), river inflow at the east
    (ana_m2obc.h:150-167, ana_tobc.h:98-112); GLS k-epsilon,
    logarithmic drag (estuary_test.h UV_LOGDRAG)."""
    from ..config import (BC_CHAPMAN_EXPLICIT, BC_CLAMPED, BC_CLOSED,
                          BC_GRADIENT, BC_RADIATION)
    W, E = 0, 2
    cfg = Config(
        name="estuary", Lm=Lm, Mm=Mm, N=N, ntracers=2,
        ew_periodic=False, ns_periodic=False,
        dt=dt, ndtfast=ndtfast,
        uv_vis2=False, visc2=0.0, tnu2=(0.0, 0.0),
        t_hadv=("HSIMT", "HSIMT"), t_vadv=("HSIMT", "HSIMT"),
        splines_vdiff=True, splines_vvisc=True,
        akv_bak=5.0e-6, akt_bak=(5.0e-6, 5.0e-6),
        bottom_drag="logarithmic", zob=0.005,
        vmix="gls",
        eos="linear", R0=1027.0, T0=10.0, S0=30.0,
        Tcoef=1.7e-4, Scoef=7.6e-4,
        theta_s=0.0, theta_b=0.0, tcline=1e16, vtransform=1,
        vstretching=1,
        lbc_zeta=LBC(BC_CHAPMAN_EXPLICIT, BC_CLOSED, BC_GRADIENT,
                     BC_CLOSED),
        lbc_ubar=LBC(BC_CLAMPED, BC_CLOSED, BC_CLAMPED, BC_CLOSED),
        lbc_vbar=LBC(BC_CLAMPED, BC_CLOSED, BC_CLAMPED, BC_CLOSED),
        lbc_u=LBC(BC_GRADIENT, BC_CLOSED, BC_GRADIENT, BC_CLOSED),
        lbc_v=LBC(BC_GRADIENT, BC_CLOSED, BC_GRADIENT, BC_CLOSED),
        lbc_t=LBC(BC_RADIATION, BC_CLOSED, BC_CLAMPED, BC_CLOSED),
        dtype=dtype)
    Xsize = 100.0e3

    def depth_fn(x, y, i, j, c):
        return 5.0 + (Xsize - x) / Xsize * 5.0

    grid, cfg = build_grid(cfg, Xsize, 300.0, f0=0.0, beta=0.0,
                           depth_fn=depth_fn)
    hc = hc_of(cfg)
    z_r, _, _ = vgrid.set_depth(grid.h, jnp.zeros_like(grid.h), hc,
                                grid.sc_r, grid.Cs_r, grid.sc_w,
                                grid.Cs_w, cfg.vtransform)
    xr3 = jnp.broadcast_to(grid.xr, z_r.shape)
    salt = jnp.where(xr3 <= 30.0e3, 30.0,
                     jnp.where(xr3 <= 80.0e3,
                               (80.0e3 - xr3) / 50.0e3 * 30.0, 0.0))
    t0 = jnp.stack([bc.fill_halo(cfg, jnp.full_like(z_r, 10.0)),
                    bc.fill_halo(cfg, salt)])
    state0 = initial_state(cfg, t=t0)

    H = cfg.halo
    ny = cfg.ny_tot
    # boundary cross-sections at rest (reference uses instantaneous
    # zeta+h; |zeta|<=1 m over 10 m depth)
    h_np = np.asarray(grid.h)
    on_np = 1.0 / np.asarray(grid.pn)
    area_w = float((h_np[H:H + Mm, H] * on_np[H:H + Mm, H]).sum())
    area_e = float((h_np[H:H + Mm, H + Lm - 1] *
                    on_np[H:H + Mm, H + Lm - 1]).sum())
    riv_flow = 0.08 * 300.0 * 5.0
    tid_flow = 0.40 * 300.0 * 10.0
    dt_salt = jnp.dtype(dtype)

    def forcing_fn(cfg_, grid_, time):
        pha = 2.0 * np.pi * time / (12.0 * 3600.0)
        zw = jnp.sin(pha) * jnp.ones((ny,), dt_salt)
        ubw = ((-tid_flow * jnp.sin(pha) - riv_flow) / area_w) * \
            jnp.ones((ny,), dt_salt)
        ube = (-riv_flow / area_e) * jnp.ones((ny,), dt_salt)
        t_east = jnp.stack([jnp.full((cfg_.N, ny), 10.0, dt_salt),
                            jnp.zeros((cfg_.N, ny), dt_salt)])
        return {"bry": {"zeta_west": zw, "ubar_west": ubw,
                        "vbar_west": jnp.zeros((ny,), dt_salt),
                        "ubar_east": ube,
                        "vbar_east": jnp.zeros((ny,), dt_salt),
                        "t_east": t_east}}

    return cfg, grid, state0, forcing_fn


def riverplume(Lm=39, Mm=67, N=13, dt=120.0, ndtfast=20,
               dtype="float64"):
    """RIVERPLUME1: river discharge into a rotating coastal basin with
    land masking (riverplume1.h; roms_riverplume1.in: 39x67x13,
    DT=120 s).  Shelf sloping from 15 m at the coast to 150 m
    (ana_grid.h:1001-1010); land strip i<=5 with a one-cell channel at
    j=Mm-17 (ana_mask.h:175-188); river source Qbar=1500 m3/s at the
    u-face (i=2, j=50) with T=10, S=0 (ana_psource.h:156-162,340-348,
    488-503; the 10 vertical-influx rain cells are not modeled - LwSrc
    is a documented gap); nonlinear JM95 EOS, KPP with bottom layer,
    MIX_GEO_TS rotated diffusion, quadratic drag."""
    from ..ops.sources import PointSources
    clo = LBC()
    cfg = Config(
        name="riverplume", Lm=Lm, Mm=Mm, N=N, ntracers=2,
        ew_periodic=False, ns_periodic=False,
        dt=dt, ndtfast=ndtfast,
        uv_vis2=True, visc2=5.0,
        ts_dif2=True, tnu2=(5.0, 5.0), ts_mix_geo=True,
        t_hadv=("U3", "U3"), t_vadv=("C4", "C4"),
        splines_vdiff=True, splines_vvisc=True,
        akv_bak=1.0e-5, akt_bak=(1.0e-6, 1.0e-6),
        bottom_drag="quadratic", rdrg2=3.0e-3,
        vmix="kpp", kpp_bottom=True,
        eos="jm95", T0=14.0, S0=32.0,
        theta_s=3.0, theta_b=0.0, tcline=25.0, vtransform=1,
        vstretching=1,
        lbc_zeta=clo, lbc_ubar=clo, lbc_vbar=clo, lbc_u=clo, lbc_v=clo,
        lbc_t=clo, dtype=dtype)

    def depth_fn(x, y, i, j, c):
        return np.where(i <= 5, 15.0,
                        150.0 + (c.Lm - i) * (15.0 - 150.0) /
                        (c.Lm - 6.0))

    def mask_fn(x, y, i, j, c):
        land = (i <= 5) & ((j <= c.Mm - 18) | (j >= c.Mm - 16))
        return np.where(land, 0.0, 1.0)

    grid, cfg = build_grid(cfg, 58.5e3, 201.0e3, f0=1.0e-4, beta=0.0,
                           depth_fn=depth_fn, mask_fn=mask_fn)
    hc = hc_of(cfg)
    z_r, _, _ = vgrid.set_depth(grid.h, jnp.zeros_like(grid.h), hc,
                                grid.sc_r, grid.Cs_r, grid.sc_w,
                                grid.Cs_w, cfg.vtransform)
    k3 = jnp.arange(1, cfg.N + 1, dtype=z_r.dtype)[:, None, None]
    temp = cfg.T0 + 0.01 * k3 + 0.0 * z_r
    salt = jnp.full_like(temp, cfg.S0)
    state0 = initial_state(cfg, t=jnp.stack(
        [bc.fill_halo(cfg, temp), bc.fill_halo(cfg, salt)]))

    H = cfg.halo
    dtt = jnp.dtype(dtype)
    src = PointSources(
        isrc=jnp.asarray([2 + H - 1]), jsrc=jnp.asarray([50 + H - 1]),
        dsrc=jnp.asarray([0]),
        Qbar=jnp.asarray([1500.0], dtt),
        Qshape=jnp.full((cfg.N, 1), 1.0 / cfg.N, dtt),
        Tsrc=jnp.stack([jnp.full((cfg.N, 1), 10.0, dtt),
                        jnp.zeros((cfg.N, 1), dtt)]))

    def forcing_fn(cfg_, grid_, time):
        return {"sources": src}

    return cfg, grid, state0, forcing_fn
