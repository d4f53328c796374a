"""Additional analytic test cases (reference ROMS/Include/<app>.h +
ana_grid/ana_initial/ana_smflux fixtures; runtime values from the matching
roms_*.in scripts).

Each builder returns (cfg, grid, state0, forcing_fn).  Cases using
biharmonic mixing in the reference currently run with the harmonic
operator (uv3dmix4/t3dmix4 planned); coefficients noted per case.
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
    y_west = np.asarray(grid.yr)[:, H]        # boundary column

    def forcing_fn(cfg, grid, time):
        # western boundary: analytic Kelvin wave (ana_fsobc/ana_m2obc)
        zw = zeta0 * jnp.exp(-f0 * y_west / cph) * \
            jnp.cos(omega_m2 * time)
        ubw = zw * cph / depth
        return {"bry": {"zeta_west": zw.astype(grid.h.dtype),
                        "ubar_west": ubw.astype(grid.h.dtype)}}

    return cfg, grid, state0, forcing_fn
