"""Round-5 application set: the remaining analytic/file-driven cases.

 * lab_canyon   - LAB_CANYON (ROMS/Include/lab_canyon.h;
                  ana_grid.h:480-511,687-700,811-821 polar annulus;
                  ana_initial.h:678-685 linear stratification): the only
                  reference app whose grid is genuinely curvilinear
                  (polar metrics, nonuniform azimuthal spacing, angler =
                  theta).  Documented reduction: the oscillating-table
                  rotation modulation (ana_spinning.h) is not applied -
                  rotation is the constant f0 = 4*pi/25; the case here
                  stress-tests the curvilinear metric terms.
 * channel_neck - CHANNEL_NECK (ROMS/Include/channel_neck.h;
                  ana_initial.h:586-594): masked channel with a neck
                  constriction, MIX_GEO_UV viscosity.  The reference
                  grid is file-driven and not shipped; the neck
                  geometry here is an analytic stand-in (documented).
 * inlet_test   - INLET_TEST (ROMS/Include/inlet_test.h; grid from
                  Data/ROMS/Grid/inlet_test_grid.nc; ana_fsobc.h:77-85
                  semidiurnal north-boundary tide): wetting-drying tidal
                  inlet.  Documented reduction: no SWAN wave coupling /
                  sediment (the wave forcing fields are external), GLS
                  k-epsilon mixing retained.
 * test_head    - TEST_HEAD (ROMS/Include/test_head.h; grid from
                  Data/ROMS/Grid/test_head_curv_grd.nc): curvilinear
                  headland with wetting-drying and tidal forcing.
                  Documented reduction: the SSH/UV tide files are
                  replaced by an analytic M2 elevation at the open
                  (west) boundary; no SWAN/sediment.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import constants as C
from ..config import (Config, LBC, BC_CLOSED, BC_GRADIENT, BC_PERIODIC,
                      BC_CHAPMAN_IMPLICIT, BC_FLATHER)
from ..grid import build_curvilinear_grid, build_grid
from ..state import initial_state
from ..ops import bc

REF_GRID_DIR = "/root/reference/Data/ROMS/Grid"


def lab_canyon(Lm=110, Mm=250, N=25, dt=0.01, ndtfast=20,
               dtype="float64"):
    """Polar-annulus lab canyon; defaults are the reference's
    roms_lab_canyon.in sizes (110x250x25, DT=0.01 s)."""
    per = LBC(BC_CLOSED, BC_PERIODIC, BC_CLOSED, BC_PERIODIC)
    cfg = Config(
        name="lab_canyon", Lm=Lm, Mm=Mm, N=N, ntracers=1,
        ew_periodic=False, ns_periodic=True,
        dt=dt, ndtfast=ndtfast,
        uv_adv=True, uv_cor=True, curvgrid=True,
        uv_vis2=True, visc2=1.0e-5,
        ts_dif2=True, tnu2=(0.0,), ts_mix_geo=True,
        splines_vdiff=True, splines_vvisc=True,
        bottom_drag="linear", rdrg=3.0e-4,
        akv_bak=1.0e-6, akt_bak=(1.0e-6,),
        vmix="none", prsgrd_scheme="djs",
        eos="linear", R0=1027.0, T0=4.0, Tcoef=1.7e-4, Scoef=0.0,
        vtransform=1, vstretching=1, theta_s=0.01, theta_b=0.0,
        tcline=0.0,
        t_hadv=("U3",), t_vadv=("C4",),
        lbc_zeta=per, lbc_ubar=per, lbc_vbar=per,
        lbc_u=per, lbc_v=per, lbc_t=per,
        dtype=dtype)

    # ---- polar grid (ana_grid.h:480-511) ----
    H = cfg.halo
    Xsize = 0.55                         # annulus width (m)
    dx = Xsize / Lm
    dth = 0.01                           # azimuthal spacing parameter
    twopi = 2.0 * np.pi
    cff = (4.0 * np.pi / (dth * Mm)) - 1.0
    f0 = 4.0 * np.pi / 25.0

    # padded fractional indices: i=1 at padded col H (ROMS interior)
    ii = np.arange(cfg.nx_tot) - H + 1.0          # i
    jj = np.arange(cfg.ny_tot) - H + 1.0          # j
    I, J = np.meshgrid(ii, jj)
    r = 0.35 + dx * (I - 1.0 + 0.5)
    theta = -np.pi + 0.5 * dth * (
        (cff + 1.0) * (J - 1.0 + 0.5) +
        (cff - 1.0) * (Mm / twopi) * np.sin(twopi * (J - 1.0 + 0.5)
                                            / Mm))
    xr = r * np.cos(theta)
    yr = r * np.sin(theta)
    # metrics (ana_grid.h:687-700): pm = 1/dx; pn = 1/(r * dtheta_loc)
    theta_sp = 0.5 * dth * ((cff + 1.0) +
                            (cff - 1.0) * np.cos(twopi * (J - 1.0) / Mm))
    pm = np.full_like(xr, 1.0 / dx)
    pn = 1.0 / (r * theta_sp)

    # canyon bathymetry (ana_grid.h:949-978), h in meters (lab tank)
    val1 = 0.55 - 0.15 * np.cos(np.pi * theta * 0.55 / 0.2) ** 2
    val2 = 0.15 + 0.15 * np.cos(np.pi * theta * 0.55 / 0.2) ** 2
    h_out = np.where(
        r <= 0.55, 0.025,
        np.where(r >= 0.7, 0.125,
                 0.125 - 0.1 * np.cos(0.5 * np.pi * (r - 0.55) / 0.15)
                 ** 2))
    h_in = np.where(
        r <= val1, 0.025,
        np.where(r >= 0.7, 0.125,
                 0.125 - 0.1 * np.cos(0.5 * np.pi * (r - val1) /
                                      np.maximum(val2, 1e-12)) ** 2))
    h = np.where(np.abs(theta) >= 0.181818181818, h_out, h_in)

    grid, cfg = build_curvilinear_grid(
        cfg, xr, yr, pm, pn, np.full_like(xr, f0), h, angler=theta)

    # ---- initial state (ana_initial.h:678-685): t = -659.34183 z ----
    from .. import vgrid
    from ..grid import hc_of
    z_r, _, _ = vgrid.set_depth(grid.h, jnp.zeros_like(grid.h),
                                hc_of(cfg), grid.sc_r, grid.Cs_r,
                                grid.sc_w, grid.Cs_w, cfg.vtransform)
    t0 = bc.fill_halo(cfg, -659.34183 * z_r)[None]
    state0 = initial_state(cfg, t=t0)
    return cfg, grid, state0, None


def channel_neck(Lm=48, Mm=16, N=8, dt=30.0, ndtfast=10,
                 dtype="float64"):
    """Masked channel with a neck constriction (CHANNEL_NECK physics:
    UV_COR/ADV, linear drag, MIX_GEO_UV viscosity, t=20 uniform); the
    neck geometry is an analytic stand-in for the unshipped file grid."""
    clo = LBC(BC_CLOSED, BC_CLOSED, BC_CLOSED, BC_CLOSED)
    cfg = Config(
        name="channel_neck", Lm=Lm, Mm=Mm, N=N, ntracers=1,
        ew_periodic=False, ns_periodic=False,
        dt=dt, ndtfast=ndtfast,
        uv_adv=True, uv_cor=True,
        uv_vis2=True, visc2=50.0, uv_mix_geo=True,
        splines_vdiff=True, splines_vvisc=True,
        bottom_drag="linear", rdrg=3.0e-4,
        akv_bak=1.0e-5, akt_bak=(1.0e-6,),
        vmix="none", prsgrd_scheme="djs",
        eos="linear", R0=1027.0, T0=20.0, Tcoef=1.7e-4, Scoef=0.0,
        theta_s=0.0, theta_b=0.0, tcline=1.0e16,
        t_hadv=("U3",), t_vadv=("C4",),
        lbc_zeta=clo, lbc_ubar=clo, lbc_vbar=clo,
        lbc_u=clo, lbc_v=clo, lbc_t=clo,
        dtype=dtype)

    Xsize, Esize = 96.0e3, 32.0e3

    def mask_fn(x, y, i, j, c):
        # neck: the channel narrows to its middle third over the middle
        # fifth of its length
        in_neck = np.abs(x - 0.5 * Xsize) < 0.1 * Xsize
        wide = np.abs(y - 0.5 * Esize) < 0.5 * Esize
        narrow = np.abs(y - 0.5 * Esize) < Esize / 6.0
        return np.where(in_neck, narrow, wide).astype(np.float64)

    grid, cfg = build_grid(cfg, Xsize, Esize, f0=1.0e-4, beta=0.0,
                           depth_fn=lambda x, y, i, j, c:
                           np.full_like(x, 50.0), mask_fn=mask_fn)
    # sloshing initial surface: eastward pressure head through the neck
    x = np.asarray(grid.xr)
    zeta0 = jnp.asarray(0.2 * np.cos(np.pi * x / Xsize),
                        grid.h.dtype) * grid.rmask
    t0 = jnp.full((1, cfg.N, cfg.ny_tot, cfg.nx_tot), 20.0,
                  grid.h.dtype)
    state0 = initial_state(cfg, zeta=bc.fill_halo(cfg, zeta0), t=t0)
    return cfg, grid, state0, None


def inlet_test(grid_path: str = REF_GRID_DIR + "/inlet_test_grid.nc",
               N=8, dt=4.0, ndtfast=20, dtype="float64"):
    """Wet/dry tidal inlet on the reference's file grid; semidiurnal
    elevation at the open north boundary (ana_fsobc.h:77-85)."""
    from ..io.gridfile import load_grid
    north_open_z = LBC(BC_CLOSED, BC_CLOSED, BC_CLOSED,
                       BC_CHAPMAN_IMPLICIT)
    north_open_uv = LBC(BC_CLOSED, BC_CLOSED, BC_CLOSED, BC_FLATHER)
    grd = LBC(BC_CLOSED, BC_CLOSED, BC_CLOSED, BC_GRADIENT)
    grid, cfg = load_grid(
        grid_path,
        name="inlet_test", N=N, ntracers=1, dt=dt, ndtfast=ndtfast,
        uv_adv=True, uv_cor=False,
        uv_vis2=True, visc2=2.0,
        splines_vdiff=True, splines_vvisc=True,
        bottom_drag="logarithmic", zob=0.05,
        akv_bak=5.0e-5, akt_bak=(5.0e-6,),
        vmix="gls", prsgrd_scheme="djs",
        eos="linear", R0=1027.0, T0=14.0, Tcoef=1.7e-4, Scoef=0.0,
        theta_s=3.0, theta_b=0.0, tcline=1.0e16,
        t_hadv=("HSIMT",), t_vadv=("HSIMT",),
        lbc_zeta=north_open_z, lbc_ubar=north_open_uv,
        lbc_vbar=north_open_uv, lbc_u=grd, lbc_v=grd, lbc_t=grd,
        wetdry=True, dcrit=0.1,
        dtype=dtype)
    t0 = jnp.full((1, cfg.N, cfg.ny_tot, cfg.nx_tot), 14.0,
                  grid.h.dtype)
    state0 = initial_state(cfg, t=t0)

    def forcing_fn(c, g, time):
        # BOUNDARY zeta_north = -sin(2 pi t / 12h) (ana_fsobc.h:80)
        zn = -jnp.sin(2.0 * jnp.pi * time / (12.0 * 3600.0))
        line = jnp.full((g.h.shape[-1],), 1.0, g.h.dtype) * zn
        return {"bry": {"zeta_north": line}}

    return cfg, grid, state0, forcing_fn


def test_head(grid_path: str = REF_GRID_DIR + "/test_head_curv_grd.nc",
              N=8, dt=6.0, ndtfast=20, dtype="float64"):
    """Curvilinear tidal headland with wetting-drying on the
    reference's file grid; analytic M2 elevation at the open west
    boundary (reduction of the SSH_TIDES file forcing)."""
    from ..io.gridfile import load_grid
    west_open_z = LBC(BC_CHAPMAN_IMPLICIT, BC_CLOSED, BC_CLOSED,
                      BC_CLOSED)
    west_open_uv = LBC(BC_FLATHER, BC_CLOSED, BC_CLOSED, BC_CLOSED)
    grd = LBC(BC_GRADIENT, BC_CLOSED, BC_CLOSED, BC_CLOSED)
    grid, cfg = load_grid(
        grid_path,
        name="test_head", N=N, ntracers=1, dt=dt, ndtfast=ndtfast,
        uv_adv=True, uv_cor=False, curvgrid=True,
        uv_vis2=True, visc2=2.0,
        splines_vdiff=True, splines_vvisc=True,
        bottom_drag="logarithmic", zob=0.02,
        akv_bak=5.0e-5, akt_bak=(5.0e-6,),
        vmix="gls", prsgrd_scheme="djs",
        eos="linear", R0=1027.0, T0=14.0, Tcoef=1.7e-4, Scoef=0.0,
        theta_s=3.0, theta_b=0.0, tcline=1.0e16,
        t_hadv=("HSIMT",), t_vadv=("HSIMT",),
        lbc_zeta=west_open_z, lbc_ubar=west_open_uv,
        lbc_vbar=west_open_uv, lbc_u=grd, lbc_v=grd, lbc_t=grd,
        wetdry=True, dcrit=0.1,
        dtype=dtype)
    t0 = jnp.full((1, cfg.N, cfg.ny_tot, cfg.nx_tot), 14.0,
                  grid.h.dtype)
    state0 = initial_state(cfg, t=t0)

    def forcing_fn(c, g, time):
        zw = 0.5 * jnp.sin(2.0 * jnp.pi * time / (12.42 * 3600.0))
        line = jnp.full((g.h.shape[-2],), 1.0, g.h.dtype) * zw
        return {"bry": {"zeta_west": line}}

    return cfg, grid, state0, forcing_fn
