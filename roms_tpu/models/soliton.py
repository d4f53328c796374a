"""SOLITON: equatorial Rossby soliton (2D-only, nondimensional).

Reference fixture: ROMS/Include/soliton.h, ROMS/External/roms_soliton.in
(96x32, DT=0.05, NDTFAST=1, NTIMES=2400), ana_grid.h (Xsize=48, Esize=16,
depth=1, f0=0, beta=1, g=1), ana_initial.h SOLITON section.

The soliton propagates westward preserving its shape; a classic
shallow-water regression with an asymptotic analytic solution.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import Config, LBC
from ..grid import build_grid
from ..ops.step2d import make_fast_state


def make_config(Lm: int = 96, Mm: int = 32, dt: float = 0.05) -> Config:
    return Config(
        name="soliton",
        Lm=Lm, Mm=Mm, N=1, ntracers=0,
        ew_periodic=True, ns_periodic=False,
        dt=dt, ndtfast=1, nfast=1,
        solve3d=False,
        uv_adv=True, uv_cor=True, uv_vis2=False, visc2=0.0,
        bottom_drag="quadratic", rdrg2=3.0e-3,
        g_override=1.0,
        lbc_zeta=LBC.periodic_ew(), lbc_ubar=LBC.periodic_ew(),
        lbc_vbar=LBC.periodic_ew(), lbc_u=LBC.periodic_ew(),
        lbc_v=LBC.periodic_ew(), lbc_t=LBC.periodic_ew(),
    )


def build(cfg: Config | None = None):
    """Returns (cfg, grid, fast_state0)."""
    cfg = cfg or make_config()
    Xsize, Esize = 48.0, 16.0

    def depth_fn(xr, yr, i, j, cfg):
        return np.ones_like(xr)           # flat depth=1

    grid, cfg = build_grid(cfg, Xsize, Esize, f0=0.0, beta=1.0,
                           depth_fn=depth_fn)
    cfg = cfg.replace(nfast=1)            # main2d mode forces nfast=1

    # --- initial soliton (ana_initial.h SOLITON) ---
    x0 = 2.0 * Xsize / 3.0
    y0 = 0.5 * Esize
    val1 = 0.395
    val2 = 0.771 * (val1 * val1)
    xr = np.asarray(grid.xr, dtype=np.float64)
    yr = np.asarray(grid.yr, dtype=np.float64)

    def sech2amp(x):
        e = np.exp(-val1 * x)
        return val2 * ((2.0 * e / (1.0 + e * e)) ** 2)

    x = xr - x0
    y = yr - y0
    zeta = 0.25 * sech2amp(x) * (6.0 * y * y + 3.0) * np.exp(-0.5 * y * y)

    xu = 0.5 * (np.roll(xr, 1, -1) + xr) - x0
    yu = yr - y0
    ubar = 0.25 * sech2amp(xu) * (6.0 * yu * yu - 9.0) * \
        np.exp(-0.5 * yu * yu)

    xv = xr - x0
    yv = 0.5 * (np.roll(yr, 1, -2) + yr) - y0
    vbar = 2.0 * sech2amp(xv) * yv * (-2.0 * val1 * np.tanh(val1 * xv)) * \
        np.exp(-0.5 * yv * yv)

    dtype = jnp.dtype(cfg.dtype)
    from ..ops import bc
    zeta = bc.fill_halo(cfg, jnp.asarray(zeta, dtype=dtype))
    ubar = bc.fill_halo(cfg, jnp.asarray(ubar, dtype=dtype))
    vbar = bc.fill_halo(cfg, jnp.asarray(vbar, dtype=dtype))
    fs = make_fast_state(cfg, zeta, ubar, vbar)
    return cfg, grid, fs
