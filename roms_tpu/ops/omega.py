"""Mass fluxes and diagnostic vertical velocity.

set_massflux (ROMS/Nonlinear/set_massflux.F:121-180) and omega
(ROMS/Nonlinear/omega.F:120-225).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import Config
from ..grid import Grid
from . import bc
from .stencil import ip1, im1, jp1, jm1


def set_massflux(cfg: Config, grid: Grid, u, v, Hz):
    """Huon = 0.5*(Hz_i + Hz_{i-1})*u*on_u, Hvom analog; halos filled
    (the reference exchanges Huon/Hvom after computing them)."""
    Huon = 0.5 * (Hz + im1(Hz)) * u * grid.on_u
    Hvom = 0.5 * (Hz + jm1(Hz)) * v * grid.om_v
    return bc.fill_halo(cfg, Huon), bc.fill_halo(cfg, Hvom)


def omega(cfg: Config, grid: Grid, Huon, Hvom, z_w):
    """S-coordinate vertical mass flux W (N+1,Ny,Nx) from continuity
    (omega.F): bottom-up integral of the horizontal flux divergence, with
    the moving-grid correction that enforces W=0 at the free surface.
    Halo filled with zero-gradient BCs (bc_w3d + exchange)."""
    div = (ip1(Huon) - Huon) + (jp1(Hvom) - Hvom)     # (N,...) at rho
    Wk = -jnp.cumsum(div, axis=0)                     # k=1..N
    wrk = Wk[-1] / (z_w[-1] - z_w[0])
    Wcorr = Wk - wrk * (z_w[1:] - z_w[0])
    # exact zero at the surface and the bottom
    W = jnp.concatenate(
        [jnp.zeros_like(Wk[:1]), Wcorr[:-1], jnp.zeros_like(Wk[:1])],
        axis=0)
    from ..config import LBC, BC_GRADIENT
    grad_all = LBC(BC_GRADIENT, BC_GRADIENT, BC_GRADIENT, BC_GRADIENT)
    return bc.apply_bc_rho(cfg, grad_all, W)
