"""Vertical boundary conditions assembly: surface/bottom kinematic fluxes.

Reference: ROMS/Nonlinear/set_vbc.F (preprocessed UPWELLING path):
heat/salt flux loading, E-P * surface salinity, and bottom drag.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import Config
from ..grid import Grid
from . import bc
from .stencil import im1, jm1, ip1, jp1


def set_vbc(cfg: Config, grid: Grid, u, v, t, stflux, btflux,
            z_r=None, z_w=None):
    """Returns (bustr, bvstr, stflx, btflx).

    u/v: 3-D velocity at nrhs; t: tracers (NT,N,Ny,Nx) at nrhs;
    stflux/btflux: raw surface/bottom tracer fluxes (NT,Ny,Nx) - heat flux
    in degC m/s, freshwater flux E-P in m/s (multiplied here by surface
    salinity, set_vbc.F:139-147).
    """
    stflx = [stflux[0]]
    btflx = [btflux[0]]
    if cfg.ntracers >= 2:
        stflx.append(stflux[1] * t[1, -1])      # EmP * surface salinity
        btflx.append(btflux[1] * t[1, 0])
        for i in range(2, cfg.ntracers):
            stflx.append(stflux[i])
            btflx.append(btflux[i])
    stflx = jnp.stack(stflx, axis=0)
    btflx = jnp.stack(btflx, axis=0)

    # bottom momentum stress (m2/s2) from the bottom-layer velocity
    if cfg.bottom_drag == "linear":
        bustr = cfg.rdrg * u[0]
        bvstr = cfg.rdrg * v[0]
    elif cfg.bottom_drag == "quadratic":
        # set_vbc.F UV_QDRAG: |u_b| * rdrg2 with 4-point averaged cross
        # component at the bottom layer
        ub, vb = u[0], v[0]
        v_at_u = 0.25 * (vb + jp1(vb) + im1(vb) + im1(jp1(vb)))
        u_at_v = 0.25 * (ub + ip1(ub) + jm1(ub) + jm1(ip1(ub)))
        bustr = cfg.rdrg2 * jnp.sqrt(ub * ub + v_at_u * v_at_u) * ub
        bvstr = cfg.rdrg2 * jnp.sqrt(u_at_v * u_at_v + vb * vb) * vb
    elif cfg.bottom_drag == "logarithmic" and z_r is not None:
        # set_vbc.F UV_LOGDRAG: Cd from the log layer at half the bottom
        # cell height, clipped to [Cdb_min, Cdb_max]
        vonKar, Cdb_min, Cdb_max = 0.41, 1.0e-6, 0.5
        cff1 = 1.0 / jnp.log((z_r[0] - z_w[0]) / cfg.zob)
        wrk = jnp.clip(vonKar * vonKar * cff1 * cff1, Cdb_min, Cdb_max)
        ub, vb = u[0], v[0]
        v_at_u = 0.25 * (vb + jp1(vb) + im1(vb) + im1(jp1(vb)))
        u_at_v = 0.25 * (ub + ip1(ub) + jm1(ub) + jm1(ip1(ub)))
        bustr = 0.5 * (wrk + im1(wrk)) * ub * \
            jnp.sqrt(ub * ub + v_at_u * v_at_u)
        bvstr = 0.5 * (wrk + jm1(wrk)) * vb * \
            jnp.sqrt(u_at_v * u_at_v + vb * vb)
    else:
        bustr = jnp.zeros_like(u[0])
        bvstr = jnp.zeros_like(v[0])
    return (bc.fill_halo(cfg, bustr), bc.fill_halo(cfg, bvstr),
            stflx, btflx)
