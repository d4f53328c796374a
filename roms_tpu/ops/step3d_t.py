"""Tracer corrector (reference ROMS/Nonlinear/step3d_t.F).

Horizontal advection of the intermediate tracer t3 with the per-tracer
scheme, vertical advection, implicit vertical diffusion (parabolic-spline
reconstruction under SPLINES_VDIFF, else standard tridiagonal), lateral
BCs.  MPDATA's corrector is not yet implemented (HSIMT/MPDATA planned).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import Config
from ..grid import Grid
from . import bc, obc
from .advection import hadv_fluxes, vadv_flux
from .stencil import ip1, jp1
from .tridiag import spline_vdiff_flux, thomas_implicit


def step3d_t(cfg: Config, grid: Grid, iic, t_nnew, t3, Huon, Hvom, W,
             Hz_new, z_r_new, Akt, t_old=None, bry=None, clm=None,
             sources=None):
    dt = cfg.dt
    pmn = grid.pm * grid.pn
    oHz = 1.0 / Hz_new
    out = []
    for itrc in range(cfg.ntracers):
        hscheme = cfg.t_hadv[itrc]
        vscheme = cfg.t_vadv[itrc]
        if hscheme in ("MPDATA",) or vscheme in ("MPDATA",):
            raise NotImplementedError("MPDATA corrector not yet implemented")

        FX, FE = hadv_fluxes(cfg, hscheme, t3[itrc], Huon, Hvom,
                             grid=grid, Hz=Hz_new, dt=dt)
        if sources is not None:
            from .sources import apply_tracer_flux_sources
            FX, FE = apply_tracer_flux_sources(sources, itrc, FX, FE,
                                               Huon, Hvom)
        tn = t_nnew[itrc] - dt * pmn * ((ip1(FX) - FX) + (jp1(FE) - FE))

        FC = vadv_flux(vscheme, t3[itrc], W, Hz_new, "corrector",
                       z_r=z_r_new, pmn=pmn, dt=dt)
        tn = (tn - dt * pmn * (FC[1:] - FC[:-1])) * oHz

        ltrc = min(1, itrc) if cfg.ntracers >= 2 else 0
        if cfg.splines_vdiff:
            flux = spline_vdiff_flux(dt, Hz_new, oHz, Akt[ltrc], tn)
            tn = tn + dt * oHz * (flux[1:] - flux[:-1])
        else:
            tn = thomas_implicit(dt, 1.0, Hz_new, z_r_new, Akt[ltrc],
                                 tn * Hz_new)

        # nudging toward tracer climatology (step3d_t.F:1172-1185)
        if clm is not None and "tclm" in clm:
            nudg = clm.get("tnudg", 0.0)
            coef = nudg[itrc] if hasattr(nudg, "__len__") else nudg
            tn = tn + dt * coef * (clm["tclm"][itrc] - tn)
        tn = bc.apply_bc_rho(cfg, cfg.lbc_t, tn)
        if t_old is not None and bc.has_advanced(cfg.lbc_t):
            tname = "temp" if itrc == 0 else ("salt" if itrc == 1
                                              else f"trc{itrc}")
            tn = bc.fill_halo(cfg, obc.t3dbc(
                cfg, grid, cfg.lbc_t, t_old[itrc], tn, bry, name=tname))
        out.append(tn)
    return jnp.stack(out, axis=0)
