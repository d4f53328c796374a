"""Tracer advection flux builders, shared by the predictor (pre_step3d.F)
and corrector (step3d_t.F) stages.

Horizontal schemes (Hadvection switches, tadv.F:146-178): C2 (centered2),
U1 (upstream1, used internally by MPDATA/HSIMT), U3 (upstream3 with
velocity-dependent hyperdiffusion), C4 (centered4), A4 (Akima4).
Vertical schemes: SPLINES, A4, C2, C4, U1.

All fluxes carry the reference's units (Tunits m3/s): FX/FE include
Huon/Hvom; vertical flux includes W.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import Config
from . import bc
from .stencil import ip1, im1, jp1, jm1
from .tridiag import spline_interp_flux

_EPS = 1.0e-16


def hadv_fluxes(cfg: Config, scheme: str, q, Huon, Hvom):
    """Horizontal advective fluxes (FX at u-points, FE at v-points) of a
    3-D tracer plane stack q (N,Ny,Nx) at one time level.

    Reference: pre_step3d.F:336-523 / step3d_t.F:227-564.
    """
    H = cfg.halo
    L, M = cfg.Lm, cfg.Mm
    if scheme == "C2":
        FX = Huon * 0.5 * (im1(q) + q)
        FE = Hvom * 0.5 * (jm1(q) + q)
        return FX, FE
    if scheme == "U1":
        FX = jnp.maximum(Huon, 0.0) * im1(q) + jnp.minimum(Huon, 0.0) * q
        FE = jnp.maximum(Hvom, 0.0) * jm1(q) + jnp.minimum(Hvom, 0.0) * q
        return FX, FE
    if scheme in ("U3", "C4", "A4"):
        # xi-direction: first differences at u-points with one-sided edge
        # extrapolation (FX(Istr-1)=FX(Istr) etc.)
        dq = q - im1(q)
        dq = bc.extrap_west(cfg, dq, H - 1)        # a(Istr-1)=H-1
        dq = bc.extrap_east(cfg, dq, H + L + 1)    # a(Iend+2)=H+L+1
        if scheme == "U3":
            curv = ip1(dq) - dq                    # at rho points
            FX = Huon * 0.5 * (im1(q) + q) - (1.0 / 6.0) * (
                im1(curv) * jnp.maximum(Huon, 0.0) +
                curv * jnp.minimum(Huon, 0.0))
        else:
            if scheme == "A4":
                cff = 2.0 * ip1(dq) * dq
                den = jnp.where(cff > _EPS, ip1(dq) + dq, 1.0)
                grad = jnp.where(cff > _EPS, cff / den, 0.0)
            else:
                grad = 0.5 * (ip1(dq) + dq)
            FX = Huon * 0.5 * (im1(q) + q - (1.0 / 3.0) * (grad - im1(grad)))

        # eta-direction
        dq = q - jm1(q)
        dq = bc.extrap_south(cfg, dq, H - 1)
        dq = bc.extrap_north(cfg, dq, H + M + 1)
        if scheme == "U3":
            curv = jp1(dq) - dq
            FE = Hvom * 0.5 * (jm1(q) + q) - (1.0 / 6.0) * (
                jm1(curv) * jnp.maximum(Hvom, 0.0) +
                curv * jnp.minimum(Hvom, 0.0))
        else:
            if scheme == "A4":
                cff = 2.0 * jp1(dq) * dq
                den = jnp.where(cff > _EPS, jp1(dq) + dq, 1.0)
                grad = jnp.where(cff > _EPS, cff / den, 0.0)
            else:
                grad = 0.5 * (jp1(dq) + dq)
            FE = Hvom * 0.5 * (jm1(q) + q - (1.0 / 3.0) * (grad - jm1(grad)))
        return FX, FE
    raise ValueError(f"unknown horizontal advection scheme {scheme}")


def vadv_flux(scheme: str, q, W, Hz, spline_variant: str):
    """Vertical advective flux at interfaces (N+1,Ny,Nx); flux[0]=flux[N]=0.

    spline_variant: "predictor" (pre_step3d.F:436-470 end conditions
    1.5/0.5/3/2) or "corrector" (step3d_t.F:633-666: 2/1/2/1).
    """
    N = q.shape[0]
    zero = jnp.zeros_like(q[:1])
    if scheme == "SPLINES":
        if spline_variant == "predictor":
            return spline_interp_flux(Hz, q, W, 1.5, 0.5, 3.0, 2.0)
        return spline_interp_flux(Hz, q, W, 2.0, 1.0, 2.0, 1.0)
    if scheme == "C2":
        flux = W[1:-1] * 0.5 * (q[:-1] + q[1:])
        return jnp.concatenate([zero, flux, zero], axis=0)
    if scheme == "U1":
        flux = jnp.maximum(W[1:-1], 0.0) * q[:-1] + \
            jnp.minimum(W[1:-1], 0.0) * q[1:]
        return jnp.concatenate([zero, flux, zero], axis=0)
    if scheme == "A4":
        # Akima monotonized 4th order (pre_step3d.F:486-516)
        d = q[1:] - q[:-1]                       # k=1..N-1
        d = jnp.concatenate([d[:1], d, d[-1:]], axis=0)   # pad -> k=0..N
        cff = 2.0 * d[1:] * d[:-1]
        den = jnp.where(cff > _EPS, d[1:] + d[:-1], 1.0)
        CFk = jnp.where(cff > _EPS, cff / den, 0.0)  # k=1..N
        flux = W[1:-1] * 0.5 * (q[:-1] + q[1:] -
                                (1.0 / 3.0) * (CFk[1:] - CFk[:-1]))
        return jnp.concatenate([zero, flux, zero], axis=0)
    if scheme == "C4":
        # 4th-order centered with reduced-order end interfaces
        # (pre_step3d.F:527-556 / step3d_t.F:804-833)
        c1, c2, c3 = 0.5, 7.0 / 12.0, 1.0 / 12.0
        # interior interfaces k=2..N-2
        flux_int = W[2:-2] * (c2 * (q[1:-2] + q[2:-1]) -
                              c3 * (q[:-3] + q[3:]))
        f1 = (W[1] * (c1 * q[0] + c2 * q[1] - c3 * q[2]))[None]
        fNm1 = (W[N - 1] * (c1 * q[N - 1] + c2 * q[N - 2] -
                            c3 * q[N - 3]))[None]
        return jnp.concatenate([zero, f1, flux_int, fNm1, zero], axis=0)
    raise ValueError(f"unknown vertical advection scheme {scheme}")
