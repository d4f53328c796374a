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


# HSIMT TVD limiter coefficients (Wu & Zhu 2010; mod_scalars.F:375-377)
_CC1, _CC2, _CC3 = 0.25, 0.5, 1.0 / 12.0
_EPS1 = 1.0e-12


def _hsimt_sw(q_up, q_dn, grad_c, grad_up, Ka_c, Ka_up):
    """HSIMT upwinded face value for one flow direction: q_up is the
    upstream cell, grad_c the face gradient, grad_up the next-upstream
    face gradient, Ka the antidiffusion factors (step3d_t.F:300-430)."""
    oKa_c = jnp.where(Ka_c <= _EPS1, 0.0,
                      1.0 / jnp.maximum(Ka_c, _EPS1))
    small = jnp.abs(grad_c) <= _EPS1
    safe = jnp.where(small, 1.0, grad_c)
    r = jnp.where(small, 0.0, grad_up / safe)
    rka = jnp.where(small, 0.0, Ka_up * oKa_c)
    a1 = _CC1 * Ka_c + _CC2 - _CC3 * oKa_c
    b1 = -_CC1 * Ka_c + _CC2 + _CC3 * oKa_c
    beta = a1 + b1 * r
    lim = jnp.maximum(0.0, jnp.minimum(jnp.minimum(2.0, 2.0 * r * rka),
                                       beta))
    return q_up + 0.5 * lim * grad_c * Ka_c


def hadv_fluxes(cfg: Config, scheme: str, q, Huon, Hvom,
                grid=None, Hz=None, dt=None):
    """Horizontal advective fluxes (FX at u-points, FE at v-points) of a
    3-D tracer plane stack q (N,Ny,Nx) at one time level.

    Reference: pre_step3d.F:336-523 / step3d_t.F:227-564.  HSIMT needs
    grid/Hz/dt for the Courant-number antidiffusion factors.
    """
    H = cfg.halo
    L, M = cfg.Lm, cfg.Mm
    if scheme == "HSIMT":
        pm, pn = grid.pm, grid.pn
        oHz = 1.0 / Hz
        cffx = 0.125 * (pn + im1(pn)) * (pm + im1(pm)) * dt
        KaX = 1.0 - jnp.abs(Huon * cffx * (oHz + im1(oHz)))
        gradX = q - im1(q)
        if not cfg.ew_periodic:
            # inflow edges: zero gradient/Ka beyond the boundary
            # (step3d_t.F HSIMT west/east special cases)
            inflow_w = Huon[..., :, H:H + 1] >= 0.0
            gradX = bc.set_col(gradX, H - 1, jnp.where(
                inflow_w[..., :, 0], 0.0, gradX[..., :, H - 1]), "west")
            KaX = bc.set_col(KaX, H - 1, jnp.where(
                inflow_w[..., :, 0], 0.0, KaX[..., :, H - 1]), "west")
            inflow_e = Huon[..., :, H + L:H + L + 1] < 0.0
            gradX = bc.set_col(gradX, H + L + 1, jnp.where(
                inflow_e[..., :, 0], 0.0, gradX[..., :, H + L + 1]), "east")
            KaX = bc.set_col(KaX, H + L + 1, jnp.where(
                inflow_e[..., :, 0], 0.0, KaX[..., :, H + L + 1]), "east")
        sw_pos = _hsimt_sw(im1(q), q, gradX, im1(gradX), KaX, im1(KaX))
        sw_neg = _hsimt_sw(q, im1(q), -gradX, -ip1(gradX), KaX, ip1(KaX))
        FX = jnp.where(Huon >= 0.0, sw_pos, sw_neg) * Huon

        cffe = 0.125 * (pn + jm1(pn)) * (pm + jm1(pm)) * dt
        KaE = 1.0 - jnp.abs(Hvom * cffe * (oHz + jm1(oHz)))
        gradE = q - jm1(q)
        if not cfg.ns_periodic:
            inflow_s = Hvom[..., H:H + 1, :] >= 0.0
            gradE = bc.set_row(gradE, H - 1, jnp.where(
                inflow_s[..., 0, :], 0.0, gradE[..., H - 1, :]), "south")
            KaE = bc.set_row(KaE, H - 1, jnp.where(
                inflow_s[..., 0, :], 0.0, KaE[..., H - 1, :]), "south")
            inflow_n = Hvom[..., H + M:H + M + 1, :] < 0.0
            gradE = bc.set_row(gradE, H + M + 1, jnp.where(
                inflow_n[..., 0, :], 0.0, gradE[..., H + M + 1, :]), "north")
            KaE = bc.set_row(KaE, H + M + 1, jnp.where(
                inflow_n[..., 0, :], 0.0, KaE[..., H + M + 1, :]), "north")
        sw_pos = _hsimt_sw(jm1(q), q, gradE, jm1(gradE), KaE, jm1(KaE))
        sw_neg = _hsimt_sw(q, jm1(q), -gradE, -jp1(gradE), KaE, jp1(KaE))
        FE = jnp.where(Hvom >= 0.0, sw_pos, sw_neg) * Hvom
        return FX, FE
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


def vadv_flux(scheme: str, q, W, Hz, spline_variant: str,
              z_r=None, pmn=None, dt=None):
    """Vertical advective flux at interfaces (N+1,Ny,Nx); flux[0]=flux[N]=0.

    spline_variant: "predictor" (pre_step3d.F:436-470 end conditions
    1.5/0.5/3/2) or "corrector" (step3d_t.F:633-666: 2/1/2/1).
    """
    N = q.shape[0]
    zero = jnp.zeros_like(q[:1])
    if scheme == "HSIMT":
        # vertical HSIMT-TVD (step3d_t.F:739-800)
        KaZ = 1.0 - jnp.abs(pmn * dt * W[1:-1] / (z_r[1:] - z_r[:-1]))
        gradZ = q[1:] - q[:-1]                     # interfaces k=1..N-1
        pad0 = jnp.zeros_like(gradZ[:1])
        Ka_dn = jnp.concatenate([pad0, KaZ[:-1]], axis=0)    # KaZ(k-1)
        Ka_up = jnp.concatenate([KaZ[1:], pad0], axis=0)     # KaZ(k+1)
        g_dn = jnp.concatenate([pad0, gradZ[:-1]], axis=0)
        g_up = jnp.concatenate([gradZ[1:], pad0], axis=0)
        sw_pos = _hsimt_sw(q[:-1], q[1:], gradZ, g_dn, KaZ, Ka_dn)
        sw_neg = _hsimt_sw(q[1:], q[:-1], -gradZ, -g_up, KaZ, Ka_up)
        sw = jnp.where(W[1:-1] >= 0.0, sw_pos, sw_neg)
        # first/last interface pure upwind when flow leaves the column
        sw = sw.at[0].set(jnp.where(W[1] >= 0.0, q[0], sw[0]))
        sw = sw.at[-1].set(jnp.where(W[N - 1] < 0.0, q[N - 1], sw[-1]))
        flux = W[1:-1] * sw
        return jnp.concatenate([zero, flux, zero], axis=0)
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
