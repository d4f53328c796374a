"""Baroclinic pressure gradient.

Default scheme "djs": splines density Jacobian (Shchepetkin & McWilliams
2003), reference ROMS/Nonlinear/prsgrd32.h (CPP DJ_GRADPS).  Alternative
"dj": standard density Jacobian (prsgrd31.h).

Returns the contribution to ru/rv (m4/s2; multiplied by Hz and the cell
width as in the reference).  Arrays are [k, j, i], k=0 bottom.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import constants as C
from ..config import Config
from .stencil import im1, jm1

_EPS = 1.0e-10


def _harm_clamped(a, b):
    """ROMS monotonized harmonic mean: 2ab/(a+b) where 2ab > eps, else 0.

    The denominator is guarded inside the untaken branch so reverse-mode
    differentiation does not propagate 0/0 NaNs (jax where-grad rule)."""
    cff = 2.0 * a * b
    safe = jnp.where(cff > _EPS, a + b, 1.0)
    return jnp.where(cff > _EPS, cff / safe, 0.0)


def prsgrd32(cfg: Config, grid, rho, z_r, z_w, Hz):
    """Splines density-Jacobian pressure gradient (prsgrd32.h:119-285)."""
    g = C.g
    GRho = g / cfg.rho0
    HalfGRho = 0.5 * GRho
    OneFifth = 0.2
    OneTwelfth = 1.0 / 12.0

    # ---- vertical monotonized differences (prsgrd32.h:134-160) ----
    dR = rho[1:] - rho[:-1]            # ROMS dR(k), k=1..N-1
    dZ = z_r[1:] - z_r[:-1]
    dR = jnp.concatenate([dR[:1], dR, dR[-1:]], axis=0)   # pad k=0 and k=N
    dZ = jnp.concatenate([dZ[:1], dZ, dZ[-1:]], axis=0)
    dRm = _harm_clamped(dR[1:], dR[:-1])                  # at rho k=1..N
    dZm = 2.0 * dZ[1:] * dZ[:-1] / (dZ[1:] + dZ[:-1])

    # ---- kinematic pressure P/rho0 (prsgrd32.h:162-186) ----
    zwN = z_w[-1]
    cff2 = 0.5 * (rho[-1] - rho[-2]) * (zwN - z_r[-1]) / (z_r[-1] - z_r[-2])
    P_top = g * zwN + GRho * (rho[-1] + cff2) * (zwN - z_r[-1])
    # increment between rho levels k and k+1 (index 0..N-2)
    inc = HalfGRho * (
        (rho[1:] + rho[:-1]) * (z_r[1:] - z_r[:-1]) -
        OneFifth * ((dRm[1:] - dRm[:-1]) *
                    (z_r[1:] - z_r[:-1] - OneTwelfth * (dZm[1:] + dZm[:-1])) -
                    (dZm[1:] - dZm[:-1]) *
                    (rho[1:] - rho[:-1] - OneTwelfth * (dRm[1:] + dRm[:-1]))))
    # P[k] = P_top + sum_{m>=k} inc[m]
    P = jnp.concatenate(
        [P_top[None] + jnp.cumsum(inc[::-1], axis=0)[::-1],
         P_top[None]], axis=0)

    # ---- XI-component (prsgrd32.h:188-238) ----
    dzu = z_r - im1(z_r)               # at u points
    dru = rho - im1(rho)
    dZx = _harm_clamped(dzu, jnp.roll(dzu, -1, -1))       # at rho points
    dRx = _harm_clamped(dru, jnp.roll(dru, -1, -1))
    ru_pg = grid.on_u * 0.5 * (Hz + im1(Hz)) * (
        im1(P) - P - HalfGRho * (
            (rho + im1(rho)) * dzu -
            OneFifth * ((dRx - im1(dRx)) *
                        (dzu - OneTwelfth * (dZx + im1(dZx))) -
                        (dZx - im1(dZx)) *
                        (dru - OneTwelfth * (dRx + im1(dRx))))))

    # ---- ETA-component (prsgrd32.h:240-285) ----
    dzv = z_r - jm1(z_r)
    drv = rho - jm1(rho)
    dZe = _harm_clamped(dzv, jnp.roll(dzv, -1, -2))
    dRe = _harm_clamped(drv, jnp.roll(drv, -1, -2))
    rv_pg = grid.om_v * 0.5 * (Hz + jm1(Hz)) * (
        jm1(P) - P - HalfGRho * (
            (rho + jm1(rho)) * dzv -
            OneFifth * ((dRe - jm1(dRe)) *
                        (dzv - OneTwelfth * (dZe + jm1(dZe))) -
                        (dZe - jm1(dZe)) *
                        (drv - OneTwelfth * (dRe + jm1(dRe))))))
    return ru_pg, rv_pg


def _dj_component(cfg: Config, rho, z_r, z_w, Hz, dm1, width):
    """One direction of the standard density Jacobian (prsgrd31.h).

    dm1: lateral shift operator (im1 for XI at u-points, jm1 for ETA);
    width: on_u or om_v.
    """
    g = C.g
    fac1 = 0.5 * g / cfg.rho0
    fac2 = 1000.0 * g / cfg.rho0
    fac3 = 0.25 * g / cfg.rho0

    # surface contribution (prsgrd31.h surface block)
    cff1 = (z_w[-1] - z_r[-1]) + (dm1(z_w[-1]) - dm1(z_r[-1]))
    phi_top = fac1 * (rho[-1] - dm1(rho[-1])) * cff1 + \
        (fac2 + fac1 * (rho[-1] + dm1(rho[-1]))) * (z_w[-1] - dm1(z_w[-1]))

    # interior increments k = N-1..1: weighted density Jacobian with the
    # gamma curvature weight (prsgrd31.h interior block)
    dz_hi = z_r[1:] - z_r[:-1]                     # own column
    dz_lo = dm1(z_r[1:]) - dm1(z_r[:-1])           # neighbor column
    cg1 = 1.0 / (dz_hi * dz_lo)
    cg2 = (z_r[:-1] - dm1(z_r[:-1])) + (z_r[1:] - dm1(z_r[1:]))
    cg3 = dz_hi - dz_lo
    gamma = 0.125 * cg1 * cg2 * cg3

    c1 = (1.0 + gamma) * (rho[1:] - dm1(rho[1:])) + \
        (1.0 - gamma) * (rho[:-1] - dm1(rho[:-1]))
    c2 = (rho[1:] + dm1(rho[1:])) - (rho[:-1] + dm1(rho[:-1]))
    c3 = (z_r[1:] + dm1(z_r[1:])) - (z_r[:-1] + dm1(z_r[:-1]))
    c4 = (1.0 + gamma) * (z_r[1:] - dm1(z_r[1:])) + \
        (1.0 - gamma) * (z_r[:-1] - dm1(z_r[:-1]))
    inc = fac3 * (c1 * c3 - c2 * c4)

    # phi[k] = phi_top + sum_{m>k} inc[m]
    phi = jnp.concatenate(
        [phi_top[None] + jnp.cumsum(inc[::-1], axis=0)[::-1],
         phi_top[None]], axis=0)
    return -0.5 * (Hz + dm1(Hz)) * phi * width


def prsgrd31(cfg: Config, grid, rho, z_r, z_w, Hz):
    ru_pg = _dj_component(cfg, rho, z_r, z_w, Hz, im1, grid.on_u)
    rv_pg = _dj_component(cfg, rho, z_r, z_w, Hz, jm1, grid.om_v)
    return ru_pg, rv_pg


def prsgrd(cfg: Config, grid, rho, z_r, z_w, Hz):
    if cfg.prsgrd_scheme == "djs":
        return prsgrd32(cfg, grid, rho, z_r, z_w, Hz)
    if cfg.prsgrd_scheme == "dj":
        return prsgrd31(cfg, grid, rho, z_r, z_w, Hz)
    raise ValueError(f"unknown prsgrd scheme {cfg.prsgrd_scheme}")
