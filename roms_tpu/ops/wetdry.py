"""Wetting-and-drying masks (WET_DRY).

The analog of ROMS/Nonlinear/wetdry.F + the WET_DRY blocks of
step2d_LF_AM3.h: cells whose total depth falls to the critical depth
Dcrit are flagged dry; momentum faces touching a dry cell only admit
flow INTO the dry cell (rewetting), never out of it.

Mask encoding (wetdry.F wetdry_mask_tile:557-721):
  rmask_wet      : 1 wet / 0 dry at rho points
  u/vmask_wet    : 2 both neighbours wet, 0 both dry,
                   +1 upstream (west/south) wet - downstream dry,
                   -1 upstream dry - downstream wet
  pmask_wet      : 1 all-4 / 3-of-4 wet, 2 edge-adjacent wet pair,
                   0 otherwise (doubles viscous corner stress like the
                   free-slip pmask convention)
The directional limiter (step2d_LF_AM3.h:2123-2131, ...)
  cff5 = | |m| - 1 |                     (0 for +-1, 1 for 0/2)
  cff6 = 0.5 + sign(0.5, x) * m          (1 if x flows toward the dry
                                          cell, 0 if out of it)
  cff7 = 0.5*m*cff5 + cff6*(1 - cff5)    (multiplier in {0, 1})
is applied to the new velocity (and the stored rhs / rufrc in 3-D
mode) after stepping, each fast substep, with masks recomputed from
zeta at the kstp level.  The per-substep rho masks are also summed
into rmask_wet_avg; at the auxiliary substep the average is floored
to a wet-everywhen mask and combined with the sign of DU_avg1/DV_avg1
into the face masks used by the slow 3-D kernels
(wetdry.F wetdry_avg_mask_tile:726-930).

Note the reference's WET_DRY_LIMIT rhs pre-limiter
(step2d_LF_AM3.h:1848-1864) is never #defined anywhere and is
therefore dead code; it is intentionally not reproduced here.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import Config
from .stencil import im1, jm1

_EPS = 1.0e-10


def rho_wet(cfg: Config, grid, zeta):
    """1/0 wet mask at rho points (wetdry.F:194-204)."""
    wd = jnp.where(zeta + grid.h <= cfg.dcrit + _EPS, 0.0, 1.0)
    return wd * grid.rmask


def face_masks(wd):
    """(umask_wet, vmask_wet) in the {0, +-1, 2} encoding."""
    def face(wm):
        s = wm + wd
        return jnp.where(s == 1.0, wm - wd, s)
    return face(im1(wd)), face(jm1(wd))


def psi_wet(wd):
    """pmask_wet at psi points from the 4 surrounding rho wet flags:
    >=3 wet -> 1; exactly 2 wet sharing an edge -> 2; else 0."""
    a = im1(jm1(wd))   # (i-1, j-1)
    b = jm1(wd)        # (i,   j-1)
    c = im1(wd)        # (i-1, j  )
    d = wd             # (i,   j  )
    nwet = a + b + c + d
    # edge-adjacent wet pair: the two wet cells form a column or a row
    adjacent = jnp.logical_or(
        jnp.logical_and(a == c, b == d),   # columns homogeneous
        jnp.logical_and(a == b, c == d))   # rows homogeneous
    return jnp.where(nwet >= 3.0, 1.0,
                     jnp.where(jnp.logical_and(nwet == 2.0, adjacent),
                               2.0, 0.0))


def limit(m, x):
    """Directional wet/dry multiplier cff7 in {0,1} for flow x through a
    face with mask code m; blocks outflow from dry cells."""
    cff5 = jnp.abs(jnp.abs(m) - 1.0)
    half_sign = jnp.where(x >= 0.0, 0.5, -0.5)
    cff6 = 0.5 + half_sign * m
    return 0.5 * m * cff5 + cff6 * (1.0 - cff5)


def avg_face_masks(wd_avg, DU_avg1, DV_avg1):
    """Fast-time-averaged directional face masks for the 3-D kernels
    (wetdry_avg_mask_tile:786-824): the {0,+-1,2} code is collapsed to
    {0,1} using the sign of the fast-averaged transport, with lone
    ponds (zero transport next to a dry cell) forced dry."""
    def one(wm, flux):
        s = wm + wd_avg
        m = jnp.where(s == 1.0, wm - wd_avg, s)
        msk = limit(m, flux)
        lone = jnp.logical_and(flux == 0.0, s <= 1.0)
        return jnp.where(lone, 0.0, msk)
    return one(im1(wd_avg), DU_avg1), one(jm1(wd_avg), DV_avg1)


def clamp_zeta(cfg: Config, grid, zeta):
    """Keep depth == Dcrit on land-masked cells
    (step2d_LF_AM3.h:855-866)."""
    return zeta + (cfg.dcrit - grid.h) * (1.0 - grid.rmask)
