"""Lateral boundary conditions and halo filling.

Replaces the reference's per-field BC kernels (ROMS/Nonlinear/zetabc.F,
u2dbc_im.F, v2dbc_im.F, u3dbc_im.F, v3dbc_im.F, t3dbc_im.F, bc_2d/3d.F) and
the periodic exchange (exchange_2d.F) for the single-device path.  The
sharded path reuses the same per-side appliers at global edges, with interior
halos filled by ppermute (roms_tpu/parallel/halo.py).

Index map (ops/stencil.py): padded array index a = roms_index + H - 1.
Boundary rho ring: west a=H-1, east a=H+Lm; u-wall west a=H, east a=H+Lm;
south a=H-1 / v-wall a=H, north a=H+Mm.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import (Config, BC_PERIODIC, BC_CLOSED, BC_GRADIENT,
                      BC_CLAMPED, BC_RADIATION, BC_CHAPMAN_EXPLICIT,
                      BC_CHAPMAN_IMPLICIT, BC_FLATHER, LBC)

_ADVANCED = {BC_RADIATION, BC_CHAPMAN_EXPLICIT, BC_CHAPMAN_IMPLICIT,
             BC_FLATHER, BC_CLAMPED}


def has_advanced(lbc: LBC) -> bool:
    """True when any side uses an active/open BC (radiation, Chapman,
    Flather, clamped) that needs the previous time level / external data
    (handled by ops/obc.py)."""
    return any(getattr(lbc, s) in _ADVANCED
               for s in ("west", "south", "east", "north"))


# ---------------------------------------------------------------------------
# Halo filling (the single-device analog of mp_exchange / exchange_2d)
# ---------------------------------------------------------------------------
def fill_halo(cfg: Config, f):
    """Fill the halo ring: periodic wrap (period Lm/Mm) in periodic
    directions, edge replication in closed directions.

    Replicated cells are never read by valid stencil math (kernels apply the
    reference's one-sided edge corrections), they only keep the halo free of
    stale values.  Works on any [..., j, i] array.
    """
    H = cfg.halo
    L, M = cfg.Lm, cfg.Mm
    if cfg.ew_periodic:
        # west halo a<H from a+L, east halo a>=H+L from a-L
        f = jnp.concatenate(
            [f[..., L:L + H], f[..., H:H + L], f[..., H:H + H]], axis=-1)
    else:
        west = jnp.repeat(f[..., H - 1:H], H - 1, axis=-1)
        east = jnp.repeat(f[..., H + L:H + L + 1], H - 1, axis=-1)
        f = jnp.concatenate(
            [west, f[..., H - 1:H + L + 1], east], axis=-1)
    if cfg.ns_periodic:
        f = jnp.concatenate(
            [f[..., M:M + H, :], f[..., H:H + M, :], f[..., H:H + H, :]],
            axis=-2)
    else:
        south = jnp.repeat(f[..., H - 1:H, :], H - 1, axis=-2)
        north = jnp.repeat(f[..., H + M:H + M + 1, :], H - 1, axis=-2)
        f = jnp.concatenate(
            [south, f[..., H - 1:H + M + 1, :], north], axis=-2)
    return f


# ---------------------------------------------------------------------------
# Per-side appliers for 2-D (and leading-dim batched) fields
# ---------------------------------------------------------------------------
def _set_col(f, a_dst, values):
    return f.at[..., :, a_dst].set(values)


def _set_row(f, a_dst, values):
    return f.at[..., a_dst, :].set(values)


def apply_bc_rho(cfg: Config, lbc: LBC, f, mask=None, clamp=None):
    """BCs for a rho-point field (zeta-like; zetabc.F:236-700 closed ≡
    zero-gradient onto the boundary ring)."""
    H = cfg.halo
    L, M = cfg.Lm, cfg.Mm
    if not cfg.ew_periodic:
        if lbc.west in (BC_CLOSED, BC_GRADIENT):
            f = _set_col(f, H - 1, f[..., :, H])
        elif lbc.west == BC_CLAMPED and clamp is not None:
            f = _set_col(f, H - 1, clamp["west"])
        if lbc.east in (BC_CLOSED, BC_GRADIENT):
            f = _set_col(f, H + L, f[..., :, H + L - 1])
        elif lbc.east == BC_CLAMPED and clamp is not None:
            f = _set_col(f, H + L, clamp["east"])
    if not cfg.ns_periodic:
        if lbc.south in (BC_CLOSED, BC_GRADIENT):
            f = _set_row(f, H - 1, f[..., H, :])
        elif lbc.south == BC_CLAMPED and clamp is not None:
            f = _set_row(f, H - 1, clamp["south"])
        if lbc.north in (BC_CLOSED, BC_GRADIENT):
            f = _set_row(f, H + M, f[..., H + M - 1, :])
        elif lbc.north == BC_CLAMPED and clamp is not None:
            f = _set_row(f, H + M, clamp["north"])
    if mask is not None:
        f = f * mask
    return fill_halo(cfg, f)


def apply_bc_u(cfg: Config, lbc: LBC, f, gamma2: float = 1.0, mask=None):
    """BCs for a u-point field (ubar/u; u2dbc_im.F).

    West/east are the *normal* direction (closed -> u=0 on the wall face);
    south/north are tangential (closed -> gamma2 slip against the interior
    row; u2dbc_im.F:960-1135).
    """
    H = cfg.halo
    L, M = cfg.Lm, cfg.Mm
    if not cfg.ew_periodic:
        if lbc.west == BC_CLOSED:
            f = _set_col(f, H, jnp.zeros_like(f[..., :, H]))
        elif lbc.west == BC_GRADIENT:
            f = _set_col(f, H, f[..., :, H + 1])
        # pin the u ghost column west of the boundary face: it has no
        # reference counterpart (u starts at i=1) and is the source
        # column for the halo fill - left untouched it integrates
        # garbage through the kernels and eventually overflows
        f = _set_col(f, H - 1, f[..., :, H])
        if lbc.east == BC_CLOSED:
            f = _set_col(f, H + L, jnp.zeros_like(f[..., :, H + L]))
        elif lbc.east == BC_GRADIENT:
            f = _set_col(f, H + L, f[..., :, H + L - 1])
    if not cfg.ns_periodic:
        if lbc.south == BC_CLOSED:
            f = _set_row(f, H - 1, gamma2 * f[..., H, :])
        elif lbc.south == BC_GRADIENT:
            f = _set_row(f, H - 1, f[..., H, :])
        if lbc.north == BC_CLOSED:
            f = _set_row(f, H + M, gamma2 * f[..., H + M - 1, :])
        elif lbc.north == BC_GRADIENT:
            f = _set_row(f, H + M, f[..., H + M - 1, :])
    if mask is not None:
        f = f * mask
    return fill_halo(cfg, f)


def apply_bc_v(cfg: Config, lbc: LBC, f, gamma2: float = 1.0, mask=None):
    """BCs for a v-point field (vbar/v; v2dbc_im.F).

    South/north are normal (closed -> v=0 on the wall face, v2dbc_im.F
    closed sections); west/east tangential (gamma2 slip).
    """
    H = cfg.halo
    L, M = cfg.Lm, cfg.Mm
    if not cfg.ns_periodic:
        if lbc.south == BC_CLOSED:
            f = _set_row(f, H, jnp.zeros_like(f[..., H, :]))
        elif lbc.south == BC_GRADIENT:
            f = _set_row(f, H, f[..., H + 1, :])
        # pin the v ghost row south of the boundary face (see apply_bc_u)
        f = _set_row(f, H - 1, f[..., H, :])
        if lbc.north == BC_CLOSED:
            f = _set_row(f, H + M, jnp.zeros_like(f[..., H + M, :]))
        elif lbc.north == BC_GRADIENT:
            f = _set_row(f, H + M, f[..., H + M - 1, :])
    if not cfg.ew_periodic:
        if lbc.west == BC_CLOSED:
            f = _set_col(f, H - 1, gamma2 * f[..., :, H])
        elif lbc.west == BC_GRADIENT:
            f = _set_col(f, H - 1, f[..., :, H])
        if lbc.east == BC_CLOSED:
            f = _set_col(f, H + L, gamma2 * f[..., :, H + L - 1])
        elif lbc.east == BC_GRADIENT:
            f = _set_col(f, H + L, f[..., :, H + L - 1])
    if mask is not None:
        f = f * mask
    return fill_halo(cfg, f)


# ---------------------------------------------------------------------------
# Edge corrections for wide stencils (the reference's one-sided grad
# extrapolations at non-periodic edges, e.g. step2d_LF_AM3.h 4th-order
# advection "grad(Istr,j)=grad(Istr+1,j)")
# ---------------------------------------------------------------------------
def extrap_west(cfg: Config, g, a: int):
    """g[:, a] = g[:, a+1] at a non-periodic western edge."""
    if cfg.ew_periodic:
        return g
    return g.at[..., :, a].set(g[..., :, a + 1])


def extrap_east(cfg: Config, g, a: int):
    if cfg.ew_periodic:
        return g
    return g.at[..., :, a].set(g[..., :, a - 1])


def extrap_south(cfg: Config, g, a: int):
    if cfg.ns_periodic:
        return g
    return g.at[..., a, :].set(g[..., a + 1, :])


def extrap_north(cfg: Config, g, a: int):
    if cfg.ns_periodic:
        return g
    return g.at[..., a, :].set(g[..., a - 1, :])
