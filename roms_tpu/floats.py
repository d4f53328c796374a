"""Lagrangian floats (drifter trajectories).

Reference: ROMS/Nonlinear/step_floats.F (4th-order Milne predictor +
Hamming corrector multistep) with velocity interpolation to float
positions (interp_floats.F).  Positions are carried in fractional grid
coordinates (the reference's track(ixgrd/iygrd/izgrd)): xg = ROMS rho
i-index, zg in w-level units [0, N].

Vectorized over floats; trajectories are a (4-level, nfloats) history
pytree suitable for lax.scan stepping alongside the model state.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .config import Config
from .grid import Grid


class FloatsState(NamedTuple):
    """Position and velocity history (time levels n-3..n, nfloats)."""
    xg: jax.Array      # (4, nf) fractional rho i-index
    yg: jax.Array
    zg: jax.Array      # (4, nf) w-level units
    ug: jax.Array      # (4, nf) dxg/dt histories (1/s grid units)
    vg: jax.Array
    wg: jax.Array
    nsteps: jax.Array  # scalar: completed float steps (for startup)


def init_floats(x0, y0, z0) -> FloatsState:
    rep = lambda a: jnp.broadcast_to(jnp.asarray(a), (4,) + jnp.shape(a))
    z = jnp.zeros_like(jnp.asarray(x0, dtype=jnp.result_type(float)))
    return FloatsState(
        xg=rep(x0) + 0.0, yg=rep(y0) + 0.0, zg=rep(z0) + 0.0,
        ug=rep(z), vg=rep(z), wg=rep(z),
        nsteps=jnp.asarray(0))


def _bilinear(field2, x, y):
    """Bilinear sample of a 2-D padded array at fractional array coords."""
    i1 = jnp.floor(x).astype(jnp.int32)
    j1 = jnp.floor(y).astype(jnp.int32)
    p2 = x - i1
    q2 = y - j1
    p1 = 1.0 - p2
    q1 = 1.0 - q2
    f = field2
    return (p1 * q1 * f[j1, i1] + p2 * q1 * f[j1, i1 + 1] +
            p1 * q2 * f[j1 + 1, i1] + p2 * q2 * f[j1 + 1, i1 + 1])


def _trilinear(field3, x, y, zlev):
    """Linear-in-k of bilinear horizontal samples; zlev in rho-level
    fractional units (level k at zlev = k - 0.5, k = 1..N)."""
    N = field3.shape[0]
    zc = jnp.clip(zlev - 0.5, 0.0, N - 1.0)
    k1 = jnp.clip(jnp.floor(zc).astype(jnp.int32), 0, N - 2)
    r2 = jnp.clip(zc - k1, 0.0, 1.0)
    lo = _bilinear_gather(field3, k1, x, y)
    hi = _bilinear_gather(field3, k1 + 1, x, y)
    return (1.0 - r2) * lo + r2 * hi


def _bilinear_gather(field3, k, x, y):
    i1 = jnp.floor(x).astype(jnp.int32)
    j1 = jnp.floor(y).astype(jnp.int32)
    p2 = x - i1
    q2 = y - j1
    p1 = 1.0 - p2
    q1 = 1.0 - q2
    f = field3
    return (p1 * q1 * f[k, j1, i1] + p2 * q1 * f[k, j1, i1 + 1] +
            p1 * q2 * f[k, j1 + 1, i1] + p2 * q2 * f[k, j1 + 1, i1 + 1])


def _grid_velocity(cfg: Config, grid: Grid, u, v, W, Hz, fl: FloatsState,
                   xg, yg, zg):
    """Velocities in grid units at float positions (interp_floats.F):
    dxg/dt = u*pm at u-points, dzg/dt = omega/Hz at w-points."""
    H = cfg.halo
    off = H - 1.0
    # rho(i) center is at xg = i; its array index is i + H - 1, so the
    # array-space sampling coordinate is xg + off.  u(i) sits at
    # xg = i - 0.5 -> array coordinate (xg + 0.5) + off; v analogous.
    xr = xg + off
    yr = yg + off
    pm_f = _bilinear(grid.pm, xr, yr)
    pn_f = _bilinear(grid.pn, xr, yr)
    ug = _trilinear(u, xg + 0.5 + off, yr, zg) * pm_f
    vg = _trilinear(v, xr, yg + 0.5 + off, zg) * pn_f
    # omega/Hz in w-level units: interpolate W (N+1 levels) linearly in zg
    N = cfg.N
    kz = jnp.clip(zg, 0.0, N * 1.0)
    k1 = jnp.clip(jnp.floor(kz).astype(jnp.int32), 0, N - 1)
    r = kz - k1
    Wlo = _bilinear_gather(W, k1, xr, yr)
    Whi = _bilinear_gather(W, jnp.minimum(k1 + 1, N), xr, yr)
    Hz_f = _bilinear_gather(Hz, jnp.clip(k1, 0, N - 1), xr, yr)
    wg = ((1.0 - r) * Wlo + r * Whi) * pm_f * pn_f / jnp.maximum(
        Hz_f, 1e-12)
    return ug, vg, wg


def vwalk_velocity(cfg: Config, grid: Grid, Akt_w, Hz,
                   fl: FloatsState, rwalk):
    """Vertical random-walk nudging velocity (vwalk_floats.F:208-219,
    Hunter, Craig & Philips 1993): w_rw = sqrt(2*Akt/dt)*N(0,1) +
    dAkt/dz evaluated at the float, returned in w-level units (1/s).

    Akt_w: diffusivity at w-points (N+1,Ny,Nx); rwalk: standard-normal
    draws (nf,), one per float per step (DRIFTER rwalk / gasdev)."""
    H = cfg.halo
    off = H - 1.0
    x_n, y_n, z_n = fl.xg[3], fl.yg[3], fl.zg[3]
    xr, yr = x_n + off, y_n + off
    N = cfg.N
    kz = jnp.clip(z_n, 0.0, N * 1.0)
    k1 = jnp.clip(jnp.floor(kz).astype(jnp.int32), 0, N - 1)
    r = kz - k1
    a_lo = _bilinear_gather(Akt_w, k1, xr, yr)
    a_hi = _bilinear_gather(Akt_w, jnp.minimum(k1 + 1, N), xr, yr)
    akt_f = (1.0 - r) * a_lo + r * a_hi
    # dAkt/dz at rho levels (mod_mixing dAktdz), sampled at the float
    dak = (Akt_w[1:] - Akt_w[:-1]) / jnp.maximum(Hz, 1e-12)
    dak_f = _trilinear(dak, xr, yr, z_n)
    Hz_f = _bilinear_gather(Hz, jnp.clip(k1, 0, N - 1), xr, yr)
    w_rw = jnp.sqrt((2.0 / cfg.dt) * jnp.maximum(akt_f, 0.0)) * rwalk \
        + dak_f
    return w_rw / jnp.maximum(Hz_f, 1e-12)


def step_floats(cfg: Config, grid: Grid, u, v, W, Hz,
                fl: FloatsState, w_vwalk=None) -> FloatsState:
    """Advance float positions one baroclinic step (step_floats.F):
    Milne predictor using 3 velocity histories, Hamming corrector with
    the velocity at the predicted position; AB-style startup ladder.
    w_vwalk: optional vertical random-walk velocity (w-level units,
    from vwalk_velocity; FLOAT_VWALK applied forward like
    vwalk_floats.F VWALK_FORWARD)."""
    dt = cfg.dt
    N = cfg.N
    # history slots: index 0 = n-3 ... 3 = n (newest last)
    x_n, y_n, z_n = fl.xg[3], fl.yg[3], fl.zg[3]
    u_n, v_n, w_n = _grid_velocity(cfg, grid, u, v, W, Hz, fl,
                                   x_n, y_n, z_n)
    ug = jnp.concatenate([fl.ug[1:], u_n[None]], axis=0)
    vg = jnp.concatenate([fl.vg[1:], v_n[None]], axis=0)
    wg = jnp.concatenate([fl.wg[1:], w_n[None]], axis=0)

    c1, c2 = 8.0 / 3.0, 4.0 / 3.0
    started = fl.nsteps >= 3
    # Milne predictor (needs 3 velocity histories); Euler otherwise
    xp_m = fl.xg[0] + dt * (c1 * ug[3] - c2 * ug[2] + c1 * ug[1])
    yp_m = fl.yg[0] + dt * (c1 * vg[3] - c2 * vg[2] + c1 * vg[1])
    zp_m = fl.zg[0] + dt * (c1 * wg[3] - c2 * wg[2] + c1 * wg[1])
    xp = jnp.where(started, xp_m, x_n + dt * ug[3])
    yp = jnp.where(started, yp_m, y_n + dt * vg[3])
    zp = jnp.where(started, zp_m, z_n + dt * wg[3])

    # velocity at the predicted position, then Hamming corrector
    u_p, v_p, w_p = _grid_velocity(cfg, grid, u, v, W, Hz, fl, xp, yp,
                                   jnp.clip(zp, 0.0, 1.0 * N))
    h1, h2, h3, h4 = 9.0 / 8.0, 1.0 / 8.0, 3.0 / 8.0, 6.0 / 8.0
    xc = h1 * fl.xg[3] - h2 * fl.xg[1] + dt * (h3 * u_p + h4 * ug[3] -
                                               h3 * ug[2])
    yc = h1 * fl.yg[3] - h2 * fl.yg[1] + dt * (h3 * v_p + h4 * vg[3] -
                                               h3 * vg[2])
    zc = h1 * fl.zg[3] - h2 * fl.zg[1] + dt * (h3 * w_p + h4 * wg[3] -
                                               h3 * wg[2])
    x1 = jnp.where(started, xc, xp)
    y1 = jnp.where(started, yc, yp)
    z1 = jnp.where(started, zc, zp)
    if w_vwalk is not None:
        # forward-Euler random-walk displacement (VWALK_FORWARD path,
        # vwalk_floats.F:275-290): applied outside the Milne/Hamming
        # ladder so the white-noise variance is not filtered
        z1 = z1 + dt * w_vwalk

    # keep in bounds: periodic wrap or clamp to the interior
    if cfg.ew_periodic:
        x1 = jnp.mod(x1 - 0.5, 1.0 * cfg.Lm) + 0.5
    else:
        x1 = jnp.clip(x1, 0.6, cfg.Lm + 0.4)
    if cfg.ns_periodic:
        y1 = jnp.mod(y1 - 0.5, 1.0 * cfg.Mm) + 0.5
    else:
        y1 = jnp.clip(y1, 0.6, cfg.Mm + 0.4)
    z1 = jnp.clip(z1, 0.0, 1.0 * N)

    push = lambda hist, new: jnp.concatenate([hist[1:], new[None]], axis=0)
    return FloatsState(
        xg=push(fl.xg, x1), yg=push(fl.yg, y1), zg=push(fl.zg, z1),
        ug=ug, vg=vg, wg=wg, nsteps=fl.nsteps + 1)
