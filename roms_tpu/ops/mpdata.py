"""MPDATA recursive anti-diffusive tracer advection corrector.

Reference: ROMS/Nonlinear/mpdata_adiff.F (Smolarkiewicz & Grabowski 1990
flux-corrected-transport limiter) and the MPDATA branches of
ROMS/Nonlinear/step3d_t.F:408-428 (first-order upstream first pass),
:1167-1180 (vertical first pass) and :1213-1318 (anti-diffusive second
pass).  The reference's ``fac`` limit is 1 (TS_MPDATA_LIMIT off) and the
power series is truncated at first order (MPDATA_HOT off) - matching the
default build.

All arrays are halo-padded [..., eta, xi]; u/v staggering follows
ops/stencil.py (u-point i spans rho cells i-1, i).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import Config
from ..grid import Grid
from . import bc as bc_mod
from .stencil import ip1, im1, jp1, jm1

_EPS = 1.0e-18
_EPS2 = 1.0e-10
_LARGE = 1.0e+20
_FAC = 1.0  # TS_MPDATA_LIMIT off


def mpdata_adiff(cfg: Config, grid: Grid, t3, Ta, Huon, Hvom, W,
                 oHz, z_r, wet=None):
    """Anti-diffusive, monotonically-limited velocities (Ua, Va, Wa).

    Ta is the upstream-advected intermediate tracer (Tunits, halos
    filled); t3 the centered time level used in the beta limiter.
    Returns dimensional Ua (m/s * om_u-weighted as in the reference:
    actually Courant/dt*om_u), Va, and Wa (m3/s) ready for the corrected
    flux pass in step3d_t.
    """
    dt = cfg.dt
    N = cfg.N
    pm, pn = grid.pm, grid.pn
    pmn = pm * pn
    umask, vmask, rmask = grid.umask, grid.vmask, grid.rmask
    umw = wet["umask_wet"] if wet is not None else 1.0
    vmw = wet["vmask_wet"] if wet is not None else 1.0
    rmw = wet["rmask_wet"] if wet is not None else 1.0

    # inverse vertical spacing at interior interfaces (mpdata_adiff.F:228)
    odz = 1.0 / (z_r[1:] - z_r[:-1])          # (N-1, Ny, Nx)

    # --- per-column vertical-gradient and z-span stacks for C ---
    G = (Ta[1:] - Ta[:-1]) * odz              # (N-1,...)
    gs = jnp.concatenate([G[:1], G[1:] + G[:-1], G[-1:]], axis=0)  # (N,...)
    zspan = jnp.concatenate([(z_r[1] - z_r[0])[None],
                             z_r[2:] - z_r[:-2],
                             (z_r[-1] - z_r[-2])[None]], axis=0)
    # end levels use 0.25, interior 0.0625 (mpdata_adiff.F:240-282)
    cfac = jnp.full((N,), 0.0625, Ta.dtype).at[0].set(0.25).at[-1].set(0.25)
    cfac = cfac[:, None, None]

    # --- per-column W Courant stacks for Wm at u/v points ---
    wc_low = (W[1] * odz[0])[None]                       # level 1
    wc_int = W[1:N - 1] * odz[:-1] + W[2:N] * odz[1:]    # levels 2..N-1
    wc_top = (W[N - 1] * odz[-1])[None]                  # level N
    wcol = jnp.concatenate([wc_low, wc_int, wc_top], axis=0) * pmn

    # cross-direction gradient stacks (masked; mpdata_adiff.F:305-330)
    bcol = ((jp1(Ta) - Ta) * (pn + jp1(pn)) * jp1(vmask) +
            (Ta - jm1(Ta)) * (jm1(pn) + pn) * vmask)
    acol = ((ip1(Ta) - Ta) * (pm + ip1(pm)) * ip1(umask) +
            (Ta - im1(Ta)) * (pm + im1(pm)) * umask)
    # transverse-flux Courant stacks
    vterm = Hvom * (pm + jm1(pm)) * (pn + jm1(pn)) * (oHz + jm1(oHz))
    uterm = Huon * (pm + im1(pm)) * (pn + im1(pn)) * (oHz + im1(oHz))

    def xyz(A, B, Cc, Um, Vm, Wm):
        X = (jnp.abs(Um) - Um * Um) * A - B * Um * Vm - Cc * Um * Wm
        Y = (jnp.abs(Vm) - Vm * Vm) * B - A * Um * Vm - Cc * Vm * Wm
        Z = (jnp.abs(Wm) - Wm * Wm) * Cc - A * Um * Wm - B * Vm * Wm
        return X, Y, Z

    def guard(q_a, q_b, vel):
        bad = (q_a <= 0.0) | (q_b <= 0.0) | (jnp.abs(q_a - q_b) <= _EPS2)
        return jnp.where(bad, 0.0, vel)

    # ================= U-antidiffusive velocity (nondim) =================
    TaS = Ta + im1(Ta) + _EPS
    Cu = cfac * (gs + im1(gs)) * (zspan + im1(zspan)) / TaS
    Wmu = 0.25 * dt * (wcol + im1(wcol))
    Au = (Ta - im1(Ta)) / TaS
    on_v = grid.on_v
    Bu = 0.03125 * (bcol + im1(bcol)) * \
        (on_v + jp1(on_v) + im1(on_v) + im1(jp1(on_v))) / TaS
    Umu = 0.125 * dt * Huon * (pm + im1(pm)) * (pn + im1(pn)) * \
        (oHz + im1(oHz))
    vsum = vterm + jp1(vterm)
    Vmu = 0.03125 * dt * (vsum + im1(vsum))
    X, _, _ = xyz(Au, Bu, Cu, Umu, Vmu, Wmu)
    Ua = X / (1.0 - jnp.abs(Au) + _EPS)
    Ua = jnp.minimum(jnp.abs(Ua), _FAC * jnp.abs(Umu)) * jnp.sign(Ua)
    Ua = guard(im1(Ta), Ta, Ua) * umask * umw

    # ================= V-antidiffusive velocity =================
    TaSv = Ta + jm1(Ta) + _EPS
    Cv = cfac * (gs + jm1(gs)) * (zspan + jm1(zspan)) / TaSv
    Wmv = 0.25 * dt * (wcol + jm1(wcol))
    Bv = (Ta - jm1(Ta)) / TaSv
    om_u = grid.om_u
    Av = 0.03125 * (acol + jm1(acol)) * \
        (om_u + ip1(om_u) + jm1(om_u) + jm1(ip1(om_u))) / TaSv
    Vmv = 0.125 * dt * Hvom * (pn + jm1(pn)) * (pm + jm1(pm)) * \
        (oHz + jm1(oHz))
    usum = uterm + ip1(uterm)
    Umv = 0.03125 * dt * (usum + jm1(usum))
    _, Y, _ = xyz(Av, Bv, Cv, Umv, Vmv, Wmv)
    Va = Y / (1.0 - jnp.abs(Bv) + _EPS)
    Va = jnp.minimum(jnp.abs(Va), _FAC * jnp.abs(Vmv)) * jnp.sign(Va)
    Va = guard(jm1(Ta), Ta, Va) * vmask * vmw

    Ua = _uv_edge_bc(cfg, Ua, "u")
    Va = _uv_edge_bc(cfg, Va, "v")

    # ============ W-antidiffusive velocity at interfaces 1..N-1 ============
    TaSw = Ta[1:] + Ta[:-1] + _EPS              # (N-1,...)
    Cw = (Ta[1:] - Ta[:-1]) / TaSw
    Aw = 0.0625 * (acol[1:] + acol[:-1]) * (om_u + ip1(om_u)) / TaSw
    Bw = 0.0625 * (bcol[1:] + bcol[:-1]) * (on_v + jp1(on_v)) / TaSw
    ur = uterm + ip1(uterm)
    vr = vterm + jp1(vterm)
    Umw = 0.03125 * dt * (ur[1:] + ur[:-1])
    Vmw = 0.03125 * dt * (vr[1:] + vr[:-1])
    Wmw = W[1:N] * odz * pmn * dt
    _, _, Z = xyz(Aw, Bw, Cw, Umw, Vmw, Wmw)
    Wa = Z / (1.0 - jnp.abs(Cw) + _EPS)
    Wa = jnp.minimum(jnp.abs(Wa), _FAC * jnp.abs(Wmw)) * jnp.sign(Wa)
    Wa = guard(Ta[:-1], Ta[1:], Wa) * rmask * rmw

    # ======= beta-ratio monotonic limiter (Smolarkiewicz & Grabowski) =======
    mask_up = rmask
    mask_dn = jnp.maximum(1.0, (1.0 - rmask) * _LARGE)
    zeros = jnp.zeros_like(Wa[:1])
    Wa_full = jnp.concatenate([zeros, Wa, zeros], axis=0)   # (N+1,...)

    def neigh_extreme(q, mask, red):
        vals = [im1(q) * im1(mask)[None],
                q * mask[None],
                ip1(q) * ip1(mask)[None],
                jm1(q) * jm1(mask)[None],
                jp1(q) * jp1(mask)[None]]
        out = vals[0]
        for v in vals[1:]:
            out = red(out, v)
        # vertical neighbors (same column mask); k end levels reuse interior
        q_dn = jnp.concatenate([q[:1], q[:-1]], axis=0) * mask[None]
        q_up = jnp.concatenate([q[1:], q[-1:]], axis=0) * mask[None]
        # at k=1 the reference omits the k-1 term; at k=N omits k+1.  Use
        # the cell itself there (already included) by substituting q.
        q_dn = q_dn.at[0].set((q * mask[None])[0])
        q_up = q_up.at[-1].set((q * mask[None])[-1])
        out = red(out, q_dn)
        out = red(out, q_up)
        return out

    Tmax = jnp.maximum(neigh_extreme(Ta, mask_up, jnp.maximum),
                       neigh_extreme(t3, mask_up, jnp.maximum))
    Tmin = jnp.minimum(neigh_extreme(Ta, mask_dn, jnp.minimum),
                       neigh_extreme(t3, mask_dn, jnp.minimum))

    Uap = jnp.maximum(Ua, 0.0)
    Uan = jnp.minimum(Ua, 0.0)
    Vap = jnp.maximum(Va, 0.0)
    Van = jnp.minimum(Va, 0.0)
    Wap = jnp.maximum(Wa_full, 0.0)
    Wan = jnp.minimum(Wa_full, 0.0)

    influx = (im1(Ta) * Uap - ip1(Ta) * ip1(Uan) +
              jm1(Ta) * Vap - jp1(Ta) * jp1(Van) +
              jnp.concatenate([zeros, Ta[:-1]], axis=0) * Wap[:-1] -
              jnp.concatenate([Ta[1:], zeros], axis=0) * Wan[1:])
    beta_up = (Tmax - Ta) / (influx + _EPS)

    outflux = Ta * (ip1(Uap) - Uan + jp1(Vap) - Van + Wap[1:] - Wan[:-1])
    beta_dn = (Ta - Tmin) / (outflux + _EPS)

    land = mask_up == 0.0
    beta_up = jnp.where(land[None], 2.0, beta_up)
    beta_dn = jnp.where(land[None], 2.0, beta_dn)

    # monotonic velocities, scaled back to dimensional units
    odt = 1.0 / dt
    cu1 = jnp.minimum(jnp.minimum(im1(beta_dn), beta_up), 1.0)
    cu2 = jnp.minimum(jnp.minimum(im1(beta_up), beta_dn), 1.0)
    Ua = (cu1 * Uap + cu2 * Uan) * odt * grid.om_u * umask * umw
    cv1 = jnp.minimum(jnp.minimum(jm1(beta_dn), beta_up), 1.0)
    cv2 = jnp.minimum(jnp.minimum(jm1(beta_up), beta_dn), 1.0)
    Va = (cv1 * Vap + cv2 * Van) * odt * grid.on_v * vmask * vmw
    cw1 = jnp.minimum(jnp.minimum(beta_dn[:-1], beta_up[1:]), 1.0)
    cw2 = jnp.minimum(jnp.minimum(beta_up[:-1], beta_dn[1:]), 1.0)
    Wa = (cw1 * jnp.maximum(Wa, 0.0) + cw2 * jnp.minimum(Wa, 0.0)) * \
        odt * grid.omn * (z_r[1:] - z_r[:-1]) * rmask * rmw

    Ua = _uv_edge_bc(cfg, Ua, "u")
    Va = _uv_edge_bc(cfg, Va, "v")
    Wa = jnp.concatenate([zeros, Wa, zeros], axis=0)
    return Ua, Va, Wa


def _uv_edge_bc(cfg: Config, a, kind: str):
    """Boundary treatment of anti-diffusive velocities
    (mpdata_adiff.F:585-650): closed edges zero the boundary-face value,
    open edges copy it from the first interior face."""
    H = cfg.halo
    if kind == "u":
        if not cfg.ew_periodic:
            lbc = cfg.lbc_u
            wv = 0.0 if lbc.west == "Clo" else a[..., :, H + 1]
            a = bc_mod.set_col(a, H, wv, "west")
            ev = 0.0 if lbc.east == "Clo" else a[..., :, H + cfg.Lm - 1]
            a = bc_mod.set_col(a, H + cfg.Lm, ev, "east")
    else:
        if not cfg.ns_periodic:
            lbc = cfg.lbc_v
            sv = 0.0 if lbc.south == "Clo" else a[..., H + 1, :]
            a = bc_mod.set_row(a, H, sv, "south")
            nv = 0.0 if lbc.north == "Clo" else a[..., H + cfg.Mm - 1, :]
            a = bc_mod.set_row(a, H + cfg.Mm, nv, "north")
    return a


def mpdata_corrected_fluxes(grid: Grid, Ta, Ua, Va, Wa, Hz):
    """Second-pass upstream fluxes with the anti-diffusive velocities
    (step3d_t.F:1240-1266, 1283-1292)."""
    FX = (jnp.maximum(Ua, 0.0) * im1(Ta) +
          jnp.minimum(Ua, 0.0) * Ta) * 0.5 * (Hz + im1(Hz)) * grid.on_u
    FE = (jnp.maximum(Va, 0.0) * jm1(Ta) +
          jnp.minimum(Va, 0.0) * Ta) * 0.5 * (Hz + jm1(Hz)) * grid.om_v
    FC = jnp.maximum(Wa[1:-1], 0.0) * Ta[:-1] + \
        jnp.minimum(Wa[1:-1], 0.0) * Ta[1:]
    zero = jnp.zeros_like(FC[:1])
    FC = jnp.concatenate([zero, FC, zero], axis=0)
    return FX, FE, FC
