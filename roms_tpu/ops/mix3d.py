"""Horizontal harmonic mixing along s-surfaces.

uv3dmix2_s (ROMS/Nonlinear/uv3dmix2_s.h) adds the time-stepped viscosity
to the mass-weighted u(nnew) and the flux divergence to rufrc;
t3dmix2_s (t3dmix2_s.h) adds the time-stepped diffusion to the
mass-weighted t(nnew).  Also: biharmonic variants (uv3dmix4_s.h,
t3dmix4_s.h) and geopotential-rotated harmonic diffusion (t3dmix2_geo.h).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import Config
from ..grid import Grid
from .stencil import ip1, im1, jp1, jm1


def smagorinsky_visc(cfg: Config, grid: Grid, u, v):
    """Deformation-rate-dependent viscosity (hmixing.F UV_SMAGORINSKY):
    visc = SmagorCoef * (cell area) * |D| added to the background."""
    pm, pn = grid.pm, grid.pn
    DefRate = jnp.sqrt(
        ((ip1(u) - u) * pm) ** 2 + ((jp1(v) - v) * pn) ** 2 +
        0.5 * (0.25 * pn * (jp1(u) + ip1(jp1(u)) - jm1(u) - ip1(jm1(u))) +
               0.25 * pm * (ip1(v) + ip1(jp1(v)) - im1(v) - im1(jp1(v)))
               ) ** 2)
    return cfg.smagor_coef * grid.omn * DefRate


def uv3dmix2(cfg: Config, grid: Grid, u, v, Hz, u_nnew, v_nnew,
             rufrc, rvfrc, dt: float):
    """Harmonic s-surface viscosity (uv3dmix2_s.h K_LOOP).

    u/v: velocity at nrhs (N,Ny,Nx); Hz at nrhs; updates (u_nnew, v_nnew,
    rufrc, rvfrc)."""
    pm, pn = grid.pm, grid.pn
    visc2 = cfg.visc2 * grid.visc_factor if cfg.use_sponge else cfg.visc2
    if cfg.uv_smagorinsky:
        visc2 = visc2 + smagorinsky_visc(cfg, grid, u, v)
    cff_r = Hz * 0.5 * (
        (pm / pn) * ((pn + ip1(pn)) * ip1(u) - (im1(pn) + pn) * u) -
        (pn / pm) * ((pm + jp1(pm)) * jp1(v) - (jm1(pm) + pm) * v))
    UFx = grid.on_r * grid.on_r * visc2 * cff_r
    VFe = grid.om_r * grid.om_r * visc2 * cff_r

    sum_pm = im1(jm1(pm)) + im1(pm) + jm1(pm) + pm
    sum_pn = im1(jm1(pn)) + im1(pn) + jm1(pn) + pn
    Hz_p = 0.125 * (im1(Hz) + Hz + im1(jm1(Hz)) + jm1(Hz))
    cff_p = Hz_p * (
        (sum_pm / sum_pn) *
        ((jm1(pn) + pn) * v - (im1(jm1(pn)) + im1(pn)) * im1(v)) +
        (sum_pn / sum_pm) *
        ((im1(pm) + pm) * u - (im1(jm1(pm)) + jm1(pm)) * jm1(u)))
    om_p = 4.0 / sum_pm
    on_p = 4.0 / sum_pn
    if cfg.use_sponge or cfg.uv_smagorinsky:
        visc2_p = 0.25 * (visc2 + im1(visc2) + jm1(visc2) +
                          im1(jm1(visc2)))
    else:
        visc2_p = visc2
    cff_p = cff_p * grid.pmask * visc2_p
    UFe = om_p * om_p * cff_p
    VFx = on_p * on_p * cff_p

    cffu = dt * 0.25 * (im1(pm) + pm) * (im1(pn) + pn)
    du1 = 0.5 * (im1(pn) + pn) * (UFx - im1(UFx))      # (N,Ny,Nx)
    du2 = 0.5 * (im1(pm) + pm) * (jp1(UFe) - UFe)
    rufrc = rufrc + jnp.sum(du1 + du2, axis=0)         # k-accumulated
    u_nnew = u_nnew + cffu * (du1 + du2)

    cffv = dt * 0.25 * (jm1(pm) + pm) * (jm1(pn) + pn)
    dv1 = 0.5 * (jm1(pn) + pn) * (ip1(VFx) - VFx)
    dv2 = 0.5 * (jm1(pm) + pm) * (VFe - jm1(VFe))
    rvfrc = rvfrc + jnp.sum(dv1 - dv2, axis=0)
    v_nnew = v_nnew + cffv * (dv1 - dv2)
    return u_nnew, v_nnew, rufrc, rvfrc


def t3dmix2(cfg: Config, grid: Grid, t, Hz, t_nnew, dt: float):
    """Harmonic s-surface tracer diffusion (t3dmix2_s.h); t at nrhs,
    updates mass-weighted t_nnew (NT,N,Ny,Nx)."""
    pm, pn = grid.pm, grid.pn
    pmon_u = (im1(pm) + pm) / (im1(pn) + pn)
    pnom_v = (jm1(pn) + pn) / (jm1(pm) + pm)
    out = []
    for itrc in range(cfg.ntracers):
        diff2 = cfg.tnu2[itrc] if itrc < len(cfg.tnu2) else 0.0
        if diff2 == 0.0:
            out.append(t_nnew[itrc])
            continue
        q = t[itrc]
        if cfg.use_sponge:
            d2 = diff2 * grid.diff_factor
            fx_c = 0.25 * (d2 + im1(d2))
            fe_c = 0.25 * (d2 + jm1(d2))
        else:
            fx_c = 0.5 * diff2
            fe_c = 0.5 * diff2
        FX = fx_c * pmon_u * (Hz + im1(Hz)) * (q - im1(q))
        FE = fe_c * pnom_v * (Hz + jm1(Hz)) * (q - jm1(q))
        out.append(t_nnew[itrc] + dt * pm * pn *
                   ((ip1(FX) - FX) + (jp1(FE) - FE)))
    return jnp.stack(out, axis=0)


def uv3dmix4(cfg: Config, grid: Grid, u, v, Hz, u_nnew, v_nnew,
             rufrc, rvfrc, dt: float):
    """Biharmonic s-surface viscosity (uv3dmix4_s.h): harmonic operator
    applied twice with sqrt(visc4) per pass (the reference stores
    sqrt(VISC4) at input, read_phypar.F)."""
    pm, pn = grid.pm, grid.pn
    vis = cfg.visc4 ** 0.5
    sum_pm = im1(jm1(pm)) + im1(pm) + jm1(pm) + pm
    sum_pn = im1(jm1(pn)) + im1(pn) + jm1(pn) + pn
    om_p = 4.0 / sum_pm
    on_p = 4.0 / sum_pn

    def harmonic(uu, vv, hz_weight):
        cff_r = 0.5 * (
            (pm / pn) * ((pn + ip1(pn)) * ip1(uu) - (im1(pn) + pn) * uu) -
            (pn / pm) * ((pm + jp1(pm)) * jp1(vv) - (jm1(pm) + pm) * vv))
        if hz_weight is not None:
            cff_r = cff_r * hz_weight
        UFx = grid.on_r * grid.on_r * vis * cff_r
        VFe = grid.om_r * grid.om_r * vis * cff_r
        cff_p = 0.5 * (
            (sum_pm / sum_pn) *
            ((jm1(pn) + pn) * vv - (im1(jm1(pn)) + im1(pn)) * im1(vv)) +
            (sum_pn / sum_pm) *
            ((im1(pm) + pm) * uu - (im1(jm1(pm)) + jm1(pm)) * jm1(uu)))
        if hz_weight is not None:
            hz_p = 0.25 * (im1(Hz) + Hz + im1(jm1(Hz)) + jm1(Hz))
            cff_p = cff_p * hz_p
        cff_p = cff_p * grid.pmask
        UFe = om_p * om_p * vis * cff_p
        VFx = on_p * on_p * vis * cff_p
        du = 0.5 * (im1(pn) + pn) * (UFx - im1(UFx)) + \
            0.5 * (im1(pm) + pm) * (jp1(UFe) - UFe)
        dv = 0.5 * (jm1(pn) + pn) * (ip1(VFx) - VFx) - \
            0.5 * (jm1(pm) + pm) * (VFe - jm1(VFe))
        return du, dv

    # first pass (no Hz): Laplacian of velocity.  Reference:
    # LapU = 0.125*(pm_sum)*(pn_sum)*T with harmonic() returning 0.5*T,
    # hence the 0.25*(sum)*(sum) factor here.
    du, dv = harmonic(u, v, None)
    LapU = 0.25 * (im1(pm) + pm) * (im1(pn) + pn) * du
    LapV = 0.25 * (jm1(pm) + pm) * (jm1(pn) + pn) * dv
    H = cfg.halo
    L, M = cfg.Lm, cfg.Mm
    # boundary conditions on the Laplacian (closed: 0 at normal face,
    # gamma2-slip tangential; uv3dmix4_s.h:233-330)
    from ..config import BC_CLOSED
    if not cfg.ew_periodic:
        if cfg.lbc_u.west == BC_CLOSED:
            LapU = LapU.at[:, :, H].set(0.0)
            LapV = LapV.at[:, :, H - 1].set(cfg.gamma2 * LapV[:, :, H])
        else:
            LapU = LapU.at[:, :, H].set(LapU[:, :, H + 1])
            LapV = LapV.at[:, :, H - 1].set(0.0)
        if cfg.lbc_u.east == BC_CLOSED:
            LapU = LapU.at[:, :, H + L].set(0.0)
            LapV = LapV.at[:, :, H + L].set(cfg.gamma2 * LapV[:, :, H + L - 1])
        else:
            LapU = LapU.at[:, :, H + L].set(LapU[:, :, H + L - 1])
            LapV = LapV.at[:, :, H + L].set(0.0)
    if not cfg.ns_periodic:
        if cfg.lbc_v.south == BC_CLOSED:
            LapV = LapV.at[:, H, :].set(0.0)
            LapU = LapU.at[:, H - 1, :].set(cfg.gamma2 * LapU[:, H, :])
        else:
            LapV = LapV.at[:, H, :].set(LapV[:, H + 1, :])
            LapU = LapU.at[:, H - 1, :].set(0.0)
        if cfg.lbc_v.north == BC_CLOSED:
            LapV = LapV.at[:, H + M, :].set(0.0)
            LapU = LapU.at[:, H + M, :].set(cfg.gamma2 * LapU[:, H + M - 1, :])
        else:
            LapV = LapV.at[:, H + M, :].set(LapV[:, H + M - 1, :])
            LapU = LapU.at[:, H + M, :].set(0.0)
    from . import bc as _bc
    LapU = _bc.fill_halo(cfg, LapU)
    LapV = _bc.fill_halo(cfg, LapV)

    # second pass (with Hz): flux divergence of the Laplacian
    du, dv = harmonic(LapU, LapV, Hz)
    cffu = dt * 0.25 * (im1(pm) + pm) * (im1(pn) + pn)
    cffv = dt * 0.25 * (jm1(pm) + pm) * (jm1(pn) + pn)
    rufrc = rufrc - jnp.sum(du, axis=0)
    u_nnew = u_nnew - cffu * du
    rvfrc = rvfrc - jnp.sum(dv, axis=0)
    v_nnew = v_nnew - cffv * dv
    return u_nnew, v_nnew, rufrc, rvfrc


def t3dmix4(cfg: Config, grid: Grid, t, Hz, t_nnew, dt: float):
    """Biharmonic s-surface tracer diffusion (t3dmix4_s.h): harmonic pass,
    boundary closure of the Laplacian, second harmonic pass."""
    pm, pn = grid.pm, grid.pn
    pmn = pm * pn
    pmon_u = (im1(pm) + pm) / (im1(pn) + pn)
    pnom_v = (jm1(pn) + pn) / (jm1(pm) + pm)
    H = cfg.halo
    L, M = cfg.Lm, cfg.Mm
    from . import bc as _bc
    out = []
    for itrc in range(cfg.ntracers):
        diff4 = (cfg.tnu4[itrc] if itrc < len(cfg.tnu4) else 0.0) ** 0.5
        if diff4 == 0.0:
            out.append(t_nnew[itrc])
            continue
        q = t[itrc]
        FX = 0.25 * (2.0 * diff4) * pmon_u * (Hz + im1(Hz)) * (q - im1(q))
        FE = 0.25 * (2.0 * diff4) * pnom_v * (Hz + jm1(Hz)) * (q - jm1(q))
        LapT = pmn * ((ip1(FX) - FX) + (jp1(FE) - FE)) / Hz
        # boundary: zero Laplacian at closed edges, replicate at open
        if not cfg.ew_periodic:
            LapT = LapT.at[:, :, H - 1].set(0.0)
            LapT = LapT.at[:, :, H + L].set(0.0)
        if not cfg.ns_periodic:
            LapT = LapT.at[:, H - 1, :].set(0.0)
            LapT = LapT.at[:, H + M, :].set(0.0)
        LapT = _bc.fill_halo(cfg, LapT)
        FX2 = 0.25 * (2.0 * diff4) * pmon_u * (Hz + im1(Hz)) * \
            (LapT - im1(LapT))
        FE2 = 0.25 * (2.0 * diff4) * pnom_v * (Hz + jm1(Hz)) * \
            (LapT - jm1(LapT))
        out.append(t_nnew[itrc] - dt * pmn *
                   ((ip1(FX2) - FX2) + (jp1(FE2) - FE2)))
    return jnp.stack(out, axis=0)


def t3dmix2_geo(cfg: Config, grid: Grid, t, Hz, z_r, t_nnew, dt: float):
    """Harmonic diffusion rotated to geopotential surfaces
    (t3dmix2_geo.h: mixed-derivative triad scheme with slope upwinding)."""
    pm, pn = grid.pm, grid.pn
    pmn = pm * pn
    out = []
    for itrc in range(cfg.ntracers):
        diff2 = cfg.tnu2[itrc] if itrc < len(cfg.tnu2) else 0.0
        if diff2 == 0.0:
            out.append(t_nnew[itrc])
            continue
        q = t[itrc]
        # level slopes at u/v points (all levels k=0..N-1)
        cffu = 0.5 * (pm + im1(pm))
        dZdx = cffu * (z_r - im1(z_r))
        dTdx = cffu * (q - im1(q))
        cffv = 0.5 * (pn + jm1(pn))
        dZde = cffv * (z_r - jm1(z_r))
        dTde = cffv * (q - jm1(q))
        # vertical derivative at interfaces (N+1; 0 at ends)
        zpad = jnp.zeros_like(q[:1])
        dTdz = jnp.concatenate(
            [zpad, (q[1:] - q[:-1]) / (z_r[1:] - z_r[:-1]), zpad], axis=0)

        dZdx_m = jnp.minimum(dZdx, 0.0)
        dZdx_p = jnp.maximum(dZdx, 0.0)
        dZde_m = jnp.minimum(dZde, 0.0)
        dZde_p = jnp.maximum(dZde, 0.0)

        # horizontal fluxes at levels (FX at u, FE at v)
        cfx = 0.25 * (2.0 * diff2) * grid.on_u * (Hz + im1(Hz))
        FX = cfx * (dTdx - 0.5 * (
            dZdx_m * (im1(dTdz)[:-1] + dTdz[1:]) +
            dZdx_p * (im1(dTdz)[1:] + dTdz[:-1])))
        cfe = 0.25 * (2.0 * diff2) * grid.om_v * (Hz + jm1(Hz))
        FE = cfe * (dTde - 0.5 * (
            dZde_m * (jm1(dTdz)[:-1] + dTdz[1:]) +
            dZde_p * (jm1(dTdz)[1:] + dTdz[:-1])))

        # vertical cross flux FS at interior interfaces kw=1..N-1
        c1 = dZdx_m[:-1]                       # level k   at u(i)
        c2 = ip1(dZdx_m)[1:]                   # level k+1 at u(i+1)
        c3 = dZdx_p[1:]                        # level k+1 at u(i)
        c4 = ip1(dZdx_p)[:-1]                  # level k   at u(i+1)
        dtz = dTdz[1:-1]
        FS = 0.5 * diff2 * (
            c1 * (c1 * dtz - dTdx[:-1]) +
            c2 * (c2 * dtz - ip1(dTdx)[1:]) +
            c3 * (c3 * dtz - dTdx[1:]) +
            c4 * (c4 * dtz - ip1(dTdx)[:-1]))
        e1 = dZde_m[:-1]
        e2 = jp1(dZde_m)[1:]
        e3 = dZde_p[1:]
        e4 = jp1(dZde_p)[:-1]
        FS = FS + 0.5 * diff2 * (
            e1 * (e1 * dtz - dTde[:-1]) +
            e2 * (e2 * dtz - jp1(dTde)[1:]) +
            e3 * (e3 * dtz - dTde[1:]) +
            e4 * (e4 * dtz - jp1(dTde)[:-1]))
        FSfull = jnp.concatenate([zpad, FS, zpad], axis=0)

        out.append(t_nnew[itrc] + dt * pmn *
                   ((ip1(FX) - FX) + (jp1(FE) - FE)) +
                   dt * (FSfull[1:] - FSfull[:-1]))
    return jnp.stack(out, axis=0)
