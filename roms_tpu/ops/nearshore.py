"""Wave-induced radiation stress forcing (nearshore kernels).

The analog of ROMS/Nonlinear/radiation_stress.F dispatching to
nearshore_mellor05.h (Mellor 2003/2005 formulation, no Svendsen roller):
given monochromatic surface-wave fields (height Hwave, direction Dwave,
length Lwave - in the reference supplied by SWAN coupling or wave
forcing files; here by the forcing dict), compute

  * the 3-D radiation-stress tensor (Sxx, Sxy, Syy) with the Mellor05
    vertical structure functions FCC/FCS/FSS
    (nearshore_mellor05.h:455-485),
  * the flux-form momentum forcing rustr3d/rvstr3d: horizontal stress
    divergence (:495-540) plus the vertical Szx/Szy term from the
    horizontal gradients of wave energy and kD (:790-905),
  * Stokes drift velocities u_stokes/v_stokes and their vertical means
    (:560-585, :916-940).

Application (stepping.py): ru -= rustr_u (flux form), and the vertical
integral joins rufrc so the barotropic mode carries the depth-integrated
stress (the reference adds rustr2d inside step2d; folding it through
rufrc is the functionally equivalent route in the explicit coupling
scheme used here).  Documented delta: Stokes-drift advection of momentum
and tracers (the reference's Huon+Huon_stokes sums throughout rhs3d/
pre_step3d/step3d_t) is not yet wired; the Stokes velocities are
computed and exposed for output/diagnostics.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .. import constants as C
from ..config import Config
from ..grid import Grid
from .stencil import ip1, im1, jp1, jm1, at_u, at_v, at_p

_EPS = 1.0e-14
_KDMAX = 5.0
_LWAVE_MIN = 1.0


class NearshoreForcing(NamedTuple):
    rustr3d: jnp.ndarray      # (N,Ny,Nx) flux-form u-forcing (m4/s2)
    rvstr3d: jnp.ndarray
    rustr2d: jnp.ndarray      # depth-integrated (Ny,Nx)
    rvstr2d: jnp.ndarray
    u_stokes: jnp.ndarray     # (N,Ny,Nx) Stokes drift (m/s)
    v_stokes: jnp.ndarray
    ubar_stokes: jnp.ndarray  # vertical means (Ny,Nx)
    vbar_stokes: jnp.ndarray
    Sxx: jnp.ndarray          # (N,Ny,Nx) radiation stresses (m3/s2)
    Sxy: jnp.ndarray
    Syy: jnp.ndarray


def radiation_stress(cfg: Config, grid: Grid, zeta, Hz, Cs_r, Cs_w,
                     Hwave, Dwave, Lwave) -> NearshoreForcing:
    """Mellor05 radiation stresses and Stokes velocities.

    zeta: free surface at the rhs time level; Hz: level thicknesses;
    Hwave (m), Dwave (rad, direction waves travel TOWARD, nautical
    convention as in the reference), Lwave (m)."""
    g = C.g
    h = grid.h
    Dstp = zeta + h

    waven = 2.0 * jnp.pi / jnp.maximum(Lwave, _LWAVE_MIN)
    owaven = 1.0 / waven
    cdir = 1.5 * jnp.pi - Dwave - grid.angler
    wavenx = waven * jnp.cos(cdir)
    waveny = waven * jnp.sin(cdir)
    waveE = 0.0625 * g * Hwave * Hwave
    # depth floor: WET_DRY can leave Dstp ~ 0 (or slightly negative in
    # halo rows); kD < 0 would NaN the sqrt/tanh chain below and the
    # stresses on dry cells are masked anyway
    kD = jnp.minimum(waven * jnp.maximum(Dstp, 0.01) + _EPS, _KDMAX)
    wavec = jnp.sqrt(g * owaven * jnp.tanh(kD))
    ocosh = 1.0 / jnp.cosh(kD)
    osinh = 1.0 / jnp.sinh(kD)
    o2sinh = 1.0 / jnp.sinh(2.0 * kD)

    # ---- vertical structure at rho levels (fac2 = 1 + Cs_r) ----
    fac2 = (1.0 + Cs_r)[:, None, None]
    FCCr = jnp.cosh(kD * fac2) * ocosh
    FCSr = jnp.cosh(kD * fac2) * osinh
    FSSr = jnp.sinh(kD * fac2) * osinh
    waveEr = waven * waveE * FCSr * FCCr
    cff4 = waveE * waven * FCSr * (FCCr - FSSr)
    ow2 = owaven * owaven
    Sxx = cff4 + waveEr * wavenx * wavenx * ow2
    Syy = cff4 + waveEr * waveny * waveny * ow2
    Sxy = waveEr * wavenx * waveny * ow2

    # ---- horizontal stress divergence (flux form) ----
    on_u = grid.on_u
    om_u = 2.0 / (jnp.roll(grid.pm, 1, -1) + grid.pm)
    om_v = grid.om_v
    on_v = 2.0 / (jnp.roll(grid.pn, 1, -2) + grid.pn)
    SxxH = Sxx * Hz
    SyyH = Syy * Hz
    rustr = (SxxH - im1(SxxH)) * on_u
    rvstr = (SyyH - jm1(SyyH)) * om_v
    UFe = at_p(Hz) * at_p(Sxy)               # psi-point cross stress
    rustr = rustr + (jp1(UFe) - UFe) * om_u
    rvstr = rvstr + (ip1(UFe) - UFe) * on_v

    # ---- vertical Szx/Szy terms (w-level structure; :790-905) ----
    fac2w = (1.0 + Cs_w)[:, None, None]

    def _vert_term(kD_s, E_s, dE, dkD, pn_half):
        FCC = jnp.cosh(kD_s * fac2w) / jnp.cosh(kD_s)
        FCS = jnp.cosh(kD_s * fac2w) / jnp.sinh(kD_s)
        FSS = jnp.sinh(kD_s * fac2w) / jnp.sinh(kD_s)
        otanh = 1.0 / jnp.tanh(kD_s)
        CF = pn_half * (FSS * dE + E_s * dkD * (FCS * fac2w - FSS * otanh))
        FC = (FSS - FCC) * CF
        return FC[1:] - FC[:-1]              # (N,Ny,Nx)

    kD_u = 0.5 * (im1(kD) + kD)
    Szx = _vert_term(jnp.maximum(kD_u, _EPS),
                     im1(waveE) + waveE,
                     waveE - im1(waveE), kD - im1(kD),
                     0.25 * (im1(grid.pn) + grid.pn))
    kD_v = 0.5 * (jm1(kD) + kD)
    Szy = _vert_term(jnp.maximum(kD_v, _EPS),
                     jm1(waveE) + waveE,
                     waveE - jm1(waveE), kD - jm1(kD),
                     0.25 * (jm1(grid.pm) + grid.pm))
    rustr = (rustr + Szx * om_u * on_u) * grid.umask
    rvstr = (rvstr + Szy * om_v * on_v) * grid.vmask

    # ---- Stokes drift velocities (:560-585) ----
    u_st = (im1(waveE) + waveE) * (im1(wavenx) + wavenx) / \
        (im1(wavec) + wavec) * jnp.cosh((im1(kD) + kD) * fac2) * \
        0.5 * (im1(o2sinh) + o2sinh) * grid.umask
    v_st = (jm1(waveE) + waveE) * (jm1(waveny) + waveny) / \
        (jm1(wavec) + wavec) * jnp.cosh((jm1(kD) + kD) * fac2) * \
        0.5 * (jm1(o2sinh) + o2sinh) * grid.vmask
    if cfg.wetdry:
        # taper the wave transport to zero as the column dries: the
        # Stokes flux bypasses the WET_DRY directional limiter (which
        # acts on the Eulerian ubar only), so an untapered transport
        # keeps pumping water through nearly-dry cells
        dcrit = cfg.dcrit
        fac = jnp.clip((Dstp - dcrit) / (9.0 * dcrit), 0.0, 1.0)
        u_st = u_st * 0.5 * (im1(fac) + fac)
        v_st = v_st * 0.5 * (jm1(fac) + fac)

    Hz_u = 0.5 * (im1(Hz) + Hz)
    Hz_v = 0.5 * (jm1(Hz) + Hz)
    D_u = jnp.sum(Hz_u, axis=0)
    D_v = jnp.sum(Hz_v, axis=0)
    ubar_st = jnp.sum(Hz_u * u_st, axis=0) / jnp.maximum(D_u, _EPS)
    vbar_st = jnp.sum(Hz_v * v_st, axis=0) / jnp.maximum(D_v, _EPS)

    return NearshoreForcing(
        rustr3d=rustr, rvstr3d=rvstr,
        rustr2d=jnp.sum(rustr, axis=0), rvstr2d=jnp.sum(rvstr, axis=0),
        u_stokes=u_st, v_stokes=v_st,
        ubar_stokes=ubar_st, vbar_stokes=vbar_st,
        Sxx=Sxx, Sxy=Sxy, Syy=Syy)


def radiation_stress08(cfg: Config, grid: Grid, zeta, Hz, z_r,
                       Cs_r, Cs_w, Hwave, Dwave,
                       Lwave) -> NearshoreForcing:
    """Mellor (2008) corrected radiation stresses
    (nearshore_mellor08.h, no Svendsen roller).

    Differences from the 2005 kernel implemented above (both kept, as
    in the reference):
     * the diagonal stress's vertical structure is
       -kE*FSC*FSS + ED*cosh(2*pi*(1+Cs)*gamr)/orad_int
       (nearshore_mellor08.h:489-505): the surface wave energy ED=E/2
       is distributed over a near-surface layer of relative thickness
       gamr = min(0.707*D/Hwave, 1) instead of the 2005
       kE*FCS*(FCC-FSS) form;
     * the vertical flux term is an s-surface SLOPE correction built
       from the full w-level stress profiles (:733-790
       dz_r/on_u * dFCC + dz_psi/om_u * dFCS) instead of the 2005
       Szx/Szy energy-gradient form.
    Documented delta: the forcing keeps the 2005 flux-form units
    (m4/s2, consumed by stepping.py's ru -= rustr3d); the reference's
    final pm*pn output-unit conversion is not applied."""
    g = C.g
    Dstp = zeta + grid.h
    waven = 2.0 * jnp.pi / jnp.maximum(Lwave, _LWAVE_MIN)
    owaven = 1.0 / waven
    cdir = 1.5 * jnp.pi - Dwave - grid.angler
    wavenx = waven * jnp.cos(cdir)
    waveny = waven * jnp.sin(cdir)
    waveE = 0.0625 * g * Hwave * Hwave
    kD = jnp.minimum(waven * jnp.maximum(Dstp, 0.01) + _EPS, _KDMAX)
    wavec = jnp.sqrt(g * owaven * jnp.tanh(kD))
    ocosh = 1.0 / jnp.cosh(kD)
    osinh = 1.0 / jnp.sinh(kD)
    o2sinh = 1.0 / jnp.sinh(2.0 * kD)

    # near-surface ED distribution metrics (:411-418)
    gamr = jnp.minimum(0.707 * Dstp / (Hwave + _EPS), 1.0)
    fac2 = (1.0 + Cs_r)[:, None, None]
    coshg = jnp.cosh(2.0 * jnp.pi * fac2 * gamr)
    orad = 1.0 / (jnp.sum(Hz * coshg, axis=0) + _EPS)

    # ---- stresses at rho levels (:461-505) ----
    kE = waven * waveE
    FCCr = jnp.cosh(kD * fac2) * ocosh
    FCSr = jnp.cosh(kD * fac2) * osinh
    FSCr = jnp.sinh(kD * fac2) * ocosh
    FSSr = jnp.sinh(kD * fac2) * osinh
    waveEr = kE * FCSr * FCCr
    ED = 0.5 * waveE
    cff4 = -kE * FSCr * FSSr + ED * coshg * orad
    ow2 = owaven * owaven
    Sxx = cff4 + waveEr * wavenx * wavenx * ow2
    Syy = cff4 + waveEr * waveny * waveny * ow2
    Sxy = waveEr * wavenx * waveny * ow2

    # ---- horizontal flux divergence (same form as 2005; :536-600) ----
    on_u = grid.on_u
    om_u = 2.0 / (jnp.roll(grid.pm, 1, -1) + grid.pm)
    om_v = grid.om_v
    on_v = 2.0 / (jnp.roll(grid.pn, 1, -2) + grid.pn)
    SxxH = Sxx * Hz
    SyyH = Syy * Hz
    rustr = (SxxH - im1(SxxH)) * on_u
    rvstr = (SyyH - jm1(SyyH)) * om_v
    UFe = at_p(Hz) * at_p(Sxy)
    rustr = rustr + (jp1(UFe) - UFe) * om_u
    rvstr = rvstr + (ip1(UFe) - UFe) * on_v

    # ---- s-surface slope vertical term (:733-790) ----
    fac2w = (1.0 + Cs_w)[:, None, None]

    def wprof(kD_s, kE_s, knn, gam2, orad2, ED2, ow2_s):
        FCC = jnp.cosh(kD_s * fac2w) / jnp.cosh(kD_s)
        FCS = jnp.cosh(kD_s * fac2w) / jnp.sinh(kD_s)
        FSC = jnp.sinh(kD_s * fac2w) / jnp.cosh(kD_s)
        FSS = jnp.sinh(kD_s * fac2w) / jnp.sinh(kD_s)
        Ew = kE_s * FCS * FCC
        coshw = jnp.cosh(jnp.pi * fac2w * gam2)
        c4 = -kE_s * FSC * FSS + 0.5 * ED2 * coshw * orad2
        return c4 + Ew * knn[0] * ow2_s, Ew * knn[1] * ow2_s

    # u-points
    kD_u = jnp.maximum(0.5 * (im1(kD) + kD), _EPS)
    kE_u = 0.5 * (im1(kE) + kE)
    Sn_u = (0.5 * (im1(wavenx * wavenx) + wavenx * wavenx),
            0.5 * (im1(wavenx * waveny) + wavenx * waveny))
    FCCu, FCSu = wprof(kD_u, kE_u, Sn_u, im1(gamr) + gamr,
                       im1(orad) + orad, 0.5 * (im1(waveE) + waveE),
                       0.5 * (im1(ow2) + ow2))
    z_p = at_p(z_r)
    dzx_u = z_r - im1(z_r)
    dzp_u = jp1(z_p) - z_p
    rustr = rustr - (dzx_u * on_u * (FCCu[1:] - FCCu[:-1]) +
                     dzp_u * om_u * (FCSu[1:] - FCSu[:-1]))
    # v-points
    kD_v = jnp.maximum(0.5 * (jm1(kD) + kD), _EPS)
    kE_v = 0.5 * (jm1(kE) + kE)
    Sn_v = (0.5 * (jm1(waveny * waveny) + waveny * waveny),
            0.5 * (jm1(wavenx * waveny) + wavenx * waveny))
    FCCv, FCSv = wprof(kD_v, kE_v, Sn_v, jm1(gamr) + gamr,
                       jm1(orad) + orad, 0.5 * (jm1(waveE) + waveE),
                       0.5 * (jm1(ow2) + ow2))
    dzy_v = z_r - jm1(z_r)
    dzp_v = ip1(z_p) - z_p
    rvstr = rvstr - (dzy_v * om_v * (FCCv[1:] - FCCv[:-1]) +
                     dzp_v * on_v * (FCSv[1:] - FCSv[:-1]))
    rustr = rustr * grid.umask
    rvstr = rvstr * grid.vmask

    # ---- Stokes drift: same 2005 forms (:960-1010) ----
    u_st = (im1(waveE) + waveE) * (im1(wavenx) + wavenx) / \
        (im1(wavec) + wavec) * jnp.cosh((im1(kD) + kD) * fac2) * \
        0.5 * (im1(o2sinh) + o2sinh) * grid.umask
    v_st = (jm1(waveE) + waveE) * (jm1(waveny) + waveny) / \
        (jm1(wavec) + wavec) * jnp.cosh((jm1(kD) + kD) * fac2) * \
        0.5 * (jm1(o2sinh) + o2sinh) * grid.vmask
    if cfg.wetdry:
        dcrit = cfg.dcrit
        fac = jnp.clip((Dstp - dcrit) / (9.0 * dcrit), 0.0, 1.0)
        u_st = u_st * 0.5 * (im1(fac) + fac)
        v_st = v_st * 0.5 * (jm1(fac) + fac)

    Hz_u = 0.5 * (im1(Hz) + Hz)
    Hz_v = 0.5 * (jm1(Hz) + Hz)
    D_u = jnp.sum(Hz_u, axis=0)
    D_v = jnp.sum(Hz_v, axis=0)
    ubar_st = jnp.sum(Hz_u * u_st, axis=0) / jnp.maximum(D_u, _EPS)
    vbar_st = jnp.sum(Hz_v * v_st, axis=0) / jnp.maximum(D_v, _EPS)

    return NearshoreForcing(
        rustr3d=rustr, rvstr3d=rvstr,
        rustr2d=jnp.sum(rustr, axis=0), rvstr2d=jnp.sum(rvstr, axis=0),
        u_stokes=u_st, v_stokes=v_st,
        ubar_stokes=ubar_st, vbar_stokes=vbar_st,
        Sxx=Sxx, Sxy=Sxy, Syy=Syy)
