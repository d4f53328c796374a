"""Mellor-Yamada level-2.5 turbulence closure (dedicated code path).

Reference: ROMS/Nonlinear/my25_corstep.F (Mellor & Yamada 1982;
Galperin et al. 1988).  The predictor (my25_prestep.F) is textually
identical to gls_prestep.F, so ``gls.gls_prestep`` is reused for it.

State convention: tke = q^2, gls = q^2*l, both at W-points.  The
corrector advects the intermediate fields, adds shear/buoyancy
production, solves the implicit dissipation + vertical-diffusion
tridiagonal with Dirichlet surface/bottom values B1^(2/3)*u*^2, limits
the length scale (Galperin), and evaluates the Sm/Sh stability
functions (Galperin form by default, Kantha & Clayson optional;
mod_scalars.F:4475-4490).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import Config
from ..grid import Grid
from . import bc
from .gls import _upwind3_fluxes, _vadv_w, _smooth_w, _gls_tridiag
from .stencil import ip1, jp1

vonKar = 0.41
eps = 1.0e-10

# closure constants (mod_scalars.F:1756-1770)
my_A1 = 0.92
my_A2 = 0.74
my_B1 = 16.6
my_B2 = 10.1
my_C1 = 0.08
my_C2 = 0.7
my_C3 = 0.2
my_E1 = 1.8
my_E2 = 1.33
my_Gh0 = 0.0233
my_Sq = 0.2
my_lmax = 0.53
my_qmin = 1.0e-8

# derived stability-function factors (mod_scalars.F:4475-4490)
my_B1p2o3 = my_B1 ** (2.0 / 3.0)
my_B1pm1o3 = my_B1 ** (-1.0 / 3.0)
my_Sm1 = my_A1 * my_A2 * ((my_B2 - 3.0 * my_A2) *
                          (1.0 - 6.0 * my_A1 / my_B1) -
                          3.0 * my_C1 * (my_B2 + 6.0 * my_A1))
my_Sm2 = 9.0 * my_A1 * my_A2
my_Sh1 = my_A2 * (1.0 - 6.0 * my_A1 / my_B1)
# Galperin et al. (1988) default
my_Sh2_gal = 3.0 * my_A2 * (6.0 * my_A1 + my_B2)
my_Sm3 = my_A1 * (1.0 - 3.0 * my_C1 - 6.0 * my_A1 / my_B1)
my_Sm4_gal = 18.0 * my_A1 * my_A1 + 9.0 * my_A1 * my_A2
# Kantha & Clayson (1994) variant
my_Sh2_kc = 3.0 * my_A2 * (6.0 * my_A1 + my_B2 * (1.0 - my_C3))
my_Sm4_kc = 18.0 * my_A1 * my_A1 + 9.0 * my_A1 * my_A2 * (1.0 - my_C2)


def _spline_shear2(u, v, Hz):
    """Parabolic-spline du/dz, dv/dz at W points and their square sum
    (my25_corstep.F RI_SPLINES branch)."""
    from .vmix import _spline_deriv
    rhs_u = 3.0 * ((u[1:] - u[:-1]) + ip1(u[1:] - u[:-1]))
    rhs_v = 3.0 * ((v[1:] - v[:-1]) + jp1(v[1:] - v[:-1]))
    dU = _spline_deriv(Hz, rhs_u)
    dV = _spline_deriv(Hz, rhs_v)
    return dU * dU + dV * dV


def my25_corstep(cfg: Config, grid: Grid, iic,
                 tke, gls, tke3, gls3, tke_nnew, gls_nnew,
                 u, v, bvf, Hz, z_r, z_w, Huon, Hvom, W,
                 Akv, Akt, Akk, Lscale,
                 sustr, svstr, bustr, bvstr,
                 kantha_clayson: bool = False):
    """MY2.5 corrector step (my25_corstep.F:160-894).

    Arguments mirror gls.gls_corstep; returns
    (tke_new, gls_new, Akv, Akt, Akk, Lscale).
    """
    dt = cfg.dt
    N = cfg.N
    pmn = grid.pm * grid.pn

    # ---- shear^2 (spline) and buoyancy at W points, smoothed like our
    #      GLS path (N2S2_HORAVG; my25_corstep.F:276-340) ----
    shear2 = _spline_shear2(u, v, Hz)
    shear2 = _smooth_w(cfg, shear2)
    buoy2 = _smooth_w(cfg, bvf)

    # ---- horizontal advection (3rd upstream; :350-538) ----
    Hu_w = 0.5 * (Huon[:-1] + Huon[1:])
    Hv_w = 0.5 * (Hvom[:-1] + Hvom[1:])
    FXk, FEk = _upwind3_fluxes(cfg, tke3[1:N], Hu_w, Hv_w)
    FXp, FEp = _upwind3_fluxes(cfg, gls3[1:N], Hu_w, Hv_w)
    cdt = dt * pmn
    tke_n = tke_nnew[1:N] - cdt * ((ip1(FXk) - FXk) + (jp1(FEk) - FEk))
    gls_n = gls_nnew[1:N] - cdt * ((ip1(FXp) - FXp) + (jp1(FEp) - FEp))

    # ---- vertical advection (:540-578) ----
    FCk = _vadv_w(tke3, W)
    FCp = _vadv_w(gls3, W)
    tke_n = tke_n - cdt * (FCk[1:] - FCk[:-1])
    gls_n = gls_n - cdt * (FCp[1:] - FCp[:-1])

    # ---- production terms (:595-636) ----
    b2 = buoy2[1:N]
    s2 = shear2[1:N]
    # ignore small negative buoyancy (my25_corstep.F:603-608)
    strat2 = jnp.where((b2 > -5.0e-5) & (b2 < 0.0), 0.0, b2)
    Qprod = s2 * (Akv[1:N] - cfg.akv_bak) - \
        strat2 * (Akt[0][1:N] - cfg.akt_bak[0])
    Ls_unlmt0 = jnp.maximum(eps, gls[1:N] / jnp.maximum(tke[1:N], eps))
    Hz_w = 0.5 * (Hz[:-1] + Hz[1:])
    tke_n = tke_n + dt * Hz_w * Qprod * 2.0
    gls_n = gls_n + dt * Hz_w * Qprod * my_E1 * Ls_unlmt0

    # ---- dissipation + wall proximity (:625-636) ----
    cff3 = my_E2 / (vonKar * vonKar)
    Qdiss = dt * jnp.sqrt(tke[1:N]) / (my_B1 * Ls_unlmt0)
    wall = Ls_unlmt0 * (1.0 / (z_w[-1][None] - z_w[1:N]) +
                        1.0 / (z_w[1:N] - z_w[0][None]))
    Wscale = 1.0 + cff3 * wall * wall

    # vertical-diffusion couplings FC(k) = -0.5*dt*(Akk(k)+Akk(k-1))/Hz(k),
    # k = 1..N (:586-592); tke and gls share Akk
    FC_all = -0.5 * dt * (Akk[1:] + Akk[:-1]) / Hz      # (N, ...) k=1..N
    FC = FC_all[:-1]                                    # k = 1..N-1
    FC_up = FC_all[1:]                                  # FC(k+1), k=1..N-1
    BCK = Hz_w * (1.0 + 2.0 * Qdiss) - FC - FC_up
    BCP = Hz_w * (1.0 + Wscale * Qdiss) - FC - FC_up

    # ---- Dirichlet surface/bottom values (:643-655) ----
    tke_sfc = my_B1p2o3 * 0.5 * jnp.sqrt(
        (sustr + ip1(sustr)) ** 2 + (svstr + jp1(svstr)) ** 2)
    tke_bot = my_B1p2o3 * 0.5 * jnp.sqrt(
        (bustr + ip1(bustr)) ** 2 + (bvstr + jp1(bvstr)) ** 2)
    gls_sfc = jnp.zeros_like(tke_sfc)
    gls_bot = jnp.zeros_like(tke_bot)

    tke_i = _gls_tridiag(BCK, FC, tke_n,
                         FC_up[-1] * tke_sfc, tke_bot)
    gls_i = _gls_tridiag(BCP, FC, gls_n,
                         FC_up[-1] * gls_sfc, gls_bot)
    tke_i = jnp.maximum(tke_i, my_qmin)
    gls_i = jnp.maximum(gls_i, my_qmin)

    # ---- length-scale limit + stability functions (:700-760) ----
    Ls_unlmt = gls_i / tke_i
    Ls_lmt = jnp.minimum(
        Ls_unlmt,
        my_lmax * jnp.sqrt(tke_i / (jnp.maximum(0.0, b2) + eps)))
    Gh = jnp.minimum(my_Gh0, -b2 * Ls_lmt * Ls_lmt / tke_i)
    if kantha_clayson:
        Sh = my_Sh1 / (1.0 - my_Sh2_kc * Gh)
        Sm = (my_B1pm1o3 + Sh * Gh * my_Sm4_kc) / (1.0 - my_Sm2 * Gh)
    else:
        Sh = my_Sh1 / (1.0 - my_Sh2_gal * Gh)
        Sm = (my_Sm3 + Sh * Gh * my_Sm4_gal) / (1.0 - my_Sm2 * Gh)

    # average q*l across the two time levels (:762-776)
    ql = 0.5 * (Ls_lmt * jnp.sqrt(tke_i) +
                Lscale[1:N] * jnp.sqrt(tke[1:N]))
    akk_bak = 5.0e-6
    Akv_i = cfg.akv_bak + ql * Sm
    Akk_i = akk_bak + ql * my_Sq
    Lscale_i = Ls_lmt

    cat = lambda b, mid, t: jnp.concatenate([b[None], mid, t[None]], axis=0)
    fh = lambda a: bc.fill_halo(cfg, a)
    Akv_new = fh(cat(Akv[0], Akv_i, Akv[-1]))
    nat = Akt.shape[0]
    Akt_new = jnp.stack(
        [fh(cat(Akt[i][0], cfg.akt_bak[i] + ql * Sh, Akt[i][-1]))
         for i in range(nat)], axis=0)
    Akk_new = fh(cat(Akk[0], Akk_i, Akk[-1]))
    Lscale_new = fh(cat(jnp.zeros_like(tke_bot), Lscale_i,
                        jnp.zeros_like(tke_sfc)))
    tke_new = fh(cat(tke_bot, tke_i, tke_sfc))
    gls_new = fh(cat(gls_bot, gls_i, gls_sfc))
    return tke_new, gls_new, Akv_new, Akt_new, Akk_new, Lscale_new
