"""Per-step global diagnostics and blowup detection.

Reference: ROMS/Nonlinear/diag.F - volume-averaged kinetic/potential
energy, total volume, max Courant/speed, NaN detection (:515-537).
On-device psum-friendly reductions (cheap under shard_map).
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import constants as C
from ..config import Config
from ..grid import Grid, hc_of
from .. import vgrid
from ..state import State
from ..ops.stencil import ip1, jp1


def interior2d(cfg: Config, a):
    H = cfg.halo
    return a[..., H:H + cfg.Mm, H:H + cfg.Lm]


def diagnostics(cfg: Config, grid: Grid, state: State):
    """Returns dict with volume, ke, pe (volume-averaged, m2/s2), max |u|,
    max |zeta|, and a finite flag."""
    hc = hc_of(cfg)
    z_r, z_w, Hz = vgrid.set_depth(grid.h, state.zeta, hc, grid.sc_r,
                                   grid.Cs_r, grid.sc_w, grid.Cs_w,
                                   cfg.vtransform)
    area = interior2d(cfg, grid.omn)
    Hzi = interior2d(cfg, Hz)
    vol_cells = Hzi * area
    volume = jnp.sum(vol_cells.sum(0))

    # KE at rho points: 0.5*(u^2 avg + v^2 avg) per cell volume
    u2 = 0.5 * (state.u ** 2 + ip1(state.u) ** 2)
    v2 = 0.5 * (state.v ** 2 + jp1(state.v) ** 2)
    ke_density = 0.5 * interior2d(cfg, u2 + v2)
    ke = jnp.sum(ke_density * vol_cells) / volume

    # PE relative to z (diag.F uses g*z*rho/rho0 integral)
    rho_anom = None
    from ..ops import eos
    rho_anom = eos.rho_eos(cfg, state.t, z_r) if cfg.ntracers else 0.0
    pe_density = C.g * interior2d(cfg, z_r * (1000.0 + rho_anom)) / cfg.rho0
    pe = jnp.sum(pe_density * vol_cells) / volume

    umax = jnp.maximum(jnp.max(jnp.abs(interior2d(cfg, state.u))),
                       jnp.max(jnp.abs(interior2d(cfg, state.v))))
    zmax = jnp.max(jnp.abs(interior2d(cfg, state.zeta)))
    finite = jnp.isfinite(umax) & jnp.isfinite(zmax) & \
        jnp.isfinite(jnp.max(jnp.abs(interior2d(cfg, state.t))))
    return dict(volume=volume, ke=ke, pe=pe, umax=umax, zmax=zmax,
                finite=finite)


def blowup(cfg: Config, diags, max_speed: float = 20.0,
           max_zeta: float = 100.0):
    """Blowup condition matching diag.F:515-537 semantics."""
    return (~diags["finite"]) | (diags["umax"] > max_speed) | \
        (diags["zmax"] > max_zeta)


def stiffness(cfg: Config, grid: Grid):
    """Grid stiffness ratios (ROMS/Utility/stiffness.F): rx0 (Beckmann &
    Haidvogel bathymetry slope number) and rx1 (Haney number over the
    terrain-following levels at rest).  Returns (rx0, rx1) scalars."""
    hc = hc_of(cfg)
    zeta0 = jnp.zeros_like(grid.h)
    _, z_w, _ = vgrid.set_depth(grid.h, zeta0, hc, grid.sc_r, grid.Cs_r,
                                grid.sc_w, grid.Cs_w, cfg.vtransform)
    H = cfg.halo
    # u-face neighbours over the interior (i and i-1), v-faces likewise
    def faces(a):
        ai = a[..., H:H + cfg.Mm, H:H + cfg.Lm]
        aim = a[..., H:H + cfg.Mm, H - 1:H + cfg.Lm - 1]
        aj = ai
        ajm = a[..., H - 1:H + cfg.Mm - 1, H:H + cfg.Lm]
        return (ai, aim), (aj, ajm)

    (hu, hum), (hv, hvm) = faces(grid.h)
    (mu, mum), (mv, mvm) = faces(grid.rmask)
    wu = mu * mum
    wv = mv * mvm
    rx0 = jnp.maximum(
        jnp.max(wu * jnp.abs(hu - hum) / (hu + hum)),
        jnp.max(wv * jnp.abs(hv - hvm) / (hv + hvm)))

    (zu, zum), (zv, zvm) = faces(z_w)
    num_u = jnp.abs(zu[1:] - zum[1:] + zu[:-1] - zum[:-1])
    den_u = zu[1:] + zum[1:] - zu[:-1] - zum[:-1]
    num_v = jnp.abs(zv[1:] - zvm[1:] + zv[:-1] - zvm[:-1])
    den_v = zv[1:] + zvm[1:] - zv[:-1] - zvm[:-1]
    rx1 = jnp.maximum(jnp.max(wu * num_u / jnp.maximum(den_u, 1e-30)),
                      jnp.max(wv * num_v / jnp.maximum(den_v, 1e-30)))
    return rx0, rx1
