"""Tidal boundary forcing.

The analog of mod_tides.F + set_tides.F: per-constituent amplitude/phase
tables evaluated at model time to produce open-boundary free-surface and
barotropic-current values (fed to ops/obc.py through the `bry` dict).

The reference reconstructs SSH/UV boundary ring values as
  zeta_bry = sum_k amp_k * cos(omega_k * t - phase_k)
with currents from tidal ellipses; here the same sum with (major-axis)
current amplitudes.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax.numpy as jnp

# standard constituent periods (hours) - mod_tides convention
PERIODS_H = {
    "M2": 12.4206012, "S2": 12.0, "N2": 12.65834751, "K2": 11.96723606,
    "K1": 23.93447213, "O1": 25.81933871, "P1": 24.06588766,
    "Q1": 26.868350, "MF": 327.8599387, "MM": 661.3111655,
}


class TidalConstituent(NamedTuple):
    name: str
    zeta_amp: jnp.ndarray     # (nbpts,) SSH amplitude along the boundary
    zeta_phase: jnp.ndarray   # radians
    u_amp: jnp.ndarray = None  # barotropic current amplitude (optional)
    u_phase: jnp.ndarray = None


def tidal_boundary(constituents, time, side: str = "west") -> Dict:
    """Evaluate the constituent sum at model time (s); returns bry dict
    entries zeta_<side> (and ubar/vbar_<side> when current amplitudes are
    given)."""
    z = None
    u = None
    for c in constituents:
        omega = 2.0 * jnp.pi / (PERIODS_H[c.name] * 3600.0)
        zc = c.zeta_amp * jnp.cos(omega * time - c.zeta_phase)
        z = zc if z is None else z + zc
        if c.u_amp is not None:
            uc = c.u_amp * jnp.cos(omega * time - c.u_phase)
            u = uc if u is None else u + uc
    out = {f"zeta_{side}": z}
    if u is not None:
        key = "ubar" if side in ("west", "east") else "vbar"
        out[f"{key}_{side}"] = u
    return out
