"""SED_TOY: small sediment-transport test case.

Analog of the reference's SED_TOY application (ROMS/Include/sed_toy.h +
External/sediment_toy.in): UPWELLING-style physics with suspended
sediment classes appended as passive tracers (concentration kg/m3),
a uniform initial bed, and the sediment module (ops/sediment.py:
settling / erosion-deposition / bed layers / optional MPM bedload)
active each slow step.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import Config
from ..ops.sediment import SedParams
from . import upwelling

SED_INI = 0.0     # initial suspended concentration kg/m3 (sed_toy: clean)


def make_config(Lm: int = 8, Mm: int = 10, N: int = 10,
                dt: float = 300.0, ndtfast: int = 30,
                params: SedParams | None = None) -> Config:
    import dataclasses
    p = dataclasses.replace(params or SedParams(), ised0=2)
    nt = 2 + p.NST
    cfg = upwelling.make_config(Lm=Lm, Mm=Mm, N=N, dt=dt, ndtfast=ndtfast)
    return cfg.replace(
        name="sed_toy", ntracers=nt,
        t_hadv=nt * ("U3",), t_vadv=nt * ("C4",), tnu2=nt * (0.0,),
        sediment=True, sed_params=p)


def build(cfg: Config | None = None, conc: float = SED_INI):
    """Returns (cfg, grid, state0, forcing_fn)."""
    cfg = cfg or make_config()
    p = cfg.sed_params
    cfg_uw = cfg.replace(ntracers=2, sediment=False, sed_params=None)
    cfg_uw, grid, s_uw, ffn = upwelling.build(cfg_uw)
    # carry over the grid-finalized fields (hmin, fast-filter nfast)
    cfg = cfg.replace(hmin=cfg_uw.hmin, nfast=cfg_uw.nfast)
    sed = jnp.stack([jnp.full_like(s_uw.t[0], conc)
                     for _ in range(p.NST)])
    t = jnp.concatenate([s_uw.t, sed], axis=0)
    from ..state import initial_state
    s0 = initial_state(cfg, zeta=s_uw.zeta, t=t)
    return cfg, grid, s0, ffn
