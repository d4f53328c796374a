"""BIO_TOY: one-dimensional (horizontally uniform) biology test case.

The analog of the reference's BIO_TOY application (External/bio_toy.in +
ana_biology.h:197-212): UPWELLING-style physics with the four NPZD
Powell compartments appended as passive tracers, initialized uniformly
(npzd_Powell.in BioIni) and forced by constant photosynthetically
available radiation (CONST_PAR, Powell & Spitz value 158.075 W/m2).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import Config
from ..ops.biology import NPZDParams
from . import upwelling

BIO_INI = (1.67, 0.08, 0.06, 0.04)     # NO3, Phyt, Zoop, SDet [mmol/m3]


def make_config(Lm: int = 10, Mm: int = 12, N: int = 12,
                dt: float = 300.0, ndtfast: int = 30,
                params: NPZDParams | None = None) -> Config:
    cfg = upwelling.make_config(Lm=Lm, Mm=Mm, N=N, dt=dt, ndtfast=ndtfast)
    return cfg.replace(
        name="bio_toy", ntracers=6,
        t_hadv=6 * ("U3",), t_vadv=6 * ("C4",), tnu2=6 * (0.0,),
        biology="npzd_powell", ibio=(2, 3, 4, 5),
        bio_params=params or NPZDParams(const_par=158.075))


def build(cfg: Config | None = None):
    """Returns (cfg, grid, state0, forcing_fn)."""
    cfg = cfg or make_config()
    cfg_uw = cfg.replace(ntracers=2, biology=None, bio_params=None)
    cfg_uw, grid, s_uw, ffn = upwelling.build(cfg_uw)
    # carry over the grid-finalized fields (hmin, fast-filter nfast);
    # without these the fast barotropic loop is empty and zeta freezes
    cfg = cfg.replace(hmin=cfg_uw.hmin, nfast=cfg_uw.nfast)
    bio = jnp.stack([jnp.full_like(s_uw.t[0], v) for v in BIO_INI])
    t = jnp.concatenate([s_uw.t, bio], axis=0)
    from ..state import initial_state
    s0 = initial_state(cfg, zeta=s_uw.zeta, t=t)
    return cfg, grid, s0, ffn
