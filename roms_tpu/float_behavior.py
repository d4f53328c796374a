"""Biological float behaviors (FLOAT_BIOLOGY).

The analog of ROMS/Nonlinear/Biology/biology_floats.F dispatching to
oyster_floats.h (Dekshenieks et al. 1993-1997 oyster-larvae behavior),
plus the diel-vertical-migration behavior commonly driven through the
same hook.  Behaviors produce a per-float vertical velocity (m/s) that
rides step_floats' w_vwalk slot (the reference adds the behavioral w to
the float velocity inside its predictor/corrector the same way), plus
per-float state carried alongside FloatsState.

Documented reductions vs oyster_floats.h: the reference interpolates
growth-rate/growth-factor/swim-time lookup TABLES read from the floats
input script (mod_behavior.F); here the published closed-form pieces
are used directly - the sinking-rate law SR = 2.665*exp(0.0058*(L-220))
um/s (oyster_floats.h:34), linear food-limited growth, and smooth
Gaussian T/S growth factors fitted to the same optima - and food/
turbidity are the constant ambient values (food_supply/turb_ambi), as
in the reference's default setup (oyster_floats.h:229-232).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .config import Config


# ---------------------------------------------------------------------------
# diel vertical migration (biology_floats.F DVM-style behavior)
# ---------------------------------------------------------------------------
def diel_migration_w(cfg: Config, z_float, time, z_day=-40.0,
                     z_night=-5.0, w_swim=0.01):
    """Behavioral vertical velocity (m/s) for diel vertical migration:
    swim toward z_day during daylight hours and z_night at night, at up
    to w_swim.  z_float: the floats' current depths (m, negative)."""
    tday = time / 86400.0
    hour = 24.0 * (tday - jnp.floor(tday))
    is_day = (hour >= 6.0) & (hour < 18.0)
    target = jnp.where(is_day, z_day, z_night)
    dz = target - z_float
    return jnp.clip(dz / 3600.0, -w_swim, w_swim)


# ---------------------------------------------------------------------------
# oyster larvae (oyster_floats.h)
# ---------------------------------------------------------------------------
class OysterParams(NamedTuple):
    """Defaults follow the reference's behavior metadata
    (mod_behavior.F / floats input script)."""
    size0: float = 60.0          # initial larval size (um)
    size_settle: float = 330.0   # settlement size (um)
    food_supply: float = 1.0     # ambient food (mg Carbon/l)
    turb_ambi: float = 0.05      # ambient turbidity (g/l)
    turb_crit: float = 0.1       # critical turbidity
    growth_max: float = 0.018    # max growth rate (um/s scale 1/3600)
    temp_opt: float = 25.0       # growth-optimal temperature (C)
    temp_sig: float = 6.0
    salt_opt: float = 22.0       # growth-optimal salinity
    salt_sig: float = 8.0
    swim_Tmin: float = 0.2       # swimming-time fraction bounds
    swim_Tmax: float = 1.0
    w_swim: float = 2.0e-3       # upward swimming speed (m/s)
    slope_Tinc: float = 0.8      # swim-time response to dS/dt > 0
    slope_Tdec: float = -1.6     # and to dS/dt < 0 (halocline cue)


class OysterState(NamedTuple):
    size: jnp.ndarray            # larval length (um)
    swim_time: jnp.ndarray       # swimming-time fraction [0..1]
    settled: jnp.ndarray         # 1.0 once settled on the bed


def init_oysters(nfloats: int, p: OysterParams,
                 dtype=jnp.float64) -> OysterState:
    return OysterState(
        size=jnp.full((nfloats,), p.size0, dtype),
        swim_time=jnp.full((nfloats,),
                           0.5 * (p.swim_Tmin + p.swim_Tmax), dtype),
        settled=jnp.zeros((nfloats,), dtype))


def oyster_behavior(cfg: Config, p: OysterParams, st: OysterState,
                    temp_f, salt_f, dsalt, z_float, h_float):
    """One behavioral update (oyster_floats.h:174-330 semantics).

    temp_f/salt_f: fields sampled at the float positions; dsalt: change
    of salinity along the track this step (the halocline swimming cue);
    z_float: depth (m, negative); h_float: local water depth (m).
    Returns (new OysterState, w_bio) with w_bio the behavioral vertical
    velocity (m/s): upward swimming for the swimming fraction of the
    time, Dekshenieks sinking for the remainder, zero once settled."""
    dt = cfg.dt
    # growth: food-limited rate * T,S environmental factor * turbidity
    # effect (d(Lsize)/dt = growth(food,L)*Gfactor(T,S)*turb_ef)
    food_lim = p.food_supply / (p.food_supply + 0.5)
    gfac_T = jnp.exp(-0.5 * ((temp_f - p.temp_opt) / p.temp_sig) ** 2)
    gfac_S = jnp.exp(-0.5 * ((salt_f - p.salt_opt) / p.salt_sig) ** 2)
    turb_ef = jnp.where(p.turb_ambi > p.turb_crit, 0.4, 1.0)
    growth = p.growth_max * food_lim * gfac_T * gfac_S * turb_ef
    size = jnp.where(st.settled > 0.5, st.size,
                     st.size + dt / 3600.0 * growth * 3600.0 *
                     (1.0 - st.size / (1.3 * p.size_settle)))

    # swimming-time fraction responds to the salinity trend along the
    # track (larvae swim up in rising salinity; oyster_floats.h:260-300)
    swim = st.swim_time + jnp.where(dsalt >= 0.0,
                                    p.slope_Tinc * dsalt,
                                    p.slope_Tdec * (-dsalt))
    swim = jnp.clip(swim, p.swim_Tmin, p.swim_Tmax)

    # sinking rate SR = 2.665 * exp(0.0058*(L-220)) um/s
    # (oyster_floats.h:34), converted to m/s
    w_sink = 2.665e-6 * jnp.exp(0.0058 * (size - 220.0))
    w_bio = swim * p.w_swim - (1.0 - swim) * w_sink

    # settlement: large enough and within 1 m of the bed
    near_bed = z_float <= (-h_float + 1.0)
    settled = jnp.where((size >= p.size_settle) & near_bed,
                        1.0, st.settled)
    w_bio = jnp.where(settled > 0.5, 0.0, w_bio)
    return OysterState(size=size, swim_time=swim,
                       settled=settled), w_bio
