"""MPDATA tracer advection tests (mpdata_adiff.F / step3d_t.F MPDATA path).

Checks the defining properties of the scheme: exact constancy
preservation, positivity/monotonicity (the Smolarkiewicz & Grabowski
beta-ratio limiter), and reduced numerical diffusion vs plain first-order
upstream on a sharp front.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from roms_tpu.models import upwelling
from roms_tpu import stepping


def make(hadv="MPDATA", vadv="MPDATA"):
    cfg = upwelling.make_config(Lm=16, Mm=24, N=8, ndtfast=10)
    cfg = cfg.replace(t_hadv=(hadv,) * 2, t_vadv=(vadv,) * 2)
    return upwelling.build(cfg)


def interior(cfg, a):
    H = cfg.halo
    return np.asarray(a[..., H:H + cfg.Mm, H:H + cfg.Lm])


def test_mpdata_constancy():
    cfg, grid, s0, ffn = make()
    tc = jnp.stack([jnp.full_like(s0.t[0], 14.0),
                    jnp.full_like(s0.t[0], 35.0)])
    s = s0.replace(t=tc, t_prev=tc)
    stepf = stepping.make_stepper(cfg, grid, ffn, donate=False)
    for _ in range(8):
        s = stepf(s)
    assert np.abs(interior(cfg, s.t[0]) - 14.0).max() < 1e-7
    assert np.abs(interior(cfg, s.t[1]) - 35.0).max() < 1e-7


def test_mpdata_positivity_and_bounds():
    """A positive blob advected by the upwelling flow must stay within
    its initial [0, max] range (monotonicity)."""
    cfg, grid, s0, ffn = make()
    H = cfg.halo
    blob = jnp.zeros_like(s0.t[0])
    blob = blob.at[:, H + 8:H + 14, H + 4:H + 10].set(1.0)
    t = s0.t.at[1].set(blob)
    s = s0.replace(t=t, t_prev=t)
    stepf = stepping.make_stepper(cfg, grid, ffn, donate=False)
    for _ in range(25):
        s = stepf(s)
    q = interior(cfg, s.t[1])
    assert np.isfinite(q).all()
    # The limiter forbids advective over/undershoots; the residual
    # tolerance is the split-explicit constancy error (O(1e-9)/step, see
    # test_step3d.py) that even a constant field accumulates.
    assert q.min() > -1e-7
    assert q.max() < 1.0 + 1e-7


def test_mpdata_beats_upstream_diffusion():
    """Uniform 1-D advection of a Gaussian: the anti-diffusive pass must
    retain a much sharper peak than plain first-order upstream while
    staying monotone (max never exceeds the initial max)."""
    from roms_tpu.config import LBC
    from roms_tpu.ops import bc
    from roms_tpu.ops.mpdata import mpdata_adiff, mpdata_corrected_fluxes
    from roms_tpu.ops.stencil import ip1, jp1

    cfg = upwelling.make_config(Lm=64, Mm=8, N=4, ndtfast=10)
    cfg = cfg.replace(ns_periodic=True, ew_periodic=True,
                      lbc_t=LBC.doubly_periodic())
    _, grid, s0, _ = upwelling.build(cfg)
    H = cfg.halo
    Ny, Nx = s0.zeta.shape
    N = cfg.N
    dt = cfg.dt
    Hz = jnp.full((N, Ny, Nx), 10.0)
    oHz = 1.0 / Hz
    Huon = 0.5 * Hz * grid.on_u          # u = 0.5 m/s, Courant 0.15
    Hvom = jnp.zeros_like(Huon)
    W = jnp.zeros((N + 1, Ny, Nx))
    z_r = jnp.cumsum(Hz, 0) - 5.0 - 40.0
    pmn = grid.pm * grid.pn

    x = jnp.arange(Nx, dtype=s0.zeta.dtype)
    q0 = 1.0 + jnp.exp(-0.5 * ((x - H - 20) / 3.0) ** 2)
    q = bc.fill_halo(cfg, jnp.broadcast_to(q0[None, None, :], (N, Ny, Nx)))

    def step_u1(q):
        FX = jnp.maximum(Huon, 0) * jnp.roll(q, 1, -1) + \
            jnp.minimum(Huon, 0) * q
        return bc.fill_halo(cfg, (q * Hz - dt * pmn * (ip1(FX) - FX)) * oHz)

    def step_mp(q):
        Ta = step_u1(q)
        Ua, Va, Wa = mpdata_adiff(cfg, grid, q, Ta, Huon, Hvom, W, oHz,
                                  z_r)
        FX2, FE2, FC2 = mpdata_corrected_fluxes(grid, Ta, Ua, Va, Wa, Hz)
        tn = Ta * Hz - dt * pmn * ((ip1(FX2) - FX2) + (jp1(FE2) - FE2) +
                                   (FC2[1:] - FC2[:-1]))
        return bc.fill_halo(cfg, tn * oHz)

    qm, qu = q, q
    for _ in range(40):
        qm = step_mp(qm)
        qu = step_u1(qu)
    pm_prof = np.asarray(qm[0, H])
    pu_prof = np.asarray(qu[0, H])
    assert pm_prof.max() > pu_prof.max() + 0.1     # much sharper peak
    assert pm_prof.max() <= q0.max() + 1e-12       # still monotone
    assert pm_prof.min() >= 1.0 - 1e-12


def test_mpdata_requires_both_directions():
    cfg, grid, s0, ffn = make(hadv="MPDATA", vadv="C4")
    stepf = stepping.make_stepper(cfg, grid, ffn, donate=False)
    with pytest.raises(ValueError):
        stepf(s0)
