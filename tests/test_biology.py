"""NPZD Powell biology: exact per-stage nitrogen conservation, bloom
dynamics under constant PAR, and the CFL-free PPM sinking operator."""

import jax
import jax.numpy as jnp
import numpy as np

from roms_tpu.ops.biology import NPZDParams, ppm_sink
from roms_tpu.models import bio_toy
from roms_tpu import stepping


def _totals(cfg, grid, s):
    """Per-compartment column inventories Sum t*Hz*area (mmol)."""
    from roms_tpu import vgrid
    from roms_tpu.models.upwelling import hc_of
    H = cfg.halo
    hc = hc_of(cfg)
    _, _, Hz = vgrid.set_depth(grid.h, s.zeta, hc, grid.sc_r, grid.Cs_r,
                               grid.sc_w, grid.Cs_w, cfg.vtransform)
    jj, ii = slice(H, H + cfg.Mm), slice(H, H + cfg.Lm)
    area = grid.omn[jj, ii]
    return np.array([float((s.t[i][:, jj, ii] * Hz[:, jj, ii] *
                            area).sum()) for i in cfg.ibio])


def test_npzd_nitrogen_conservation_and_bloom():
    # no sinking: every conversion stage is conservative, so total N
    # (NO3+P+Z+D inventory) must be constant while a bloom develops
    p = NPZDParams(const_par=158.075, wPhy=0.0, wDet=0.0)
    cfg = bio_toy.make_config(Lm=6, Mm=8, N=10, params=p)
    cfg, grid, s0, ffn = bio_toy.build(cfg)
    tot0 = _totals(cfg, grid, s0)
    step = stepping.make_stepper(cfg, grid, ffn, donate=False)
    s = s0
    for _ in range(40):          # ~3.3 h
        s = step(s)
    tot1 = _totals(cfg, grid, s)
    assert np.isfinite(tot1).all()
    # bloom: P grows at the expense of NO3 near the surface
    H = cfg.halo
    assert float(s.t[3][-1, H + 4, H + 3]) > bio_toy.BIO_INI[1]
    assert float(s.t[2][-1, H + 4, H + 3]) < bio_toy.BIO_INI[0]
    # total nitrogen conserved (advection is constancy-preserving for
    # the uniform fields; biology conserves exactly by construction)
    np.testing.assert_allclose(tot1.sum(), tot0.sum(), rtol=1e-9)


def test_npzd_detritus_sinking_exports():
    # with wDet=80 m/day the detritus pool reaches the seabed and is
    # exported, so total N decreases monotonically
    p = NPZDParams(const_par=0.0, wPhy=0.0, wDet=80.0,
                   DetRR=0.0, ZooGR=0.0, PhyMRD=0.0, ZooMRD=0.0)
    cfg = bio_toy.make_config(Lm=6, Mm=8, N=10, params=p)
    cfg, grid, s0, ffn = bio_toy.build(cfg)
    tot0 = _totals(cfg, grid, s0)
    step = stepping.make_stepper(cfg, grid, ffn, donate=False)
    s = s0
    tots = []
    for _ in range(30):
        s = step(s)
        tots.append(_totals(cfg, grid, s).sum())
    assert np.isfinite(np.array(tots)).all()
    assert tots[-1] < tot0.sum()             # seabed export happened
    diffs = np.diff([tot0.sum()] + tots)
    assert (diffs <= 1e-9).all()             # monotone loss


def test_ppm_sink_operator():
    # uniform 1 m grid; a blob sinks by exactly the prescribed distance
    N = 40
    z_w = jnp.arange(-float(N), 1.0)[:, None, None]      # -40..0
    Hz = jnp.ones((N, 1, 1))
    k = jnp.arange(N)[:, None, None]
    qc = jnp.exp(-((k - 30.0) / 3.0) ** 2)
    dist = 7.0
    out, export = jax.jit(lambda q: ppm_sink(q, Hz, z_w, dist))(qc)
    out = np.asarray(out)[:, 0, 0]
    qn = np.asarray(qc)[:, 0, 0]
    # mass conserved (blob far from the seabed: no export)
    np.testing.assert_allclose(out.sum(), qn.sum(), rtol=1e-12)
    np.testing.assert_allclose(float(export[0, 0]), 0.0, atol=1e-12)
    # center of mass moved down by dist
    com0 = (qn * np.arange(N)).sum() / qn.sum()
    com1 = (out * np.arange(N)).sum() / out.sum()
    np.testing.assert_allclose(com0 - com1, dist, atol=0.05)
    # positivity preserved
    assert out.min() > -1e-12
    # multi-cell CFL-free: the blob sits at z~-9.5, so dist=35 pushes
    # most of it through the seabed; remaining + export = original
    out2, export2 = ppm_sink(qc, Hz, z_w, 35.0)
    np.testing.assert_allclose(float(jnp.sum(out2) + export2[0, 0]),
                               qn.sum(), rtol=1e-12)
    assert float(export2[0, 0]) > 0.5 * qn.sum()
