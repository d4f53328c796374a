"""Sediment model (ops/sediment.py): exact water<->bed mass balance,
erosion limiting, MPM bedload conservation, bed-layer bookkeeping, and
the SED_TOY end-to-end case."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from roms_tpu import stepping, vgrid
from roms_tpu.models import sed_toy
from roms_tpu.models.upwelling import hc_of
from roms_tpu.ops.bc import fill_halo
from roms_tpu.ops.sediment import SedParams, apply_sediment, _bed_layers


def _setup(params, conc=0.0, **kw):
    cfg = sed_toy.make_config(params=params, **kw)
    cfg, grid, s0, ffn = sed_toy.build(cfg, conc=conc)
    hc = hc_of(cfg)
    _, z_w, Hz = vgrid.set_depth(grid.h, s0.zeta, hc, grid.sc_r,
                                 grid.Cs_r, grid.sc_w, grid.Cs_w,
                                 cfg.vtransform)
    return cfg, grid, s0, ffn, Hz, z_w


def _inv(cfg, grid, t, bed, Hz):
    """Interior inventory (kg): suspended + bed, per class summed."""
    H = cfg.halo
    jj, ii = slice(H, H + cfg.Mm), slice(H, H + cfg.Lm)
    area = grid.omn[jj, ii]
    p = cfg.sed_params
    wat = sum(float((t[p.ised0 + c][:, jj, ii] * Hz[:, jj, ii] *
                     area).sum()) for c in range(p.NST))
    sed = float((bed[:, :, jj, ii] * area).sum())
    return wat + sed, wat, sed


def test_settle_erode_balance_and_limiting():
    # direct apply_sediment: water-column change must exactly balance
    # bed change per column, and the bed can never go negative even
    # with an absurd erosion rate under strong stress
    p = SedParams(Wsed=(0.002,), Erate=(10.0,),
                  tau_ce=(0.05 / 1025.0,), tau_cd=(0.05 / 1025.0,))
    cfg, grid, s0, _, Hz, z_w = _setup(p, conc=0.3)
    tau = 5.0e-4          # kinematic stress >> tau_ce
    bustr = jnp.full_like(s0.zeta, tau)
    bvstr = jnp.zeros_like(s0.zeta)
    t1, bed1 = apply_sediment(cfg, grid, p, s0.t, s0.bed_mass, Hz, z_w,
                              bustr, bvstr)
    assert float(bed1.min()) >= 0.0
    tot0 = _inv(cfg, grid, s0.t, s0.bed_mass, Hz)[0]
    tot1, wat1, sed1 = _inv(cfg, grid, t1, bed1, Hz)
    np.testing.assert_allclose(tot1, tot0, rtol=1e-12)
    # erosion actually resuspended: near-bottom concentration grew
    H = cfg.halo
    assert float(t1[2][0, H + 3, H + 3]) > float(s0.t[2][0, H + 3, H + 3])

    # zero stress, zero initial concentration: nothing moves at all
    cfg0, grid0, s00, _, Hz0, z_w0 = _setup(SedParams(), conc=0.0)
    t2, bed2 = apply_sediment(cfg0, grid0, cfg0.sed_params, s00.t,
                              s00.bed_mass, Hz0, z_w0,
                              jnp.zeros_like(s00.zeta),
                              jnp.zeros_like(s00.zeta))
    np.testing.assert_allclose(np.asarray(t2), np.asarray(s00.t),
                               atol=1e-15)
    np.testing.assert_allclose(np.asarray(bed2), np.asarray(s00.bed_mass),
                               atol=1e-15)


def test_bedload_mpm_conserves_in_periodic_channel():
    # EW-periodic channel, NS closed: MPM bedload redistributes the top
    # layer but total interior bed mass is conserved (flux out the east
    # face re-enters the west face; no flux through the walls)
    p = SedParams(Wsed=(0.0,), Erate=(0.0,), bedload=True,
                  bedload_coeff=0.5)
    cfg, grid, s0, _, Hz, z_w = _setup(p, conc=0.0)
    H = cfg.halo
    # nonuniform stress field (eastward, varying along the channel)
    jj = jnp.arange(s0.zeta.shape[-2])[:, None]
    ii = jnp.arange(s0.zeta.shape[-1])[None, :]
    bustr = fill_halo(cfg, 2.0e-3 * (1.0 + 0.5 *
                                     jnp.sin(2 * jnp.pi * ii / cfg.Lm)) *
                      jnp.exp(-((jj - H - cfg.Mm / 2) / cfg.Mm) ** 2))
    bvstr = fill_halo(cfg, 5.0e-4 * jnp.cos(2 * jnp.pi * ii / cfg.Lm) *
                      jnp.ones_like(jj * ii, bustr.dtype))
    bed = s0.bed_mass
    tot0 = _inv(cfg, grid, s0.t, bed, Hz)[0]
    t = s0.t
    for _ in range(5):
        t, bed = apply_sediment(cfg, grid, p, t, bed, Hz, z_w,
                                bustr, bvstr)
    tot1 = _inv(cfg, grid, t, bed, Hz)[0]
    np.testing.assert_allclose(tot1, tot0, rtol=1e-11)
    # it actually moved mass around
    top = np.asarray(bed[0, 0, H:H + cfg.Mm, H:H + cfg.Lm])
    assert top.std() > 1e-6
    assert top.min() >= 0.0


def test_bed_layers_borrow_and_split():
    p = SedParams(Nbed=3, newlayer_thick=0.01)
    cfg, grid, s0, _, Hz, z_w = _setup(p)
    dt = np.dtype(cfg.dtype)
    shp = s0.zeta.shape
    unit = p.Srho[0] * (1.0 - p.poros)       # kg/m2 per m thickness

    # (a) thin top layer + deep active layer -> borrow from layer 2
    bed = jnp.stack([jnp.full((1,) + shp, th * unit, dt)
                     for th in (0.001, 0.05, 0.05)])
    iactv = jnp.full(shp, 0.02, dt)
    out = _bed_layers(cfg, p, bed, iactv)
    th0 = float(out[0, 0, 3, 3]) / unit
    np.testing.assert_allclose(th0, 0.02, rtol=1e-9)
    np.testing.assert_allclose(float(out.sum()), float(bed.sum()),
                               rtol=1e-12)

    # (b) very thick top layer -> split into new stratum, bottom merge
    bed = jnp.stack([jnp.full((1,) + shp, th * unit, dt)
                     for th in (0.2, 0.01, 0.01)])
    iactv = jnp.full(shp, 0.02, dt)
    out = _bed_layers(cfg, p, bed, iactv)
    np.testing.assert_allclose(float(out[0, 0, 3, 3]) / unit, 0.02,
                               rtol=1e-9)
    np.testing.assert_allclose(float(out[1, 0, 3, 3]) / unit, 0.18,
                               rtol=1e-9)
    np.testing.assert_allclose(float(out[2, 0, 3, 3]) / unit, 0.02,
                               rtol=1e-9)
    np.testing.assert_allclose(float(out.sum()), float(bed.sum()),
                               rtol=1e-12)


def test_sed_toy_end_to_end():
    # full model: suspended mud settles out while the upwelling wind
    # spins the channel up; total sediment (water+bed) conserved, bed
    # gains mass, everything stays finite
    p = SedParams(Wsed=(0.001,), Erate=(0.0,))
    cfg, grid, s0, ffn, Hz, z_w = _setup(p, conc=0.1)
    tot0, wat0, sed0 = _inv(cfg, grid, s0.t, s0.bed_mass, Hz)
    step = stepping.make_stepper(cfg, grid, ffn, donate=False)
    s = s0
    for _ in range(30):
        s = step(s)
    hc = hc_of(cfg)
    _, _, Hz1 = vgrid.set_depth(grid.h, s.zeta, hc, grid.sc_r, grid.Cs_r,
                                grid.sc_w, grid.Cs_w, cfg.vtransform)
    tot1, wat1, sed1 = _inv(cfg, grid, s.t, s.bed_mass, Hz1)
    assert np.isfinite(np.asarray(s.t)).all()
    assert np.isfinite(np.asarray(s.bed_mass)).all()
    assert sed1 > sed0                     # deposition happened
    assert wat1 < wat0
    np.testing.assert_allclose(tot1, tot0, rtol=1e-8)


def test_sed_morph_erosion_deepens_h():
    """SED_MORPH: strong erosion thins the bed and the effective
    bathymetry deepens (set_depth.F:166,214 feedback with the
    morphological acceleration factor)."""
    import numpy as np
    import jax.numpy as jnp
    from roms_tpu.models import sed_toy
    from roms_tpu.ops.sediment import SedParams, bed_thickness_total
    from roms_tpu import stepping, vgrid
    from roms_tpu.grid import hc_of
    from roms_tpu.state import _initial_bed_mass

    p = SedParams(Sd50=(0.0001,), Wsed=(1.0e-4,), Erate=(5.0e-3,),
                  tau_ce=(1.0e-6,), tau_cd=(1.0e-6,),
                  sed_morph=True, morph_fac=50.0)
    cfg = sed_toy.make_config(params=p)
    cfg, grid, s0, ffn = sed_toy.build(cfg)

    # strong bottom current so the drag-law stress far exceeds tau_ce
    u = jnp.full((cfg.N,) + grid.h.shape, 0.5, s0.zeta.dtype)
    s = s0.replace(u=u, ubar=jnp.full_like(s0.zeta, 0.5))
    thick_start = bed_thickness_total(p, s.bed_mass)
    for _ in range(5):
        s = stepping.step(cfg, grid, s, ffn)
    thick_end = bed_thickness_total(p, s.bed_mass)
    H = cfg.halo
    jj, ii = slice(H, H + cfg.Mm), slice(H, H + cfg.Lm)
    d_thick = np.asarray(thick_end - thick_start)[jj, ii]
    assert d_thick.min() < -1.0e-5          # net erosion
    # morph feedback: same erosion WITHOUT sed_morph leaves more bed
    # change in h-space: compare the effective depth offsets
    thick0 = bed_thickness_total(
        p, _initial_bed_mass(cfg, grid.h.shape, grid.h.dtype))
    dh = np.asarray(bed_thickness_total(p, s.bed_mass) - thick0)[jj, ii]
    assert dh.min() < -1.0e-5               # h deepened where eroded
    assert np.isfinite(np.asarray(s.t)).all()


def test_soulsby_bedload_runs_and_transports():
    """BEDLOAD_SOULSBY: wave-dominated stresses move bed mass along the
    current direction (sed_bedload.F Soulsby-Damgaard branch)."""
    import numpy as np
    import jax.numpy as jnp
    from roms_tpu.config import Config
    from roms_tpu.ops.sediment import SedParams, _bedload_mpm
    from roms_tpu.models import sed_toy

    p = SedParams(Sd50=(0.0005,), Wsed=(1.0e-3,),
                  bedload=True, bedload_method="soulsby",
                  bedload_coeff=1.0, tau_ce=(0.05 / 1025.0,))
    cfg = sed_toy.make_config(params=p)
    cfg, grid, s0, ffn = sed_toy.build(cfg)
    shp = grid.h.shape
    dt64 = s0.zeta.dtype
    bed = s0.bed_mass
    # eastward current stress + waves at 45 degrees
    tau_c = jnp.full(shp, 2.0e-4, dt64)
    tau_w = jnp.full(shp, 1.0e-3, dt64)
    phicw = jnp.full(shp, 0.25 * np.pi, dt64)
    bustr = jnp.full(shp, 2.0e-4, dt64)
    bvstr = jnp.zeros(shp, dt64)
    tau_mag = jnp.full(shp, 1.2e-3, dt64)
    bed2 = _bedload_mpm(cfg, grid, p, bed, tau_mag, bustr, bvstr,
                        tau_c=tau_c, tau_wav=tau_w, phicw=phicw)
    d = np.asarray(bed2[0, 0] - bed[0, 0])
    H = cfg.halo
    # uniform stresses: divergence-free transport leaves the bed flat
    assert np.isfinite(d).all()
    assert np.abs(d[H + 2:-H - 2, H + 2:-H - 2]).max() < 1e-12
    # a stress gradient (stronger waves downstream) makes the transport
    # divergent: mass erodes where the flux increases along-stream
    x = jnp.linspace(0.5, 1.5, shp[1])[None, :]
    tau_wx = tau_w * x
    bed3 = _bedload_mpm(cfg, grid, p, bed, tau_mag, bustr, bvstr,
                        tau_c=tau_c, tau_wav=tau_wx, phicw=phicw)
    db = np.asarray(bed3[0, 0] - bed[0, 0])
    mid = db[H + 3:-H - 3, H + 3:-H - 3]
    assert mid.min() < -1e-12               # divergent flux erodes
    assert np.isfinite(db).all()
