"""Rotated-tensor horizontal tracer mixing (ops/mix3d.py):
geopotential (t3dmix2/4_geo) and isopycnal (t3dmix2/4_iso) variants.

Checks: exact tracer-mass conservation in a doubly-periodic domain,
flat-grid degeneration of the geo rotation to the s-surface operator,
the epineutral null property (a tracer that is a linear function of
potential density has exactly zero isopycnal-diffusion tendency), and
down-gradient sign for a dianeutral tracer."""

import jax.numpy as jnp
import numpy as np

from roms_tpu.config import LBC
from roms_tpu.grid import build_grid, hc_of
from roms_tpu.models import upwelling
from roms_tpu import vgrid
from roms_tpu.ops import bc
from roms_tpu.ops.mix3d import (t3dmix2, t3dmix4, t3dmix2_geo,
                                t3dmix4_geo, t3dmix2_iso, t3dmix4_iso,
                                uv3dmix2, uv3dmix2_geo, uv3dmix4,
                                uv3dmix4_geo)


def _setup(flat: bool, doubly_periodic: bool = True):
    per = LBC.doubly_periodic()
    cfg = upwelling.make_config(Lm=10, Mm=12, N=10).replace(
        ew_periodic=True, ns_periodic=doubly_periodic,
        lbc_zeta=per, lbc_ubar=per, lbc_vbar=per,
        lbc_u=per, lbc_v=per, lbc_t=per,
        tnu2=(30.0, 30.0), tnu4=(1.0e8, 1.0e8), ts_dif4=True)

    def depth(xr, yr, i, j, c):
        if flat:
            return np.full_like(xr, 100.0)
        return 100.0 - 40.0 * np.sin(2 * np.pi * i / c.Lm) * \
            np.cos(2 * np.pi * j / c.Mm)

    grid, cfg = build_grid(cfg, 50.0e3, 60.0e3, f0=-1.0e-4, beta=0.0,
                           depth_fn=depth)
    z_r, z_w, Hz = vgrid.set_depth(grid.h, jnp.zeros_like(grid.h),
                                   hc_of(cfg), grid.sc_r, grid.Cs_r,
                                   grid.sc_w, grid.Cs_w, cfg.vtransform)
    # smooth 3-D tracer with structure in every direction
    x = np.asarray(grid.xr) / 50.0e3
    y = np.asarray(grid.yr) / 60.0e3
    q = (14.0 + 4.0 * np.exp(np.asarray(z_r) / 40.0) +
         np.sin(2 * np.pi * x) * np.cos(4 * np.pi * y))
    q = bc.fill_halo(cfg, jnp.asarray(q))
    t = jnp.stack([q, jnp.full_like(q, 35.0)])
    return cfg, grid, t, Hz, z_r


def _interior_mass(cfg, grid, dT, Hz):
    H = cfg.halo
    jj, ii = slice(H, H + cfg.Mm), slice(H, H + cfg.Lm)
    area = grid.omn[jj, ii]
    # dT is the Hz-weighted tendency (m*Tunits): mass change per area
    return float((dT[:, jj, ii] * area).sum())


def test_geo_conserves_and_matches_s_on_flat_grid():
    # flat grid: geopotential rotation must reduce exactly to the
    # s-surface operator (slopes vanish)
    cfg, grid, t, Hz, z_r = _setup(flat=True)
    zero = jnp.zeros_like(t)
    d_s = t3dmix2(cfg, grid, t, Hz, zero, cfg.dt)
    d_g = t3dmix2_geo(cfg, grid, t, Hz, z_r, zero, cfg.dt)
    np.testing.assert_allclose(np.asarray(d_g), np.asarray(d_s),
                               rtol=1e-12, atol=1e-14)
    d_s4 = t3dmix4(cfg, grid, t, Hz, zero, cfg.dt)
    d_g4 = t3dmix4_geo(cfg, grid, t, Hz, z_r, zero, cfg.dt)
    np.testing.assert_allclose(np.asarray(d_g4), np.asarray(d_s4),
                               rtol=1e-10, atol=1e-14)


def test_rotated_operators_conserve_mass():
    cfg, grid, t, Hz, z_r = _setup(flat=False)
    pden = 1027.0 - 0.17 * (t[0] - 14.0)      # linear EOS sigma
    zero = jnp.zeros_like(t)
    scale = float(jnp.abs(t[0]).max())
    for name, dT in [
            ("geo2", t3dmix2_geo(cfg, grid, t, Hz, z_r, zero, cfg.dt)),
            ("geo4", t3dmix4_geo(cfg, grid, t, Hz, z_r, zero, cfg.dt)),
            ("iso2", t3dmix2_iso(cfg, grid, t, pden, Hz, z_r, zero,
                                 cfg.dt)),
            ("iso4", t3dmix4_iso(cfg, grid, t, pden, Hz, z_r, zero,
                                 cfg.dt))]:
        assert np.isfinite(np.asarray(dT)).all(), name
        m = _interior_mass(cfg, grid, dT[0], Hz)
        ref = _interior_mass(cfg, grid, jnp.abs(dT[0]), Hz) + scale
        assert abs(m) < 1e-9 * ref, (name, m, ref)
        # the operator actually does something
        assert float(jnp.abs(dT[0]).max()) > 0.0, name


def test_iso_null_on_density_aligned_tracer():
    # q = a + b*pden  =>  epineutral diffusion tendency is exactly zero
    # (triad slopes cancel term by term), PROVIDED the stratification
    # exceeds the eps=0.5 kg/m3 stability floor everywhere
    # (t3dmix2_iso.h:355-360) - so use a strongly stratified T
    cfg, grid, t, Hz, z_r = _setup(flat=False)
    x = np.asarray(grid.xr) / 50.0e3
    y = np.asarray(grid.yr) / 60.0e3
    T = jnp.asarray(14.0 + 2.5 * (np.asarray(z_r) + 140.0) +
                    2.0 * np.sin(2 * np.pi * x) * np.cos(2 * np.pi * y))
    T = bc.fill_halo(cfg, T)
    pden = 1027.0 - 0.17 * (T - 14.0)
    q_iso = 3.0 + 0.5 * pden
    t_iso = jnp.stack([T, q_iso])
    zero = jnp.zeros_like(t_iso)
    dT = t3dmix2_iso(cfg, grid, t_iso, pden, Hz, z_r, zero, cfg.dt)
    # tracer 1 (density-aligned): machine-zero tendency on interior
    # levels (at k=0 and k=N-1 the reference zeroes dTdr at the
    # surface/bottom interface, so exact neutrality holds only inside)
    assert float(jnp.abs(dT[1][1:-1]).max()) < 1e-10 * float(
        jnp.abs(dT[0]).max() + 1e-30)
    # tracer 0 (T itself, dianeutral structure): nonzero
    assert float(jnp.abs(dT[0]).max()) > 0.0


def _uv_fields(cfg, grid, z_r):
    x = np.asarray(grid.xr) / 50.0e3
    y = np.asarray(grid.yr) / 60.0e3
    zz = np.asarray(z_r) / 100.0
    u = jnp.asarray(0.1 * np.sin(2 * np.pi * x) * np.cos(2 * np.pi * y) *
                    (1.0 + zz))
    v = jnp.asarray(0.1 * np.cos(4 * np.pi * x) * np.sin(2 * np.pi * y) *
                    (1.0 - 0.3 * zz))
    return bc.fill_halo(cfg, u), bc.fill_halo(cfg, v)


def test_uv_geo_matches_s_on_flat_grid_and_dissipates():
    cfg, grid, t, Hz, z_r = _setup(flat=True)
    u, v = _uv_fields(cfg, grid, z_r)
    zu, zv = jnp.zeros_like(u), jnp.zeros_like(v)
    z2 = jnp.zeros_like(grid.h)
    du_s, dv_s, ru_s, rv_s = uv3dmix2(cfg, grid, u, v, Hz, zu, zv,
                                      z2, z2, cfg.dt)
    du_g, dv_g, ru_g, rv_g = uv3dmix2_geo(cfg, grid, u, v, Hz, z_r,
                                          zu, zv, z2, z2, cfg.dt)
    np.testing.assert_allclose(np.asarray(du_g), np.asarray(du_s),
                               rtol=1e-10, atol=1e-16)
    np.testing.assert_allclose(np.asarray(dv_g), np.asarray(dv_s),
                               rtol=1e-10, atol=1e-16)
    np.testing.assert_allclose(np.asarray(ru_g), np.asarray(ru_s),
                               rtol=1e-10, atol=1e-16)

    # sloped grid: operator dissipates kinetic energy (down-gradient)
    cfg, grid, t, Hz, z_r = _setup(flat=False)
    u, v = _uv_fields(cfg, grid, z_r)
    du, dv, _, _ = uv3dmix2_geo(cfg, grid, u, v, Hz, z_r, zu, zv,
                                z2, z2, cfg.dt)
    assert np.isfinite(np.asarray(du)).all()
    assert np.isfinite(np.asarray(dv)).all()
    H = cfg.halo
    jj, ii = slice(H, H + cfg.Mm), slice(H, H + cfg.Lm)
    # du is the Hz-weighted increment: new KE proxy must not grow
    Hz_u = 0.5 * (Hz + jnp.roll(Hz, 1, -1))
    Hz_v = 0.5 * (Hz + jnp.roll(Hz, 1, -2))
    ke0 = float((u[:, jj, ii]**2 * Hz_u[:, jj, ii]).sum() +
                (v[:, jj, ii]**2 * Hz_v[:, jj, ii]).sum())
    u1 = u + du / Hz_u
    v1 = v + dv / Hz_v
    ke1 = float((u1[:, jj, ii]**2 * Hz_u[:, jj, ii]).sum() +
                (v1[:, jj, ii]**2 * Hz_v[:, jj, ii]).sum())
    assert ke1 < ke0


def test_uv4_geo_matches_s_on_flat_grid_and_dissipates():
    cfg, grid, t, Hz, z_r = _setup(flat=True)
    cfg = cfg.replace(visc4=1.0e8, uv_vis4=True)
    u, v = _uv_fields(cfg, grid, z_r)
    zu, zv = jnp.zeros_like(u), jnp.zeros_like(v)
    z2 = jnp.zeros_like(grid.h)
    du_s, dv_s, ru_s, rv_s = uv3dmix4(cfg, grid, u, v, Hz, zu, zv,
                                      z2, z2, cfg.dt)
    du_g, dv_g, ru_g, rv_g = uv3dmix4_geo(cfg, grid, u, v, Hz, z_r,
                                          zu, zv, z2, z2, cfg.dt)
    np.testing.assert_allclose(np.asarray(du_g), np.asarray(du_s),
                               rtol=1e-10, atol=1e-16)
    np.testing.assert_allclose(np.asarray(dv_g), np.asarray(dv_s),
                               rtol=1e-10, atol=1e-16)
    np.testing.assert_allclose(np.asarray(ru_g), np.asarray(ru_s),
                               rtol=1e-10, atol=1e-16)

    # sloped grid: the biharmonic rotated operator dissipates KE
    cfg, grid, t, Hz, z_r = _setup(flat=False)
    cfg = cfg.replace(visc4=1.0e8, uv_vis4=True)
    u, v = _uv_fields(cfg, grid, z_r)
    du, dv, _, _ = uv3dmix4_geo(cfg, grid, u, v, Hz, z_r, zu, zv,
                                z2, z2, cfg.dt)
    assert np.isfinite(np.asarray(du)).all()
    assert np.isfinite(np.asarray(dv)).all()
    assert float(jnp.abs(du).max()) > 0.0
    H = cfg.halo
    jj, ii = slice(H, H + cfg.Mm), slice(H, H + cfg.Lm)
    Hz_u = 0.5 * (Hz + jnp.roll(Hz, 1, -1))
    Hz_v = 0.5 * (Hz + jnp.roll(Hz, 1, -2))
    ke0 = float((u[:, jj, ii]**2 * Hz_u[:, jj, ii]).sum() +
                (v[:, jj, ii]**2 * Hz_v[:, jj, ii]).sum())
    u1 = u + du / Hz_u
    v1 = v + dv / Hz_v
    ke1 = float((u1[:, jj, ii]**2 * Hz_u[:, jj, ii]).sum() +
                (v1[:, jj, ii]**2 * Hz_v[:, jj, ii]).sum())
    assert ke1 < ke0


def test_iso_downgradient_in_density_space():
    # an anomaly confined to one isopycnal layer spreads along it:
    # variance of the tracer must decrease under harmonic iso mixing
    cfg, grid, t, Hz, z_r = _setup(flat=False)
    pden = 1027.0 - 0.17 * (t[0] - 14.0)
    x = np.asarray(grid.xr) / 50.0e3
    blob = jnp.asarray(np.exp(-((x - 0.5) / 0.15) ** 2)) * \
        jnp.exp(-((np.asarray(z_r) + 30.0) / 15.0) ** 2)
    tt = jnp.stack([t[0], blob])
    zero = jnp.zeros_like(tt)
    dT = t3dmix2_iso(cfg, grid, tt, pden, Hz, z_r, zero, cfg.dt)
    H = cfg.halo
    jj, ii = slice(H, H + cfg.Mm), slice(H, H + cfg.Lm)
    area = grid.omn[jj, ii]
    q0 = blob[:, jj, ii]
    q1 = q0 + (dT[1][:, jj, ii] / Hz[:, jj, ii])
    var0 = float((q0 ** 2 * Hz[:, jj, ii] * area).sum())
    var1 = float((q1 ** 2 * Hz[:, jj, ii] * area).sum())
    assert var1 < var0
