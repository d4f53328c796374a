"""Wetting-and-drying tests (WET_DRY; reference ROMS/Nonlinear/wetdry.F
and the WET_DRY blocks of step2d_LF_AM3.h).

Covers: mask encodings, the directional limiter truth table, all-wet
equivalence (wetdry on == off when nothing ever dries), and a sloping
beach that dries out without draining below the critical depth.
"""

import jax
import jax.numpy as jnp
import numpy as np

from roms_tpu.config import Config
from roms_tpu.grid import build_grid
from roms_tpu.ops import bc, step2d, wetdry


def chan_setup(wetdry_on, Lm=24, Mm=16):
    cfg = Config(name="chan", Lm=Lm, Mm=Mm, N=2, dt=300.0, ndtfast=10,
                 solve3d=True, visc2=0.0, uv_vis2=False,
                 bottom_drag=None, wetdry=wetdry_on)
    grid, cfg = build_grid(cfg, 100e3, 80e3, f0=1e-4, beta=0.0,
                           depth_fn=lambda x, y, i, j, c: 50.0 + 0 * x)
    return cfg, grid


def test_face_mask_encoding():
    # wd layout (one row): wet wet dry dry wet
    wd = jnp.asarray([[1.0, 1.0, 0.0, 0.0, 1.0]] * 3)
    um, _ = wetdry.face_masks(wd)
    # face i uses cells (i-1, i): [?, 2, +1, 0, -1]
    np.testing.assert_allclose(np.asarray(um[1, 1:]), [2.0, 1.0, 0.0, -1.0])
    vm_wd = wd.T
    _, vm = wetdry.face_masks(vm_wd)
    np.testing.assert_allclose(np.asarray(vm[1:, 1]), [2.0, 1.0, 0.0, -1.0])


def test_psi_mask_encoding():
    # 2x2 neighbourhoods: all wet -> 1; one dry -> 1; adjacent pair -> 2;
    # diagonal pair -> 0; one wet -> 0
    def pw(a, b, c, d):
        # corners: a=(i-1,j-1) b=(i,j-1) c=(i-1,j) d=(i,j)
        wd = jnp.asarray([[a, b], [c, d]], dtype=jnp.float64)
        return float(wetdry.psi_wet(wd)[1, 1])

    assert pw(1, 1, 1, 1) == 1.0
    assert pw(0, 1, 1, 1) == 1.0
    assert pw(1, 1, 0, 0) == 2.0          # south row wet
    assert pw(1, 0, 1, 0) == 2.0          # west column wet
    assert pw(1, 0, 0, 1) == 0.0          # diagonal
    assert pw(0, 1, 1, 0) == 0.0          # diagonal
    assert pw(1, 0, 0, 0) == 0.0
    assert pw(0, 0, 0, 0) == 0.0


def test_limiter_truth_table():
    m = jnp.asarray([2.0, 0.0, 1.0, 1.0, -1.0, -1.0])
    x = jnp.asarray([5.0, 5.0, 1.0, -1.0, 1.0, -1.0])
    # m=+1: flow toward dry east cell (x>0) allowed, out of it blocked;
    # m=-1: flow toward dry west cell (x<0) allowed, out of it blocked
    np.testing.assert_allclose(np.asarray(wetdry.limit(m, x)),
                               [1.0, 0.0, 1.0, 0.0, 0.0, 1.0])


def test_avg_face_mask_lone_pond():
    wd = jnp.asarray([[1.0, 1.0, 0.0]] * 2)
    flux = jnp.zeros_like(wd)
    um, _ = wetdry.avg_face_masks(wd, flux, flux)
    # face between two wet cells with zero flux stays wet
    assert float(um[0, 1]) == 1.0
    # face next to a dry cell with zero averaged flux is a lone pond
    assert float(um[0, 2]) == 0.0


def test_allwet_fast_loop_equivalence():
    """With 50 m of water everywhere the wet/dry machinery must be a
    bitwise no-op (all limiters evaluate to 1)."""
    out = {}
    for on in (False, True):
        cfg, grid = chan_setup(on)
        key = jax.random.PRNGKey(0)
        z = 0.01 * jax.random.normal(key, (cfg.ny_tot, cfg.nx_tot),
                                     dtype=jnp.float64)
        z = bc.apply_bc_rho(cfg, cfg.lbc_zeta, z)
        zero = jnp.zeros_like(z)
        fs = step2d.make_fast_state(cfg, z, zero, zero)
        fs_out, rufrc_c, rvfrc_c, wet = step2d.fast_loop(
            cfg, grid, fs, rufrc=zero, rvfrc=zero,
            ru0_nm1=zero, ru0_nm2=zero, rv0_nm1=zero, rv0_nm2=zero, iic=0)
        out[on] = (fs_out, rufrc_c, wet)
    # the extra *1.0 multiplies change XLA fusion, so allow ~1 ulp
    np.testing.assert_allclose(np.asarray(out[True][0].zeta_n),
                               np.asarray(out[False][0].zeta_n),
                               rtol=1e-13, atol=1e-16)
    np.testing.assert_allclose(np.asarray(out[True][0].ubar_n),
                               np.asarray(out[False][0].ubar_n),
                               rtol=1e-13, atol=1e-16)
    np.testing.assert_allclose(np.asarray(out[True][1]),
                               np.asarray(out[False][1]),
                               rtol=1e-13, atol=1e-12)
    wet = out[True][2]
    assert out[False][2] is None
    H = out[True][0].zeta_n.shape  # noqa: F841  (shape sanity only)
    assert float(jnp.min(wet["rmask_wet"])) == 1.0
    assert float(jnp.min(wet["umask_wet"])) == 1.0


def _beach_setup(wetdry_on):
    """Closed basin with a shelf that sits below the critical depth:
    west half 10 m deep, east quarter 0.02 m (dry at rest)."""
    cfg = Config(name="beach", Lm=40, Mm=6, N=2, dt=5.0, ndtfast=1,
                 solve3d=False, visc2=0.0, uv_vis2=False,
                 ew_periodic=False, ns_periodic=False,
                 bottom_drag="linear", rdrg=3e-4,
                 wetdry=wetdry_on, dcrit=0.10)

    def depth(x, y, i, j, c):
        xs = x / 10e3          # 0..1 across the basin
        return np.maximum(0.02, 10.0 * (1.0 - xs) ** 2)

    grid, cfg = build_grid(cfg, 10e3, 1.5e3, f0=0.0, beta=0.0,
                           depth_fn=depth)
    h = np.asarray(grid.h)
    # start at rest with dry cells holding exactly the critical depth
    z0 = np.maximum(0.0, cfg.dcrit - h)
    # a 0.3 m seiche hump in the deep west end
    i = np.arange(h.shape[1])[None, :]
    z0 = z0 + 0.3 * np.exp(-((i - 8.0) / 4.0) ** 2) * (h > 1.0)
    zeta = jnp.asarray(z0)
    zero = jnp.zeros_like(zeta)
    fs = step2d.make_fast_state(cfg, zeta, zero, zero)
    # steady offshore (westward) wind keeps sucking water off the shelf
    frc = step2d.Forcing2D(sustr=zero - 1.0e-3, svstr=zero)
    return cfg, grid, fs, frc


def test_beach_drying_stays_bounded():
    cfg, grid, fs, frc = _beach_setup(True)
    step1 = jax.jit(lambda s: step2d.step_2d_only(cfg, grid, s, True,
                                                  forcing=frc))
    stepn = jax.jit(lambda s: step2d.step_2d_only(cfg, grid, s, False,
                                                  forcing=frc))
    fs = step1(fs)
    for _ in range(1599):
        fs = stepn(fs)
    H = cfg.halo
    z = np.asarray(fs.zeta_n)[H:H + cfg.Mm, H:H + cfg.Lm]
    h = np.asarray(grid.h)[H:H + cfg.Mm, H:H + cfg.Lm]
    u = np.asarray(fs.ubar_n)
    assert np.isfinite(z).all() and np.isfinite(u).all()
    depth = z + h
    # no cell drains below ~half the critical depth: dry faces only
    # admit inflow, so water cannot be sucked out of a dry cell
    assert depth.min() > 0.5 * cfg.dcrit
    # and the seiche actually moved water (the run is not frozen)
    assert np.abs(u).max() > 1e-3


def test_beach_without_wetdry_drains_negative():
    """Control: the same case without WET_DRY drives the shelf depth
    negative (or blows up), demonstrating the limiter matters."""
    cfg, grid, fs, frc = _beach_setup(False)
    step1 = jax.jit(lambda s: step2d.step_2d_only(cfg, grid, s, True,
                                                  forcing=frc))
    stepn = jax.jit(lambda s: step2d.step_2d_only(cfg, grid, s, False,
                                                  forcing=frc))
    fs = step1(fs)
    for _ in range(1599):
        fs = stepn(fs)
    H = cfg.halo
    z = np.asarray(fs.zeta_n)[H:H + cfg.Mm, H:H + cfg.Lm]
    h = np.asarray(grid.h)[H:H + cfg.Mm, H:H + cfg.Lm]
    depth = z + h
    assert (not np.isfinite(depth).all()) or depth.min() < 0.0
