"""shard_map + explicit ppermute halo path vs single-device reference.

The local-block stepper (parallel/smap.py) must reproduce the global
step exactly: same physics, halo refreshes via ring exchange instead of
array wrap.  The reference's analog test: NtileI x NtileJ results are
partition-invariant (SURVEY.md §4.7)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from roms_tpu import stepping
from roms_tpu.models import upwelling
from roms_tpu.parallel import smap
from roms_tpu.parallel.shard import make_mesh

pytestmark = pytest.mark.smoke

needs8 = pytest.mark.skipif(len(jax.devices()) < 8,
                            reason="needs 8 devices")


def _setup(Lm=24, Mm=16, N=4):
    cfg = upwelling.make_config(Lm=Lm, Mm=Mm, N=N, ndtfast=8)
    return upwelling.build(cfg)


def test_block_unblock_roundtrip():
    cfg, grid, s0, ffn = _setup()
    mesh = make_mesh(jax.devices()[:8], shape=(2, 4))
    sb = smap.block(cfg, mesh, s0)
    s1 = smap.unblock(cfg, mesh, sb)
    for name in ("zeta", "u", "v", "t", "Akv"):
        a = np.asarray(getattr(s0, name))
        b = np.asarray(getattr(s1, name))
        np.testing.assert_array_equal(a, b, err_msg=name)


@needs8
def test_smap_matches_single_device():
    cfg, grid, s0, ffn = _setup()
    assert smap.supported(cfg)
    nsteps = 4

    runA = jax.jit(lambda s: stepping.run(cfg, grid, s, nsteps, ffn))
    sA = jax.device_get(runA(s0))

    mesh = make_mesh(jax.devices()[:8], shape=(2, 4))
    stepB = smap.make_smap_stepper(cfg, grid, mesh, ffn)
    sb = smap.block(cfg, mesh, s0)
    for _ in range(nsteps):
        sb = stepB(sb)
    sB = jax.device_get(smap.unblock(cfg, mesh, sb))

    for name in ("zeta", "ubar", "vbar", "u", "v", "t"):
        a = np.asarray(getattr(sA, name))
        b = np.asarray(getattr(sB, name))
        np.testing.assert_allclose(b, a, rtol=0, atol=1e-11, err_msg=name)


@needs8
def test_smap_matches_single_device_closed_basin():
    """Fully closed domain (no periodic wrap anywhere) exercises the
    edge-ownership masking on all four sides."""
    from roms_tpu.models import cases
    cfg, grid, s0, ffn = cases.basin(Lm=24, Mm=16, N=4, ndtfast=8)
    if not smap.supported(cfg):
        pytest.skip("basin config outside smap subset")
    nsteps = 3
    runA = jax.jit(lambda s: stepping.run(cfg, grid, s, nsteps, ffn))
    sA = jax.device_get(runA(s0))

    mesh = make_mesh(jax.devices()[:8], shape=(2, 4))
    stepB = smap.make_smap_stepper(cfg, grid, mesh, ffn)
    sb = smap.block(cfg, mesh, s0)
    for _ in range(nsteps):
        sb = stepB(sb)
    sB = jax.device_get(smap.unblock(cfg, mesh, sb))
    for name in ("zeta", "ubar", "vbar", "u", "v", "t"):
        a = np.asarray(getattr(sA, name))
        b = np.asarray(getattr(sB, name))
        np.testing.assert_allclose(b, a, rtol=0, atol=1e-11, err_msg=name)


@needs8
def test_smap_radiation_obc_wetdry():
    """Radiation OBCs + wetting-drying over an 8-device mesh: the
    obc.py ring writes and wetdry masks are edge-shard-gated; results
    must match single-device exactly (VERDICT r3 item 3 criterion)."""
    from roms_tpu.config import Config, LBC, BC_RADIATION
    from roms_tpu.grid import build_grid
    from roms_tpu.state import initial_state
    from roms_tpu.ops import bc as bc_mod

    rad = LBC(west=BC_RADIATION, east=BC_RADIATION)
    cfg = Config(
        name="smap_rad", Lm=24, Mm=16, N=4, ntracers=2,
        ew_periodic=False, ns_periodic=False,
        dt=60.0, ndtfast=10, solve3d=True,
        vtransform=2, vstretching=4, theta_s=0.0, theta_b=0.0,
        tcline=1.0e16, uv_adv=True, uv_cor=False,
        bottom_drag="linear", rdrg=3.0e-4,
        vmix="none", eos="linear", Tcoef=0.0, Scoef=0.0,
        t_hadv=("U3", "U3"), t_vadv=("C4", "C4"),
        lbc_zeta=rad, lbc_ubar=rad, lbc_vbar=rad,
        lbc_u=rad, lbc_v=rad, lbc_t=rad,
        wetdry=True, dcrit=0.1,
        dtype="float64")
    grid, cfg = build_grid(
        cfg, Xsize=24.0e3, Esize=16.0e3, f0=0.0, beta=0.0,
        depth_fn=lambda x, y, i, j, c: 5.0 + 95.0 * x / 24.0e3)
    assert smap.supported(cfg)

    Hc = cfg.halo
    x = grid.xr - 12.0e3
    y = grid.yr - 8.0e3
    zeta0 = bc_mod.fill_halo(
        cfg, 0.2 * jnp.exp(-(x ** 2 + y ** 2) / (3.0e3 ** 2)))
    t0 = jnp.stack(
        [jnp.full((cfg.N, cfg.ny_tot, cfg.nx_tot), 17.0),
         jnp.full((cfg.N, cfg.ny_tot, cfg.nx_tot), 35.0)])
    s0 = initial_state(cfg, zeta=zeta0, t=t0)

    nsteps = 4
    runA = jax.jit(lambda s: stepping.run(cfg, grid, s, nsteps))
    sA = jax.device_get(runA(s0))
    assert np.isfinite(np.asarray(sA.zeta)).all()

    mesh = make_mesh(jax.devices()[:8], shape=(2, 4))
    stepB = smap.make_smap_stepper(cfg, grid, mesh)
    sb = smap.block(cfg, mesh, s0)
    for _ in range(nsteps):
        sb = stepB(sb)
    sB = jax.device_get(smap.unblock(cfg, mesh, sb))
    for name in ("zeta", "ubar", "vbar", "u", "v", "t"):
        a = np.asarray(getattr(sA, name))
        b = np.asarray(getattr(sB, name))
        np.testing.assert_allclose(b, a, rtol=0, atol=1e-11, err_msg=name)


@needs8
def test_smap_tidal_bry_volcons():
    """Tidal boundary data (bry lines built from the grid argument) +
    OBC volume conservation (psum face integrals) over an 8-device
    mesh == single device (VERDICT r4 item 5 criterion)."""
    from roms_tpu.models import cases
    cfg, grid, s0, ffn = cases.kelvin(Lm=24, Mm=16, N=4, dt=300.0,
                                      ndtfast=20)
    cfg = cfg.replace(volcons=("west", "east"))
    assert smap.supported(cfg)
    nsteps = 3
    runA = jax.jit(lambda s: stepping.run(cfg, grid, s, nsteps, ffn))
    sA = jax.device_get(runA(s0))
    assert np.isfinite(np.asarray(sA.zeta)).all()

    mesh = make_mesh(jax.devices()[:8], shape=(2, 4))
    stepB = smap.make_smap_stepper(cfg, grid, mesh, ffn)
    sb = smap.block(cfg, mesh, s0)
    for _ in range(nsteps):
        sb = stepB(sb)
    sB = jax.device_get(smap.unblock(cfg, mesh, sb))
    for name in ("zeta", "ubar", "vbar", "u", "v", "t"):
        a = np.asarray(getattr(sA, name))
        b = np.asarray(getattr(sB, name))
        np.testing.assert_allclose(b, a, rtol=0, atol=1e-11,
                                   err_msg=name)
