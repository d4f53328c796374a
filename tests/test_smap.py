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
