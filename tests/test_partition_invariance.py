"""Partition invariance: results must not depend on the device-mesh shape.

The reference's analog: the same NtileI x NtileJ tiling run serial / OpenMP /
MPI gives identical results (SURVEY.md §4.7).  Here: single-device vs an
8-device (2,4) mesh over the virtual CPU backend.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from roms_tpu.models import upwelling
from roms_tpu import stepping
from roms_tpu.parallel import shard

pytestmark = pytest.mark.smoke


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_partition_invariance_upwelling():
    cfg = upwelling.make_config(Lm=26, Mm=26, N=4, ndtfast=6)
    cfg, grid, s0, ffn = upwelling.build(cfg)

    # single device
    step1 = jax.jit(lambda s: stepping.run(cfg, grid, s, 5, ffn))
    sA = jax.device_get(step1(s0))

    # 2x4 mesh
    mesh = shard.make_mesh(jax.devices()[:8], shape=(2, 4))
    gridB = shard.shard_state(mesh, grid)
    sB0 = shard.shard_state(mesh, s0)
    stepB = jax.jit(lambda s: stepping.run(cfg, gridB, s, 5, ffn))
    sB = jax.device_get(stepB(sB0))

    for name in ("zeta", "ubar", "vbar", "u", "v", "t"):
        a = np.asarray(getattr(sA, name))
        b = np.asarray(getattr(sB, name))
        # XLA may reassociate reductions across shards; tolerance near
        # roundoff rather than bitwise
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-12, err_msg=name)
