"""I/O: NetCDF history writing, checkpoint/restore, driver run."""

import os

import jax
import numpy as np
import pytest

from roms_tpu.models import upwelling
from roms_tpu import stepping
from roms_tpu.driver import Simulation
from roms_tpu.io import checkpoint
from roms_tpu.io.netcdf import read_history


@pytest.fixture(scope="module")
def small():
    cfg = upwelling.make_config(Lm=12, Mm=16, N=6, ndtfast=8)
    return upwelling.build(cfg)


def test_history_writer_roundtrip(tmp_path_factory, small):
    cfg, grid, s0, ffn = small
    path = str(tmp_path_factory.mktemp("io") / "his.nc")
    sim = Simulation(cfg, grid, s0, ffn, his_file=path, nhis=2,
                     ninfo=0, log=lambda *a: None)
    sim.run(6)
    sim.finalize()
    data = read_history(path)
    assert data["zeta"].shape == (3, cfg.Mm, cfg.Lm)
    assert data["temp"].shape == (3, cfg.N, cfg.Mm, cfg.Lm)
    assert np.isfinite(data["temp"]).all()
    np.testing.assert_allclose(data["ocean_time"],
                               [2 * cfg.dt, 4 * cfg.dt, 6 * cfg.dt])
    # grid vars present with metadata
    assert data["h"].shape == (cfg.Mm, cfg.Lm)
    # checksums recorded per record (get_hash.F analog)
    assert len(sim.writer.checksums) == 3


def test_checkpoint_restart_bitwise(tmp_path_factory, small):
    cfg, grid, s0, ffn = small
    d = str(tmp_path_factory.mktemp("ckpt") / "rst")
    stepf = stepping.make_stepper(cfg, grid, ffn, donate=False)
    s = s0
    for _ in range(3):
        s = stepf(s)
    checkpoint.save(d, s)
    s_restored = checkpoint.restore(d, jax.tree_util.tree_map(
        lambda x: np.zeros_like(np.asarray(x)), s))
    for a, b in zip(jax.tree_util.tree_leaves(s),
                    jax.tree_util.tree_leaves(s_restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # continue both -> identical
    sa = stepf(s)
    sb = stepf(jax.tree_util.tree_map(jax.numpy.asarray, s_restored))
    np.testing.assert_array_equal(np.asarray(sa.t), np.asarray(sb.t))


def test_driver_blowup_detection(small):
    cfg, grid, s0, ffn = small
    from roms_tpu.driver import BlowupError
    import jax.numpy as jnp
    bad = s0.replace(u=s0.u.at[2, 8, 8].set(jnp.nan))  # NaN -> blowup
    sim = Simulation(cfg, grid, bad, ffn, ninfo=1, log=lambda *a: None)
    with pytest.raises(BlowupError):
        sim.run(3)
