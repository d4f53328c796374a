"""Sharded (parallel) output path - the mod_pio_netcdf analog
(io/pio.py): each process writes only its addressable shards; the
assembled stream must match the gather-based writer bit-for-bit."""

import numpy as np
import pytest

import jax

from roms_tpu.models import upwelling
from roms_tpu.parallel import shard
from roms_tpu import stepping
from roms_tpu.io import pio


@pytest.mark.smoke
def test_sharded_write_matches_gathered(tmp_path):
    cfg = upwelling.make_config(Lm=26, Mm=26, N=4, dtype="float32")
    cfg, grid, s0, ffn = upwelling.build(cfg)
    mesh = shard.make_mesh(jax.devices()[:8])
    grid_s = shard.shard_state(mesh, grid)
    s = shard.shard_state(mesh, s0)
    step = shard.make_sharded_stepper(cfg, grid_s, mesh, ffn,
                                      donate=False)

    base = str(tmp_path / "his_pio")
    w = pio.ShardedHistoryWriter(base, cfg)
    times = []
    for n in range(3):
        s = step(s)
        w.write(s, float(s.time))
        times.append(float(s.time))
    w.close()

    data = pio.read_sharded(base)
    assert np.allclose(data["time"], times)
    H = cfg.halo
    jj = slice(H, H + cfg.Mm)
    ii = slice(H, H + cfg.Lm)
    # final-record fields match the device arrays' interiors exactly
    for name in ("zeta", "ubar", "vbar", "u", "v", "t"):
        ref = np.asarray(getattr(s, name))[..., jj, ii]
        got = data[name][-1]
        assert got.shape == ref.shape
        np.testing.assert_array_equal(got, ref, err_msg=name)

    # offline rearranger produces a loadable canonical file
    out = pio.assemble(base)
    from scipy.io import netcdf_file
    nc = netcdf_file(out, "r", mmap=False)
    z = np.asarray(nc.variables["zeta"][:])
    np.testing.assert_array_equal(z[-1], np.asarray(s.zeta)[jj, ii])
    nc.close()
