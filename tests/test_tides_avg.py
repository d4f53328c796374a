"""Tidal boundary helper and time-averaged output."""

import jax
import jax.numpy as jnp
import numpy as np

from roms_tpu.ops import tides
from roms_tpu.models import upwelling
from roms_tpu.driver import Simulation
from roms_tpu.io.netcdf import read_history


def test_tidal_boundary_sum():
    nb = 10
    c1 = tides.TidalConstituent(
        "M2", zeta_amp=jnp.full(nb, 1.0), zeta_phase=jnp.zeros(nb),
        u_amp=jnp.full(nb, 0.1), u_phase=jnp.zeros(nb))
    c2 = tides.TidalConstituent(
        "K1", zeta_amp=jnp.full(nb, 0.3),
        zeta_phase=jnp.full(nb, np.pi / 2))
    out0 = tides.tidal_boundary([c1, c2], 0.0, side="west")
    np.testing.assert_allclose(np.asarray(out0["zeta_west"]),
                               1.0 + 0.3 * np.cos(-np.pi / 2), rtol=1e-12)
    assert "ubar_west" in out0
    # period check: after one M2 period the M2 part repeats
    TM2 = tides.PERIODS_H["M2"] * 3600.0
    outT = tides.tidal_boundary([c1], TM2, side="west")
    np.testing.assert_allclose(np.asarray(outT["zeta_west"]), 1.0,
                               rtol=1e-9)


def test_time_averaged_output(tmp_path):
    cfg = upwelling.make_config(Lm=12, Mm=14, N=4, ndtfast=6)
    cfg, grid, s0, ffn = upwelling.build(cfg)
    avg = str(tmp_path / "avg.nc")
    his = str(tmp_path / "his.nc")
    sim = Simulation(cfg, grid, s0, ffn, his_file=his, nhis=4,
                     avg_file=avg, navg=4, ninfo=0, log=lambda *a: None)
    sim.run(8)
    sim.finalize()
    a = read_history(avg)
    h = read_history(his)
    assert a["zeta"].shape[0] == 2
    # averages must differ from snapshots but be the right magnitude
    assert np.isfinite(a["temp"]).all()
    assert abs(a["temp"].mean() - h["temp"].mean()) < 0.5
    # averaged time stamps centered in each window
    np.testing.assert_allclose(a["ocean_time"],
                               [2.0 * cfg.dt, 6.0 * cfg.dt])
