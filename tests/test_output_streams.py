"""Output parity: DIA/QCK/FLT streams, expanded averages, multi-file
ring, and batched-dispatch averaging correctness (set_avg.F /
wrt_diags.F / wrt_quick.F / wrt_floats.F / output.F NDEFHIS)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from roms_tpu import stepping
from roms_tpu.driver import Simulation
from roms_tpu.io.netcdf import read_history
from roms_tpu.models import upwelling


@pytest.fixture(scope="module")
def small():
    cfg = upwelling.make_config(Lm=12, Mm=14, N=4, ndtfast=6)
    return upwelling.build(cfg)


def test_avg_identical_for_any_steps_per_call(small, tmp_path):
    """Averaging must sample EVERY step regardless of dispatch batching
    (the round-3 bug: host-loop sampling averaged every Nth state)."""
    cfg, grid, s0, ffn = small
    outs = []
    for spc in (1, 2, 4):
        path = str(tmp_path / f"avg{spc}.nc")
        sim = Simulation(cfg, grid, s0, ffn, avg_file=path, navg=4,
                         ninfo=0, log=lambda *a: None,
                         steps_per_call=spc)
        sim.run(8)
        sim.finalize()
        outs.append(read_history(path))
    for k in ("zeta", "temp", "u"):
        np.testing.assert_allclose(outs[1][k], outs[0][k], atol=1e-13,
                                   err_msg=f"{k} spc=2")
        np.testing.assert_allclose(outs[2][k], outs[0][k], atol=1e-13,
                                   err_msg=f"{k} spc=4")
    # expanded field set is present
    for k in ("AKv", "AKt", "hsbl", "tke", "DU_avg1", "DV_avg1"):
        assert k in outs[0], k


def test_avg_equals_hand_mean(small, tmp_path):
    cfg, grid, s0, ffn = small
    path = str(tmp_path / "avg.nc")
    sim = Simulation(cfg, grid, s0, ffn, avg_file=path, navg=3,
                     ninfo=0, log=lambda *a: None)
    sim.run(3)
    sim.finalize()
    a = read_history(path)

    # hand mean over the same 3 states
    step1 = stepping.make_stepper(cfg, grid, ffn, donate=False)
    s = s0
    zs = []
    for _ in range(3):
        s = step1(s)
        zs.append(np.asarray(s.zeta))
    H = cfg.halo
    want = np.mean(zs, axis=0)[H:H + cfg.Mm, H:H + cfg.Lm]
    np.testing.assert_allclose(a["zeta"][0], want, atol=1e-13)


def test_dia_stream(small, tmp_path):
    cfg, grid, s0, ffn = small
    path = str(tmp_path / "dia.nc")
    sim = Simulation(cfg, grid, s0, ffn, dia_file=path, ndia=2,
                     ninfo=0, log=lambda *a: None)
    sim.run(4)
    sim.finalize()
    d = read_history(path)
    assert d["ocean_time"].shape[0] == 2
    # momentum budget closes exactly (vvisc is the remainder bucket,
    # test_diags.py convention) and survives the time averaging
    total = sum(d[f"u_{k}"] for k in
                ("prestep", "hvisc", "prsgrd", "cor", "xadv", "yadv",
                 "vadv", "vvisc"))
    np.testing.assert_allclose(d["u_rate"], total, atol=1e-10)
    # tracer mean rate over the window equals the actual change / ndia
    for k in ("temp_xadv", "temp_vdiff", "temp_rate", "salt_rate"):
        assert k in d and np.isfinite(d[k]).all()


def test_qck_stream(small, tmp_path):
    cfg, grid, s0, ffn = small
    path = str(tmp_path / "qck.nc")
    sim = Simulation(cfg, grid, s0, ffn, qck_file=path, nqck=2,
                     ninfo=0, log=lambda *a: None)
    sim.run(4)
    sim.finalize()
    q = read_history(path)
    assert q["temp_sur"].shape == (2, cfg.Mm, cfg.Lm)
    # surface slice equals the top level of the final state
    H = cfg.halo
    s = sim.state
    np.testing.assert_allclose(
        q["temp_sur"][-1],
        np.asarray(s.t[0, -1])[H:H + cfg.Mm, H:H + cfg.Lm], atol=1e-12)


def test_his_file_ring(small, tmp_path):
    cfg, grid, s0, ffn = small
    base = str(tmp_path / "his.nc")
    sim = Simulation(cfg, grid, s0, ffn, his_file=base, nhis=1,
                     ndef_his=2, ninfo=0, log=lambda *a: None)
    sim.run(5)
    sim.finalize()
    paths = sim.writer.paths
    assert len(paths) == 3                      # 5 records, 2 per file
    h1 = read_history(paths[0])
    h3 = read_history(paths[2])
    assert h1["zeta"].shape[0] == 2
    assert h3["zeta"].shape[0] == 1


def test_floats_writer(small, tmp_path):
    from roms_tpu.io.netcdf import FloatsWriter
    from roms_tpu import floats as fl_mod
    cfg, grid, s0, ffn = small
    fl = fl_mod.init_floats(jnp.array([4.0, 6.0]), jnp.array([5.0, 7.0]),
                            jnp.array([2.0, 3.0]))
    assert fl.xg.shape == (2,) or fl.xg.shape == (4, 2)
    path = str(tmp_path / "flt.nc")
    w = FloatsWriter(path, cfg, nfloats=2)
    w.write(fl, 0.0)
    w.write(fl, cfg.dt)
    w.close()
    out = read_history(path)
    assert out["Xgrid"].shape == (2, 2)
    np.testing.assert_allclose(out["Xgrid"][0], [4.0, 6.0])


def test_avg_quadratic_fields(small, tmp_path):
    """set_avg.F:2352-3952 quadratic/derived averages: u*u, mass fluxes
    and rho are accumulated every step; Cauchy-Schwarz <q2> >= <q>2
    holds pointwise for the squared fields."""
    cfg, grid, s0, ffn = small
    path = str(tmp_path / "avgq.nc")
    sim = Simulation(cfg, grid, s0, ffn, avg_file=path, navg=4,
                     ninfo=0, log=lambda *a: None)
    sim.run(8)
    sim.finalize()
    out = read_history(path)
    for k in ("zeta2", "ubar2", "vbar2", "uu", "vv", "uv", "Huon",
              "Hvom", "rho"):
        assert k in out, k
        assert np.isfinite(out[k]).all(), k
    assert (out["zeta2"] + 1e-15 >= out["zeta"] ** 2).all()
    assert (out["ubar2"] + 1e-15 >= out["ubar"] ** 2).all()
