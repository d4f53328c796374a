"""File-driven domain: get_grid.F / get_state.F analogs (io/gridfile.py).

Round-trips an analytic UPWELLING-like domain through a ROMS-native grid
NetCDF file and a history file, then runs the file-driven model and checks
the trajectory matches the analytic one exactly (reading a grid from file
must be equivalent to building it analytically).
"""

import numpy as np
import jax
import pytest

from roms_tpu import stepping
from roms_tpu.models import upwelling
from roms_tpu.io import gridfile
from roms_tpu.io.netcdf import HistoryWriter
from roms_tpu.utils import yamlcfg

pytestmark = pytest.mark.smoke


@pytest.fixture(scope="module")
def analytic():
    cfg = upwelling.make_config(Lm=16, Mm=18, N=4, ndtfast=6)
    cfg, grid, s0, ffn = upwelling.build(cfg)
    return cfg, grid, s0, ffn


def test_grid_roundtrip(analytic, tmp_path):
    cfg, grid, s0, ffn = analytic
    path = str(tmp_path / "grd.nc")
    gridfile.save_grid(path, cfg, grid)

    grid2, cfg2 = gridfile.load_grid(
        path, N=cfg.N, dt=cfg.dt, ndtfast=cfg.ndtfast,
        ew_periodic=cfg.ew_periodic, ns_periodic=cfg.ns_periodic,
        theta_s=cfg.theta_s, theta_b=cfg.theta_b, tcline=cfg.tcline,
        vtransform=cfg.vtransform, vstretching=cfg.vstretching)
    assert cfg2.Lm == cfg.Lm and cfg2.Mm == cfg.Mm
    assert cfg2.hmin == pytest.approx(cfg.hmin)
    H = cfg.halo
    sl = (slice(H - 1, H + cfg.Mm + 1), slice(H - 1, H + cfg.Lm + 1))
    for name in ("h", "f", "pm", "pn", "rmask", "umask", "vmask"):
        a = np.asarray(getattr(grid, name))[sl]
        b = np.asarray(getattr(grid2, name))[sl]
        np.testing.assert_allclose(b, a, rtol=0, atol=1e-12, err_msg=name)


def test_file_driven_run_matches_analytic(analytic, tmp_path):
    cfg, grid, s0, ffn = analytic
    gpath = str(tmp_path / "grd.nc")
    gridfile.save_grid(gpath, cfg, grid)
    grid2, cfg2 = gridfile.load_grid(
        gpath, cfg=cfg.replace(nfast=0, hmin=0.0))
    # periodic wrap of file-loaded metrics must regenerate the halo
    runA = jax.jit(lambda s: stepping.run(cfg, grid, s, 3, ffn))
    runB = jax.jit(lambda s: stepping.run(cfg2, grid2, s, 3, ffn))
    sA = jax.device_get(runA(s0))
    sB = jax.device_get(runB(s0))
    for name in ("zeta", "u", "v", "t"):
        np.testing.assert_allclose(
            np.asarray(getattr(sB, name)), np.asarray(getattr(sA, name)),
            rtol=0, atol=1e-10, err_msg=name)


def test_state_from_history(analytic, tmp_path):
    cfg, grid, s0, ffn = analytic
    s1 = jax.jit(lambda s: stepping.run(cfg, grid, s, 2, ffn))(s0)
    hpath = str(tmp_path / "his.nc")
    w = HistoryWriter(hpath, cfg, grid=grid)
    w.write(s1)
    w.close()

    s2 = gridfile.load_state(cfg, hpath)
    H = cfg.halo
    sl = (slice(H, H + cfg.Mm), slice(H, H + cfg.Lm))
    np.testing.assert_allclose(np.asarray(s2.zeta)[sl],
                               np.asarray(s1.zeta)[sl], atol=1e-12)
    np.testing.assert_allclose(np.asarray(s2.t)[(slice(None),) * 2 + sl],
                               np.asarray(s1.t)[(slice(None),) * 2 + sl],
                               atol=1e-12)
    assert float(s2.time) == pytest.approx(float(s1.time))
    # the loaded state must be steppable
    s3 = jax.jit(lambda s: stepping.step(cfg, grid, s, ffn))(s2)
    assert np.isfinite(np.asarray(s3.zeta)).all()


def test_yaml_file_case(analytic, tmp_path):
    cfg, grid, s0, ffn = analytic
    gpath = str(tmp_path / "grd.nc")
    gridfile.save_grid(gpath, cfg, grid)
    doc = {
        "case": "file",
        "grid_file": gpath,
        "nsteps": 1,
        "config": {
            "N": cfg.N, "dt": cfg.dt, "ndtfast": cfg.ndtfast,
            "ew_periodic": cfg.ew_periodic,
            "ns_periodic": cfg.ns_periodic,
            "theta_s": cfg.theta_s, "theta_b": cfg.theta_b,
            "tcline": cfg.tcline, "vtransform": cfg.vtransform,
            "vstretching": cfg.vstretching,
        },
    }
    cfg3, grid3, state3, ffn3, opts = yamlcfg.build_from_dict(doc)
    assert cfg3.Lm == cfg.Lm
    s = jax.jit(lambda s: stepping.step(cfg3, grid3, s))(state3)
    assert np.isfinite(np.asarray(s.zeta)).all()
