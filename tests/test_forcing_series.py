"""Forcing snapshot series: linear time interpolation, cycling
(get_cycle.F / set_2dfld.F semantics), NetCDF round-trip, and a model
run driven by file-style snapshots matching the analytic run."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from roms_tpu import stepping
from roms_tpu.forcing import (ForcingSeries, make_series, series_interp,
                              make_forcing_fn, series_from_netcdf,
                              embed_padded)
from roms_tpu.models import upwelling


def test_interp_and_cycling():
    times = jnp.asarray([10.0, 20.0, 40.0])
    data = jnp.asarray([1.0, 3.0, 7.0])
    fs = make_series(times, data)
    # exact at records, linear between, clamped outside
    assert float(series_interp(fs, 20.0)) == 3.0
    np.testing.assert_allclose(float(series_interp(fs, 15.0)), 2.0)
    np.testing.assert_allclose(float(series_interp(fs, 30.0)), 5.0)
    assert float(series_interp(fs, 0.0)) == 1.0
    assert float(series_interp(fs, 99.0)) == 7.0

    # cycling: records at 10,20,40 with cycle 50; wrap spans
    # t in [40, 60) -> between data[2] (at 40) and data[0] (at 60=10+50)
    fc = make_series(times, data, cycle=50.0)
    np.testing.assert_allclose(float(series_interp(fc, 45.0)),
                               7.0 + (1.0 - 7.0) * 0.25)
    np.testing.assert_allclose(float(series_interp(fc, 55.0)),
                               7.0 + (1.0 - 7.0) * 0.75)
    # periodicity: t and t+cycle identical
    np.testing.assert_allclose(float(series_interp(fc, 15.0)),
                               float(series_interp(fc, 65.0)))
    # works under jit with traced time
    f = jax.jit(lambda t: series_interp(fc, t))
    np.testing.assert_allclose(float(f(45.0)),
                               float(series_interp(fc, 45.0)))


def test_run_from_snapshots_matches_analytic():
    # sample the upwelling analytic wind onto a dense snapshot series;
    # the snapshot-driven run must track the analytic run closely
    cfg = upwelling.make_config(Lm=8, Mm=10, N=8)
    cfg, grid, s0, ffn = upwelling.build(cfg)
    nstep = 40
    tsnap = np.arange(0.0, (nstep + 2) * cfg.dt, cfg.dt / 2)
    snaps = np.stack([np.asarray(ffn(cfg, grid, t)["sustr"])
                      for t in tsnap])
    fs = make_series(jnp.asarray(tsnap), jnp.asarray(snaps))
    ffn_file = make_forcing_fn({"sustr": fs})
    step_a = stepping.make_stepper(cfg, grid, ffn, donate=False)
    step_f = stepping.make_stepper(cfg, grid, ffn_file, donate=False)
    sa, sf = s0, s0
    for _ in range(nstep):
        sa = step_a(sa)
        sf = step_f(sf)
    ua = np.asarray(sa.u)
    uf = np.asarray(sf.u)
    assert np.isfinite(uf).all()
    # dense linear sampling of a smooth ramp: tiny differences only
    np.testing.assert_allclose(uf, ua, atol=5e-4)
    assert np.abs(uf).max() > 1e-3          # the wind actually acted


def test_netcdf_series_roundtrip(tmp_path):
    from scipy.io import netcdf_file
    cfg = upwelling.make_config(Lm=6, Mm=8, N=4)
    cfg, grid, s0, ffn = upwelling.build(cfg)
    path = os.path.join(tmp_path, "frc.nc")
    nt = 5
    rng = np.random.RandomState(0)
    recs = rng.randn(nt, cfg.Mm, cfg.Lm)
    with netcdf_file(path, "w") as f:
        f.createDimension("sms_time", nt)
        f.createDimension("eta_rho", cfg.Mm)
        f.createDimension("xi_rho", cfg.Lm)
        tv = f.createVariable("sms_time", "d", ("sms_time",))
        tv[:] = np.arange(nt, dtype=np.float64)      # days
        vv = f.createVariable("sustr", "d",
                              ("sms_time", "eta_rho", "xi_rho"))
        vv[:] = recs
    fs = series_from_netcdf(path, "sustr", "sms_time", cfg=cfg,
                            cycle=5.0 * 86400.0)
    assert fs.data.shape == (nt, cfg.ny_tot, cfg.nx_tot)
    H = cfg.halo
    got = np.asarray(series_interp(fs, 2.0 * 86400.0))
    np.testing.assert_allclose(got[H:H + cfg.Mm, H:H + cfg.Lm], recs[2])
    # halfway between records 2 and 3
    got = np.asarray(series_interp(fs, 2.5 * 86400.0))
    np.testing.assert_allclose(got[H:H + cfg.Mm, H:H + cfg.Lm],
                               0.5 * (recs[2] + recs[3]))
