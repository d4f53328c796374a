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


# =====================================================================
# Equilibrium tide (TIDE_GENERATING_FORCES; equilibrium_tide.F)
# =====================================================================

def test_equilibrium_tide_amplitude_and_species():
    import jax.numpy as jnp
    import numpy as np
    from roms_tpu.ops.tides import (harmonic_constituents,
                                    equilibrium_tide)

    class _G:
        pass

    g = _G()
    lon = jnp.linspace(0.0, 360.0, 73)[None, :] * jnp.ones((37, 1))
    lat = jnp.linspace(-90.0, 90.0, 37)[:, None] * jnp.ones((1, 73))
    g.xr, g.yr = lon, lat
    hcon = harmonic_constituents(2451545.0, lnodal=True)
    assert set(hcon) == {"Q1", "O1", "K1", "N2", "M2", "S2", "K2"}
    # M2 amplitude*love ~ 0.168 m (x nodal factor close to 1)
    afl_m2 = hcon["M2"][0]
    assert 0.14 < afl_m2 < 0.19

    eq = equilibrium_tide(g, 0.0, hcon)
    assert np.isfinite(np.asarray(eq)).all()
    # bounded by the sum of constituent amplitudes
    total = sum(v[0] for v in hcon.values())
    assert float(jnp.abs(eq).max()) <= total + 1e-12
    # semidiurnal species vanish at the poles (cos^2(lat)); diurnal
    # vanish at equator+poles (sin(2 lat)) -> poles are zero overall
    np.testing.assert_allclose(np.asarray(eq[0]), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(eq[-1]), 0.0, atol=1e-12)
    # M2 dominates at the equator: ~12.42 h periodicity in time
    t_half = 0.5 * 2 * np.pi / hcon["M2"][2]
    eq2 = equilibrium_tide(g, t_half, hcon)
    ieq = 18   # equator row
    c = np.corrcoef(np.asarray(eq[ieq]), np.asarray(eq2[ieq]))[0, 1]
    assert c < -0.5


def test_equilibrium_tide_in_step():
    # benchmark (spherical) with the body force on: the surface
    # pressure term produces motion from rest of tidal magnitude
    import jax
    import jax.numpy as jnp
    import numpy as np
    from roms_tpu.models import benchmark
    from roms_tpu import stepping
    cfg = benchmark.make_config(Lm=24, Mm=8, N=4, dtype="float64")
    cfg, grid, st, ffn = benchmark.build(cfg)
    cfg = cfg.replace(tide_gen_forces=True, vmix="none",
                      bulk_fluxes=False, ts_dif2=False, tnu2=(0.0, 0.0),
                      uv_vis2=False, visc2=0.0)
    stepf = jax.jit(lambda s: stepping.step(cfg, grid, s))
    for _ in range(5):
        st = stepf(st)
    u = np.asarray(st.u)
    assert np.isfinite(u).all()
    assert 0.0 < np.abs(u).max() < 0.5   # tidal acceleration, not blowup
