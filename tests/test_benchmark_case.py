"""BENCHMARK case (spherical + JM95 + KPP + COARE) sanity tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from roms_tpu.models import benchmark
from roms_tpu import stepping
from roms_tpu.ops import eos
from roms_tpu.utils import diag


def test_jm95_check_values():
    """rho_eos.F header check values: T=3C, S=35.5, Z=-5000 m."""
    T = jnp.array([[3.0]])
    S = jnp.array([[35.5]])
    Z = jnp.array([[-5000.0]])
    den = eos.rho_jm95(T, S, Z) + 1000.0
    np.testing.assert_allclose(float(den[0, 0]), 1050.3639165364, rtol=1e-9)
    den1 = eos.rho_jm95(T, S, jnp.zeros_like(Z)) + 1000.0
    np.testing.assert_allclose(float(den1[0, 0]), 1028.2845117925, rtol=1e-9)


@pytest.fixture(scope="module")
def bench_small():
    cfg = benchmark.make_config(Lm=64, Mm=32, N=12, ndtfast=10)
    return benchmark.build(cfg)


def test_benchmark_runs_stable(bench_small):
    cfg, grid, s0, ffn = bench_small
    stepf = stepping.make_stepper(cfg, grid, ffn, donate=False)
    s = s0
    for _ in range(20):
        s = stepf(s)
    d = jax.device_get(diag.diagnostics(cfg, grid, s))
    assert bool(d["finite"])
    assert float(d["umax"]) < 2.0
    # spherical Coriolis: southern hemisphere f<0 everywhere
    assert np.asarray(grid.f).max() < 0.0


def test_benchmark_zonal_wind_drives_flow(bench_small):
    cfg, grid, s0, ffn = bench_small
    stepf = stepping.make_stepper(cfg, grid, ffn, donate=False)
    s = s0
    for _ in range(20):
        s = stepf(s)
    H = cfg.halo
    usurf = np.asarray(s.u[-1, H:H + cfg.Mm, H:H + cfg.Lm])
    # eastward wind jet at -60 lat -> eastward surface flow on average
    assert usurf.mean() > 0.0
