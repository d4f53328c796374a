"""Barotropic engine tests: rest state, volume conservation, soliton
propagation (SOLITON analytic fixture, SURVEY.md §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from roms_tpu.models import soliton
from roms_tpu.ops import step2d

pytestmark = pytest.mark.smoke


@pytest.fixture(scope="module")
def soliton_setup():
    return soliton.build()


def run_steps(cfg, grid, fs, nsteps):
    step1 = jax.jit(lambda fs: step2d.step_2d_only(cfg, grid, fs, True))
    step = jax.jit(lambda fs: step2d.step_2d_only(cfg, grid, fs, False))
    fs = step1(fs)
    for _ in range(nsteps - 1):
        fs = step(fs)
    return fs


def interior(cfg, a):
    H = cfg.halo
    return a[..., H:H + cfg.Mm, H:H + cfg.Lm]


def test_rest_state_stays_at_rest(soliton_setup):
    cfg, grid, fs0 = soliton_setup
    z = jnp.zeros_like(fs0.zeta_n)
    fs = step2d.make_fast_state(cfg, z, z, z)
    fs = run_steps(cfg, grid, fs, 10)
    assert float(jnp.max(jnp.abs(fs.zeta_n))) == 0.0
    assert float(jnp.max(jnp.abs(fs.ubar_n))) == 0.0


def test_soliton_volume_conservation(soliton_setup):
    cfg, grid, fs0 = soliton_setup
    area = interior(cfg, grid.omn)
    vol0 = float(jnp.sum(interior(cfg, fs0.zeta_n) * area))
    fs = run_steps(cfg, grid, fs0, 100)
    vol = float(jnp.sum(interior(cfg, fs.zeta_n) * area))
    assert np.isfinite(vol)
    assert abs(vol - vol0) < 1e-10 * max(1.0, abs(vol0))


def test_soliton_westward_propagation(soliton_setup):
    cfg, grid, fs0 = soliton_setup
    nsteps = 400          # t = 20 nondimensional units
    fs = run_steps(cfg, grid, fs0, nsteps)
    z0 = np.asarray(interior(cfg, fs0.zeta_n))
    z1 = np.asarray(interior(cfg, fs.zeta_n))
    assert np.isfinite(z1).all()
    # peak amplitude roughly preserved (soliton; some radiation expected)
    assert z1.max() > 0.5 * z0.max()
    # peak moved west: linear long-wave Rossby speed ~ -1/3 (nondim);
    # the nonlinear soliton moves a bit faster (~ -0.4)
    x0 = np.unravel_index(np.argmax(z0), z0.shape)[1]
    x1 = np.unravel_index(np.argmax(z1), z1.shape)[1]
    dx_cells = x1 - x0
    t = nsteps * cfg.dt
    dx_expected = -t / 3.0 / 0.5       # cells (dx=0.5)
    assert dx_cells < -0.5 * abs(dx_expected)
    assert dx_cells > -2.0 * abs(dx_expected)


def test_fast_loop_runs_solve3d_mode():
    """SOLVE3D-mode fast loop with zero slow forcing behaves sanely."""
    from roms_tpu.config import Config, LBC
    from roms_tpu.grid import build_grid

    cfg = Config(name="chan", Lm=24, Mm=16, N=2, dt=300.0, ndtfast=10,
                 solve3d=True, visc2=0.0, uv_vis2=False,
                 bottom_drag=None)
    grid, cfg = build_grid(cfg, 100e3, 80e3, f0=1e-4, beta=0.0,
                           depth_fn=lambda x, y, i, j, c: 50.0 + 0 * x)
    key = jax.random.PRNGKey(0)
    H = cfg.halo
    z = 0.01 * jax.random.normal(key, (cfg.ny_tot, cfg.nx_tot),
                                 dtype=jnp.float64)
    from roms_tpu.ops import bc
    z = bc.apply_bc_rho(cfg, cfg.lbc_zeta, z)
    zero = jnp.zeros_like(z)
    fs = step2d.make_fast_state(cfg, z, zero, zero)
    fs_out, rufrc_c, rvfrc_c, _ = step2d.fast_loop(
        cfg, grid, fs, rufrc=zero, rvfrc=zero,
        ru0_nm1=zero, ru0_nm2=zero, rv0_nm1=zero, rv0_nm2=zero, iic=0)
    assert np.isfinite(np.asarray(fs_out.zeta_n)).all()
    assert np.isfinite(np.asarray(fs_out.Zt_avg1)).all()
    # filter average should be close to the (small) initial field scale
    assert float(jnp.max(jnp.abs(fs_out.Zt_avg1))) < 0.05
    # with zero slow rhs, rufrc_c = -rhs_ubar(first predictor)
    assert np.isfinite(np.asarray(rufrc_c)).all()
