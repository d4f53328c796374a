"""Observation operator (extract_obs analog), obs files, stats_modobs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from roms_tpu import fourdvar, obs, stepping
from roms_tpu.models import upwelling


@pytest.fixture(scope="module")
def setup():
    # default ndtfast: with 1 km cells the fast CFL needs ~30 substeps
    # (ndtfast=6 is marginal and the 4D-Var inner loop amplifies it)
    cfg = upwelling.make_config(Lm=16, Mm=18, N=4)
    cfg, grid, s0, ffn = upwelling.build(cfg)
    return cfg, grid, s0, ffn


def test_interp2d_bilinear_exact(setup):
    cfg, grid, s0, _ = setup
    # bilinear interpolation reproduces a linear-in-(i,j) field exactly
    H = cfg.halo
    jj, ii = np.mgrid[0:cfg.ny_tot, 0:cfg.nx_tot].astype(float)
    f = 2.0 + 0.3 * (ii - H + 1) + 0.7 * (jj - H + 1)   # roms index units
    xg = np.array([3.25, 7.5, 10.75])
    yg = np.array([2.5, 9.0, 14.25])
    got = np.asarray(obs.interp2d(cfg, jnp.asarray(f), xg, yg))
    want = 2.0 + 0.3 * xg + 0.7 * yg
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_interp2d_stagger_offsets(setup):
    cfg, grid, s0, _ = setup
    H = cfg.halo
    # a u-point field linear in the u index iu: value = iu.  Sampling at
    # Xgrid = iu - 0.5 (the rho-unit coordinate of u(iu)) must return iu.
    jj, ii = np.mgrid[0:cfg.ny_tot, 0:cfg.nx_tot].astype(float)
    fu = ii - H + 1
    for iu in (3.0, 7.0):
        got = float(np.asarray(obs.interp2d(
            cfg, jnp.asarray(fu), np.array([iu - 0.5]),
            np.array([5.0]), var="u"))[0])
        assert got == pytest.approx(iu, abs=1e-12)


def test_interp3d_trilinear_exact(setup):
    cfg, grid, s0, _ = setup
    H = cfg.halo
    kk, jj, ii = np.mgrid[0:cfg.N, 0:cfg.ny_tot, 0:cfg.nx_tot].astype(float)
    f = 1.0 + 0.2 * (ii - H + 1) + 0.4 * (jj - H + 1) + 1.5 * (kk + 1)
    xg = np.array([4.5, 8.25])
    yg = np.array([3.75, 12.0])
    zg = np.array([1.5, 3.25])
    got = np.asarray(obs.interp3d(cfg, jnp.asarray(f), xg, yg, zg,
                                  var="temp"))
    want = 1.0 + 0.2 * xg + 0.4 * yg + 1.5 * zg
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_obs_file_roundtrip(setup, tmp_path):
    cfg, grid, s0, _ = setup
    path = str(tmp_path / "obs.nc")
    olist = [
        obs.FracObs(step=2, var="zeta", xg=np.array([3.5, 8.0]),
                    yg=np.array([4.0, 9.5]),
                    values=jnp.asarray([0.1, -0.2]), sigma=0.05),
        obs.FracObs(step=4, var="temp", xg=np.array([6.25]),
                    yg=np.array([7.75]), zg=np.array([2.5]),
                    values=jnp.asarray([18.0]), sigma=0.3),
    ]
    obs.write_obs(path, cfg, olist)
    back = obs.read_obs(path, cfg)
    assert len(back) == 2
    bz = next(o for o in back if o.var == "zeta")
    bt = next(o for o in back if o.var == "temp")
    assert bz.step == 2 and bt.step == 4
    np.testing.assert_allclose(np.asarray(bz.values), [0.1, -0.2])
    np.testing.assert_allclose(bz.xg, [3.5, 8.0])
    assert bz.sigma == pytest.approx(0.05)
    np.testing.assert_allclose(bt.zg, [2.5])


def test_i4dvar_with_fracobs_twin(setup):
    """Tiny twin experiment through the fractional-coordinate H: the
    analysis must beat the background in observation space."""
    cfg, grid, s0, ffn = setup
    nsteps = 2
    # truth: perturbed initial temperature
    H = cfg.halo
    pert = 0.5 * jnp.exp(
        -(jnp.arange(cfg.ny_tot)[:, None] - (H + 9)) ** 2 / 18.0
        - (jnp.arange(cfg.nx_tot)[None, :] - (H + 8)) ** 2 / 18.0)
    truth0 = s0.replace(t=s0.t.at[0, -1].add(pert))
    truth = truth0
    run1 = jax.jit(lambda s: stepping.step(cfg, grid, s, ffn))
    olist = []
    rng = np.random.default_rng(0)
    for n in range(1, nsteps + 1):
        truth = run1(truth)
        xg = rng.uniform(2, cfg.Lm - 1, 12)
        yg = rng.uniform(2, cfg.Mm - 1, 12)
        zg = np.full(12, float(cfg.N))       # surface-most level
        o = obs.FracObs(step=n, var="temp", xg=xg, yg=yg, zg=zg,
                        values=jnp.zeros(12), sigma=0.1)
        o.values = o.sample(cfg, truth)
        olist.append(o)

    # temperature-only control (zeta/u/v sigmas zero) keeps the analysis
    # increment dynamically stable on this coarse fast-CFL test grid
    xa, diags = fourdvar.i4dvar(cfg, grid, s0, olist, nsteps, ffn,
                                n_inner=5, n_outer=1,
                                sigmas={"zeta": 0.0, "u": 0.0,
                                        "v": 0.0, "t": 0.5})
    assert diags["Jo"][-1] < 0.5 * diags["Jo"][0]

    # stats_modobs: analysis fits obs better than background
    sb, sa = s0, xa
    states_b, states_a = {}, {}
    for n in range(1, nsteps + 1):
        sb = run1(sb)
        sa = run1(sa)
        states_b[n], states_a[n] = sb, sa
    stat_b = obs.stats_modobs(cfg, olist, states_b)
    stat_a = obs.stats_modobs(cfg, olist, states_a)
    assert stat_a["temp"]["rmse"] < stat_b["temp"]["rmse"]
    assert stat_b["temp"]["count"] == 12 * nsteps
