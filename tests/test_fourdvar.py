"""I4D-Var twin experiment: recover a perturbed initial condition from
sparse observations of the free surface and SST (the reference's i4dvar.h
outer/inner loop semantics with jvp/vjp TLM-ADM)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from roms_tpu.models import upwelling
from roms_tpu import stepping, fourdvar


def test_i4dvar_twin_experiment():
    cfg = upwelling.make_config(Lm=12, Mm=14, N=4, ndtfast=6)
    cfg, grid, truth0, ffn = upwelling.build(cfg)
    H = cfg.halo
    nsteps = 2

    # truth: background + smooth temperature perturbation
    key = jax.random.PRNGKey(7)
    pert = 0.5 * jnp.exp(
        -(((grid.xr - 6e3) / 3e3) ** 2 + ((grid.yr - 7e3) / 3e3) ** 2))
    t_true = truth0.t.at[0].add(pert)
    truth = truth0.replace(t=t_true, t_prev=t_true)

    # observations: SST everywhere (interior) at step 2
    s = truth
    obs = []
    stepf = stepping.make_stepper(cfg, grid, ffn, donate=False)
    for n in range(1, nsteps + 1):
        s = stepf(s)
        if n == 2:
            ii = np.s_[0, -1, H:H + cfg.Mm, H:H + cfg.Lm]
            obs.append(fourdvar.Obs(
                step=n, field="t", idx=ii, values=s.t[ii], sigma=0.1))

    background = truth0   # unperturbed background
    analysis, diags = fourdvar.i4dvar(
        cfg, grid, background, obs, nsteps, ffn,
        sigmas={"zeta": 0.0, "u": 0.0, "v": 0.0, "t": 0.5},
        b_iters=2, n_inner=5, n_outer=1)

    # cost must drop substantially
    assert diags["Jo"][-1] < 0.05 * diags["Jo"][0]
    # the analysis initial SST must be closer to the truth than background
    err_b = float(jnp.abs(background.t[0, -1] - truth.t[0, -1]).max())
    err_a = float(jnp.abs(analysis.t[0, -1] - truth.t[0, -1]).max())
    assert err_a < 0.5 * err_b


def _twin_setup():
    cfg = upwelling.make_config(Lm=12, Mm=14, N=4, ndtfast=6)
    cfg, grid, truth0, ffn = upwelling.build(cfg)
    H = cfg.halo
    nsteps = 2
    pert = 0.5 * jnp.exp(
        -(((grid.xr - 6e3) / 3e3) ** 2 + ((grid.yr - 7e3) / 3e3) ** 2))
    t_true = truth0.t.at[0].add(pert)
    truth = truth0.replace(t=t_true, t_prev=t_true)
    s = truth
    obs = []
    stepf = stepping.make_stepper(cfg, grid, ffn, donate=False)
    for n in range(1, nsteps + 1):
        s = stepf(s)
        if n == 2:
            ii = np.s_[0, -1, H:H + cfg.Mm, H:H + cfg.Lm]
            obs.append(fourdvar.Obs(
                step=n, field="t", idx=ii, values=s.t[ii], sigma=0.1))
    return cfg, grid, truth0, ffn, obs, nsteps


def _check_dual_matches_primal(dual_fn):
    cfg, grid, truth0, ffn, obs, nsteps = _twin_setup()
    sig = {"zeta": 0.0, "u": 0.0, "v": 0.0, "t": 0.5}
    ana_d, dd = dual_fn(cfg, grid, truth0, obs, nsteps, ffn,
                        sigmas=sig, b_iters=2, n_inner=8)
    ana_p, dp = fourdvar.i4dvar(cfg, grid, truth0, obs, nsteps, ffn,
                                sigmas=sig, b_iters=2, n_inner=8)
    # dual reduces the cost like the primal
    assert dd["Jo"][-1] < 0.05 * dd["Jo"][0]
    # same analysis increment (same normal equations)
    da = np.asarray(ana_d.t[0, -1]) - np.asarray(truth0.t[0, -1])
    pa = np.asarray(ana_p.t[0, -1]) - np.asarray(truth0.t[0, -1])
    scale = np.abs(pa).max()
    np.testing.assert_allclose(da, pa, atol=0.05 * scale)


def test_rbl4dvar_dual_matches_primal():
    """The dual (observation-space) solve must reach the same analysis
    as the primal I4D-Var for the same B and enough iterations."""
    _check_dual_matches_primal(fourdvar.rbl4dvar)


def test_r4dvar_representer_matches_primal():
    """R4D-Var (indirect representer, plain obs-space CG) solves the
    same stabilized representer system - same analysis as the primal."""
    _check_dual_matches_primal(fourdvar.r4dvar)


def test_i4dvar_wind_stress_control_twin():
    """Adjustable surface forcing (frc_adjust.F analog): the truth is
    driven by a wind-stress anomaly the background lacks; with
    ("sustr",) in the control vector and the IC sigmas zeroed, 4D-Var
    recovers the anomaly (corr ~ 1, Jo down by >4 orders)."""
    # ndtfast=30: fast-CFL-stable (an understable fast loop leaves the
    # forward run usable but amplifies grid-scale gravity-wave modes
    # ~1e12 in the 3-step adjoint; cf. the test_obs fixture fix).
    # vmix="none": the closure's boundary-layer-depth one-hot gathers
    # make the wind-stress adjoint spiky; the forcing-control machinery
    # is demonstrated on the direct momentum pathway.
    cfg = upwelling.make_config(Lm=12, Mm=14, N=4, ndtfast=30)
    cfg, grid, truth0, ffn = upwelling.build(cfg)
    cfg = cfg.replace(vmix="none")
    H = cfg.halo
    nsteps = 3

    # kinematic stress anomaly (m2/s2): ~0.2 Pa peak
    tau = 2.0e-4 * jnp.exp(
        -(((grid.xr - 6e3) / 4e3) ** 2 + ((grid.yr - 7e3) / 5e3) ** 2))

    def ffn_truth(c, g, t):
        frc = dict(ffn(c, g, t)) if ffn else {}
        frc["sustr"] = frc.get("sustr", 0.0) + tau
        return frc

    # observations: surface u from the truth run
    s = truth0
    stepf = stepping.make_stepper(cfg, grid, ffn_truth, donate=False)
    obs = []
    for n in range(1, nsteps + 1):
        s = stepf(s)
        if n >= 2:
            iu = np.s_[-1, H:H + cfg.Mm, H:H + cfg.Lm]
            obs.append(fourdvar.Obs(
                step=n, field="u", idx=iu, values=s.u[iu], sigma=1e-3))

    analysis, diags = fourdvar.i4dvar(
        cfg, grid, truth0, obs, nsteps, ffn,
        sigmas={"zeta": 0.0, "u": 0.0, "v": 0.0, "t": 0.0,
                "sustr": 1.0e-4},
        b_iters=2, n_inner=8, n_outer=1,
        controls=("zeta", "u", "v", "t", "sustr"))

    assert diags["Jo"][-1] < 1e-3 * diags["Jo"][0]
    dsus = np.asarray(diags["control"]["sustr"])
    tau_np = np.asarray(tau)
    ii = np.s_[H:H + cfg.Mm, H:H + cfg.Lm]
    a, b = dsus[ii].ravel(), tau_np[ii].ravel()
    corr = float(np.dot(a - a.mean(), b - b.mean()) /
                 (np.linalg.norm(a - a.mean()) *
                  np.linalg.norm(b - b.mean()) + 1e-30))
    assert corr > 0.95, corr
    # amplitude recovered within 20%
    assert 0.8 < np.abs(a).max() / tau_np.max() < 1.2
