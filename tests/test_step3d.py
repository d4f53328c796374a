"""3-D baroclinic core tests (UPWELLING fixture, SURVEY.md §7 stage 3).

The constancy-preservation test is the reference's own acid test of the
split-explicit coupling: a spatially constant tracer must remain constant
through advection by the corrected mass fluxes (step3d_uv.F:1190-1211
exact-integral correction + pre_step3d.F artificial continuity).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from roms_tpu.models import upwelling
from roms_tpu import stepping
from roms_tpu.utils import diag

pytestmark = pytest.mark.smoke


@pytest.fixture(scope="module")
def upw():
    cfg = upwelling.make_config(Lm=16, Mm=24, N=8, ndtfast=10)
    return upwelling.build(cfg)


def interior(cfg, a):
    H = cfg.halo
    return np.asarray(a[..., H:H + cfg.Mm, H:H + cfg.Lm])


def test_tracer_constancy_preservation(upw):
    cfg, grid, s0, ffn = upw
    tc = jnp.stack([jnp.full_like(s0.t[0], 14.0),
                    jnp.full_like(s0.t[0], 35.0)])
    s = s0.replace(t=tc, t_prev=tc)
    # run WITH wind so there is real flow and free-surface movement
    stepf = stepping.make_stepper(cfg, grid, ffn, donate=False)
    for _ in range(10):
        s = stepf(s)
    Terr = np.abs(interior(cfg, s.t[0]) - 14.0).max()
    Serr = np.abs(interior(cfg, s.t[1]) - 35.0).max()
    # With active flow the fast-filter's first-corrector inconsistency
    # (the reference's own: step2d_LF_AM3.h first corrector is plain AM3
    # against a stale cross-step rzeta while the secondary weights treat
    # it as Backward-Euler) yields O(1e-9) constancy error per step -
    # identical behavior to Fortran ROMS, not a porting defect.
    assert Terr < 1e-7
    assert Serr < 1e-7
    assert np.isfinite(interior(cfg, s.u)).all()


def test_tracer_constancy_no_wind(upw):
    cfg, grid, s0, _ = upw
    tc = jnp.stack([jnp.full_like(s0.t[0], 14.0),
                    jnp.full_like(s0.t[0], 35.0)])
    s = s0.replace(t=tc, t_prev=tc)
    stepf = stepping.make_stepper(cfg, grid, None, donate=False)
    for _ in range(5):
        s = stepf(s)
    assert np.abs(interior(cfg, s.t[0]) - 14.0).max() < 1e-11


def test_stratified_rest_state(upw):
    cfg, grid, s0, _ = upw
    stepf = stepping.make_stepper(cfg, grid, None, donate=False)
    s = s0
    for _ in range(5):
        s = stepf(s)
    # pressure-gradient error of the splines density Jacobian over the
    # shelf must be tiny (prsgrd32 design goal)
    assert np.abs(interior(cfg, s.u)).max() < 1e-4
    assert np.abs(interior(cfg, s.zeta)).max() < 1e-4
    # stratification unchanged to high accuracy
    np.testing.assert_allclose(interior(cfg, s.t[0]),
                               interior(cfg, s0.t[0]), atol=1e-3)


def test_upwelling_short_run_physics(upw):
    cfg, grid, s0, ffn = upw
    stepf = stepping.make_stepper(cfg, grid, ffn, donate=False)
    s = s0
    for _ in range(30):
        s = stepf(s)
    d = jax.device_get(diag.diagnostics(cfg, grid, s))
    assert bool(d["finite"])
    assert 0 < float(d["ke"]) < 1.0
    assert float(d["umax"]) < 2.0
    # volume conservation: total volume matches initial to round-off
    d0 = jax.device_get(diag.diagnostics(cfg, grid, s0))
    assert abs(float(d["volume"]) / float(d0["volume"]) - 1.0) < 1e-10
    # wind is westward (sustr<0): surface flow should have negative u mean
    usurf = interior(cfg, s.u[-1]).mean()
    assert usurf < 0.0


def test_restart_equivalence(upw):
    """PERFECT_RESTART analog: stepping 6 = stepping 3 + (state roundtrip)
    + stepping 3, bitwise."""
    cfg, grid, s0, ffn = upw
    stepf = stepping.make_stepper(cfg, grid, ffn, donate=False)
    sA = s0
    for _ in range(6):
        sA = stepf(sA)
    sB = s0
    for _ in range(3):
        sB = stepf(sB)
    # roundtrip through host numpy (what a checkpoint does)
    leaves, treedef = jax.tree_util.tree_flatten(sB)
    leaves = [jnp.asarray(np.asarray(x)) for x in leaves]
    sB = jax.tree_util.tree_unflatten(treedef, leaves)
    for _ in range(3):
        sB = stepf(sB)
    for a, b in zip(jax.tree_util.tree_leaves(sA),
                    jax.tree_util.tree_leaves(sB)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mean_age_tracer_pair():
    """AGE_MEAN inert pair: with a uniform conservative tracer C=1 the
    age concentration grows by dt*C per step, so mean age = n*dt
    (step3d_t.F:1507-1539, Zhang et al. 2010)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from roms_tpu.models import upwelling
    from roms_tpu import stepping
    cfg, grid, st, ffn = upwelling.build()
    cfg = cfg.replace(ntracers=4, inert_age=((2, 3),),
                      t_hadv=4 * ("U3",), t_vadv=4 * ("C4",),
                      tnu2=(0.0,) * 4, akt_bak=(1e-6,) * 4)
    t4 = jnp.concatenate([st.t, jnp.ones_like(st.t[:1]),
                          jnp.zeros_like(st.t[:1])])
    st = st.replace(t=t4, Akt=jnp.concatenate(
        [st.Akt, st.Akt[:1], st.Akt[:1]]))
    stepf = jax.jit(lambda s: stepping.step(cfg, grid, s, ffn))
    for n in range(3):
        st = stepf(st)
    H = cfg.halo
    itr = (slice(None), slice(H, H + cfg.Mm), slice(H, H + cfg.Lm))
    C = np.asarray(st.t[2])[itr]
    A = np.asarray(st.t[3])[itr]
    np.testing.assert_allclose(C, 1.0, atol=1e-9)       # constancy
    np.testing.assert_allclose(A / C, 3 * cfg.dt, rtol=1e-7)
