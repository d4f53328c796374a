"""Lagrangian floats: advection accuracy in a known flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from roms_tpu.models import upwelling
from roms_tpu import stepping, floats
from roms_tpu import vgrid
from roms_tpu.grid import hc_of
from roms_tpu.ops.omega import set_massflux, omega


def test_floats_uniform_flow_advection():
    """Floats in a prescribed uniform zonal flow must travel u*t."""
    cfg = upwelling.make_config(Lm=24, Mm=16, N=6, ndtfast=8)
    cfg, grid, s0, ffn = upwelling.build(cfg)
    u0 = 0.3   # m/s
    s = s0.replace(u=jnp.full_like(s0.u, u0))
    hc = hc_of(cfg)
    z_r, z_w, Hz = vgrid.set_depth(grid.h, s.zeta, hc, grid.sc_r,
                                   grid.Cs_r, grid.sc_w, grid.Cs_w,
                                   cfg.vtransform)
    Huon, Hvom = set_massflux(cfg, grid, s.u, s.v, Hz)
    W = omega(cfg, grid, Huon, Hvom, z_w)

    fl = floats.init_floats(jnp.array([5.0, 12.0]),
                            jnp.array([8.0, 8.0]),
                            jnp.array([3.0, 5.0]))
    stepf = jax.jit(lambda fl: floats.step_floats(cfg, grid, s.u, s.v, W,
                                                  Hz, fl))
    nsteps = 20
    for _ in range(nsteps):
        fl = stepf(fl)
    dx_cells = np.asarray(fl.xg[3]) - np.array([5.0, 12.0])
    # expected displacement in cells: u0 * t * pm (dx = 1000 m)
    expected = u0 * nsteps * cfg.dt / 1000.0
    np.testing.assert_allclose(dx_cells, expected, rtol=1e-3)
    # no meridional or vertical drift in uniform zonal flow
    assert np.abs(np.asarray(fl.yg[3]) - 8.0).max() < 1e-6
    assert np.isfinite(np.asarray(fl.zg)).all()


def test_floats_follow_model_flow():
    """Floats advected by an evolving UPWELLING run stay bounded/finite."""
    cfg = upwelling.make_config(Lm=16, Mm=24, N=6, ndtfast=8)
    cfg, grid, s0, ffn = upwelling.build(cfg)
    stepm = stepping.make_stepper(cfg, grid, ffn, donate=False)
    fl = floats.init_floats(jnp.linspace(2.0, 14.0, 5),
                            jnp.full(5, 12.0), jnp.full(5, 5.0))
    s = s0
    hc = hc_of(cfg)
    for _ in range(15):
        s = stepm(s)
        z_r, z_w, Hz = vgrid.set_depth(grid.h, s.zeta, hc, grid.sc_r,
                                       grid.Cs_r, grid.sc_w, grid.Cs_w,
                                       cfg.vtransform)
        Huon, Hvom = set_massflux(cfg, grid, s.u, s.v, Hz)
        W = omega(cfg, grid, Huon, Hvom, z_w)
        fl = floats.step_floats(cfg, grid, s.u, s.v, W, Hz, fl)
    assert np.isfinite(np.asarray(fl.xg)).all()
    x = np.asarray(fl.xg[3])
    y = np.asarray(fl.yg[3])
    assert ((x > 0) & (x < cfg.Lm + 1)).all()
    assert ((y > 0) & (y < cfg.Mm + 1)).all()


def test_floats_with_sharded_fields_match_single_device():
    """mp_collect/mp_assemble analog: float trajectories are computed
    from the logically-global sharded velocity fields (XLA gathers the
    interpolation stencils across shards), so a multi-device run needs
    no explicit collection step and matches single-device exactly."""
    import numpy as np
    import jax
    from roms_tpu.models import upwelling
    from roms_tpu.parallel import shard
    from roms_tpu import stepping, vgrid, floats
    from roms_tpu.grid import hc_of
    from roms_tpu.ops.omega import set_massflux, omega

    cfg = upwelling.make_config(Lm=26, Mm=26, N=4, dtype="float64")
    cfg, grid, s0, ffn = upwelling.build(cfg)
    H = cfg.halo
    hc = hc_of(cfg)
    fl0 = floats.init_floats(
        np.asarray([6.0, 12.0, 20.0]) + H - 0.5,
        np.asarray([8.0, 14.0, 20.0]) + H - 0.5,
        np.asarray([-5.0, -40.0, -80.0]))

    def advance(grid_x, s, fl, n):
        step = stepping.make_stepper(cfg, grid_x, ffn, donate=False)
        for _ in range(n):
            s = step(s)
            z_r, z_w, Hz = vgrid.set_depth(
                grid_x.h, s.zeta, hc, grid_x.sc_r, grid_x.Cs_r,
                grid_x.sc_w, grid_x.Cs_w, cfg.vtransform)
            Huon, Hvom = set_massflux(cfg, grid_x, s.u, s.v, Hz)
            W = omega(cfg, grid_x, Huon, Hvom, z_w)
            fl = floats.step_floats(cfg, grid_x, s.u, s.v, W, Hz, fl)
        return s, fl

    _, fl_ref = advance(grid, s0, fl0, 6)

    mesh = shard.make_mesh(jax.devices()[:8])
    grid_s = shard.shard_state(mesh, grid)
    s_s = shard.shard_state(mesh, s0)
    _, fl_par = advance(grid_s, s_s, fl0, 6)

    np.testing.assert_allclose(np.asarray(fl_par.xg),
                               np.asarray(fl_ref.xg), atol=1e-10)
    np.testing.assert_allclose(np.asarray(fl_par.yg),
                               np.asarray(fl_ref.yg), atol=1e-10)
    np.testing.assert_allclose(np.asarray(fl_par.zg),
                               np.asarray(fl_ref.zg), atol=1e-8)


@pytest.mark.smoke
def test_float_behaviors():
    """FLOAT_BIOLOGY behaviors (biology_floats.F / oyster_floats.h):
    diel migration targets flip day/night; oyster larvae grow, sink
    faster as they grow (SR law), swim up in rising salinity, and
    settle near the bed at settlement size."""
    import jax.numpy as jnp
    import numpy as np
    from roms_tpu import float_behavior as fb
    from roms_tpu.models import upwelling

    cfg = upwelling.make_config(Lm=8, Mm=8, N=4, ndtfast=6)
    cfg, grid, s0, ffn = upwelling.build(cfg)

    # diel migration: day -> swim down toward z_day, night -> up
    z = jnp.full((5,), -20.0)
    w_day = fb.diel_migration_w(cfg, z, time=12.0 * 3600.0)
    w_night = fb.diel_migration_w(cfg, z, time=0.0)
    assert float(w_day.max()) < 0.0       # toward -40 m
    assert float(w_night.min()) > 0.0     # toward -5 m

    # oyster larvae
    p = fb.OysterParams()
    st = fb.init_oysters(4, p)
    temp = jnp.full((4,), p.temp_opt)
    salt = jnp.full((4,), p.salt_opt)
    zf = jnp.array([-5.0, -5.0, -74.5, -5.0])
    hf = jnp.full((4,), 75.0)
    st1, w1 = fb.oyster_behavior(cfg, p, st, temp, salt,
                                 jnp.zeros((4,)), zf, hf)
    assert (np.asarray(st1.size) > np.asarray(st.size)).all()  # growth
    # rising salinity -> more swimming -> larger w than falling
    st_up, w_up = fb.oyster_behavior(cfg, p, st, temp, salt,
                                     jnp.full((4,), 0.5), zf, hf)
    st_dn, w_dn = fb.oyster_behavior(cfg, p, st, temp, salt,
                                     jnp.full((4,), -0.5), zf, hf)
    assert (np.asarray(w_up) > np.asarray(w_dn)).all()
    # bigger larvae sink faster (SR law)
    big = st._replace(size=jnp.full((4,), 320.0),
                      swim_time=jnp.full((4,), p.swim_Tmin))
    sml = st._replace(size=jnp.full((4,), 120.0),
                      swim_time=jnp.full((4,), p.swim_Tmin))
    _, w_big = fb.oyster_behavior(cfg, p, big, temp, salt,
                                  jnp.zeros((4,)), zf, hf)
    _, w_sml = fb.oyster_behavior(cfg, p, sml, temp, salt,
                                  jnp.zeros((4,)), zf, hf)
    assert (np.asarray(w_big) < np.asarray(w_sml)).all()
    # settlement: settlement-size larva near the bed settles, w -> 0
    ready = st._replace(size=jnp.full((4,), p.size_settle + 1.0))
    st2, w2 = fb.oyster_behavior(cfg, p, ready, temp, salt,
                                 jnp.zeros((4,)), zf, hf)
    assert float(st2.settled[2]) == 1.0 and float(w2[2]) == 0.0
    assert float(st2.settled[0]) == 0.0
