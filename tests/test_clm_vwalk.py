"""2-D momentum climatology nudging (step2d_LF_AM3.h:1822-1844) and
the float vertical random walk (vwalk_floats.F)."""

import jax
import jax.numpy as jnp
import numpy as np

from roms_tpu import stepping
from roms_tpu.models import upwelling
from roms_tpu.floats import init_floats, step_floats, vwalk_velocity


def test_m2_nudging_relaxes_ubar_toward_climatology():
    # main2d (2D-only) mode, where the nudging term acts directly on
    # the rhs.  (Under SOLVE3D the rufrc conversion subtracts the
    # first-fast-step rhs - including the nudging term - so M2 nudging
    # only damps fast deviations there, exactly as in the reference
    # step2d_LF_AM3.h:1884-1888.)
    from roms_tpu.ops import step2d
    from roms_tpu.config import LBC
    per = LBC.doubly_periodic()
    cfg = upwelling.make_config(Lm=10, Mm=12, N=8).replace(
        solve3d=False, ns_periodic=True,
        lbc_zeta=per, lbc_ubar=per, lbc_vbar=per)
    from roms_tpu.grid import build_grid
    grid, cfg = build_grid(cfg, 10.0e3, 12.0e3, f0=0.0, beta=0.0,
                           depth_fn=lambda x, y, i, j, c: 50.0 + 0 * x)
    z = jnp.zeros_like(grid.h)
    fs = step2d.make_fast_state(cfg, z, z, z)
    clm = {"ubarclm": jnp.full_like(z, 0.05), "vbarclm": z,
           "m2nudg": 1.0 / 1800.0}
    fs = step2d.step_2d_only(cfg, grid, fs, True, clm=clm)
    nstep = int(2.0 * 1800.0 / (cfg.dt / cfg.ndtfast))
    for _ in range(nstep):                 # ~2 nudging timescales
        fs = step2d.step_2d_only(cfg, grid, fs, False, clm=clm)
    H = cfg.halo
    ub = float(np.asarray(fs.ubar_n[H:H + cfg.Mm, H:H + cfg.Lm]).mean())
    # relaxed most of the way to the climatology
    assert ub > 0.035
    # control: without clm nothing moves
    fs0 = step2d.make_fast_state(cfg, z, z, z)
    fs0 = step2d.step_2d_only(cfg, grid, fs0, True)
    ub0 = float(np.abs(np.asarray(fs0.ubar_n)).max())
    assert ub0 == 0.0


def test_vwalk_diffusion_statistics():
    # resting column with uniform Akt: floats must spread with variance
    # ~ 2*Akt*t (in z units) and drift little
    cfg = upwelling.make_config(Lm=8, Mm=10, N=16)
    cfg, grid, s0, ffn = upwelling.build(cfg)
    from roms_tpu import vgrid
    from roms_tpu.models.upwelling import hc_of
    _, z_w, Hz = vgrid.set_depth(grid.h, s0.zeta, hc_of(cfg), grid.sc_r,
                                 grid.Cs_r, grid.sc_w, grid.Cs_w,
                                 cfg.vtransform)
    akt = 1.0e-3
    Akt_w = jnp.full((cfg.N + 1,) + grid.h.shape, akt, grid.h.dtype)
    nf = 400
    fl = init_floats(jnp.full((nf,), 4.0), jnp.full((nf,), 5.0),
                     jnp.full((nf,), 8.0))
    zero3 = jnp.zeros((cfg.N,) + grid.h.shape, grid.h.dtype)
    zw3 = jnp.zeros((cfg.N + 1,) + grid.h.shape, grid.h.dtype)
    key = jax.random.PRNGKey(7)
    nsteps = 40
    # depth of a z-level unit at the release point (uniform region)
    H = cfg.halo
    hz_loc = float(Hz[8, H + 4, H + 3])
    z0_m = float(jnp.sum(Hz[:8, H + 4, H + 3]))
    for n in range(nsteps):
        key, sub = jax.random.split(key)
        rw = jax.random.normal(sub, (nf,), grid.h.dtype)
        wv = vwalk_velocity(cfg, grid, Akt_w, Hz, fl, rw)
        fl = step_floats(cfg, grid, zero3, zero3, zw3, Hz, fl,
                         w_vwalk=wv)
    z = np.asarray(fl.zg[3])
    t_tot = nsteps * cfg.dt
    var_m = np.var((z - 8.0) * hz_loc)           # meters^2
    expect = 2.0 * akt * t_tot
    assert 0.5 * expect < var_m < 2.0 * expect
    # no systematic drift with uniform Akt (dAkt/dz = 0)
    assert abs((z.mean() - 8.0) * hz_loc) < 3.0 * np.sqrt(expect / nf) * 5
