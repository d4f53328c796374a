"""Open-boundary conditions: a gravity wave must leave the domain through
Chapman/Flather (and radiation) boundaries with little reflection, while a
closed basin retains its energy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from roms_tpu.config import Config, LBC, BC_CHAPMAN_IMPLICIT, BC_FLATHER, \
    BC_RADIATION, BC_GRADIENT, BC_CLOSED
from roms_tpu.grid import build_grid
from roms_tpu.ops import step2d, bc


def make_case(lbc_z, lbc_u, lbc_v):
    cfg = Config(
        name="obc", Lm=60, Mm=20, N=1, ntracers=0,
        ew_periodic=False, ns_periodic=False,
        dt=30.0, ndtfast=1, nfast=1, solve3d=False,
        uv_adv=False, uv_cor=False, uv_vis2=False, visc2=0.0,
        bottom_drag=None,
        lbc_zeta=lbc_z, lbc_ubar=lbc_u, lbc_vbar=lbc_v,
        lbc_u=lbc_u, lbc_v=lbc_v, lbc_t=lbc_z)
    grid, cfg = build_grid(cfg, 60e3, 20e3, f0=0.0, beta=0.0,
                           depth_fn=lambda x, y, i, j, c: 50.0 + 0 * x)
    cfg = cfg.replace(nfast=1)
    # Gaussian free-surface bump in the center
    xr = np.asarray(grid.xr)
    yr = np.asarray(grid.yr)
    z0 = 0.1 * np.exp(-(((xr - 30e3) / 5e3) ** 2 +
                        ((yr - 10e3) / 5e3) ** 2))
    zeta = bc.fill_halo(cfg, jnp.asarray(z0))
    zero = jnp.zeros_like(zeta)
    fs = step2d.make_fast_state(cfg, zeta, zero, zero)
    return cfg, grid, fs


def energy(cfg, grid, fs):
    H = cfg.halo
    z = np.asarray(fs.zeta_n[H:H + cfg.Mm, H:H + cfg.Lm])
    return float((z ** 2).sum())


def run(cfg, grid, fs, n):
    s1 = jax.jit(lambda s: step2d.step_2d_only(cfg, grid, s, True))
    st = jax.jit(lambda s: step2d.step_2d_only(cfg, grid, s, False))
    fs = s1(fs)
    for _ in range(n - 1):
        fs = st(fs)
    return fs


# wave crossing time: c = sqrt(g*50) ~ 22 m/s; domain 60 km -> ~2700 s
NSTEP = 150   # 4500 s


def test_closed_basin_retains_energy():
    clo = LBC(BC_CLOSED, BC_CLOSED, BC_CLOSED, BC_CLOSED)
    cfg, grid, fs = make_case(clo, clo, clo)
    e0 = energy(cfg, grid, fs)
    fs = run(cfg, grid, fs, NSTEP)
    # free gravity waves slosh: surface energy fluctuates but stays O(e0)
    assert energy(cfg, grid, fs) > 0.05 * e0


@pytest.mark.parametrize("zkind,ukind", [
    (BC_CHAPMAN_IMPLICIT, BC_FLATHER),
    (BC_RADIATION, BC_RADIATION),
])
def test_open_boundaries_radiate(zkind, ukind):
    zl = LBC(zkind, zkind, zkind, zkind)
    ul = LBC(ukind, BC_GRADIENT, ukind, BC_GRADIENT)
    vl = LBC(BC_GRADIENT, ukind, BC_GRADIENT, ukind)
    cfg, grid, fs = make_case(zl, ul, vl)
    e0 = energy(cfg, grid, fs)
    fs = run(cfg, grid, fs, NSTEP)
    e1 = energy(cfg, grid, fs)
    assert np.isfinite(e1)
    # most of the initial surface energy must have left the domain
    assert e1 < 0.15 * e0, f"reflection too strong: e1/e0={e1 / e0:.3f}"


def test_volume_conservation_enforced():
    """obc_volcons: with all-open radiation boundaries AND volume
    conservation, the net boundary flux correction keeps total volume
    nearly constant."""
    from roms_tpu.config import BC_CHAPMAN_IMPLICIT, BC_FLATHER
    zl = LBC(*(4 * [BC_CHAPMAN_IMPLICIT]))
    ul = LBC(BC_FLATHER, BC_GRADIENT, BC_FLATHER, BC_GRADIENT)
    vl = LBC(BC_GRADIENT, BC_FLATHER, BC_GRADIENT, BC_FLATHER)
    cfg, grid, fs = make_case(zl, ul, vl)
    cfg = cfg.replace(volcons=("west", "south", "east", "north"))
    H = cfg.halo
    area = np.asarray(grid.omn[H:H + cfg.Mm, H:H + cfg.Lm])
    vol0 = float((np.asarray(fs.zeta_n[H:H + cfg.Mm, H:H + cfg.Lm]) *
                  area).sum())
    fs = run(cfg, grid, fs, 60)
    z = np.asarray(fs.zeta_n[H:H + cfg.Mm, H:H + cfg.Lm])
    assert np.isfinite(z).all()
    # net boundary flux is zeroed every substep: total volume conserved
    # (the wave sloshes but cannot drain); tolerance covers the O(dt)
    # predictor/corrector D mismatch in the correction
    vol1 = float((z * area).sum())
    assert abs(vol1 - vol0) < 0.05 * abs(vol0), (vol0, vol1)


def test_shchepetkin_radiates_energy_out():
    """Shchepetkin 2-D momentum OBC + Chapman-implicit zeta: the bump
    leaves; energy decays by >10x (u2dbc_im.F Shchepetkin branch)."""
    chi = LBC(BC_CHAPMAN_IMPLICIT, BC_CHAPMAN_IMPLICIT,
              BC_CHAPMAN_IMPLICIT, BC_CHAPMAN_IMPLICIT)
    from roms_tpu.config import BC_SHCHEPETKIN
    shc = LBC(BC_SHCHEPETKIN, BC_SHCHEPETKIN, BC_SHCHEPETKIN,
              BC_SHCHEPETKIN)
    cfg, grid, fs = make_case(chi, shc, shc)
    e0 = energy(cfg, grid, fs)
    fs = run(cfg, grid, fs, NSTEP)
    e1 = energy(cfg, grid, fs)
    assert np.isfinite(np.asarray(fs.zeta_n)).all()
    assert e1 < 0.1 * e0


def test_reduced_physics_accelerates_with_slope():
    """Reduced-physics 2-D momentum OBC: boundary ubar integrates the
    local surface pressure gradient (u2dbc_im.F reduced branch)."""
    from roms_tpu.config import BC_REDUCED, BC_GRADIENT
    gra = LBC(BC_GRADIENT, BC_GRADIENT, BC_GRADIENT, BC_GRADIENT)
    red = LBC(BC_REDUCED, BC_REDUCED, BC_REDUCED, BC_REDUCED)
    cfg, grid, fs = make_case(gra, red, red)
    # replace the bump with a uniform x-slope: dz/dx < 0 -> du/dt > 0
    H = cfg.halo
    xr = np.asarray(grid.xr)
    slope = -1.0e-6
    z0 = slope * (xr - 30e3)
    from roms_tpu.ops import bc as bcmod
    zeta = bcmod.fill_halo(cfg, jnp.asarray(z0))
    fs = fs.replace(zeta_n=zeta, zeta_nm1=zeta, Zt_avg1=zeta)
    fs1 = run(cfg, grid, fs, 3)
    ub = np.asarray(fs1.ubar_n)
    # western boundary column accelerated in +x (down the slope)
    assert (ub[H:H + cfg.Mm, H] > 0.0).all()
    assert np.isfinite(ub).all()
