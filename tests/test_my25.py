"""Dedicated Mellor-Yamada 2.5 closure (my25_corstep.F equivalent)."""

import numpy as np

from tests.test_vmix import make_ml_case
from roms_tpu import stepping
from roms_tpu.ops import my25


def test_my25_constants():
    """Derived stability-function factors match mod_scalars.F:4475-4490."""
    assert np.isclose(my25.my_B1p2o3, 16.6 ** (2.0 / 3.0))
    assert np.isclose(my25.my_Sh1, 0.74 * (1.0 - 6.0 * 0.92 / 16.6))
    assert np.isclose(my25.my_Sm2, 9.0 * 0.92 * 0.74)
    assert np.isclose(my25.my_Sm4_gal, 18.0 * 0.92 ** 2 + 9.0 * 0.92 * 0.74)


def test_my25_mixed_layer_grows():
    cfg, grid, s0, ffn = make_ml_case("my25")
    stepf = stepping.make_stepper(cfg, grid, ffn, donate=False)
    s = s0
    for _ in range(30):     # 5 h of 0.1 N/m2 wind
        s = stepf(s)
    H = cfg.halo
    col = (slice(None), H + 4, H + 4)
    tke = np.asarray(s.tke[col])
    akv = np.asarray(s.Akv[col])
    assert np.isfinite(np.asarray(s.tke)).all()
    assert np.isfinite(np.asarray(s.gls)).all()
    # q2 at the surface set by the Dirichlet BC: B1^(2/3)*u*^2
    ust2 = 0.1 / 1025.0
    assert np.isclose(tke[-1], 16.6 ** (2.0 / 3.0) * ust2, rtol=1e-3)
    # turbulence mixes the near-surface: Akv well above background there
    assert akv[-3:].max() > 1e-4
    # deep interior stays quiescent
    assert akv[1] < 1e-3
    u = np.asarray(s.u)
    assert np.isfinite(u).all() and np.abs(u).max() < 1.0


def test_my25_galperin_vs_kantha_clayson():
    """Both stability-function variants run; they differ measurably."""
    cfg, grid, s0, ffn = make_ml_case("my25")
    cfg_kc = cfg.replace(my25_kantha_clayson=True)
    s_g = s0
    s_k = s0
    stepg = stepping.make_stepper(cfg, grid, ffn, donate=False)
    stepk = stepping.make_stepper(cfg_kc, grid, ffn, donate=False)
    for _ in range(10):
        s_g = stepg(s_g)
        s_k = stepk(s_k)
    akv_g = np.asarray(s_g.Akv)
    akv_k = np.asarray(s_k.Akv)
    assert np.isfinite(akv_g).all() and np.isfinite(akv_k).all()
    assert np.abs(akv_g - akv_k).max() > 0.0
