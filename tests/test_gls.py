"""GLS (k-epsilon) closure: wind-driven mixed-layer growth and stability."""

import jax
import numpy as np
import pytest

from tests.test_vmix import make_ml_case
from roms_tpu import stepping


def test_gls_mixed_layer_grows():
    cfg, grid, s0, ffn = make_ml_case("gls")
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
    # surface tke above the floor (wind injection through the Dirichlet BC)
    assert tke[-1] > 10.0 * cfg.gls_params.Kmin
    # turbulence mixes the near-surface: Akv well above background there
    assert akv[-3:].max() > 1e-4
    # deep interior stays quiescent
    assert akv[1] < 1e-3
    u = np.asarray(s.u)
    assert np.isfinite(u).all() and np.abs(u).max() < 1.0


def test_gls_perfect_restart_fields_present():
    cfg, grid, s0, ffn = make_ml_case("gls")
    stepf = stepping.make_stepper(cfg, grid, ffn, donate=False)
    s = stepf(s0)
    # closure state advances (not frozen at init values)
    assert float(np.abs(np.asarray(s.tke) - float(s0.tke[0, 0, 0])).max()) > 0
