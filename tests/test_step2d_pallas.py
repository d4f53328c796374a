"""Equivalence of the fused Pallas fast loop vs the reference jnp path.

The Pallas kernel (ops/step2d_pallas.py) must reproduce ops/step2d.fast_loop
exactly on its supported configuration subset; these tests pin that, both for
the shared math core run as plain JAX and for the full pallas_call plumbing
in interpreter mode.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from roms_tpu import stepping
from roms_tpu.models import upwelling
from roms_tpu.ops import step2d, step2d_pallas
from roms_tpu.ops.step2d import Fast2DState

pytestmark = pytest.mark.smoke


def _setup():
    cfg = upwelling.make_config(Lm=24, Mm=20, N=4, ndtfast=8)
    cfg, grid, s0, ffn = upwelling.build(cfg)
    # a couple of slow steps so the fast state / rufrc history is nontrivial
    s = jax.jit(lambda s: stepping.run(cfg, grid, s, 2, ffn))(s0)
    zero = jnp.zeros_like(s.zeta)
    fs = Fast2DState(
        zeta_n=s.zeta, zeta_nm1=s.zeta, ubar_n=s.ubar, ubar_nm1=s.ubar,
        vbar_n=s.vbar, vbar_nm1=s.vbar,
        rzeta_n=s.rzeta, rzeta_nm1=zero, rubar_n=s.rubar, rubar_nm1=zero,
        rvbar_n=s.rvbar, rvbar_nm1=zero,
        Zt_avg1=zero, DU_avg1=zero, DV_avg1=zero,
        DU_avg2=zero, DV_avg2=zero)
    # synthetic slow forcing with structure
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    rufrc = 1e-4 * jax.random.normal(k1, s.zeta.shape, s.zeta.dtype)
    rvfrc = 1e-4 * jax.random.normal(k2, s.zeta.shape, s.zeta.dtype)
    hist = (s.rufrc0_prev, s.rufrc0_prev2, s.rvfrc0_prev, s.rvfrc0_prev2)
    return cfg, grid, fs, rufrc, rvfrc, hist, s.iic


def _ref(cfg, grid, fs, rufrc, rvfrc, hist, iic):
    fs_r, ruc, rvc, wet = step2d.fast_loop(
        cfg, grid, fs, rufrc=rufrc, rvfrc=rvfrc,
        ru0_nm1=hist[0], ru0_nm2=hist[1], rv0_nm1=hist[2],
        rv0_nm2=hist[3], iic=iic)
    assert wet is None
    return fs_r, ruc, rvc


def _compare(ref, out, atol, rhs_rtol=0.0):
    """State fields to atol; RHS/forcing fields additionally allow a
    relative tolerance: the kernel's masked-where boundary writes fuse
    differently in XLA than .at updates (one-ulp FP reassociation) and
    the large-magnitude rhs terms amplify that to ~1e-12 relative."""
    fs_r, ruc_r, rvc_r = ref
    fs_o, ruc_o, rvc_o = out
    for name in step2d_pallas._FS_FIELDS:
        a = np.asarray(getattr(fs_o, name))
        b = np.asarray(getattr(fs_r, name))
        scale = max(np.abs(b).max(), 1.0)
        rt = rhs_rtol if name.startswith(("r", "DU", "DV")) else 0.0
        np.testing.assert_allclose(a, b, rtol=0,
                                   atol=atol + rt * scale, err_msg=name)
    for a, b in ((ruc_o, ruc_r), (rvc_o, rvc_r)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1.0)
        np.testing.assert_allclose(a, b, rtol=0,
                                   atol=atol + rhs_rtol * scale)


def test_core_matches_fast_loop():
    cfg, grid, fs, rufrc, rvfrc, hist, iic = _setup()
    assert step2d_pallas.supported(cfg)
    ref = jax.jit(lambda: _ref(cfg, grid, fs, rufrc, rvfrc, hist, iic))()
    out = jax.jit(lambda: step2d_pallas.core_reference(
        cfg, grid, fs, rufrc, rvfrc, *hist, iic=iic))()
    _compare(ref, out, atol=0.0)          # identical op order -> bitwise


def test_pallas_interpret_matches_fast_loop():
    cfg, grid, fs, rufrc, rvfrc, hist, iic = _setup()
    ref = jax.jit(lambda: _ref(cfg, grid, fs, rufrc, rvfrc, hist, iic))()
    fs_o, ruc_o, rvc_o, wet = jax.jit(
        lambda: step2d_pallas.fast_loop_fused(
            cfg, grid, fs, rufrc, rvfrc, *hist, iic, interpret=True))()
    assert wet is None
    _compare(ref, (fs_o, ruc_o, rvc_o), atol=1e-13, rhs_rtol=1e-9)


def test_use_pallas_gating():
    cfg, *_ = _setup()
    import dataclasses
    assert not step2d_pallas.supported(
        dataclasses.replace(cfg, wetdry=True))
    assert not step2d_pallas.supported(cfg, sources=object())
    # on CPU the dispatcher requires the explicit interpret opt-in
    assert not step2d_pallas.use_pallas(cfg)
