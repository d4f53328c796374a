"""DIAGNOSTICS_TS tracer budget terms (mod_diags.F / step3d_t.F
DiaTwrk analog): integral closure properties of each term."""

import jax
import jax.numpy as jnp
import numpy as np

from roms_tpu import stepping, vgrid
from roms_tpu.models import upwelling
from roms_tpu.models.upwelling import hc_of


def test_budget_term_integrals():
    cfg = upwelling.make_config(Lm=10, Mm=12, N=10)
    cfg = cfg.replace(tnu2=(5.0, 5.0))        # exercise hdiff too
    cfg, grid, s, ffn = upwelling.build(cfg)
    step_d = jax.jit(lambda st: stepping.step(cfg, grid, st, ffn,
                                              collect_diags=True))
    for _ in range(10):
        s, dia = step_d(s)
    H = cfg.halo
    jj, ii = slice(H, H + cfg.Mm), slice(H, H + cfg.Lm)
    _, _, Hz = vgrid.set_depth(grid.h, s.zeta, hc_of(cfg), grid.sc_r,
                               grid.Cs_r, grid.sc_w, grid.Cs_w,
                               cfg.vtransform)
    area = grid.omn[jj, ii]
    vol = Hz[:, jj, ii] * area

    def closure(term):
        # domain integral vanishes relative to the term's own gross
        # magnitude: flux-form advection (EW periodic, NS zero-flux
        # walls), columnwise-telescoping vadv/vdiff, conservative hdiff
        net = float((dia[term][0][:, jj, ii] * vol).sum())
        gross = float((jnp.abs(dia[term][0][:, jj, ii]) * vol).sum())
        assert abs(net) <= 1e-9 * gross + 1e-20, (term, net, gross)

    for term in ("xadv", "yadv", "vadv", "vdiff", "hdiff"):
        closure(term)
    # terms are actually active (xadv is legitimately zero: the
    # upwelling channel is x-uniform)
    assert float(jnp.abs(dia["yadv"]).max()) > 0.0
    assert float(jnp.abs(dia["vdiff"]).max()) > 0.0
    assert float(jnp.abs(dia["hdiff"]).max()) > 0.0
    # rate equals total change by construction and is consistent in
    # magnitude with the terms
    assert dia["rate"].shape == s.t.shape
    assert np.isfinite(np.asarray(dia["rate"])).all()


def test_diags_do_not_change_solution():
    cfg = upwelling.make_config(Lm=8, Mm=10, N=8)
    cfg, grid, s0, ffn = upwelling.build(cfg)
    step_p = stepping.make_stepper(cfg, grid, ffn, donate=False)
    step_d = jax.jit(lambda st: stepping.step(cfg, grid, st, ffn,
                                              collect_diags=True))
    sa, sb = s0, s0
    for _ in range(5):
        sa = step_p(sa)
        sb, _ = step_d(sb)
    np.testing.assert_array_equal(np.asarray(sa.t), np.asarray(sb.t))
    np.testing.assert_array_equal(np.asarray(sa.zeta),
                                  np.asarray(sb.zeta))
