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


def test_uv_budget_terms():
    """DIAGNOSTICS_UV (mod_diags.F DiaRU/DiaRV analog): closure and the
    discrete conservation identities of each momentum budget term."""
    from roms_tpu.ops.stencil import im1, jm1

    from roms_tpu.ops import bc

    cfg = upwelling.make_config(Lm=10, Mm=12, N=10)
    cfg = cfg.replace(visc2=20.0, uv_vis2=True)   # exercise hvisc too
    cfg, grid, s, ffn = upwelling.build(cfg)
    # x-dependent velocity perturbation so the advective terms are real
    # signals (the upwelling channel is otherwise x-uniform)
    key = jax.random.PRNGKey(7)
    du = 0.02 * jax.random.normal(key, s.u.shape, s.u.dtype)
    dv = 0.02 * jax.random.normal(jax.random.fold_in(key, 1), s.v.shape,
                                  s.v.dtype)
    s = s.replace(u=bc.fill_halo(cfg, du * grid.umask),
                  v=bc.fill_halo(cfg, dv * grid.vmask))
    step_d = jax.jit(lambda st: stepping.step(cfg, grid, st, ffn,
                                              collect_diags=True))
    s_prev = s
    for _ in range(6):
        s_prev = s
        s, dia = step_d(s)

    # exact closure: rate == sum of terms (vvisc is the remainder bucket)
    for c in ("u", "v"):
        total = sum(np.asarray(dia[f"{c}_{k}"]) for k in
                    ("prestep", "prsgrd", "cor", "xadv", "yadv",
                     "vadv", "hvisc", "vvisc"))
        np.testing.assert_allclose(total, np.asarray(dia[f"{c}_rate"]),
                                   rtol=0, atol=1e-16)
    np.testing.assert_array_equal(np.asarray(dia["u_rate"]),
                                  np.asarray(s.u - s_prev.u))

    # reconstruct the raw rhs terms: term = inc / (DC0 * oHz)
    H = cfg.halo
    _, _, Hz2 = vgrid.set_depth(grid.h, s.zeta, hc_of(cfg), grid.sc_r,
                                grid.Cs_r, grid.sc_w, grid.Cs_w,
                                cfg.vtransform)
    pm, pn = grid.pm, grid.pn
    DC0u = 0.25 * cfg.dt * (23.0 / 12.0) * (pm + im1(pm)) * (pn + im1(pn))
    DC0v = 0.25 * cfg.dt * (23.0 / 12.0) * (pm + jm1(pm)) * (pn + jm1(pn))
    Hzu = 0.5 * (Hz2 + im1(Hz2))
    Hzv = 0.5 * (Hz2 + jm1(Hz2))
    ru = {k: np.asarray(dia["u_" + k] * Hzu / DC0u) for k in
          ("cor", "xadv", "yadv", "vadv")}
    rv = {k: np.asarray(dia["v_" + k] * Hzv / DC0v) for k in
          ("cor", "xadv", "yadv", "vadv")}

    jj, ii = slice(H, H + cfg.Mm), slice(H, H + cfg.Lm)
    # vadv: interface fluxes telescope -> every column integral vanishes
    for r in (ru["vadv"], rv["vadv"]):
        col = r[:, jj, ii].sum(axis=0)
        assert np.abs(col).max() <= 1e-10 * np.abs(r).max() + 1e-20
    # xadv: flux-form, EW-periodic -> every i-row sum vanishes
    rowsum = ru["xadv"][:, jj, ii].sum(axis=-1)
    assert np.abs(rowsum).max() <= 1e-10 * np.abs(ru["xadv"]).max() + 1e-20
    # Coriolis does no work: sum(u*ru_cor) + sum(v*rv_cor) ~ 0
    work = float((np.asarray(s_prev.u) * ru["cor"])[:, jj, ii].sum() +
                 (np.asarray(s_prev.v) * rv["cor"])[:, jj, ii].sum())
    gross = float(np.abs(np.asarray(s_prev.u) * ru["cor"]).sum() +
                  np.abs(np.asarray(s_prev.v) * rv["cor"]).sum())
    assert abs(work) <= 1e-9 * gross + 1e-20, (work, gross)
    # terms are actually active
    for key in ("u_prsgrd", "v_cor", "u_vvisc", "v_hvisc", "u_prestep"):
        assert float(jnp.abs(dia[key]).max()) > 0.0, key


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
    # Not bitwise: requesting extra outputs changes XLA fusion decisions,
    # which reorder float ops by 1-2 ulp.  Semantically identical.
    np.testing.assert_allclose(np.asarray(sa.t), np.asarray(sb.t),
                               rtol=1e-13, atol=0.0)
    np.testing.assert_allclose(np.asarray(sa.zeta), np.asarray(sb.zeta),
                               rtol=1e-13, atol=1e-15)
