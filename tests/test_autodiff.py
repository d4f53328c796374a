"""Autodiff layer: tangent-linear and adjoint of the full step.

Replaces the reference's hand-coded TLM/ADM/RPM mirrors (ROMS/Tangent,
ROMS/Adjoint, ROMS/Representer - 252k LoC) with jvp/vjp over the nonlinear
step, validated with the reference's own self-checking driver semantics
(SURVEY.md §4.3):
 * sanity check (pert_roms.h): TLM vs finite-difference NLM convergence,
 * symmetry check (symmetry.h / dotproduct.F): <Ax, y> == <x, A^T y>.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from roms_tpu.models import upwelling
from roms_tpu import stepping


@pytest.fixture(scope="module")
def setup():
    cfg = upwelling.make_config(Lm=12, Mm=16, N=6, ndtfast=8)
    cfg, grid, s0, ffn = upwelling.build(cfg)
    # spin up a few steps so the trajectory is active
    stepf = stepping.make_stepper(cfg, grid, ffn, donate=False)
    s = s0
    for _ in range(5):
        s = stepf(s)
    def f(state):
        return stepping.step(cfg, grid, state, ffn)
    return cfg, grid, s, f


def _rand_like(key, tree, scale=1e-4):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(key, len(leaves))
    out = []
    for k, x in zip(keys, leaves):
        if jnp.issubdtype(x.dtype, jnp.floating):
            out.append(scale * jax.random.normal(k, x.shape, x.dtype))
        else:
            out.append(np.zeros(x.shape, jax.dtypes.float0))
    return jax.tree_util.tree_unflatten(treedef, out)


def _dot(a, b):
    return sum(jnp.vdot(x, y) for x, y in zip(
        jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
        if x.dtype == jnp.float64)


def test_tlm_finite_difference_convergence(setup):
    """pert_roms.h sanity check: |f(x+eps*dx) - f(x) - eps*J dx| = O(eps^2)."""
    cfg, grid, s, f = setup
    dx = _rand_like(jax.random.PRNGKey(1), s, scale=1.0)
    y0, jvp_out = jax.jit(lambda s, dx: jax.jvp(f, (s,), (dx,)))(s, dx)

    errs = []
    for eps in (1e-4, 1e-5):
        sp = jax.tree_util.tree_map(
            lambda x, d: x + eps * d if jnp.issubdtype(x.dtype, jnp.floating)
            else x, s, dx)
        y1 = jax.jit(f)(sp)
        num = jax.tree_util.tree_map(
            lambda a, b: (a - b) / eps if jnp.issubdtype(a.dtype, jnp.floating)
            else jnp.zeros_like(a), y1, y0)
        diff = jax.tree_util.tree_map(
            lambda a, b: a - b if jnp.issubdtype(a.dtype, jnp.floating)
            else jnp.zeros_like(a), num, jvp_out)
        nrm = float(jnp.sqrt(_dot(diff, diff).real))
        ref = float(jnp.sqrt(_dot(jvp_out, jvp_out).real))
        errs.append(nrm / ref)
    # first-order error should shrink ~linearly with eps
    assert errs[0] < 1e-2
    assert errs[1] < errs[0]


def test_adjoint_symmetry(setup):
    """symmetry.h / dotproduct.F: <J dx, dy> == <dx, J^T dy>."""
    cfg, grid, s, f = setup
    dx = _rand_like(jax.random.PRNGKey(2), s, scale=1.0)
    dy = _rand_like(jax.random.PRNGKey(3), s, scale=1.0)

    _, Jdx = jax.jit(lambda s, dx: jax.jvp(f, (s,), (dx,)))(s, dx)
    _, vjp_fn = jax.vjp(f, s)
    (JTdy,) = jax.jit(lambda dy: vjp_fn(dy))(dy)

    lhs = float(_dot(Jdx, dy).real)
    rhs = float(_dot(dx, JTdy).real)
    assert abs(lhs - rhs) <= 1e-10 * max(abs(lhs), abs(rhs), 1e-30)
