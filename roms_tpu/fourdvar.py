"""Incremental strong-constraint 4D-Var (I4D-Var).

The analog of the reference's I4D-Var driver stack
(ROMS/Drivers/i4dvar.h ROMS_run outer/inner loops, ROMS/Utility/congrad.F
conjugate-gradient minimizer, convolve.F/normalization.F diffusion-operator
background covariance), with the crucial difference that the tangent-linear
and adjoint models are jax.jvp/jax.vjp of the nonlinear step instead of the
hand-coded ROMS/Tangent + ROMS/Adjoint mirrors (SURVEY.md §2.8).

Control vector: initial-condition increments of (zeta, u, v, t).
Background covariance: B = Sigma C Sigma with C a diffusion-operator
correlation (iterated Laplacian smoothing, the reference's convolve.F
approach) and Sigma diagonal standard deviations.
Inner loop: CG on the Gauss-Newton normal equations
  (I + B^T/2 M^T H^T R^-1 H M B^1/2) w = -B^T/2 grad Jo,
preconditioned control w with delta_x = B^1/2 w (the reference's
v-space formulation).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Sequence

import jax
import jax.numpy as jnp

from .config import Config
from .grid import Grid
from .state import State
from . import stepping
from .ops import bc
from .ops.stencil import ip1, im1, jp1, jm1

CONTROL_FIELDS = ("zeta", "u", "v", "t")


@dataclass
class Obs:
    """Observations of one field at one model step.

    field: State field name ("zeta", "t", "u", ...); idx: tuple of index
    arrays into the (padded) field array; values: observed values;
    sigma: observation error std dev."""
    step: int
    field: str
    idx: tuple
    values: jax.Array
    sigma: float = 1.0


def _smooth(cfg: Config, a, iters: int):
    """Diffusion-operator correlation smoother (convolve.F analog):
    iterated 5-point Laplacian smoothing with halo refresh."""
    for _ in range(iters):
        a = bc.fill_halo(cfg, a)
        a = a + 0.125 * (ip1(a) + im1(a) + jp1(a) + jm1(a) - 4.0 * a)
    return bc.fill_halo(cfg, a)


def make_bsqrt(cfg: Config, sigmas: Dict[str, float], iters: int = 4):
    """B^{1/2}: per-field std dev scaling + horizontal diffusion smoothing
    (self-adjoint, so B^{T/2} = B^{1/2} up to the halo projection)."""

    def bsqrt(incr: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        out = {}
        for name, v in incr.items():
            out[name] = sigmas.get(name, 0.0) * _smooth(cfg, v, iters)
        return out

    return bsqrt


def _dot(a: Dict, b: Dict):
    return sum(jnp.vdot(a[k], b[k]).real for k in a)


def _make_ops(cfg: Config, grid: Grid, background: State,
              obs: Sequence[Obs], nsteps: int, forcing_fn: Callable):
    """Shared 4D-Var building blocks: the sampled trajectory operator
    H∘M, the sigma-scaled observation vector, and increment helpers."""

    def sample(ob, state: State):
        # fractional-coordinate obs (obs.FracObs, the extract_obs.F
        # path) carry their own sampler; integer-index Obs index the
        # padded field directly
        if hasattr(ob, "sample"):
            return ob.sample(cfg, state)
        return getattr(state, ob.field)[ob.idx]

    def traj_obs(state: State):
        out = []
        for n in range(nsteps):
            state = stepping.step(cfg, grid, state, forcing_fn)
            for ob in obs:
                if ob.step == n + 1:
                    out.append(sample(ob, state) / ob.sigma)
        return jnp.concatenate([jnp.ravel(o) for o in out])

    y_scaled = jnp.concatenate(
        [jnp.ravel(ob.values / ob.sigma) for ob in sorted(
            obs, key=lambda o: o.step)])

    def add_incr(state: State, dx: Dict):
        upd = {k: getattr(state, k) + dx[k] for k in CONTROL_FIELDS}
        return state.replace(**upd)

    def zeros_incr():
        return {k: jnp.zeros_like(getattr(background, k))
                for k in CONTROL_FIELDS}

    return traj_obs, y_scaled, add_incr, zeros_incr


def i4dvar(cfg: Config, grid: Grid, background: State,
           obs: Sequence[Obs], nsteps: int,
           forcing_fn: Callable = None,
           sigmas: Dict[str, float] = None,
           b_iters: int = 4, n_inner: int = 10, n_outer: int = 1):
    """Run incremental 4D-Var; returns (analysis State, diagnostics dict).

    The trajectory operator M maps an initial State to the observed
    quantities at their steps; H samples fields at indices.
    """
    sigmas = sigmas or {"zeta": 0.1, "u": 0.1, "v": 0.1, "t": 0.5}
    bsqrt = make_bsqrt(cfg, sigmas, b_iters)
    traj_obs, y_scaled, add_incr, zeros_incr = _make_ops(
        cfg, grid, background, obs, nsteps, forcing_fn)

    diags = {"Jo": [], "cg_residuals": []}
    x = background

    @jax.jit
    def linearize(x):
        hx, vjp_fn = jax.vjp(lambda dx: traj_obs(add_incr(x, dx)),
                             zeros_incr())
        d = hx - y_scaled
        (rhs_adj,) = vjp_fn(d)
        rhs = {k: -v for k, v in bsqrt(rhs_adj).items()}
        return d, rhs

    @jax.jit
    def hess_mv(x, w):
        """(I + B^T/2 M^T H^T R^-1 H M B^1/2) w about trajectory x."""
        dxb = bsqrt(w)
        f = lambda dx: traj_obs(add_incr(x, dx))
        _, hmv = jax.jvp(f, (zeros_incr(),), (dxb,))
        _, vjp_fn = jax.vjp(f, zeros_incr())
        (adj,) = vjp_fn(hmv)
        badj = bsqrt(adj)
        return {k: w[k] + badj[k] for k in w}

    for outer in range(n_outer):
        d, rhs = linearize(x)
        diags["Jo"].append(float(0.5 * jnp.vdot(d, d).real))

        # congrad.F-style conjugate gradient in control (v) space
        w = {k: jnp.zeros_like(v) for k, v in rhs.items()}
        r = rhs
        p = r
        rr = _dot(r, r)
        for it in range(n_inner):
            Ap = hess_mv(x, p)
            alpha = rr / jnp.maximum(_dot(p, Ap), 1e-30)
            w = {k: w[k] + alpha * p[k] for k in w}
            r = {k: r[k] - alpha * Ap[k] for k in r}
            rr_new = _dot(r, r)
            diags["cg_residuals"].append(float(jnp.sqrt(rr_new)))
            beta = rr_new / jnp.maximum(rr, 1e-30)
            p = {k: r[k] + beta * p[k] for k in p}
            rr = rr_new

        x = add_incr(x, bsqrt(w))

    # final cost
    hx_f = traj_obs(x)
    df = hx_f - y_scaled
    diags["Jo"].append(float(0.5 * jnp.vdot(df, df).real))
    return x, diags


def rbl4dvar(cfg: Config, grid: Grid, background: State,
             obs: Sequence[Obs], nsteps: int,
             forcing_fn: Callable = None,
             sigmas: Dict[str, float] = None,
             b_iters: int = 4, n_inner: int = 10, n_outer: int = 1):
    """Dual (observation-space) 4D-Var: the RBL4D-Var formulation
    (ROMS/Drivers/rbl4dvar.h + ROMS/Utility/rpcg_lanczos.F).

    Solves (R + G) z = d in observation space, G = H M B M^T H^T the
    stabilized representer matrix, with the restricted preconditioned
    conjugate gradient of Gurol et al. (2014) - inner products taken in
    the G-metric so the iterates reproduce primal (I4D-Var) convergence
    - then maps back with dx = B M^T H^T z.  Strong-constraint control
    vector (IC increments); the reference's weak-constraint model-error
    and boundary controls are a documented gap.  R = I in
    sigma-scaled observation space."""
    sigmas = sigmas or {"zeta": 0.1, "u": 0.1, "v": 0.1, "t": 0.5}
    bsqrt = make_bsqrt(cfg, sigmas, b_iters)
    traj_obs, y_scaled, add_incr, zeros_incr = _make_ops(
        cfg, grid, background, obs, nsteps, forcing_fn)

    def apply_B(v: Dict):
        return bsqrt(bsqrt(v))          # B = B^1/2 B^T/2 (symmetric)

    diags = {"Jo": [], "cg_residuals": []}
    x = background

    @jax.jit
    def innovation(x):
        hx = traj_obs(x)
        return y_scaled - hx

    @jax.jit
    def rep_mv(x, z):
        """G z = H M B M^T H^T z about trajectory x."""
        f = lambda dx: traj_obs(add_incr(x, dx))
        _, vjp_fn = jax.vjp(f, zeros_incr())
        (adj,) = vjp_fn(z)
        _, out = jax.jvp(f, (zeros_incr(),), (apply_B(adj),))
        return out

    for outer in range(n_outer):
        d = innovation(x)
        diags["Jo"].append(float(0.5 * jnp.vdot(d, d).real))

        # RPCG: CG on (I + G) z = d with G-metric inner products
        z = jnp.zeros_like(d)
        r = d
        Gr = rep_mv(x, r)
        p, Gp = r, Gr
        rGr = jnp.vdot(r, Gr).real
        for it in range(n_inner):
            Ap = p + Gp
            # alpha from the G-inner product (rpcg_lanczos.F scaling)
            pGAp = jnp.vdot(Gp, Ap).real
            alpha = rGr / jnp.maximum(pGAp, 1e-30)
            z = z + alpha * p
            r = r - alpha * Ap
            Gr = rep_mv(x, r)
            rGr_new = jnp.vdot(r, Gr).real
            diags["cg_residuals"].append(
                float(jnp.sqrt(jnp.maximum(rGr_new, 0.0))))
            beta = rGr_new / jnp.maximum(rGr, 1e-30)
            p = r + beta * p
            Gp = Gr + beta * Gp
            rGr = rGr_new

        # back to state space: dx = B M^T H^T z
        f = lambda dx: traj_obs(add_incr(x, dx))
        _, vjp_fn = jax.vjp(f, zeros_incr())
        (adj,) = vjp_fn(z)
        x = add_incr(x, apply_B(adj))

    d = innovation(x)
    diags["Jo"].append(float(0.5 * jnp.vdot(d, d).real))
    return x, diags


def r4dvar(cfg: Config, grid: Grid, background: State,
           obs: Sequence[Obs], nsteps: int,
           forcing_fn: Callable = None,
           sigmas: Dict[str, float] = None,
           b_iters: int = 4, n_inner: int = 10, n_outer: int = 1):
    """Indirect-representer 4D-Var (R4D-Var; ROMS/Drivers/r4dvar.h +
    ROMS/Utility/congrad.F in observation space).

    Each outer (Picard) iteration solves the representer system
    (R + G) z = d by plain conjugate gradient in sigma-scaled
    observation space (R = I there), G = H M B M^T H^T, then maps back
    with dx = B M^T H^T z and re-linearizes about the updated
    trajectory.  Documented deltas vs the reference: the finite-
    amplitude representer-tangent model (RPM) is the exact jax.jvp
    tangent linearization, and the control vector is strong-constraint
    IC increments (no model-error/boundary controls)."""
    sigmas = sigmas or {"zeta": 0.1, "u": 0.1, "v": 0.1, "t": 0.5}
    bsqrt = make_bsqrt(cfg, sigmas, b_iters)
    traj_obs, y_scaled, add_incr, zeros_incr = _make_ops(
        cfg, grid, background, obs, nsteps, forcing_fn)

    def apply_B(v: Dict):
        return bsqrt(bsqrt(v))

    diags = {"Jo": [], "cg_residuals": []}
    x = background

    @jax.jit
    def innovation(x):
        return y_scaled - traj_obs(x)

    @jax.jit
    def rep_mv(x, z):
        """(R + G) z with G = H M B M^T H^T about trajectory x."""
        f = lambda dx: traj_obs(add_incr(x, dx))
        _, vjp_fn = jax.vjp(f, zeros_incr())
        (adj,) = vjp_fn(z)
        _, Gz = jax.jvp(f, (zeros_incr(),), (apply_B(adj),))
        return z + Gz

    for outer in range(n_outer):
        d = innovation(x)
        diags["Jo"].append(float(0.5 * jnp.vdot(d, d).real))

        # congrad.F: standard CG on the stabilized representer matrix
        z = jnp.zeros_like(d)
        r = d
        p = r
        rr = jnp.vdot(r, r).real
        for it in range(n_inner):
            Ap = rep_mv(x, p)
            alpha = rr / jnp.maximum(jnp.vdot(p, Ap).real, 1e-30)
            z = z + alpha * p
            r = r - alpha * Ap
            rr_new = jnp.vdot(r, r).real
            diags["cg_residuals"].append(float(jnp.sqrt(rr_new)))
            beta = rr_new / jnp.maximum(rr, 1e-30)
            p = r + beta * p
            rr = rr_new

        f = lambda dx: traj_obs(add_incr(x, dx))
        _, vjp_fn = jax.vjp(f, zeros_incr())
        (adj,) = vjp_fn(z)
        x = add_incr(x, apply_B(adj))

    d = innovation(x)
    diags["Jo"].append(float(0.5 * jnp.vdot(d, d).real))
    return x, diags
