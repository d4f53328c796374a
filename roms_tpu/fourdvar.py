"""Incremental strong-constraint 4D-Var (I4D-Var).

The analog of the reference's I4D-Var driver stack
(ROMS/Drivers/i4dvar.h ROMS_run outer/inner loops, ROMS/Utility/congrad.F
conjugate-gradient minimizer, convolve.F/normalization.F diffusion-operator
background covariance), with the crucial difference that the tangent-linear
and adjoint models are jax.jvp/jax.vjp of the nonlinear step instead of the
hand-coded ROMS/Tangent + ROMS/Adjoint mirrors (SURVEY.md §2.8).

Control vector: initial-condition increments of (zeta, u, v, t), plus
optionally surface-forcing increments ("sustr"/"svstr" - piecewise-
constant over the window, the frc_adjust.F analog) and open-boundary
data increments ("bry:zeta_west", ... - the obc_adjust.F analog); see
_make_ops.  Background covariance: B = Sigma C Sigma with C a diffusion-operator
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
            sig = sigmas.get(name, 0.0)
            if getattr(v, "ndim", 0) >= 2:
                out[name] = sig * _smooth(cfg, v, iters)
            else:
                # boundary-data lines (1-D): std-dev scaling only
                out[name] = sig * v
        return out

    return bsqrt


def _dot(a: Dict, b: Dict):
    return sum(jnp.vdot(a[k], b[k]).real for k in a)


def _make_ops(cfg: Config, grid: Grid, background: State,
              obs: Sequence[Obs], nsteps: int, forcing_fn: Callable,
              controls: Sequence[str] = CONTROL_FIELDS):
    """Shared 4D-Var building blocks: the sampled trajectory operator
    H∘M, the sigma-scaled observation vector, and increment helpers.

    controls: the control-vector entries.  State field names are
    initial-condition increments; "sustr"/"svstr" (and any other 2-D
    forcing key) are surface-forcing increments applied uniformly over
    the window (frc_adjust.F:1-120 piecewise-constant adjustment with
    one record); "bry:<key>" entries (e.g. "bry:zeta_west") are
    open-boundary data increments (obc_adjust.F)."""
    state_keys = [k for k in controls if hasattr(background, k)]
    frc_keys = [k for k in controls
                if not hasattr(background, k) and
                not k.startswith("bry:")]
    bry_keys = [k[4:] for k in controls if k.startswith("bry:")]

    def sample(ob, state: State):
        # fractional-coordinate obs (obs.FracObs, the extract_obs.F
        # path) carry their own sampler; integer-index Obs index the
        # padded field directly
        if hasattr(ob, "sample"):
            return ob.sample(cfg, state)
        return getattr(state, ob.field)[ob.idx]

    def _wrap_forcing(dx: Dict):
        """Apply forcing/boundary-data control increments on top of the
        case forcing (the TLM/ADM of these enters via jvp/vjp of the
        wrapped function - the frc_adjust/obc_adjust analogs)."""
        if not frc_keys and not bry_keys:
            return forcing_fn

        def ffn(c, g, t):
            frc = dict(forcing_fn(c, g, t)) if forcing_fn else {}
            for k in frc_keys:
                frc[k] = frc.get(k, 0.0) + dx[k]
            if bry_keys:
                b = dict(frc.get("bry", {}))
                for k in bry_keys:
                    b[k] = b.get(k, 0.0) + dx["bry:" + k]
                frc["bry"] = b
            return frc
        return ffn

    def traj_obs_ctl(state: State, dx: Dict):
        ffn = _wrap_forcing(dx)
        out = []
        for n in range(nsteps):
            state = stepping.step(cfg, grid, state, ffn)
            for ob in obs:
                if ob.step == n + 1:
                    out.append(sample(ob, state) / ob.sigma)
        return jnp.concatenate([jnp.ravel(o) for o in out])

    y_scaled = jnp.concatenate(
        [jnp.ravel(ob.values / ob.sigma) for ob in sorted(
            obs, key=lambda o: o.step)])

    def add_state_incr(state: State, dx: Dict):
        upd = {k: getattr(state, k) + dx[k] for k in state_keys}
        return state.replace(**upd)

    zero2 = jnp.zeros_like(background.zeta)

    def zeros_incr():
        out = {k: jnp.zeros_like(getattr(background, k))
               for k in state_keys}
        for k in frc_keys:
            out[k] = zero2
        for k in bry_keys:
            # boundary lines span the padded axis of their side
            n = (background.zeta.shape[-2] if k.endswith("west")
                 or k.endswith("east") else background.zeta.shape[-1])
            out["bry:" + k] = jnp.zeros((n,), background.zeta.dtype)
        return out

    def traj_obs(state: State):
        return traj_obs_ctl(state, zeros_incr())

    return traj_obs_ctl, traj_obs, y_scaled, add_state_incr, zeros_incr


def i4dvar(cfg: Config, grid: Grid, background: State,
           obs: Sequence[Obs], nsteps: int,
           forcing_fn: Callable = None,
           sigmas: Dict[str, float] = None,
           b_iters: int = 4, n_inner: int = 10, n_outer: int = 1,
           controls: Sequence[str] = CONTROL_FIELDS):
    """Run incremental 4D-Var; returns (analysis State, diagnostics dict).

    The trajectory operator M maps an initial State to the observed
    quantities at their steps; H samples fields at indices.  controls
    may add surface-forcing ("sustr", "svstr") and boundary-data
    ("bry:zeta_west", ...) entries to the IC control vector (the
    frc_adjust.F / obc_adjust.F adjustable-forcing analogs); their
    accumulated increments are returned in diags["control"].
    """
    sigmas = sigmas or {"zeta": 0.1, "u": 0.1, "v": 0.1, "t": 0.5}
    bsqrt = make_bsqrt(cfg, sigmas, b_iters)
    traj_ctl, traj_obs, y_scaled, add_state, zeros_incr = _make_ops(
        cfg, grid, background, obs, nsteps, forcing_fn, controls)
    z0 = zeros_incr()
    ctl_keys = [k for k in z0 if not hasattr(background, k)]

    def f_about(x, ctl):
        def f(dx):
            dxm = {**dx, **{k: dx[k] + ctl[k] for k in ctl}}
            return traj_ctl(add_state(x, dx), dxm)
        return f

    diags = {"Jo": [], "cg_residuals": []}
    x = background
    ctl = {k: z0[k] for k in ctl_keys}

    @jax.jit
    def linearize(x, ctl):
        hx, vjp_fn = jax.vjp(f_about(x, ctl), zeros_incr())
        d = hx - y_scaled
        (rhs_adj,) = vjp_fn(d)
        rhs = {k: -v for k, v in bsqrt(rhs_adj).items()}
        return d, rhs

    @jax.jit
    def hess_mv(x, ctl, w):
        """(I + B^T/2 M^T H^T R^-1 H M B^1/2) w about trajectory x."""
        dxb = bsqrt(w)
        f = f_about(x, ctl)
        _, hmv = jax.jvp(f, (zeros_incr(),), (dxb,))
        _, vjp_fn = jax.vjp(f, zeros_incr())
        (adj,) = vjp_fn(hmv)
        badj = bsqrt(adj)
        return {k: w[k] + badj[k] for k in w}

    for outer in range(n_outer):
        d, rhs = linearize(x, ctl)
        diags["Jo"].append(float(0.5 * jnp.vdot(d, d).real))

        # congrad.F-style conjugate gradient in control (v) space
        w = {k: jnp.zeros_like(v) for k, v in rhs.items()}
        r = rhs
        p = r
        rr = _dot(r, r)
        for it in range(n_inner):
            Ap = hess_mv(x, ctl, p)
            alpha = rr / jnp.maximum(_dot(p, Ap), 1e-30)
            w = {k: w[k] + alpha * p[k] for k in w}
            r = {k: r[k] - alpha * Ap[k] for k in r}
            rr_new = _dot(r, r)
            diags["cg_residuals"].append(float(jnp.sqrt(rr_new)))
            beta = rr_new / jnp.maximum(rr, 1e-30)
            p = {k: r[k] + beta * p[k] for k in p}
            rr = rr_new

        incr = bsqrt(w)
        x = add_state(x, incr)
        ctl = {k: ctl[k] + incr[k] for k in ctl}

    # final cost
    df = f_about(x, ctl)(zeros_incr()) - y_scaled
    diags["Jo"].append(float(0.5 * jnp.vdot(df, df).real))
    diags["control"] = ctl
    return x, diags


def rbl4dvar(cfg: Config, grid: Grid, background: State,
             obs: Sequence[Obs], nsteps: int,
             forcing_fn: Callable = None,
             sigmas: Dict[str, float] = None,
             b_iters: int = 4, n_inner: int = 10, n_outer: int = 1,
             controls: Sequence[str] = CONTROL_FIELDS):
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
    traj_ctl, traj_obs, y_scaled, add_state, zeros_incr = _make_ops(
        cfg, grid, background, obs, nsteps, forcing_fn, controls)
    z0 = zeros_incr()
    ctl_keys = [k for k in z0 if not hasattr(background, k)]
    ctl = {k: z0[k] for k in ctl_keys}

    def f_about(x, ctl):
        def f(dx):
            dxm = {**dx, **{k: dx[k] + ctl[k] for k in ctl}}
            return traj_ctl(add_state(x, dx), dxm)
        return f

    def apply_B(v: Dict):
        return bsqrt(bsqrt(v))          # B = B^1/2 B^T/2 (symmetric)

    diags = {"Jo": [], "cg_residuals": []}
    x = background

    @jax.jit
    def innovation(x, ctl):
        return y_scaled - f_about(x, ctl)(zeros_incr())

    @jax.jit
    def rep_mv(x, ctl, z):
        """G z = H M B M^T H^T z about trajectory x."""
        f = f_about(x, ctl)
        _, vjp_fn = jax.vjp(f, zeros_incr())
        (adj,) = vjp_fn(z)
        _, out = jax.jvp(f, (zeros_incr(),), (apply_B(adj),))
        return out

    for outer in range(n_outer):
        d = innovation(x, ctl)
        diags["Jo"].append(float(0.5 * jnp.vdot(d, d).real))

        # RPCG: CG on (I + G) z = d with G-metric inner products
        z = jnp.zeros_like(d)
        r = d
        Gr = rep_mv(x, ctl, r)
        p, Gp = r, Gr
        rGr = jnp.vdot(r, Gr).real
        for it in range(n_inner):
            Ap = p + Gp
            # alpha from the G-inner product (rpcg_lanczos.F scaling)
            pGAp = jnp.vdot(Gp, Ap).real
            alpha = rGr / jnp.maximum(pGAp, 1e-30)
            z = z + alpha * p
            r = r - alpha * Ap
            Gr = rep_mv(x, ctl, r)
            rGr_new = jnp.vdot(r, Gr).real
            diags["cg_residuals"].append(
                float(jnp.sqrt(jnp.maximum(rGr_new, 0.0))))
            beta = rGr_new / jnp.maximum(rGr, 1e-30)
            p = r + beta * p
            Gp = Gr + beta * Gp
            rGr = rGr_new

        # back to state space: dx = B M^T H^T z
        f = f_about(x, ctl)
        _, vjp_fn = jax.vjp(f, zeros_incr())
        (adj,) = vjp_fn(z)
        incr = apply_B(adj)
        x = add_state(x, incr)
        ctl = {k: ctl[k] + incr[k] for k in ctl}

    d = innovation(x, ctl)
    diags["Jo"].append(float(0.5 * jnp.vdot(d, d).real))
    diags["control"] = ctl
    return x, diags


def r4dvar(cfg: Config, grid: Grid, background: State,
           obs: Sequence[Obs], nsteps: int,
           forcing_fn: Callable = None,
           sigmas: Dict[str, float] = None,
           b_iters: int = 4, n_inner: int = 10, n_outer: int = 1,
           controls: Sequence[str] = CONTROL_FIELDS):
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
    traj_ctl, traj_obs, y_scaled, add_state, zeros_incr = _make_ops(
        cfg, grid, background, obs, nsteps, forcing_fn, controls)
    z0 = zeros_incr()
    ctl_keys = [k for k in z0 if not hasattr(background, k)]
    ctl = {k: z0[k] for k in ctl_keys}

    def f_about(x, ctl):
        def f(dx):
            dxm = {**dx, **{k: dx[k] + ctl[k] for k in ctl}}
            return traj_ctl(add_state(x, dx), dxm)
        return f

    def apply_B(v: Dict):
        return bsqrt(bsqrt(v))

    diags = {"Jo": [], "cg_residuals": []}
    x = background

    @jax.jit
    def innovation(x, ctl):
        return y_scaled - f_about(x, ctl)(zeros_incr())

    @jax.jit
    def rep_mv(x, ctl, z):
        """(R + G) z with G = H M B M^T H^T about trajectory x."""
        f = f_about(x, ctl)
        _, vjp_fn = jax.vjp(f, zeros_incr())
        (adj,) = vjp_fn(z)
        _, Gz = jax.jvp(f, (zeros_incr(),), (apply_B(adj),))
        return z + Gz

    for outer in range(n_outer):
        d = innovation(x, ctl)
        diags["Jo"].append(float(0.5 * jnp.vdot(d, d).real))

        # congrad.F: standard CG on the stabilized representer matrix
        z = jnp.zeros_like(d)
        r = d
        p = r
        rr = jnp.vdot(r, r).real
        for it in range(n_inner):
            Ap = rep_mv(x, ctl, p)
            alpha = rr / jnp.maximum(jnp.vdot(p, Ap).real, 1e-30)
            z = z + alpha * p
            r = r - alpha * Ap
            rr_new = jnp.vdot(r, r).real
            diags["cg_residuals"].append(float(jnp.sqrt(rr_new)))
            beta = rr_new / jnp.maximum(rr, 1e-30)
            p = r + beta * p
            rr = rr_new

        f = f_about(x, ctl)
        _, vjp_fn = jax.vjp(f, zeros_incr())
        (adj,) = vjp_fn(z)
        incr = apply_B(adj)
        x = add_state(x, incr)
        ctl = {k: ctl[k] + incr[k] for k in ctl}

    d = innovation(x, ctl)
    diags["Jo"].append(float(0.5 * jnp.vdot(d, d).real))
    diags["control"] = ctl
    return x, diags
