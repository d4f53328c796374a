"""Pallas TPU kernel: whole-array VMEM pressure-gradient evaluation.

Same pattern (and motivation) as ops/mix3d_pallas.py: the prsgrd32
density-Jacobian chain is a stack of roll/shift stencils whose XLA
lowering rematerializes intermediates in HBM between neighbouring
stages; holding the operands in VMEM and evaluating the exact jnp math
from ops/prsgrd.py inside one pallas_call removes those round trips.

The round-4 version integrated the column with jnp.cumsum, which Mosaic
serializes level-by-level with poor scheduling (22% slower in the full
bench).  This version substitutes a statically-unrolled downward
accumulator writing into a VMEM scratch plane stack (N is ~30 and
static, so the unroll costs nothing and every store has a static index).
Measured in the full BENCHMARK1 step (not in an isolated cache-hot
scan - see mix3d_pallas for why that misleads).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import Config
from ..grid import Grid
from . import prsgrd as _prsgrd
from .mix3d_pallas import _grid_lite


def use_pallas(cfg: Config) -> bool:
    if os.environ.get("ROMS_PALLAS_PRSGRD", "1") == "0":
        return False
    if os.environ.get("ROMS_PALLAS", "1") == "0" or not cfg.pallas2d:
        return False
    if cfg.prsgrd_scheme != "djs":
        return False
    from .bc import current_ctx
    if current_ctx() is not None:      # shard_map region: XLA path
        return False
    if jax.default_backend() == "cpu":
        return bool(os.environ.get("ROMS_PALLAS_INTERPRET"))
    return True


def _scratch_rcumsum(P_scr):
    """Downward-integral implementation writing into the (N+1,Ny,Nx)
    VMEM scratch: out[k] = top + sum_{m>=k} inc[m], out[-1] = top.
    Statically unrolled over the ~30 levels (all stores static-index)."""
    def rcs(inc, top):
        n = inc.shape[0]
        P_scr[n] = top
        acc = top
        for kk in range(n - 1, -1, -1):
            acc = acc + inc[kk]
            P_scr[kk] = acc
        return P_scr[:n + 1]
    return rcs


def prsgrd32_fused(cfg: Config, grid: Grid, rho, z_r, z_w, Hz,
                   eq_tide=None, interpret: bool | None = None):
    """Fused prsgrd32; same contract as prsgrd.prsgrd32."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    have_tide = eq_tide is not None
    shape3 = rho.shape
    dtype = rho.dtype

    def kernel(*refs):
        *ins, ru_o, rv_o, P_scr = refs
        if have_tide:
            rho_r, zr_r, zw_r, hz_r, pm_r, pn_r, tide_r = ins
            tide = tide_r[...]
        else:
            rho_r, zr_r, zw_r, hz_r, pm_r, pn_r = ins
            tide = None
        g = _grid_lite(pm_r[...], pn_r[...], None)
        ru, rv = _prsgrd.prsgrd32(cfg, g, rho_r[...], zr_r[...],
                                  zw_r[...], hz_r[...], eq_tide=tide,
                                  rcumsum=_scratch_rcumsum(P_scr))
        ru_o[...] = ru
        rv_o[...] = rv

    ins = [rho, z_r, z_w, Hz, grid.pm, grid.pn]
    if have_tide:
        ins.append(eq_tide)
    from .mix3d_pallas import _vmem_params
    return pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct(shape3, dtype)] * 2,
        in_specs=[vmem] * len(ins),
        out_specs=[vmem] * 2,
        scratch_shapes=[pltpu.VMEM((shape3[0] + 1,) + shape3[1:], dtype)],
        **_vmem_params(interpret),
    )(*ins)
