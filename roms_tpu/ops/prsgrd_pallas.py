"""Pallas TPU kernel: whole-array VMEM pressure-gradient evaluation.

Same pattern (and motivation) as ops/mix3d_pallas.py: the prsgrd32
density-Jacobian chain is a stack of roll/shift stencils whose XLA
lowering rematerializes intermediates in HBM between neighbouring
stages; holding the operands in VMEM and evaluating the exact jnp math
from ops/prsgrd.py inside one pallas_call removes those round trips.
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
    # Measured in the full BENCHMARK1 bench: 2.37e8 vs 3.03e8 pts/s -
    # 22% SLOWER overall.  The vertical jnp.cumsum in the pressure
    # integration serializes across the 30 levels inside Mosaic,
    # whereas XLA lowers it as a logarithmic scan over fused slices.
    # Kept as an opt-in (ROMS_PALLAS_PRSGRD=1) baseline for a future
    # version that integrates the column with a fori_loop accumulator.
    if os.environ.get("ROMS_PALLAS_PRSGRD", "0") != "1":
        return False
    if os.environ.get("ROMS_PALLAS", "1") == "0" or not cfg.pallas2d:
        return False
    if cfg.prsgrd_scheme != "djs":
        return False
    if jax.default_backend() == "cpu":
        return bool(os.environ.get("ROMS_PALLAS_INTERPRET"))
    return True


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
        if have_tide:
            (rho_r, zr_r, zw_r, hz_r, pm_r, pn_r, tide_r,
             ru_o, rv_o) = refs
            tide = tide_r[...]
        else:
            rho_r, zr_r, zw_r, hz_r, pm_r, pn_r, ru_o, rv_o = refs
            tide = None
        g = _grid_lite(pm_r[...], pn_r[...], None)
        ru, rv = _prsgrd.prsgrd32(cfg, g, rho_r[...], zr_r[...],
                                  zw_r[...], hz_r[...], eq_tide=tide)
        ru_o[...] = ru
        rv_o[...] = rv

    ins = [rho, z_r, z_w, Hz, grid.pm, grid.pn]
    if have_tide:
        ins.append(eq_tide)
    return pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct(shape3, dtype)] * 2,
        in_specs=[vmem] * len(ins),
        out_specs=[vmem] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*ins)
