"""Pallas TPU kernels: VMEM-resident fused horizontal mixing.

The rotated-triad tracer diffusion (t3dmix2_geo.h) and the harmonic
viscosity (uv3dmix2_s.h) are ~20% of the BENCHMARK1 step under plain
XLA: each jnp.roll in the triad stencils materializes a full (N,Ny,Nx)
copy in HBM, so one operator application touches ~50x the field size.
These kernels load the operands into VMEM once, evaluate the whole
stencil chain on-chip (reusing the exact jnp math from ops/mix3d.py),
and write the updated mass-weighted field back once.

Covers the harmonic operators only (the biharmonic variants carry
boundary-condition scatter writes between passes); ops/mix3d.py remains
the general path and the equivalence reference.
"""

from __future__ import annotations

import os
from types import SimpleNamespace

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import Config
from ..grid import Grid
from . import mix3d


def supported(cfg: Config) -> bool:
    """The fused kernels implement this configuration exactly."""
    return not (cfg.use_sponge or cfg.uv_smagorinsky)


def use_pallas(cfg: Config) -> bool:
    # Measured on TPU v5e at BENCHMARK1 size: in an isolated scan the
    # whole-array VMEM kernels look ~10% slower than XLA's fused
    # stencil chain (inputs stay HBM-cache-hot there), but in the FULL
    # step they cut the measured step time ~15% (2.59e8 -> 3.03e8
    # pts/s): the pallas_call boundary removes XLA's rematerialized
    # roll copies between neighbouring stages.  Default ON;
    # ROMS_PALLAS_HMIX=0 disables.
    if os.environ.get("ROMS_PALLAS_HMIX", "1") == "0":
        return False
    if os.environ.get("ROMS_PALLAS", "1") == "0" or not cfg.pallas2d:
        return False
    if not supported(cfg):
        return False
    from .bc import current_ctx
    if current_ctx() is not None:      # shard_map region: XLA path
        return False
    if jax.default_backend() == "cpu":
        return bool(os.environ.get("ROMS_PALLAS_INTERPRET"))
    return True


def _grid_lite(pm, pn, pmask) -> SimpleNamespace:
    """Derived metrics recomputed on-chip (VPU work, done once)."""
    return SimpleNamespace(
        pm=pm, pn=pn, pmask=pmask,
        on_r=1.0 / pn, om_r=1.0 / pm,
        on_u=2.0 / (jnp.roll(pn, 1, -1) + pn),
        om_v=2.0 / (jnp.roll(pm, 1, -2) + pm))


def _vmem_params(interpret):
    # 123 MB of the v5e's 128 MB VMEM: whole-array kernels carry their
    # intermediates as (spilled) vector registers, and lower caps
    # rejected kernels that fit the hardware (rhs3d_fused needs ~120 MB;
    # ~124 MB is the practical ceiling - the runtime keeps some VMEM)
    return dict(
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=123 * 1024 * 1024),
        interpret=interpret)


def t3dmix2_geo_fused(cfg: Config, grid: Grid, t, Hz, z_r, t_nnew,
                      dt: float, interpret: bool | None = None):
    """Fused t3dmix2_geo: one kernel per active tracer, t_nnew donated.
    Same contract as mix3d.t3dmix2_geo."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    shape = t[0].shape
    dtype = t.dtype

    out = []
    for itrc in range(cfg.ntracers):
        dcoef = cfg.tnu2[itrc] if itrc < len(cfg.tnu2) else 0.0
        if dcoef == 0.0:
            out.append(t_nnew[itrc])
            continue

        def kernel(q_ref, hz_ref, zr_ref, pm_ref, pn_ref, nnew_ref,
                   out_ref, dcoef=dcoef):
            g = _grid_lite(pm_ref[...], pn_ref[...], None)
            FX, FE, FS = mix3d._triad_fluxes_geo(
                cfg, g, q_ref[...], hz_ref[...], zr_ref[...], dcoef)
            out_ref[...] = nnew_ref[...] + dt * mix3d._rotated_div(
                cfg, g, FX, FE, FS)

        out.append(pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
            in_specs=[vmem] * 6,
            out_specs=vmem,
            input_output_aliases={5: 0},
            **_vmem_params(interpret),
        )(t[itrc], Hz, z_r, grid.pm, grid.pn, t_nnew[itrc]))
    return jnp.stack(out, axis=0)


def uv3dmix2_fused(cfg: Config, grid: Grid, u, v, Hz, u_nnew, v_nnew,
                   rufrc, rvfrc, dt: float, interpret: bool | None = None):
    """Fused uv3dmix2 (s-surface harmonic viscosity); u_nnew/v_nnew and
    rufrc/rvfrc donated.  Same contract as mix3d.uv3dmix2."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    def kernel(u_ref, v_ref, hz_ref, pm_ref, pn_ref, pmask_ref,
               un_ref, vn_ref, ruf_ref, rvf_ref,
               un_out, vn_out, ruf_out, rvf_out):
        g = _grid_lite(pm_ref[...], pn_ref[...], pmask_ref[...])
        un, vn, ruf, rvf = mix3d.uv3dmix2(
            cfg, g, u_ref[...], v_ref[...], hz_ref[...],
            un_ref[...], vn_ref[...], ruf_ref[...], rvf_ref[...], dt)
        un_out[...] = un
        vn_out[...] = vn
        ruf_out[...] = ruf
        rvf_out[...] = rvf

    shapes = [jax.ShapeDtypeStruct(u_nnew.shape, u_nnew.dtype),
              jax.ShapeDtypeStruct(v_nnew.shape, v_nnew.dtype),
              jax.ShapeDtypeStruct(rufrc.shape, rufrc.dtype),
              jax.ShapeDtypeStruct(rvfrc.shape, rvfrc.dtype)]
    un, vn, ruf, rvf = pl.pallas_call(
        kernel,
        out_shape=shapes,
        in_specs=[vmem] * 10,
        out_specs=[vmem] * 4,
        input_output_aliases={6: 0, 7: 1, 8: 2, 9: 3},
        **_vmem_params(interpret),
    )(u, v, Hz, grid.pm, grid.pn, grid.pmask, u_nnew, v_nnew,
      rufrc, rvfrc)
    return un, vn, ruf, rvf
