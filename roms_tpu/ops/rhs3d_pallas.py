"""Pallas TPU kernels: the slow-momentum RHS phase.

momentum_rhs_fused() covers the whole momentum side of main3d's rhs3d
phase (ROMS/Nonlinear/main3d.F:563-590): the pre_step3d momentum start
(pre_step3d.F:659-700), the splines density-Jacobian pressure gradient
(prsgrd32.h), the Coriolis/curvilinear/advection RHS (rhs3d.F), and the
harmonic viscosity (uv3dmix2_s.h), reusing the exact jnp stage math from
ops/{pre_step3d,prsgrd,rhs3d,mix3d}.py.

Kernel granularity (measured): a single kernel for the whole phase
overflows VMEM - Mosaic holds every intermediate of the unrolled
whole-array dataflow as vector registers and spilled 176 MB on the
128 MB v5e.  The phase therefore runs as a short chain of VMEM-sized
kernels (prsgrd32 -> rhs3d -> uv3dmix2) with the pointwise momentum
start left to XLA (it fuses cleanly).  Each kernel still removes the
HBM rematerialization of its internal roll/shift stencil chain, which
is where the round-3 profiling located the bandwidth loss.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import Config
from ..grid import Grid
from . import bc, rhs3d as _rhs3d
from .bc import current_ctx
from .mix3d_pallas import _vmem_params
from .pre_step3d import momentum_init, ab3_start_coefs


def supported(cfg: Config) -> bool:
    """Configurations whose momentum rhs phase this path reproduces
    exactly (everything else falls back to the XLA stage chain)."""
    return (cfg.prsgrd_scheme == "djs"
            and not cfg.use_sponge and not cfg.uv_smagorinsky
            and not cfg.uv_mix_geo and not (cfg.uv_vis4 and cfg.visc4)
            and cfg.uv_cor and cfg.uv_adv)


def use_pallas(cfg: Config, clm=None, want_diags=False) -> bool:
    if os.environ.get("ROMS_PALLAS_RHS", "1") == "0":
        return False
    if os.environ.get("ROMS_PALLAS", "1") == "0" or not cfg.pallas2d:
        return False
    if not supported(cfg) or clm is not None or want_diags:
        return False
    if current_ctx() is not None:      # shard_map region: XLA path
        return False
    if jax.default_backend() == "cpu":
        return bool(os.environ.get("ROMS_PALLAS_INTERPRET"))
    return True


def rhs3d_fused(cfg: Config, grid, u, v, Huon, Hvom, W, Hz, ru, rv,
                sustr, svstr, bustr, bvstr,
                interpret: bool | None = None):
    """Fused rhs3d_momentum (Coriolis + curvilinear + U3/C4 advection +
    barotropic integral); ru/rv donated.  Same contract as
    rhs3d.rhs3d_momentum (clm/diags excluded by use_pallas).

    One kernel per direction: both directions in one kernel spilled
    ~134 MB of whole-array vector registers past the 128 MB VMEM."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    dtype = u.dtype
    shape3 = u.shape
    shape2 = sustr.shape

    def make_h_kernel(part):
        # stage 1: Coriolis + curvilinear + U3 horizontal advection
        def kernel(u_r, v_r, huon_r, hvom_r, hz_r, r_r,
                   pm_r, pn_r, fomn_r, dndx_r, dmde_r, r_o):
            g = _metrics(pm_r[...], pn_r[...], None, fomn_r[...],
                         dndx_r[...], dmde_r[...])
            r_in = r_r[...]
            r_o[...] = _rhs3d.rhs3d_momentum(
                cfg, g, u_r[...], v_r[...], huon_r[...], hvom_r[...],
                None, hz_r[...],
                r_in if part == "u" else None,
                r_in if part == "v" else None,
                None, None, None, None, parts=part,
                pieces=("cor", "curv", "hadv"))
        return kernel

    def make_v_kernel(part):
        # stage 2: 4th-order vertical advection + barotropic integral +
        # stress difference (+ clm/bodyforce, excluded by use_pallas)
        def kernel(vel_r, w_r, hz_r, r_r, sstr_r, bstr_r,
                   pm_r, pn_r, r_o, rfrc_o):
            g = _metrics(pm_r[...], pn_r[...], None, None, None, None)
            r_in = r_r[...]
            sstr = sstr_r[...]
            bstr = bstr_r[...]
            r2, rfrc = _rhs3d.rhs3d_momentum(
                cfg, g,
                vel_r[...] if part == "u" else None,
                vel_r[...] if part == "v" else None,
                None, None, w_r[...], hz_r[...],
                r_in if part == "u" else None,
                r_in if part == "v" else None,
                sstr if part == "u" else None,
                sstr if part == "v" else None,
                bstr if part == "u" else None,
                bstr if part == "v" else None,
                parts=part, pieces=("vadv", "bodyforce", "frc"))
            r_o[...] = r2
            rfrc_o[...] = rfrc
        return kernel

    def run(part, vel, r, sstr, bstr):
        bc.push_masked()   # edge extrapolations as where-masks
        try:
            ins = [u, v, Huon, Hvom, Hz, r, grid.pm, grid.pn,
                   grid.fomn, grid.dndx, grid.dmde]
            r = pl.pallas_call(
                make_h_kernel(part),
                out_shape=jax.ShapeDtypeStruct(shape3, dtype),
                in_specs=[vmem] * len(ins),
                out_specs=vmem,
                input_output_aliases={5: 0},
                **_vmem_params(interpret),
            )(*ins)
            ins = [vel, W, Hz, r, sstr, bstr, grid.pm, grid.pn]
            return pl.pallas_call(
                make_v_kernel(part),
                out_shape=[jax.ShapeDtypeStruct(shape3, dtype),
                           jax.ShapeDtypeStruct(shape2, dtype)],
                in_specs=[vmem] * len(ins),
                out_specs=[vmem] * 2,
                input_output_aliases={3: 0},
                **_vmem_params(interpret),
            )(*ins)
        finally:
            bc.pop_masked()

    ru2, rufrc = run("u", u, ru, sustr, bustr)
    rv2, rvfrc = run("v", v, rv, svstr, bvstr)
    return ru2, rv2, rufrc, rvfrc


def _metrics(pm, pn, pmask, fomn, dndx, dmde):
    """Derived metric terms recomputed on-chip (VPU work, done once)."""
    from types import SimpleNamespace
    return SimpleNamespace(
        pm=pm, pn=pn, pmask=pmask, fomn=fomn, dndx=dndx, dmde=dmde,
        on_r=1.0 / pn, om_r=1.0 / pm,
        on_u=2.0 / (jnp.roll(pn, 1, -1) + pn),
        om_u=2.0 / (jnp.roll(pm, 1, -1) + pm),
        on_v=2.0 / (jnp.roll(pn, 1, -2) + pn),
        om_v=2.0 / (jnp.roll(pm, 1, -2) + pm))


def momentum_rhs_fused(cfg: Config, grid: Grid, iic, u, v, Hz, z_r, z_w,
                       rho, Huon, Hvom, W, ru_prev, ru_prev2, rv_prev,
                       rv_prev2, sustr, svstr, bustr, bvstr,
                       eq_tide=None, interpret: bool | None = None):
    """Momentum rhs phase as a chain of VMEM kernels.  Returns (u_nnew,
    v_nnew, ru, rv, rufrc, rvfrc) with identical semantics to the
    unfused chain momentum_init -> prsgrd32 -> rhs3d_momentum ->
    uv3dmix2."""
    from . import mix3d_pallas, prsgrd_pallas
    a1, a2 = ab3_start_coefs(iic, u.dtype)
    u_nnew, v_nnew = momentum_init(
        cfg, grid.pm, grid.pn, a1, a2, u, v, Hz, ru_prev, ru_prev2,
        rv_prev, rv_prev2, sustr, svstr, bustr, bvstr)
    ru, rv = prsgrd_pallas.prsgrd32_fused(cfg, grid, rho, z_r, z_w, Hz,
                                          eq_tide=eq_tide,
                                          interpret=interpret)
    ru, rv, rufrc, rvfrc = rhs3d_fused(
        cfg, grid, u, v, Huon, Hvom, W, Hz, ru, rv,
        sustr, svstr, bustr, bvstr, interpret=interpret)
    if cfg.uv_vis2 and cfg.visc2 != 0.0:
        u_nnew, v_nnew, rufrc, rvfrc = mix3d_pallas.uv3dmix2_fused(
            cfg, grid, u, v, Hz, u_nnew, v_nnew, rufrc, rvfrc, cfg.dt,
            interpret=interpret)
    return u_nnew, v_nnew, ru, rv, rufrc, rvfrc
