"""Pallas TPU kernels: the diagnostic ("time n") stage of main3d.

grid_flux_fused  - set_depth (set_depth.F:160-250) + set_massflux
                   (set_massflux.F:121-180) + omega (omega.F:120-225)
                   in one VMEM kernel: (zeta, u, v) -> (z_r, z_w, Hz,
                   Huon, Hvom, W).
eos_fused        - rho_eos_pden + brunt_vaisala (rho_eos.F) in one
                   kernel: t -> (rho, pden, bvf).
omega_fused      - standalone omega for the corrected fluxes (the W2
                   call after step3d_uv).

Same motivation and conventions as ops/mix3d_pallas.py (whole-array
VMEM, exact jnp stage math, masked boundary writes, statically-unrolled
vertical accumulations).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import Config
from ..grid import Grid
from .. import vgrid
from . import bc, eos as _eos
from .bc import current_ctx
from .mix3d_pallas import _vmem_params
from .omega import cumsum_unrolled, omega as _omega


def use_pallas(cfg: Config) -> bool:
    if os.environ.get("ROMS_PALLAS_DIAG", "1") == "0":
        return False
    if os.environ.get("ROMS_PALLAS", "1") == "0" or not cfg.pallas2d:
        return False
    if current_ctx() is not None:      # shard_map region: XLA path
        return False
    if jax.default_backend() == "cpu":
        return bool(os.environ.get("ROMS_PALLAS_INTERPRET"))
    return True


def _col(a, dtype):
    """Lift a (K,) stretching table to a (K,1,1) VMEM-friendly array
    (Mosaic has no 1-D vectors; set_depth accepts the lifted form)."""
    return jnp.asarray(a, dtype)[:, None, None]


def grid_flux_fused(cfg: Config, grid: Grid, zeta, u, v, hc,
                    interpret: bool | None = None):
    """Fused set_depth + set_massflux + omega (zice/nearshore excluded
    by the caller).  Returns (z_r, z_w, Hz, Huon, Hvom, W)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    dtype = u.dtype
    N = u.shape[0]
    shape2 = zeta.shape
    s3 = (N,) + shape2
    s3w = (N + 1,) + shape2

    def kernel(zeta_r, u_r, v_r, h_r, pm_r, pn_r, scr_r, csr_r,
               scw_r, csw_r, zr_o, zw_o, hz_o, huon_o, hvom_o, w_o):
        z_r, z_w, Hz = vgrid.set_depth(
            h_r[...], zeta_r[...], hc, scr_r[...], csr_r[...],
            scw_r[...], csw_r[...], cfg.vtransform)
        pm = pm_r[...]
        pn = pn_r[...]
        on_u = 2.0 / (jnp.roll(pn, 1, -1) + pn)
        om_v = 2.0 / (jnp.roll(pm, 1, -2) + pm)
        Huon = 0.5 * (Hz + jnp.roll(Hz, 1, -1)) * u_r[...] * on_u
        Hvom = 0.5 * (Hz + jnp.roll(Hz, 1, -2)) * v_r[...] * om_v
        Huon = bc.fill_halo(cfg, Huon)
        Hvom = bc.fill_halo(cfg, Hvom)
        W = _omega(cfg, None, Huon, Hvom, z_w, cumsum_fn=cumsum_unrolled)
        zr_o[...] = z_r
        zw_o[...] = z_w
        hz_o[...] = Hz
        huon_o[...] = Huon
        hvom_o[...] = Hvom
        w_o[...] = W

    ins = [zeta, u, v, grid.h, grid.pm, grid.pn,
           _col(grid.sc_r, dtype), _col(grid.Cs_r, dtype),
           _col(grid.sc_w, dtype), _col(grid.Cs_w, dtype)]
    bc.push_masked()
    try:
        return pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct(s3, dtype),
                       jax.ShapeDtypeStruct(s3w, dtype),
                       jax.ShapeDtypeStruct(s3, dtype),
                       jax.ShapeDtypeStruct(s3, dtype),
                       jax.ShapeDtypeStruct(s3, dtype),
                       jax.ShapeDtypeStruct(s3w, dtype)],
            in_specs=[vmem] * len(ins),
            out_specs=[vmem] * 6,
            **_vmem_params(interpret),
        )(*ins)
    finally:
        bc.pop_masked()


def eos_fused(cfg: Config, t, z_r, z_w, want_bvf: bool,
              interpret: bool | None = None):
    """Fused rho_eos_pden (+ brunt_vaisala).  Returns (rho, pden[, bvf])."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    dtype = t.dtype
    s3 = t[0].shape
    s3w = z_w.shape

    def kernel(*refs):
        if want_bvf:
            t_r, zr_r, zw_r, rho_o, pden_o, bvf_o = refs
            # JM95 polynomials evaluated once for rho/pden AND bvf
            rho, pden, bvf = _eos.rho_eos_pden_bvf(
                cfg, t_r[...], zr_r[...], zw_r[...])
            bvf_o[...] = bvf
        else:
            t_r, zr_r, rho_o, pden_o = refs
            rho, pden = _eos.rho_eos_pden(cfg, t_r[...], zr_r[...])
        rho_o[...] = rho
        pden_o[...] = pden

    ins = [t, z_r] + ([z_w] if want_bvf else [])
    outs = [jax.ShapeDtypeStruct(s3, dtype)] * 2 + \
        ([jax.ShapeDtypeStruct(s3w, dtype)] if want_bvf else [])
    res = pl.pallas_call(
        kernel,
        out_shape=outs,
        in_specs=[vmem] * len(ins),
        out_specs=[vmem] * len(outs),
        **_vmem_params(interpret),
    )(*ins)
    return res


def omega_fused(cfg: Config, grid: Grid, Huon, Hvom, z_w,
                interpret: bool | None = None):
    """Fused omega for the corrected fluxes (W2)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    def kernel(huon_r, hvom_r, zw_r, w_o):
        w_o[...] = _omega(cfg, None, huon_r[...], hvom_r[...],
                          zw_r[...], cumsum_fn=cumsum_unrolled)

    bc.push_masked()
    try:
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(z_w.shape, z_w.dtype),
            in_specs=[vmem] * 3,
            out_specs=vmem,
            **_vmem_params(interpret),
        )(Huon, Hvom, z_w)
    finally:
        bc.pop_masked()
