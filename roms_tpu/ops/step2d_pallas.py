"""Pallas TPU kernel: VMEM-resident fused fast barotropic loop.

The reference's fast loop (ROMS/Nonlinear/main3d.F:592-713 calling
step2d_LF_AM3.h) runs nfast ~= 1.41*NDTFAST short 2-D steps per slow
baroclinic step.  Under plain XLA each substep's ~30 stencil sweeps
round-trip the whole 2-D state through HBM (the jnp.roll shifts break
fusion), which makes the fast loop ~18% of the step at BENCHMARK1 size
while touching orders of magnitude more HBM than the state size.

This module fuses the WHOLE fast loop into one Pallas kernel: every 2-D
field (state, filter accumulators, grid metrics) is loaded into VMEM
once, all nfast LF-AM3 substeps run on-chip, and results are written
back once.  At BENCHMARK1 size (518x70 f32 padded arrays) the ~40
resident fields total ~6 MB and fit comfortably in VMEM.

The kernel covers the benchmark-relevant configuration subset (SOLVE3D,
periodic/closed/gradient lateral BCs, no wetting-drying, no point
sources, no open-boundary data, no 2-D climatology nudging); the
general jnp path in ops/step2d.py remains the fallback and the
reference for equivalence tests.  The numerical core `_core` is shared
math: it can run as plain traced JAX (CPU tests compare it against
ops/step2d.fast_loop) or inside the Pallas kernel.
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
from . import bc
from .stencil import ip1, jp1
from .step2d import (Fast2DState, depth_fluxes, _rhs_momentum,
                     _step_momentum)

_FS_FIELDS = ("zeta_n", "zeta_nm1", "ubar_n", "ubar_nm1", "vbar_n",
              "vbar_nm1", "rzeta_n", "rzeta_nm1", "rubar_n", "rubar_nm1",
              "rvbar_n", "rvbar_nm1", "Zt_avg1", "DU_avg1", "DV_avg1",
              "DU_avg2", "DV_avg2")
_GRID_FIELDS = ("h", "f", "pm", "pn", "dndx", "dmde",
                "rmask", "umask", "vmask", "pmask")


def supported(cfg: Config, bry=None, sources=None, clm=None) -> bool:
    """True when the fused kernel implements this configuration exactly."""
    if not cfg.solve3d or cfg.wetdry or cfg.volcons:
        return False
    if cfg.nearshore is not None:     # Stokes transports (us2d path)
        return False
    if bry is not None or sources is not None or clm is not None:
        return False
    for lbc in (cfg.lbc_zeta, cfg.lbc_ubar, cfg.lbc_vbar):
        if bc.has_advanced(lbc):
            return False
    return cfg.nfast >= 2


def use_pallas(cfg: Config, bry=None, sources=None, clm=None) -> bool:
    """Dispatch decision for stepping.step: the kernel path is taken on
    TPU-like backends by default; on CPU only when ROMS_PALLAS_INTERPRET
    is set (interpreter mode, for tests)."""
    if os.environ.get("ROMS_PALLAS", "1") == "0" or not cfg.pallas2d:
        return False
    if not supported(cfg, bry, sources, clm):
        return False
    from .bc import current_ctx
    if current_ctx() is not None:      # shard_map region: XLA path
        return False
    if jax.default_backend() == "cpu":
        return bool(os.environ.get("ROMS_PALLAS_INTERPRET"))
    return True


def _grid_lite(cfg: Config, vals: dict) -> SimpleNamespace:
    """Staggered metrics recomputed on-chip from the primitive arrays
    (mirrors the Grid properties; VPU work, done once per kernel)."""
    pm, pn = vals["pm"], vals["pn"]
    return SimpleNamespace(
        on_u=2.0 / (jnp.roll(pn, 1, -1) + pn),
        om_v=2.0 / (jnp.roll(pm, 1, -2) + pm),
        om_r=1.0 / pm, on_r=1.0 / pn,
        fomn=vals["f"] / (pm * pn),
        **vals)


def _core(cfg: Config, g, fs: Fast2DState, rufrc, rvfrc,
          ru0_nm1, ru0_nm2, rv0_nm1, rv0_nm2, iic, w1g, w2g, dtype):
    """The restricted fast loop (no wetdry/OBC/sources/clm), shared by the
    Pallas kernel and the plain-JAX equivalence test.  w1g/w2g are weight
    getters (int index -> scalar) so the Pallas path can read them from
    SMEM.  Mirrors ops/step2d.fast_loop step for step."""
    dtfast = jnp.asarray(cfg.dtfast, dtype=dtype)
    h = g.h
    pmn = g.pm * g.pn
    nfast = cfg.nfast
    zero = jnp.zeros_like(fs.zeta_n)

    def zbc(z_new):
        return bc.apply_bc_rho(cfg, cfg.lbc_zeta, z_new, mask=g.rmask)

    def ubc(u_new):
        return bc.apply_bc_u(cfg, cfg.lbc_ubar, u_new,
                             gamma2=cfg.gamma2, mask=g.umask)

    def vbc(v_new):
        return bc.apply_bc_v(cfg, cfg.lbc_vbar, v_new,
                             gamma2=cfg.gamma2, mask=g.vmask)

    # ================= fast step 1 (peeled: FE predictor) =================
    Drhs, DUon, DVom = depth_fluxes(g, fs.zeta_n, fs.ubar_n, fs.vbar_n)
    cff2 = (-1.0 / 12.0) * w2g(1)
    fs = fs.replace(Zt_avg1=zero, DU_avg1=zero, DV_avg1=zero,
                    DU_avg2=cff2 * DUon, DV_avg2=cff2 * DVom)

    rhs_zeta = (DUon - ip1(DUon)) + (DVom - jp1(DVom))
    zeta_new = (fs.zeta_n + pmn * dtfast * rhs_zeta) * g.rmask
    Dnew = zeta_new + h
    zwrk = 0.5 * (fs.zeta_n + zeta_new)
    zeta_p = zbc(zeta_new)

    rhs_ubar, rhs_vbar = _rhs_momentum(
        cfg, g, fs.zeta_n, fs.ubar_n, fs.vbar_n,
        Drhs, DUon, DVom, zwrk, zwrk * zwrk, None)

    # --- 2D-3D coupling on the first predictor (:1868-1990) ---
    iic = jnp.asarray(iic)
    rufrc_c = rufrc - rhs_ubar
    rvfrc_c = rvfrc - rhs_vbar
    w_now = jnp.where(iic == 0, 1.0,
                      jnp.where(iic == 1, 1.5, 23.0 / 12.0)).astype(dtype)
    w_m1 = jnp.where(iic == 0, 0.0,
                     jnp.where(iic == 1, 0.5, 16.0 / 12.0)).astype(dtype)
    w_m2 = jnp.where(iic <= 1, 0.0, 5.0 / 12.0).astype(dtype)
    rhs_ubar = rhs_ubar + w_now * rufrc_c - w_m1 * ru0_nm1 + w_m2 * ru0_nm2
    rhs_vbar = rhs_vbar + w_now * rvfrc_c - w_m1 * rv0_nm1 + w_m2 * rv0_nm2

    ubar_p, vbar_p = _step_momentum(
        cfg, g, fs.ubar_n, fs.vbar_n, fs.zeta_n + h, Dnew,
        0.5 * dtfast * rhs_ubar, 0.5 * dtfast * rhs_vbar)
    ubar_p = ubc(ubar_p)
    vbar_p = vbc(vbar_p)
    fs = fs.replace(
        rzeta_nm1=fs.rzeta_n, rzeta_n=bc.fill_halo(cfg, rhs_zeta),
        rubar_nm1=fs.rubar_n, rubar_n=rhs_ubar,
        rvbar_nm1=fs.rvbar_n, rvbar_n=rhs_vbar)

    def corrector(fs, zeta_p, ubar_p, vbar_p, cff2):
        Drhs, DUon, DVom = depth_fluxes(g, zeta_p, ubar_p, vbar_p)
        fs = fs.replace(DU_avg2=fs.DU_avg2 + cff2 * DUon,
                        DV_avg2=fs.DV_avg2 + cff2 * DVom)

        rhs_zeta = (DUon - ip1(DUon)) + (DVom - jp1(DVom))
        c1 = dtfast * 5.0 / 12.0
        c2 = dtfast * 8.0 / 12.0
        c3 = dtfast * 1.0 / 12.0
        zeta_new = (fs.zeta_n + pmn * (c1 * rhs_zeta + c2 * fs.rzeta_n -
                                       c3 * fs.rzeta_nm1)) * g.rmask
        Dnew = zeta_new + h
        cff4 = 2.0 / 5.0
        zwrk = (1.0 - cff4) * zeta_new + cff4 * zeta_p
        zeta_new = zbc(zeta_new)

        rhs_ubar, rhs_vbar = _rhs_momentum(
            cfg, g, zeta_p, ubar_p, vbar_p,
            Drhs, DUon, DVom, zwrk, zwrk * zwrk, None)
        rhs_ubar = rhs_ubar + rufrc_c
        rhs_vbar = rhs_vbar + rvfrc_c

        cm1 = 0.5 * dtfast * 5.0 / 12.0
        cm2 = 0.5 * dtfast * 8.0 / 12.0
        cm3 = 0.5 * dtfast * 1.0 / 12.0
        ubar_new, vbar_new = _step_momentum(
            cfg, g, fs.ubar_n, fs.vbar_n, fs.zeta_n + h, Dnew,
            cm1 * rhs_ubar + cm2 * fs.rubar_n - cm3 * fs.rubar_nm1,
            cm1 * rhs_vbar + cm2 * fs.rvbar_n - cm3 * fs.rvbar_nm1)
        ubar_new = ubc(ubar_new)
        vbar_new = vbc(vbar_new)
        return fs.replace(
            zeta_nm1=fs.zeta_n, zeta_n=zeta_new,
            ubar_nm1=fs.ubar_n, ubar_n=ubar_new,
            vbar_nm1=fs.vbar_n, vbar_n=vbar_new)

    # first corrector: cff2 = weight(2,iif) with iif=1 -> w2[0]
    fs = corrector(fs, zeta_p, ubar_p, vbar_p, w2g(0))

    # ============== fast steps 2..nfast (LF / AM3), fori_loop ==============
    def fused_body(i, fs):
        Drhs, DUon, DVom = depth_fluxes(g, fs.zeta_n, fs.ubar_n, fs.vbar_n)
        cff1 = w1g(i - 2)                                 # weight(1,iif-1)
        cff2 = (8.0 / 12.0) * w2g(i - 1) - (1.0 / 12.0) * w2g(i)
        fs = fs.replace(
            Zt_avg1=fs.Zt_avg1 + cff1 * fs.zeta_n,
            DU_avg1=fs.DU_avg1 + cff1 * DUon,
            DV_avg1=fs.DV_avg1 + cff1 * DVom,
            DU_avg2=fs.DU_avg2 + cff2 * DUon,
            DV_avg2=fs.DV_avg2 + cff2 * DVom)

        rhs_zeta = (DUon - ip1(DUon)) + (DVom - jp1(DVom))
        zeta_new = (fs.zeta_nm1 + pmn * (2.0 * dtfast) * rhs_zeta) * \
            g.rmask
        Dnew = zeta_new + h
        cff4 = 4.0 / 25.0
        cff5 = 1.0 - 2.0 * cff4
        zwrk = cff5 * fs.zeta_n + cff4 * (fs.zeta_nm1 + zeta_new)
        zeta_p = zbc(zeta_new)

        rhs_ubar, rhs_vbar = _rhs_momentum(
            cfg, g, fs.zeta_n, fs.ubar_n, fs.vbar_n,
            Drhs, DUon, DVom, zwrk, zwrk * zwrk, None)
        rhs_ubar = rhs_ubar + rufrc_c
        rhs_vbar = rhs_vbar + rvfrc_c

        ubar_p, vbar_p = _step_momentum(
            cfg, g, fs.ubar_nm1, fs.vbar_nm1, fs.zeta_nm1 + h, Dnew,
            dtfast * rhs_ubar, dtfast * rhs_vbar)
        ubar_p = ubc(ubar_p)
        vbar_p = vbc(vbar_p)
        fs = fs.replace(
            rzeta_nm1=fs.rzeta_n, rzeta_n=bc.fill_halo(cfg, rhs_zeta),
            rubar_nm1=fs.rubar_n, rubar_n=rhs_ubar,
            rvbar_nm1=fs.rvbar_n, rvbar_n=rhs_vbar)
        # corrector: cff2 = (5/12)*weight(2,iif) -> w2[i-1]
        return corrector(fs, zeta_p, ubar_p, vbar_p,
                         (5.0 / 12.0) * w2g(i - 1))

    fs = jax.lax.fori_loop(2, nfast + 1, fused_body, fs)

    # ========== auxiliary predictor (iif = nfast+1): averages only ==========
    _, DUon, DVom = depth_fluxes(g, fs.zeta_n, fs.ubar_n, fs.vbar_n)
    i = nfast + 1
    cff1 = w1g(i - 2)
    cff2 = (8.0 / 12.0) * w2g(i - 1) - (1.0 / 12.0) * w2g(i)
    fs = fs.replace(
        Zt_avg1=bc.fill_halo(cfg, fs.Zt_avg1 + cff1 * fs.zeta_n),
        DU_avg1=bc.fill_halo(cfg, fs.DU_avg1 + cff1 * DUon),
        DV_avg1=bc.fill_halo(cfg, fs.DV_avg1 + cff1 * DVom),
        DU_avg2=bc.fill_halo(cfg, fs.DU_avg2 + cff2 * DUon),
        DV_avg2=bc.fill_halo(cfg, fs.DV_avg2 + cff2 * DVom))
    return fs, rufrc_c, rvfrc_c


def core_reference(cfg: Config, grid: Grid, fs: Fast2DState,
                   rufrc, rvfrc, ru0_nm1, ru0_nm2, rv0_nm1, rv0_nm2,
                   iic=0):
    """_core as plain traced JAX (for CPU equivalence tests)."""
    w1, w2 = grid.weight1, grid.weight2
    vals = {k: getattr(grid, k) for k in _GRID_FIELDS}
    g = _grid_lite(cfg, vals)
    return _core(cfg, g, fs, rufrc, rvfrc, ru0_nm1, ru0_nm2,
                 rv0_nm1, rv0_nm2, iic, lambda k: w1[k], lambda k: w2[k],
                 fs.zeta_n.dtype)


def fast_loop_fused(cfg: Config, grid: Grid, fs: Fast2DState,
                    rufrc, rvfrc, ru0_nm1, ru0_nm2, rv0_nm1, rv0_nm2,
                    iic, interpret: bool | None = None):
    """Pallas-fused fast loop.  Same contract as ops/step2d.fast_loop for
    the supported() subset; returns (fs, rufrc_c, rvfrc_c, None)."""
    dtype = fs.zeta_n.dtype
    shape = fs.zeta_n.shape
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    w1 = grid.weight1.astype(dtype)
    w2 = grid.weight2.astype(dtype)
    iic_arr = jnp.asarray(iic, jnp.int32).reshape((1,))

    fs_in = [getattr(fs, k) for k in _FS_FIELDS]
    frc_in = [rufrc, rvfrc, ru0_nm1, ru0_nm2, rv0_nm1, rv0_nm2]
    grid_in = [getattr(grid, k) for k in _GRID_FIELDS]
    n_in = len(fs_in) + len(frc_in) + len(grid_in)
    n_out = len(_FS_FIELDS) + 2

    def kernel(iic_ref, w1_ref, w2_ref, *refs):
        ins, outs = refs[:n_in], refs[n_in:]
        vals = [r[...] for r in ins]
        kfs = Fast2DState(*vals[:17])
        (k_rufrc, k_rvfrc, k_ru0_nm1, k_ru0_nm2,
         k_rv0_nm1, k_rv0_nm2) = vals[17:23]
        g = _grid_lite(cfg, dict(zip(_GRID_FIELDS, vals[23:])))
        # boundary writes as masked where-ops: Mosaic has no scatter
        bc.push_masked()
        try:
            fs_out, rufrc_c, rvfrc_c = _core(
                cfg, g, kfs, k_rufrc, k_rvfrc, k_ru0_nm1, k_ru0_nm2,
                k_rv0_nm1, k_rv0_nm2, iic_ref[0],
                lambda k: w1_ref[k], lambda k: w2_ref[k], dtype)
        finally:
            bc.pop_masked()
        results = [getattr(fs_out, k) for k in _FS_FIELDS] + \
            [rufrc_c, rvfrc_c]
        for ref, val in zip(outs, results):
            ref[...] = val

    smem = lambda n: pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    # donate the 17 fast-state buffers to their outputs (and rufrc/rvfrc
    # to the converted values): halves the VMEM residency, which is what
    # fits the whole BENCHMARK1 state on chip
    aliases = {3 + i: i for i in range(17)}
    aliases[3 + 17] = 17
    aliases[3 + 18] = 18
    out = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct(shape, dtype)] * n_out,
        in_specs=[smem(1), smem(len(w1)), smem(len(w2))] + [vmem] * n_in,
        out_specs=[vmem] * n_out,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(iic_arr, w1, w2, *fs_in, *frc_in, *grid_in)

    fs_out = Fast2DState(*out[:17])
    return fs_out, out[17], out[18], None
