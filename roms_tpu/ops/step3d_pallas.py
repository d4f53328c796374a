"""Pallas TPU kernels: fused 3-D predictor/corrector stages.

Three VMEM-resident kernels covering the remaining bandwidth-bound 3-D
pipeline of main3d (the fast loop, h-mix, prsgrd and rhs3d already have
kernels):

 * tracer_predictor_fused - the pre_step3d.F tracer loop (one kernel per
   tracer): LF-AM3 horizontal/vertical advection of t(n) -> t3, plus the
   t(nnew) start with surface/bottom/nonlocal/solar fluxes.
 * uv_corrector_fused     - step3d_uv.F: AB3 update, implicit vertical
   viscosity (statically-unrolled spline solve), barotropic-mean
   replacement, ring corrections, mass-flux consistency.
 * tracer_corrector_fused - the step3d_t.F tracer loop (one kernel per
   tracer): advection of t3 + implicit vertical diffusion.

All kernels reuse the exact jnp math from ops/{pre_step3d,step3d_uv,
step3d_t}.py, substituting the statically-unrolled vertical solvers from
ops/tridiag.py (Mosaic cannot lower lax.scan's xs slicing) and tracing
with bc masked-writes mode (no scatter lowering).  Whole-array VMEM
kernels: each removes XLA's HBM rematerialization of the roll/shift
stencil chain inside its stage; granularity chosen to keep windows +
live vector registers under the 128 MB v5e VMEM (see rhs3d_pallas.py).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import Config
from ..grid import Grid
from . import bc
from .advection import vadv_flux
from .bc import current_ctx
from .mix3d_pallas import _vmem_params
from .pre_step3d import predictor_coefs, tracer_predictor
from .step3d_t import tracer_corrector
from .step3d_uv import step3d_uv
from .tridiag import (spline_interp_flux_unrolled,
                      spline_vdiff_flux_unrolled,
                      thomas_implicit_unrolled)

_OK_SCHEMES = {"C2", "U1", "U3", "C4", "A4", "SPLINES"}


def _vadv_unrolled(scheme, q, W, Hz, variant, z_r=None, pmn=None,
                   dt=None):
    """advection.vadv_flux with the SPLINES scan statically unrolled."""
    if scheme == "SPLINES":
        if variant == "predictor":
            return spline_interp_flux_unrolled(Hz, q, W, 1.5, 0.5, 3.0,
                                               2.0)
        return spline_interp_flux_unrolled(Hz, q, W, 2.0, 1.0, 2.0, 1.0)
    return vadv_flux(scheme, q, W, Hz, variant, z_r=z_r, pmn=pmn, dt=dt)


def _base_ok(cfg: Config) -> bool:
    if os.environ.get("ROMS_PALLAS_3D", "1") == "0":
        return False
    if os.environ.get("ROMS_PALLAS", "1") == "0" or not cfg.pallas2d:
        return False
    if current_ctx() is not None:      # shard_map region: XLA path
        return False
    if jax.default_backend() == "cpu":
        return bool(os.environ.get("ROMS_PALLAS_INTERPRET"))
    return True


def use_tracer_pallas(cfg: Config, bry=None, clm=None, sources=None,
                      want_diags=False) -> bool:
    """Gate shared by the predictor and corrector tracer kernels."""
    if not _base_ok(cfg):
        return False
    if bry is not None or clm is not None or sources is not None \
            or want_diags:
        return False
    if bc.has_advanced(cfg.lbc_t):
        return False
    ok = all(s in _OK_SCHEMES for s in cfg.t_hadv[:cfg.ntracers]) and \
        all(s in _OK_SCHEMES for s in cfg.t_vadv[:cfg.ntracers])
    return ok and cfg.ntracers >= 1


def use_uv_pallas(cfg: Config, bry=None, sources=None, wet=None) -> bool:
    if not _base_ok(cfg):
        return False
    if bry is not None or sources is not None or wet is not None:
        return False
    return not (bc.has_advanced(cfg.lbc_u) or bc.has_advanced(cfg.lbc_v))


# ---------------------------------------------------------------------------
# tracer predictor (pre_step3d.F tracer loop)
# ---------------------------------------------------------------------------
def mix_in_predictor(cfg: Config) -> bool:
    """True when the harmonic tracer mixing (t3dmix2 / t3dmix2_geo) is
    folded into the predictor kernel (saves the t_nnew HBM round trip
    and the shared-field re-reads of a separate h-mix kernel).

    Default OFF: at BENCHMARK1 f32 on v5e the folded kernel needs
    ~126 MB of VMEM and the hardware refuses (the runtime keeps a few MB
    of the 128); opt in with ROMS_PALLAS_FOLD_MIX=1 for smaller grids."""
    from . import mix3d_pallas
    if os.environ.get("ROMS_PALLAS_FOLD_MIX", "0") != "1":
        return False
    return (any(x != 0.0 for x in cfg.tnu2)
            and not cfg.ts_mix_iso
            and not (cfg.ts_dif4 and any(x != 0.0 for x in cfg.tnu4))
            and mix3d_pallas.supported(cfg))


def tracer_predictor_fused(cfg: Config, grid: Grid, iic, t, t_prev, Hz,
                           Huon, Hvom, W, Akt, ghats=None, srflx=None,
                           swdk_w=None, stflx=None, btflx=None,
                           z_r=None, interpret: bool | None = None):
    """Fused pre_step3d tracer phase: returns (t3, t_nnew) stacks.
    Same contract as the tracer part of pre_step3d (sources excluded by
    use_tracer_pallas; z_r only read when the harmonic mixing is folded
    in - see mix_in_predictor)."""
    from . import mix3d
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    dtype = t.dtype
    shape3 = t[0].shape
    with_mix = mix_in_predictor(cfg) and z_r is not None

    t3_list, tn_list = [], []
    for itrc in range(cfg.ntracers):
        coefs = jnp.stack(predictor_coefs(cfg, iic, itrc, dtype))
        ltrc = min(1, itrc) if cfg.ntracers >= 2 else 0
        ghats_i = ghats[itrc] if (ghats is not None
                                  and itrc < ghats.shape[0]) else None
        srflx_i = srflx if itrc == 0 else None
        have_sol = srflx_i is not None and swdk_w is not None
        dcoef = cfg.tnu2[itrc] if itrc < len(cfg.tnu2) else 0.0
        mix_i = with_mix and dcoef != 0.0

        def kernel(*refs, itrc=itrc, have_g=ghats_i is not None,
                   have_sol=have_sol, mix_i=mix_i, dcoef=dcoef):
            (co_r, q_r, qp_r, hz_r, huon_r, hvom_r, w_r, akt_r,
             pm_r, pn_r, st_r, bt_r, *rest) = refs
            g_i = rest[0][...] if have_g else None
            rest = rest[1:] if have_g else rest
            if have_sol:
                sr = rest[0][...]
                sw = rest[1][...]
                rest = rest[2:]
            else:
                sr = sw = None
            zr_r = rest[0] if mix_i else None
            rest = rest[1:] if mix_i else rest
            t3_o, tn_o = rest
            coefs_k = (co_r[0], co_r[1], co_r[2], co_r[3])
            q = q_r[...]
            Hz_ = hz_r[...]
            pm = pm_r[...]
            pn = pn_r[...]
            t3_i, tn_i = tracer_predictor(
                cfg, pm * pn, itrc, coefs_k, q,
                qp_r[...], Hz_, None, huon_r[...], hvom_r[...],
                w_r[...], akt_r[...], g_i, sr, sw, st_r[...], bt_r[...],
                vadv_fn=_vadv_unrolled)
            if mix_i:
                # harmonic mixing folded in (t3dmix2_geo.h / t3dmix2.h)
                from .mix3d_pallas import _grid_lite
                g = _grid_lite(pm, pn, None)
                if cfg.ts_mix_geo:
                    FX, FE, FS = mix3d._triad_fluxes_geo(
                        cfg, g, q, Hz_, zr_r[...], dcoef)
                    tn_i = tn_i + cfg.dt * mix3d._rotated_div(
                        cfg, g, FX, FE, FS)
                else:
                    # t3dmix2_s.h (no sponge - mix3d_pallas.supported)
                    from .stencil import ip1, im1, jp1, jm1
                    pmon_u = (im1(pm) + pm) / (im1(pn) + pn)
                    pnom_v = (jm1(pn) + pn) / (jm1(pm) + pm)
                    FX = 0.5 * dcoef * pmon_u * (Hz_ + im1(Hz_)) * \
                        (q - im1(q))
                    FE = 0.5 * dcoef * pnom_v * (Hz_ + jm1(Hz_)) * \
                        (q - jm1(q))
                    tn_i = tn_i + cfg.dt * pm * pn * (
                        (ip1(FX) - FX) + (jp1(FE) - FE))
            t3_o[...] = t3_i
            tn_o[...] = tn_i

        ins = [coefs, t[itrc], t_prev[itrc], Hz, Huon, Hvom, W,
               Akt[ltrc], grid.pm, grid.pn, stflx[itrc], btflx[itrc]]
        if ghats_i is not None:
            ins.append(ghats_i)
        if have_sol:
            ins.append(srflx_i)
            ins.append(swdk_w)
        if mix_i:
            ins.append(z_r)
        bc.push_masked()
        try:
            t3_i, tn_i = pl.pallas_call(
                kernel,
                out_shape=[jax.ShapeDtypeStruct(shape3, dtype)] * 2,
                in_specs=[smem] + [vmem] * (len(ins) - 1),
                out_specs=[vmem] * 2,
                **_vmem_params(interpret),
            )(*ins)
        finally:
            bc.pop_masked()
        t3_list.append(t3_i)
        tn_list.append(tn_i)
    return jnp.stack(t3_list, axis=0), jnp.stack(tn_list, axis=0)


# ---------------------------------------------------------------------------
# momentum corrector (step3d_uv.F)
# ---------------------------------------------------------------------------
def uv_corrector_fused(cfg: Config, grid: Grid, iic, u_nnew, v_nnew,
                       ru, rv, Hz_new, Akv, DU_avg1, DV_avg1, DU_avg2,
                       DV_avg2, Huon_old, Hvom_old,
                       interpret: bool | None = None):
    """Fused step3d_uv; same contract (wet/bry/sources excluded by
    use_uv_pallas).  u_nnew/v_nnew/Huon_old/Hvom_old donated."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    dtype = u_nnew.dtype
    shape3 = u_nnew.shape
    shape2 = DU_avg1.shape
    iic_a = jnp.asarray(iic, jnp.int32).reshape(1)

    def make_kernel(part):
        # one direction per kernel: both at once spilled ~126 MB of
        # whole-array vector registers past the 128 MB v5e VMEM
        def kernel(iic_r, vn_r, r_r, hz_r, akv_r, d1_r, d2_r,
                   flx_r, pm_r, pn_r, msk_r, v_o, vb_o, flx_o):
            from types import SimpleNamespace
            pm = pm_r[...]
            pn = pn_r[...]
            g = SimpleNamespace(
                pm=pm, pn=pn,
                umask=msk_r[...], vmask=msk_r[...],
                on_u=2.0 / (jnp.roll(pn, 1, -1) + pn),
                om_v=2.0 / (jnp.roll(pm, 1, -2) + pm))
            vn = vn_r[...]
            r = r_r[...]
            d1 = d1_r[...]
            d2 = d2_r[...]
            args = dict(u_nnew=vn if part == "u" else None,
                        v_nnew=vn if part == "v" else None,
                        ru=r if part == "u" else None,
                        rv=r if part == "v" else None,
                        DU_avg1=d1 if part == "u" else None,
                        DV_avg1=d1 if part == "v" else None,
                        DU_avg2=d2 if part == "u" else None,
                        DV_avg2=d2 if part == "v" else None,
                        Huon_old=flx_r[...] if part == "u" else None,
                        Hvom_old=flx_r[...] if part == "v" else None)
            vel, vbar2, flx = step3d_uv(
                cfg, g, iic_r[0], args["u_nnew"], args["v_nnew"],
                args["ru"], args["rv"], hz_r[...], akv_r[...],
                args["DU_avg1"], args["DV_avg1"], args["DU_avg2"],
                args["DV_avg2"], args["Huon_old"], args["Hvom_old"],
                spline_fn=spline_vdiff_flux_unrolled, parts=part)
            v_o[...] = vel
            vb_o[...] = vbar2
            flx_o[...] = flx
        return kernel

    def run(part, vn, r, d1, d2, flx, mask):
        ins = [iic_a, vn, r, Hz_new, Akv, d1, d2, flx,
               grid.pm, grid.pn, mask]
        bc.push_masked()
        try:
            return pl.pallas_call(
                make_kernel(part),
                out_shape=[jax.ShapeDtypeStruct(shape3, dtype),
                           jax.ShapeDtypeStruct(shape2, dtype),
                           jax.ShapeDtypeStruct(shape3, dtype)],
                in_specs=[smem] + [vmem] * (len(ins) - 1),
                out_specs=[vmem] * 3,
                input_output_aliases={1: 0, 7: 2},
                **_vmem_params(interpret),
            )(*ins)
        finally:
            bc.pop_masked()

    u, ubar, Huon = run("u", u_nnew, ru, DU_avg1, DU_avg2, Huon_old,
                        grid.umask)
    v, vbar, Hvom = run("v", v_nnew, rv, DV_avg1, DV_avg2, Hvom_old,
                        grid.vmask)
    return u, v, ubar, vbar, Huon, Hvom


# ---------------------------------------------------------------------------
# tracer corrector (step3d_t.F tracer loop)
# ---------------------------------------------------------------------------
def tracer_corrector_fused(cfg: Config, grid: Grid, t_nnew, t3, Huon,
                           Hvom, W, Hz_new, z_r_new, Akt,
                           interpret: bool | None = None):
    """Fused step3d_t (non-MPDATA schemes): returns the updated tracer
    stack.  Same contract as step3d_t with bry/clm/sources None."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    dtype = t_nnew.dtype
    shape3 = t_nnew[0].shape
    need_zr = not cfg.splines_vdiff or any(
        s == "SPLINES" for s in cfg.t_vadv[:cfg.ntracers])

    out = []
    for itrc in range(cfg.ntracers):
        ltrc = min(1, itrc) if cfg.ntracers >= 2 else 0

        def kernel(*refs, itrc=itrc):
            (tn_r, t3_r, huon_r, hvom_r, w_r, hz_r, akt_r,
             pm_r, pn_r, *rest) = refs
            zr = rest[0][...] if need_zr else None
            rest = rest[1:] if need_zr else rest
            (t_o,) = rest
            Hz_ = hz_r[...]
            t_o[...] = tracer_corrector(
                cfg, None, pm_r[...] * pn_r[...], itrc, tn_r[...],
                t3_r[...], huon_r[...], hvom_r[...], w_r[...], Hz_,
                zr, 1.0 / Hz_, akt_r[...],
                spline_fn=spline_vdiff_flux_unrolled,
                thomas_fn=thomas_implicit_unrolled,
                vadv_fn=_vadv_unrolled)

        ins = [t_nnew[itrc], t3[itrc], Huon, Hvom, W, Hz_new,
               Akt[ltrc], grid.pm, grid.pn]
        if need_zr:
            ins.append(z_r_new)
        bc.push_masked()
        try:
            out.append(pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(shape3, dtype),
                in_specs=[vmem] * len(ins),
                out_specs=vmem,
                input_output_aliases={0: 0},
                **_vmem_params(interpret),
            )(*ins))
        finally:
            bc.pop_masked()
    return jnp.stack(out, axis=0)
