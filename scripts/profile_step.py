"""Per-stage TPU timing breakdown of the BENCHMARK1 slow step.

Times each main3d stage kernel (jitted in isolation, HBM-to-HBM) plus the
full fused step, to locate where the step time goes.  Usage:

    python scripts/profile_step.py [--reps 30]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def timeit(name, fn, *args, reps=30, results=None):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:28s} {ms:9.3f} ms")
    if results is not None:
        results[name] = ms
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=30)
    args = ap.parse_args()

    from roms_tpu.models import benchmark
    from roms_tpu import stepping, vgrid
    from roms_tpu.grid import hc_of
    from roms_tpu.ops import bulk_flux as bfx
    from roms_tpu.ops import eos, prsgrd, vmix
    from roms_tpu.ops.omega import set_massflux, omega
    from roms_tpu.ops.vbc import set_vbc
    from roms_tpu.ops.pre_step3d import pre_step3d
    from roms_tpu.ops.rhs3d import rhs3d_momentum
    from roms_tpu.ops.mix3d import t3dmix2_geo, uv3dmix2
    from roms_tpu.ops.step2d import Fast2DState, fast_loop
    from roms_tpu.ops.step3d_uv import step3d_uv
    from roms_tpu.ops.step3d_t import step3d_t

    cfg = benchmark.make_config(Lm=512, Mm=64, N=30, dt=150.0, ndtfast=20,
                                dtype="float32")
    cfg, grid, state, ffn = benchmark.build(cfg)
    hc = hc_of(cfg)

    step = jax.jit(lambda s: stepping.step(cfg, grid, s, ffn))
    for _ in range(3):
        state = step(state)
    jax.block_until_ready(state)

    res = {}
    f_null = jax.jit(lambda x: x + 1.0)
    timeit("dispatch overhead (x+1)", f_null, jnp.zeros((8, 128)),
           reps=args.reps, results=res)
    timeit("full step", step, state, reps=args.reps, results=res)

    # ---- stage inputs (mirror stepping.step preamble) ----
    zero2 = jnp.zeros_like(state.zeta)
    nt = cfg.ntracers
    frc = ffn(cfg, grid, state.time)
    srflx = frc["srflx"]

    f_blk = jax.jit(lambda t_s, srf: bfx.bulk_flux(
        cfg, grid, t_s, srf, frc["Uwind"], frc["Vwind"], frc["Tair"],
        frc["Pair"], frc["Hair"], frc["cloud"], frc["rain"]))
    blk = timeit("bulk_flux (COARE)", f_blk, state.t[0, -1], srflx,
                 reps=args.reps, results=res)
    sustr, svstr = blk["sustr"], blk["svstr"]
    stflux = jnp.concatenate([blk["stflux_temp"][None],
                              jnp.zeros((nt - 1,) + zero2.shape,
                                        zero2.dtype)], axis=0)
    btflux = jnp.zeros((nt,) + zero2.shape, zero2.dtype)

    f_depth = jax.jit(lambda z: vgrid.set_depth(
        grid.h, z, hc, grid.sc_r, grid.Cs_r, grid.sc_w, grid.Cs_w,
        cfg.vtransform))
    z_r, z_w, Hz = timeit("set_depth", f_depth, state.zeta,
                          reps=args.reps, results=res)

    f_mflx = jax.jit(lambda u, v, H: set_massflux(cfg, grid, u, v, H))
    Huon, Hvom = timeit("set_massflux", f_mflx, state.u, state.v, Hz,
                        reps=args.reps, results=res)

    f_eos = jax.jit(lambda t, zr: eos.rho_eos_pden(cfg, t, zr))
    rho, pden = timeit("rho_eos (JM95)", f_eos, state.t, z_r,
                       reps=args.reps, results=res)

    f_bvf = jax.jit(lambda t, zr, zw: eos.brunt_vaisala(cfg, t, zr, zw))
    bvf = timeit("brunt_vaisala", f_bvf, state.t, z_r, z_w,
                 reps=args.reps, results=res)

    f_vbc = jax.jit(lambda u, v, t: set_vbc(cfg, grid, u, v, t, stflux,
                                            btflux, z_r=z_r, z_w=z_w))
    bustr, bvstr, stflx, btflx = timeit("set_vbc", f_vbc, state.u,
                                        state.v, state.t,
                                        reps=args.reps, results=res)

    f_kpp = jax.jit(lambda u, v, t, rho, pden, bvf, hs, hb: vmix.lmd_vmix(
        cfg, grid, u, v, t, rho, pden, bvf, Hz, z_r, z_w,
        sustr, svstr, bustr, bvstr, stflx, srflx, hs,
        btflx=btflx, hbbl_prev=hb))
    Akv, Akt, hsbl, hbbl, ghats = timeit(
        "lmd_vmix (KPP)", f_kpp, state.u, state.v, state.t, rho, pden,
        bvf, state.hsbl, state.hbbl, reps=args.reps, results=res)

    f_omega = jax.jit(lambda hu, hv, zw: omega(cfg, grid, hu, hv, zw))
    W = timeit("omega", f_omega, Huon, Hvom, z_w,
               reps=args.reps, results=res)

    swdk_w = vmix.swfrac(z_w[-1][None] - z_w)
    f_pre = jax.jit(lambda t, tp, u, v: pre_step3d(
        cfg, grid, state.iic, t, tp, u, v, Hz, z_r, Huon, Hvom, W, Akt,
        sustr, svstr, bustr, bvstr, stflx, btflx,
        state.ru_prev, state.ru_prev2, state.rv_prev, state.rv_prev2,
        srflx=srflx, ghats=ghats, swdk_w=swdk_w))
    t3, t_nnew, u_nnew, v_nnew = timeit(
        "pre_step3d", f_pre, state.t, state.t_prev, state.u, state.v,
        reps=args.reps, results=res)

    f_prs = jax.jit(lambda rho: prsgrd.prsgrd(cfg, grid, rho, z_r, z_w,
                                              Hz))
    ru, rv = timeit("prsgrd32", f_prs, rho, reps=args.reps, results=res)

    f_tmix = jax.jit(lambda t, tn: t3dmix2_geo(cfg, grid, t, Hz, z_r, tn,
                                               cfg.dt))
    t_nnew = timeit("t3dmix2_geo", f_tmix, state.t, t_nnew,
                    reps=args.reps, results=res)

    f_rhs = jax.jit(lambda u, v, ru, rv: rhs3d_momentum(
        cfg, grid, u, v, Huon, Hvom, W, Hz, ru, rv,
        sustr, svstr, bustr, bvstr))
    ru, rv, rufrc, rvfrc = timeit("rhs3d_momentum", f_rhs, state.u,
                                  state.v, ru, rv,
                                  reps=args.reps, results=res)

    f_uvmix = jax.jit(lambda u, v, un, vn, rf, rvf: uv3dmix2(
        cfg, grid, u, v, Hz, un, vn, rf, rvf, cfg.dt))
    u_nnew, v_nnew, rufrc, rvfrc = timeit(
        "uv3dmix2", f_uvmix, state.u, state.v, u_nnew, v_nnew, rufrc,
        rvfrc, reps=args.reps, results=res)

    fs0 = Fast2DState(
        zeta_n=state.zeta, zeta_nm1=state.zeta,
        ubar_n=state.ubar, ubar_nm1=state.ubar,
        vbar_n=state.vbar, vbar_nm1=state.vbar,
        rzeta_n=state.rzeta, rzeta_nm1=zero2,
        rubar_n=state.rubar, rubar_nm1=zero2,
        rvbar_n=state.rvbar, rvbar_nm1=zero2,
        Zt_avg1=zero2, DU_avg1=zero2, DV_avg1=zero2,
        DU_avg2=zero2, DV_avg2=zero2)
    f_fast = jax.jit(lambda fs, rf, rvf: fast_loop(
        cfg, grid, fs, rufrc=rf, rvfrc=rvf,
        ru0_nm1=state.rufrc0_prev, ru0_nm2=state.rufrc0_prev2,
        rv0_nm1=state.rvfrc0_prev, rv0_nm2=state.rvfrc0_prev2,
        iic=state.iic))
    fs, rufrc_c, rvfrc_c, wet = timeit(
        f"fast_loop ({cfg.nfast} substeps)", f_fast, fs0, rufrc, rvfrc,
        reps=args.reps, results=res)

    z_r2, z_w2, Hz2 = f_depth(fs.Zt_avg1)
    f_s3uv = jax.jit(lambda un, vn, ru, rv: step3d_uv(
        cfg, grid, state.iic, un, vn, ru, rv, Hz2, Akv,
        fs.DU_avg1, fs.DV_avg1, fs.DU_avg2, fs.DV_avg2, Huon, Hvom,
        u_old=state.u, v_old=state.v, z_w_new=z_w2))
    u2, v2, ubar2, vbar2, Huon2, Hvom2 = timeit(
        "step3d_uv", f_s3uv, u_nnew, v_nnew, ru, rv,
        reps=args.reps, results=res)

    W2 = f_omega(Huon2, Hvom2, z_w2)
    f_s3t = jax.jit(lambda tn, t3: step3d_t(
        cfg, grid, state.iic, tn, t3, Huon2, Hvom2, W2, Hz2, z_r2, Akt,
        t_old=state.t))
    t2 = timeit("step3d_t", f_s3t, t_nnew, t3,
                reps=args.reps, results=res)

    total = sum(v for k, v in res.items() if k != "full step")
    print(f"{'sum of stages':28s} {total:9.3f} ms")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
