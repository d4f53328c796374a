"""Per-component timing of the BENCHMARK1 step on the real TPU.

Times each major stage of stepping.step in isolation (jitted separately)
plus the full step, to locate the hot spots. Components overlap in what
they compute (e.g. set_depth feeds everything), so the sum exceeds the
full-step time; ratios are what matters.
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from roms_tpu.models import benchmark
from roms_tpu import stepping, vgrid
from roms_tpu.grid import hc_of
from roms_tpu.ops import eos, vmix, bc, prsgrd
from roms_tpu.ops.omega import set_massflux, omega
from roms_tpu.ops.vbc import set_vbc
from roms_tpu.ops.pre_step3d import pre_step3d
from roms_tpu.ops.rhs3d import rhs3d_momentum
from roms_tpu.ops.step2d import Fast2DState, fast_loop
from roms_tpu.ops.step3d_uv import step3d_uv
from roms_tpu.ops.step3d_t import step3d_t
from roms_tpu.ops import bulk_flux as bfx


def bench_fn(name, fn, *args, reps=20):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:28s} {dt:8.3f} ms")
    return dt


def main():
    Lm, Mm, N = 512, 64, 30
    cfg = benchmark.make_config(Lm=Lm, Mm=Mm, N=N, dt=150.0, ndtfast=20,
                                dtype="float32")
    cfg, grid, state, ffn = benchmark.build(cfg)
    hc = hc_of(cfg)

    # warm the state a few steps so fields are nontrivial
    step1 = jax.jit(lambda s: stepping.step(cfg, grid, s, ffn))
    for _ in range(3):
        state = step1(state)
    jax.block_until_ready(state)

    zero2 = jnp.zeros_like(state.zeta)
    frc = ffn(cfg, grid, state.time)

    z_r, z_w, Hz = vgrid.set_depth(grid.h, state.zeta, hc, grid.sc_r,
                                   grid.Cs_r, grid.sc_w, grid.Cs_w,
                                   cfg.vtransform)
    Huon, Hvom = set_massflux(cfg, grid, state.u, state.v, Hz)
    rho, pden = eos.rho_eos_pden(cfg, state.t, z_r)
    srflx0 = frc.get("srflx", zero2)
    blk = bfx.bulk_flux(cfg, grid, state.t[0, -1], srflx0,
                        frc.get("Uwind", zero2), frc.get("Vwind", zero2),
                        frc.get("Tair", zero2),
                        frc.get("Pair", zero2 + 1013.0),
                        frc.get("Hair", zero2), frc.get("cloud", zero2),
                        frc.get("rain", zero2))
    sustr, svstr = blk["sustr"], blk["svstr"]
    nt = cfg.ntracers
    stflux = jnp.concatenate(
        [blk["stflux_temp"][None], jnp.zeros((nt - 1,) + zero2.shape)], 0)
    btflux = jnp.zeros((nt,) + zero2.shape)
    bustr, bvstr, stflx, btflx = set_vbc(cfg, grid, state.u, state.v,
                                         state.t, stflux, btflux,
                                         z_r=z_r, z_w=z_w)
    bvf = eos.brunt_vaisala(cfg, state.t, z_r, z_w)
    Akv, Akt, hsbl, hbbl, ghats = vmix.lmd_vmix(
        cfg, grid, state.u, state.v, state.t, rho, pden, bvf, Hz, z_r,
        z_w, sustr, svstr, bustr, bvstr, stflx, srflx0, state.hsbl,
        btflx=btflx, hbbl_prev=state.hbbl)
    W = omega(cfg, grid, Huon, Hvom, z_w)
    t3, t_nnew, u_nnew, v_nnew = pre_step3d(
        cfg, grid, state.iic, state.t, state.t_prev, state.u, state.v,
        Hz, z_r, Huon, Hvom, W, Akt, sustr, svstr, bustr, bvstr,
        stflx, btflx, state.ru_prev, state.ru_prev2, state.rv_prev,
        state.rv_prev2, srflx=srflx0, ghats=ghats,
        swdk_w=vmix.swfrac(z_w[-1][None] - z_w))
    ru, rv = prsgrd.prsgrd(cfg, grid, rho, z_r, z_w, Hz)
    ru2, rv2, rufrc, rvfrc = rhs3d_momentum(
        cfg, grid, state.u, state.v, Huon, Hvom, W, Hz, ru, rv,
        sustr, svstr, bustr, bvstr)
    fs0 = Fast2DState(
        zeta_n=state.zeta, zeta_nm1=state.zeta,
        ubar_n=state.ubar, ubar_nm1=state.ubar,
        vbar_n=state.vbar, vbar_nm1=state.vbar,
        rzeta_n=state.rzeta, rzeta_nm1=zero2,
        rubar_n=state.rubar, rubar_nm1=zero2,
        rvbar_n=state.rvbar, rvbar_nm1=zero2,
        Zt_avg1=zero2, DU_avg1=zero2, DV_avg1=zero2,
        DU_avg2=zero2, DV_avg2=zero2)

    print(f"grid {Lm}x{Mm}x{N}, nfast={cfg.nfast}, f32")
    total = bench_fn("FULL STEP", lambda s: stepping.step(cfg, grid, s, ffn),
                     state)
    bench_fn("set_depth", lambda z: vgrid.set_depth(
        grid.h, z, hc, grid.sc_r, grid.Cs_r, grid.sc_w, grid.Cs_w,
        cfg.vtransform), state.zeta)
    bench_fn("rho_eos+bvf", lambda t: (
        eos.rho_eos_pden(cfg, t, z_r),
        eos.brunt_vaisala(cfg, t, z_r, z_w)), state.t)
    bench_fn("bulk_flux", lambda T: bfx.bulk_flux(
        cfg, grid, T, srflx0, frc.get("Uwind", zero2),
        frc.get("Vwind", zero2), frc.get("Tair", zero2),
        frc.get("Pair", zero2 + 1013.0), frc.get("Hair", zero2),
        frc.get("cloud", zero2), frc.get("rain", zero2)), state.t[0, -1])
    bench_fn("KPP (lmd_vmix)", lambda u, v: vmix.lmd_vmix(
        cfg, grid, u, v, state.t, rho, pden, bvf, Hz, z_r, z_w,
        sustr, svstr, bustr, bvstr, stflx, srflx0, state.hsbl,
        btflx=btflx, hbbl_prev=state.hbbl), state.u, state.v)
    bench_fn("pre_step3d", lambda t: pre_step3d(
        cfg, grid, state.iic, t, state.t_prev, state.u, state.v, Hz,
        z_r, Huon, Hvom, W, Akt, sustr, svstr, bustr, bvstr, stflx,
        btflx, state.ru_prev, state.ru_prev2, state.rv_prev,
        state.rv_prev2, srflx=srflx0, ghats=ghats,
        swdk_w=vmix.swfrac(z_w[-1][None] - z_w)), state.t)
    bench_fn("prsgrd", lambda r: prsgrd.prsgrd(cfg, grid, r, z_r, z_w, Hz),
             rho)
    bench_fn("rhs3d_momentum", lambda u, v: rhs3d_momentum(
        cfg, grid, u, v, Huon, Hvom, W, Hz, ru, rv,
        sustr, svstr, bustr, bvstr), state.u, state.v)
    bench_fn("fast_loop (nfast substeps)", lambda f: fast_loop(
        cfg, grid, f, rufrc=rufrc, rvfrc=rvfrc,
        ru0_nm1=state.rufrc0_prev, ru0_nm2=state.rufrc0_prev2,
        rv0_nm1=state.rvfrc0_prev, rv0_nm2=state.rvfrc0_prev2,
        iic=state.iic), fs0)
    fs1, rufrc_c, rvfrc_c, wet = jax.jit(lambda f: fast_loop(
        cfg, grid, f, rufrc=rufrc, rvfrc=rvfrc,
        ru0_nm1=state.rufrc0_prev, ru0_nm2=state.rufrc0_prev2,
        rv0_nm1=state.rvfrc0_prev, rv0_nm2=state.rvfrc0_prev2,
        iic=state.iic))(fs0)
    z_r2, z_w2, Hz2 = vgrid.set_depth(grid.h, fs1.Zt_avg1, hc, grid.sc_r,
                                      grid.Cs_r, grid.sc_w, grid.Cs_w,
                                      cfg.vtransform)
    bench_fn("step3d_uv", lambda un, vn: step3d_uv(
        cfg, grid, state.iic, un, vn, ru2, rv2, Hz2, Akv,
        fs1.DU_avg1, fs1.DV_avg1, fs1.DU_avg2, fs1.DV_avg2, Huon, Hvom,
        u_old=state.u, v_old=state.v, z_w_new=z_w2), u_nnew, v_nnew)
    u2, v2, ubar2, vbar2, Huon2, Hvom2 = jax.jit(
        lambda un, vn: step3d_uv(
            cfg, grid, state.iic, un, vn, ru2, rv2, Hz2, Akv,
            fs1.DU_avg1, fs1.DV_avg1, fs1.DU_avg2, fs1.DV_avg2,
            Huon, Hvom, u_old=state.u, v_old=state.v,
            z_w_new=z_w2))(u_nnew, v_nnew)
    W2 = omega(cfg, grid, Huon2, Hvom2, z_w2)
    bench_fn("step3d_t", lambda tn: step3d_t(
        cfg, grid, state.iic, tn, t3, Huon2, Hvom2, W2, Hz2, z_r2, Akt,
        t_old=state.t), t_nnew)
    bench_fn("omega", lambda h1, h2: omega(cfg, grid, h1, h2, z_w),
             Huon, Hvom)
    bench_fn("set_massflux", lambda u, v: set_massflux(cfg, grid, u, v, Hz),
             state.u, state.v)
    print(f"(components overlap; FULL STEP = {total:.3f} ms)")


if __name__ == "__main__":
    main()
