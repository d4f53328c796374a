"""Accurate per-stage timing: each stage scanned 100x inside one jit
to amortize the axon dispatch RPC."""
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
from roms_tpu.ops import eos, prsgrd, vmix, bulk_flux as bfx
from roms_tpu.ops.omega import set_massflux, omega
from roms_tpu.ops.pre_step3d import pre_step3d
from roms_tpu.ops.rhs3d import rhs3d_momentum
from roms_tpu.ops.step2d import Fast2DState, fast_loop
from roms_tpu.ops.step3d_uv import step3d_uv
from roms_tpu.ops.step3d_t import step3d_t
from roms_tpu.ops.vbc import set_vbc

L = 600


def timeit(name, fn, *args):
    """Scan fn L times inside one jit; fn must return something state-like
    to keep the loop serial (we thread the first arg)."""
    def body(c, _):
        return fn(c, *args[1:]), None

    g = jax.jit(lambda c: jax.lax.scan(body, c, None, length=L)[0])
    out = g(args[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = g(args[0])
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / L * 1e3
    print(f"{name:18s}: {dt:8.4f} ms")
    return dt


def main():
    Lm, Mm, N = 512, 64, 30
    cfg = benchmark.make_config(Lm=Lm, Mm=Mm, N=N, dt=150.0, ndtfast=20,
                                dtype="float32")
    cfg, grid, state, ffn = benchmark.build(cfg)
    hc = hc_of(cfg)
    s = state
    zero2 = jnp.zeros_like(s.zeta)
    nt = cfg.ntracers

    z_r, z_w, Hz = vgrid.set_depth(grid.h, s.zeta, hc, grid.sc_r,
                                   grid.Cs_r, grid.sc_w, grid.Cs_w,
                                   cfg.vtransform)
    Huon, Hvom = set_massflux(cfg, grid, s.u, s.v, Hz)
    rho, pden = eos.rho_eos_pden(cfg, s.t, z_r)
    bvf = eos.brunt_vaisala(cfg, s.t, z_r, z_w)
    W = omega(cfg, grid, Huon, Hvom, z_w)
    frc = ffn(cfg, grid, s.time)
    sustr = frc.get("sustr", zero2)
    svstr = frc.get("svstr", zero2)
    stflx = jnp.zeros((nt,) + zero2.shape, zero2.dtype)
    Akv, Akt = s.Akv, s.Akt

    total = 0.0
    timeit("baseline(t*1.0001)", lambda t: t * 1.0001, s.t * 1.0)
    timeit("baseline(2d)", lambda z: z * 1.0001 + zero2, s.zeta * 1.0)
    total += timeit("set_depth", lambda z: jnp.sum(vgrid.set_depth(
        grid.h, z, hc, grid.sc_r, grid.Cs_r, grid.sc_w, grid.Cs_w,
        cfg.vtransform)[2], axis=0) * 1e-9 + z, s.zeta)
    total += timeit("rho_eos+bvf", lambda t: t + 1e-12 * (
        eos.rho_eos_pden(cfg, t, z_r)[0] +
        eos.brunt_vaisala(cfg, t, z_r, z_w)[:-1]), s.t * 1.0)
    total += timeit("set_massflux", lambda u: u + 1e-12 * set_massflux(
        cfg, grid, u, s.v, Hz)[0], s.u * 1.0)
    total += timeit("omega", lambda hu: hu + 1e-12 * omega(
        cfg, grid, hu, Hvom, z_w)[:-1], Huon * 1.0)
    total += timeit("bulk_flux", lambda t: t + 1e-12 * bfx.bulk_flux(
        cfg, grid, t[0, -1], zero2,
        frc.get("Uwind", zero2), frc.get("Vwind", zero2),
        frc.get("Tair", zero2), frc.get("Pair", zero2 + 1013.0),
        frc.get("Hair", zero2), frc.get("cloud", zero2),
        frc.get("rain", zero2))["sustr"][None, None], s.t * 1.0)
    total += timeit("set_vbc", lambda u: u + 1e-12 * set_vbc(
        cfg, grid, u, s.v, s.t, stflx, stflx, z_r=z_r, z_w=z_w)[0],
        s.u * 1.0)

    def kpp(t):
        akv, akt, hs, hb, gh = vmix.lmd_vmix(
            cfg, grid, s.u, s.v, t, rho, pden, bvf, Hz, z_r, z_w,
            sustr, svstr, zero2, zero2, stflx, zero2, s.hsbl,
            btflx=stflx, hbbl_prev=s.hbbl)
        return t + 1e-12 * akv[None, :-1]
    total += timeit("lmd_vmix(KPP)", kpp, s.t * 1.0)

    def pres(t):
        t3, t_nnew, u_nnew, v_nnew = pre_step3d(
            cfg, grid, s.iic, t, s.t, s.u, s.v, Hz, z_r, Huon, Hvom, W,
            Akt, sustr, svstr, zero2, zero2, stflx, stflx,
            s.ru_prev, s.ru_prev2, s.rv_prev, s.rv_prev2)
        return t + 1e-12 * (t_nnew + 1e-3 * t3) + 1e-15 * u_nnew[None]
    total += timeit("pre_step3d", pres, s.t * 1.0)

    total += timeit("prsgrd", lambda r: r + 1e-12 * prsgrd.prsgrd(
        cfg, grid, r, z_r, z_w, Hz)[0], rho * 1.0)

    def rhs(u):
        ru, rv, rufrc, rvfrc = rhs3d_momentum(
            cfg, grid, u, s.v, Huon, Hvom, W, Hz,
            jnp.zeros_like(u), jnp.zeros_like(s.v),
            sustr, svstr, zero2, zero2)
        return u + 1e-12 * ru + 1e-15 * rufrc[None]
    total += timeit("rhs3d_momentum", rhs, s.u * 1.0)

    fs0 = Fast2DState(
        zeta_n=s.zeta, zeta_nm1=s.zeta, ubar_n=s.ubar, ubar_nm1=s.ubar,
        vbar_n=s.vbar, vbar_nm1=s.vbar,
        rzeta_n=s.rzeta, rzeta_nm1=zero2, rubar_n=s.rubar,
        rubar_nm1=zero2, rvbar_n=s.rvbar, rvbar_nm1=zero2,
        Zt_avg1=zero2, DU_avg1=zero2, DV_avg1=zero2,
        DU_avg2=zero2, DV_avg2=zero2)
    ruf = jnp.zeros_like(s.ubar)
    rvf = jnp.zeros_like(s.vbar)

    def fl(fs):
        fs2, rc, vc, _ = fast_loop(cfg, grid, fs, rufrc=ruf, rvfrc=rvf,
                                   ru0_nm1=ruf, ru0_nm2=ruf,
                                   rv0_nm1=rvf, rv0_nm2=rvf,
                                   iic=jnp.array(5))
        return fs2.replace(zeta_n=fs2.zeta_n * (1.0 - 1e-12))
    total += timeit(f"fast_loop({cfg.nfast})", fl, fs0)

    def s3uv(u):
        u2, v2, ub2, vb2, Hu2, Hv2 = step3d_uv(
            cfg, grid, s.iic, u, jnp.zeros_like(s.v) + u * 0, s.ru_prev,
            s.rv_prev, Hz, Akv, zero2, zero2, zero2, zero2, Huon, Hvom,
            u_old=s.u, v_old=s.v, z_w_new=z_w)
        return u + 1e-12 * u2 + 1e-15 * Hu2
    total += timeit("step3d_uv", s3uv, s.u * 1.0)

    def s3t(t):
        t2 = step3d_t(cfg, grid, s.iic, t * Hz[None], t, Huon, Hvom, W,
                      Hz, z_r, Akt, t_old=t)
        return t * (1 - 1e-12) + 1e-12 * t2
    total += timeit("step3d_t", s3t, s.t * 1.0)

    print(f"{'SUM':18s}: {total:8.4f} ms")


if __name__ == "__main__":
    main()
