"""Micro-profile of lmd_vmix internals on the BENCHMARK1 grid (TPU)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def timeit(name, fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:36s} {ms:9.3f} ms")
    return out


def main():
    from roms_tpu.models import benchmark
    from roms_tpu import stepping, vgrid
    from roms_tpu.grid import hc_of
    from roms_tpu.ops import eos, vmix
    from roms_tpu.ops.vbc import set_vbc
    from roms_tpu.ops import bulk_flux as bfx

    cfg = benchmark.make_config(Lm=512, Mm=64, N=30, dt=150.0, ndtfast=20,
                                dtype="float32")
    cfg, grid, state, ffn = benchmark.build(cfg)
    hc = hc_of(cfg)
    step = jax.jit(lambda s: stepping.step(cfg, grid, s, ffn))
    for _ in range(3):
        state = step(state)
    jax.block_until_ready(state)

    zero2 = jnp.zeros_like(state.zeta)
    frc = ffn(cfg, grid, state.time)
    srflx = frc["srflx"]
    blk = jax.jit(lambda t_s: bfx.bulk_flux(
        cfg, grid, t_s, srflx, frc["Uwind"], frc["Vwind"], frc["Tair"],
        frc["Pair"], frc["Hair"], frc["cloud"], frc["rain"]))(state.t[0, -1])
    sustr, svstr = blk["sustr"], blk["svstr"]
    nt = cfg.ntracers
    stflux = jnp.concatenate([blk["stflux_temp"][None],
                              jnp.zeros((nt - 1,) + zero2.shape,
                                        zero2.dtype)], axis=0)
    btflux = jnp.zeros_like(stflux)
    z_r, z_w, Hz = vgrid.set_depth(grid.h, state.zeta, hc, grid.sc_r,
                                   grid.Cs_r, grid.sc_w, grid.Cs_w,
                                   cfg.vtransform)
    rho, pden = eos.rho_eos_pden(cfg, state.t, z_r)
    bvf = eos.brunt_vaisala(cfg, state.t, z_r, z_w)
    bustr, bvstr, stflx, btflx = set_vbc(cfg, grid, state.u, state.v,
                                         state.t, stflux, btflux,
                                         z_r=z_r, z_w=z_w)

    timeit("dispatch overhead", jax.jit(lambda x: x + 1.0),
           jnp.zeros((8, 128)))

    f_kpp = jax.jit(lambda u, v, t, hs, hb: vmix.lmd_vmix(
        cfg, grid, u, v, t, rho, pden, bvf, Hz, z_r, z_w,
        sustr, svstr, bustr, bvstr, stflx, srflx, hs,
        btflx=btflx, hbbl_prev=hb))
    timeit("lmd_vmix full", f_kpp, state.u, state.v, state.t,
           state.hsbl, state.hbbl)

    # spline derivs alone (the 3 scans x2 directions)
    from roms_tpu.ops.stencil import ip1, jp1
    u, v = state.u, state.v

    def derivs(u, v, rho):
        rhs_r = 6.0 * (rho[1:] - rho[:-1])
        rhs_u = 3.0 * ((u[1:] - u[:-1]) + ip1(u[1:] - u[:-1]))
        rhs_v = 3.0 * ((v[1:] - v[:-1]) + jp1(v[1:] - v[:-1]))
        dU = vmix._spline_deriv(Hz, rhs_u)
        dV = vmix._spline_deriv(Hz, rhs_v)
        dR = vmix._spline_deriv(Hz, rhs_r)
        return dU, dV, dR

    timeit("3x spline_deriv (6 scans)", jax.jit(derivs), u, v, rho)

    # no-bkpp variant
    cfg_nb = cfg.replace(kpp_bottom=False) if hasattr(cfg, "replace") else None
    if cfg_nb is not None:
        f_nb = jax.jit(lambda u, v, t, hs, hb: vmix.lmd_vmix(
            cfg_nb, grid, u, v, t, rho, pden, bvf, Hz, z_r, z_w,
            sustr, svstr, bustr, bvstr, stflx, srflx, hs,
            btflx=btflx, hbbl_prev=hb))
        timeit("lmd_vmix no-bkpp", f_nb, state.u, state.v, state.t,
               state.hsbl, state.hbbl)

    # monkeypatch spline_deriv -> cheap centered difference
    orig = vmix._spline_deriv

    def cheap_deriv(Hz, rhs):
        zero = jnp.zeros_like(Hz[0])
        d = rhs / (Hz[:-1] + Hz[1:])
        return jnp.concatenate([zero[None], d, zero[None]], axis=0)

    vmix._spline_deriv = cheap_deriv
    f_cheap = jax.jit(lambda u, v, t, hs, hb: vmix.lmd_vmix(
        cfg, grid, u, v, t, rho, pden, bvf, Hz, z_r, z_w,
        sustr, svstr, bustr, bvstr, stflx, srflx, hs,
        btflx=btflx, hbbl_prev=hb))
    timeit("lmd_vmix cheap-deriv", f_cheap, state.u, state.v, state.t,
           state.hsbl, state.hbbl)
    vmix._spline_deriv = orig

    # wscale cost: 4 full-field calls
    def wscales(ustar, z1):
        a = vmix._wscale(ustar[None], z1)
        b = vmix._wscale(ustar[None], z1 * 0.5)
        c = vmix._wscale(ustar[None], z1 * 0.25)
        d = vmix._wscale(ustar[None], z1 * 0.125)
        return a, b, c, d

    Ustar = jnp.sqrt(jnp.sqrt(sustr ** 2 + svstr ** 2))
    zh = vonKar = 0.41 * (z_w[-1][None] - z_w[:-1]) * -1e-8
    timeit("4x wscale", jax.jit(wscales), Ustar, zh)

    # take_along_axis cost: 10 gathers like the hsbl/match code
    def gathers(FC, ks):
        outs = []
        for i in range(10):
            outs.append(jnp.take_along_axis(
                FC, jnp.clip(ks + i, 0, FC.shape[0] - 1)[None], axis=0)[0])
        return outs

    ks = jnp.full(zero2.shape, 10, jnp.int32)
    timeit("10x take_along_axis(N,.,.)", jax.jit(gathers), bvf, ks)

    # swfrac cost: 3 full-profile calls
    def swf(zg):
        return (vmix.swfrac(zg), vmix.swfrac(zg * 0.9),
                vmix.swfrac(zg * 0.8))

    zgrid = z_w[-1][None] - z_w
    timeit("3x swfrac(N+1 profile)", jax.jit(swf), zgrid)


if __name__ == "__main__":
    main()
