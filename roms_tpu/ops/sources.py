"""Point sources (river runoff): the analog of mod_sources.F + the LuvSrc
injection sites in step2d (momentum faces), step3d_uv (3-D profile), and
the tracer advective-flux overrides in pre_step3d/step3d_t.

Sources are static (config-time) index lists with time-constant or
time-varying transports supplied through the forcing dict:

    frc["sources"] = PointSources(
        isrc=..., jsrc=...,      # padded array indices of the source FACE
        dsrc=...,                # 0: u-face, 1: v-face (mod_sources Dsrc)
        Qbar=...,                # (nsrc,) barotropic transport m3/s
        Qshape=...,              # (N, nsrc) vertical distribution, sums 1
        Tsrc=...,                # (NT, N, nsrc) tracer values (optional)
    )
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class PointSources(NamedTuple):
    isrc: jax.Array        # (nsrc,) padded i index of the face
    jsrc: jax.Array
    dsrc: jax.Array        # (nsrc,) 0 = u-face, 1 = v-face
    Qbar: jax.Array        # (nsrc,) m3/s
    Qshape: jax.Array      # (N, nsrc)
    Tsrc: Optional[jax.Array] = None   # (NT, N, nsrc)

    @property
    def Qsrc(self):
        return self.Qshape * self.Qbar[None]


def apply_ubar_sources(src: PointSources, ubar, vbar, zeta, h,
                       on_u, om_v):
    """step2d LuvSrc (step2d_LF_AM3.h:2478-2504): overwrite the barotropic
    velocity at source faces with Qbar / (face width * depth)."""
    import jax.numpy as jnp
    from .stencil import im1, jm1
    D = zeta + h
    # u-face: D averaged across (i-1, i)
    Du = 0.5 * (D + im1(D)) * on_u
    Dv = 0.5 * (D + jm1(D)) * om_v
    u_val = src.Qbar / Du[src.jsrc, src.isrc]
    v_val = src.Qbar / Dv[src.jsrc, src.isrc]
    is_u = src.dsrc == 0
    ubar = ubar.at[src.jsrc, src.isrc].set(
        jnp.where(is_u, u_val, ubar[src.jsrc, src.isrc]))
    vbar = vbar.at[src.jsrc, src.isrc].set(
        jnp.where(~is_u, v_val, vbar[src.jsrc, src.isrc]))
    return ubar, vbar


def apply_uv_sources(src: PointSources, u, v, z_w, on_u, om_v):
    """step3d_uv LuvSrc (step3d_uv.F:1390-1419): impose the vertical
    transport profile at source faces."""
    from .stencil import im1, jm1
    dz = z_w[1:] - z_w[:-1]                    # (N,Ny,Nx)
    dzu = 0.5 * (dz + im1(dz))
    dzv = 0.5 * (dz + jm1(dz))
    qs = src.Qsrc                              # (N,nsrc)
    u_val = qs / (on_u[src.jsrc, src.isrc][None] *
                  dzu[:, src.jsrc, src.isrc])
    v_val = qs / (om_v[src.jsrc, src.isrc][None] *
                  dzv[:, src.jsrc, src.isrc])
    is_u = src.dsrc == 0
    u = u.at[:, src.jsrc, src.isrc].set(
        jnp.where(is_u[None], u_val, u[:, src.jsrc, src.isrc]))
    v = v.at[:, src.jsrc, src.isrc].set(
        jnp.where(~is_u[None], v_val, v[:, src.jsrc, src.isrc]))
    return u, v


def apply_tracer_flux_sources(src: PointSources, itrc: int, FX, FE,
                              Huon, Hvom):
    """Tracer advective-flux override at source faces (pre_step3d.F /
    step3d_t.F LuvSrc): FX(Isrc) = Huon(Isrc)*Tsrc."""
    if src.Tsrc is None:
        return FX, FE
    tv = src.Tsrc[itrc]                        # (N,nsrc)
    fx_val = Huon[:, src.jsrc, src.isrc] * tv
    fe_val = Hvom[:, src.jsrc, src.isrc] * tv
    is_u = src.dsrc == 0
    FX = FX.at[:, src.jsrc, src.isrc].set(
        jnp.where(is_u[None], fx_val, FX[:, src.jsrc, src.isrc]))
    FE = FE.at[:, src.jsrc, src.isrc].set(
        jnp.where(~is_u[None], fe_val, FE[:, src.jsrc, src.isrc]))
    return FX, FE
