"""Explicit ppermute halo exchange vs the single-device periodic wrap."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from roms_tpu.config import Config
from roms_tpu.ops import bc
from roms_tpu.parallel import halo


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_ppermute_halo_matches_periodic_wrap():
    cfg = Config(Lm=32, Mm=16, N=1, ew_periodic=True, ns_periodic=True)
    H = cfg.halo
    key = jax.random.PRNGKey(0)
    # global interior field, replicated-built then sharded by interior
    interior = jax.random.normal(key, (cfg.Mm, cfg.Lm))
    # reference: single-device padded + wrapped
    padded = jnp.zeros((cfg.ny_tot, cfg.nx_tot))
    padded = padded.at[H:H + cfg.Mm, H:H + cfg.Lm].set(interior)
    ref = bc.fill_halo(cfg, padded)

    # sharded: 1x8 mesh along xi; each shard holds a locally padded block
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(1, 8), ("eta", "xi"))
    nloc = cfg.Lm // 8

    def local_pad_and_exchange(block):
        # block: (Mm, nloc) local interior
        lp = jnp.zeros((cfg.Mm + 2 * H, nloc + 2 * H), block.dtype)
        lp = lp.at[H:H + cfg.Mm, H:H + nloc].set(block)
        return halo.exchange_2d(cfg, lp)

    f = shard_map(local_pad_and_exchange, mesh=mesh,
                  in_specs=P("eta", "xi"), out_specs=P("eta", "xi"))
    blocks = jax.jit(f)(interior)
    # blocks is the concatenation of padded shards: check each shard's
    # halos against the reference padded array
    out = np.asarray(blocks)
    refn = np.asarray(ref)
    for p in range(8):
        loc = out[:, p * (nloc + 2 * H):(p + 1) * (nloc + 2 * H)]
        # reference block: global columns [p*nloc - H, (p+1)*nloc + H)
        cols = (np.arange(-H, nloc + H) + p * nloc) % cfg.Lm
        ref_block = refn[H:H + cfg.Mm, H:H + cfg.Lm][:, cols]
        np.testing.assert_allclose(loc[H:H + cfg.Mm], ref_block,
                                   err_msg=f"shard {p} interior rows")
        # eta halos: wrapped rows from the opposite edge
        rows_n = (np.arange(cfg.Mm, cfg.Mm + H)) % cfg.Mm
        ref_n = refn[H:H + cfg.Mm, H:H + cfg.Lm][rows_n][:, cols]
        np.testing.assert_allclose(loc[H + cfg.Mm:], ref_n,
                                   err_msg=f"shard {p} north halo")
