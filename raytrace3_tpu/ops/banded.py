"""Banded all-pairs deposit: sorted 1-D spatial banding + windowed matmuls.

The TPU-measured deposit landscape (see bench history): the gather-based
uniform grid (ops/grid.py) loses badly to the all-pairs masked matmul on the
MXU, but all-pairs is O(C x D) and dominates 512^2 passes.  This op keeps
the matmul formulation and kills the quadratic term with SPATIAL BANDING:

  1. sort hit points and deposits by one coordinate (x), invalid lanes
     pushed to +inf (they sort to the tail and never pair);
  2. a hit-point tile of T consecutive sorted records spans a tiny x-range;
     every deposit within the search radius r = sqrt(INIT_R2) of the tile
     lies in a CONTIGUOUS window of the x-sorted deposit array, located with
     one searchsorted per tile;
  3. each (tile x window) block runs the exact brute-force math (distance
     identity + normal filter + flux matmul) — dynamic_slice block loads,
     no per-element gathers;
  4. results scatter back through the sort permutation.

Effective work drops from C x D to C x W where W = deposits per x-slab
(~4-6% of D for the reference scene), a ~20x cut, while staying 100%
MXU/VPU-vectorised.  Equality with the brute-force oracle is tested
(tests/test_deposit.py); a window overflow (pathologically dense slab)
drops the tail — size ``window`` generously.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from ..core.types import Deposits, HitPoints
from ..render.deposit import NORMAL_DOT_MIN, _PREC, pair_d2_ndot

#: Search radius of the reference's fixed kd-tree query (Raytracer.h:85).
SEARCH_R = math.sqrt(2.0)


def make_banded_deposit(tile: int = 1024, window: int = 32768, axis: int = 0,
                        search_r: float = SEARCH_R, batch_tiles: int = 8):
    """Build deposit_fn(hp, dep) -> (d_nphot, d_tao).

    ``batch_tiles`` vmaps that many tiles per sequential map step —
    sequential while-loop dispatch overhead on TPU otherwise dominates the
    per-tile compute (profile-measured)."""

    def deposit_fn(hp: HitPoints, dep: Deposits):
        C = hp.capacity
        D = dep.pos.shape[0]
        t = min(tile, C)
        pad_c = (-C) % t
        w = min(window, D)

        # --- sort both sides along `axis`, invalid to +inf ---
        hx = jnp.where(hp.valid, hp.pos[:, axis], jnp.inf)
        h_ord = jnp.argsort(hx)
        dx = jnp.where(dep.valid, dep.pos[:, axis], jnp.inf)
        dxs, d_ord = jax.lax.sort_key_val(
            dx, jnp.arange(dx.shape[0], dtype=jnp.int32)
        )
        dpos = dep.pos[d_ord]
        dn = dep.n[d_ord]
        dflux = jnp.where(dep.valid[d_ord, None], dep.flux[d_ord], 0.0)
        dvalid = dep.valid[d_ord]

        hpos = jnp.pad(hp.pos[h_ord], ((0, pad_c), (0, 0)))
        hn = jnp.pad(hp.n[h_ord], ((0, pad_c), (0, 0)))
        hr2 = jnp.pad(hp.r2[h_ord], (0, pad_c))
        hval = jnp.pad(hp.valid[h_ord], (0, pad_c))
        hxs = jnp.pad(hx[h_ord], (0, pad_c), constant_values=jnp.inf)

        n_tiles = (C + pad_c) // t
        tiles_x_lo = hxs.reshape(n_tiles, t).min(axis=1) - search_r
        # window start: first deposit with x >= x_lo, clamped so the slice
        # stays in bounds
        starts = jnp.searchsorted(dxs, tiles_x_lo)
        starts = jnp.clip(starts, 0, max(D - w, 0))

        def tile_body(i):
            s = starts[i]
            dp = jax.lax.dynamic_slice_in_dim(dpos, s, w)
            dnn = jax.lax.dynamic_slice_in_dim(dn, s, w)
            df = jax.lax.dynamic_slice_in_dim(dflux, s, w)
            dv = jax.lax.dynamic_slice_in_dim(dvalid, s, w)
            hp_t = jax.lax.dynamic_slice_in_dim(hpos, i * t, t)
            hn_t = jax.lax.dynamic_slice_in_dim(hn, i * t, t)
            r2_t = jax.lax.dynamic_slice_in_dim(hr2, i * t, t)
            hv_t = jax.lax.dynamic_slice_in_dim(hval, i * t, t)

            d2, ndot = pair_d2_ndot(hp_t, hn_t, dp, dnn)
            m = (
                (d2 <= r2_t[:, None])
                & (ndot > NORMAL_DOT_MIN)
                & dv[None, :]
                & hv_t[:, None]
            ).astype(dp.dtype)
            return m.sum(1), jnp.matmul(m, df, precision=_PREC)

        bs = min(batch_tiles, n_tiles)
        cnt_tiles, flux_tiles = jax.lax.map(
            tile_body, jnp.arange(n_tiles), batch_size=bs
        )
        cnt_sorted = cnt_tiles.reshape(-1)[:C]
        flux_sorted = flux_tiles.reshape(-1, 3)[:C]

        # scatter back to original hit-point order
        cnt = jnp.zeros(C, dep.pos.dtype).at[h_ord].set(cnt_sorted)
        flux = jnp.zeros((C, 3), dep.pos.dtype).at[h_ord].set(flux_sorted)
        return cnt, hp.wgt * flux / jnp.pi                 # Raytracer.h:156

    return deposit_fn
