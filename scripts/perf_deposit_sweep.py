#!/usr/bin/env python
"""A/B sweep of PallasDeposit configurations at bench shapes.

Times the FULL per-round deposit call (sort + work list + kernel + unpack)
for several (bucket2d, tile, wchunk, work_cap) configurations on inputs
distributed like the reference scene (points on the box walls/floor and
sphere surfaces, not uniform volume — window volumes and therefore the
candidate workload depend on the surface clustering).

Usage: python scripts/perf_deposit_sweep.py  (RT3_SWEEP=i,j,... to subset)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def scene_points(rng, n):
    """Points on the reference scene's surfaces (Scene.h:116-156 geometry)."""
    kind = rng.integers(0, 6, n)
    p = np.zeros((n, 3), np.float32)
    u, v = rng.uniform(0, 1, n), rng.uniform(0, 1, n)
    p[kind == 0] = np.stack([np.full((kind == 0).sum(), 1.0),
                             u[kind == 0] * 81.6, v[kind == 0] * 170],
                            1)  # left wall
    p[kind == 1] = np.stack([np.full((kind == 1).sum(), 99.0),
                             u[kind == 1] * 81.6, v[kind == 1] * 170], 1)
    m = kind == 2  # floor (the caustics surface - heaviest)
    p[m] = np.stack([u[m] * 98 + 1, np.zeros(m.sum()), v[m] * 170], 1)
    m = kind == 3  # ceiling
    p[m] = np.stack([u[m] * 98 + 1, np.full(m.sum(), 81.6), v[m] * 170], 1)
    m = kind == 4  # back wall
    p[m] = np.stack([u[m] * 98 + 1, v[m] * 81.6, np.zeros(m.sum())], 1)
    m = kind == 5  # sphere-ish cluster near the glass sphere
    th, ph = u[m] * np.pi, v[m] * 2 * np.pi
    p[m] = np.stack([73 + 16.5 * np.sin(th) * np.cos(ph),
                     16.5 + 16.5 * np.cos(th),
                     88 + 16.5 * np.sin(th) * np.sin(ph)], 1)
    return p


def main() -> int:
    cache_dir = os.path.join(REPO, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from raytrace3_tpu.core.types import Deposits, make_hitpoints
    from raytrace3_tpu.ops.deposit_pallas import (PallasDeposit,
                                                  PallasDepositLane,
                                                  PallasDepositStream,
                                                  PallasDepositTile,
                                                  PallasDepositZTile)

    segs, N = 14, 131072
    D = int(os.environ.get("RT3_SWEEP_D", segs * N))
    C = int(os.environ.get("RT3_SWEEP_C", int(512 * 512 * 1.3)))
    rng = np.random.default_rng(0)

    dep = Deposits(
        pos=jnp.asarray(scene_points(rng, D)),
        n=jnp.asarray(rng.normal(size=(D, 3)).astype(np.float32)),
        flux=jnp.asarray(rng.uniform(0, 1, (D, 3)).astype(np.float32)),
        valid=jnp.asarray(rng.uniform(size=D) < 0.8),
    )
    hp = make_hitpoints(C, 2.0, jnp.float32)
    hp = hp.replace(pos=jnp.asarray(scene_points(rng, C)),
                    valid=jnp.ones((C,), bool))

    bounds = dict(x_lo=-4.0, x_hi=104.0, z_lo=-4.0, z_hi=184.0)
    b1 = dict(x_lo=-4.0, x_hi=104.0)
    T = PallasDepositTile
    # Round-3 sweep #3: the flat work-item grid lost everywhere (sweep #2:
    # ~0.7us Pallas grid tax x 26-131k chunks); the tile-loop kernel walks
    # chunks in an in-kernel fori_loop, so small tiles (fewer PAIRS via
    # narrower y windows) and large chunks (fewer DMA trips) can finally
    # combine.
    S = PallasDepositStream
    # Round-3 sweep #4: every tile/chunk shape in sweep #3 landed within
    # 10% (57-64 ms) -> per-chunk SCALAR overhead (the ~40-op in-kernel
    # chunk_of recompute), not pair math, binds.  The stream kernel decodes
    # host-precomputed items with 2 SMEM loads; `packed` variants time the
    # layout-space call (no (C, 8) unpack gather, no r2 scatter).
    # Round-3 sweep #5: stream kernel with nbuf-deep DMA pipelining.
    # Sweep #4 fits a DMA-LATENCY-bound model: per-chunk compute at t=128
    # (~0.4 us) sits below the ~1 us issue+completion latency that double
    # buffering can't hide; all shapes landed within 10% because chunk
    # count x latency dominated.  nbuf > 2 keeps several fetches in
    # flight; if it works, smaller tiles (whose PAIR volume is what
    # shrinks) finally pay off.
    configs = [
        ("1d_t512_wc1024_W16k", dict(tile=512, wchunk=1024, work_cap=16384)),
        ("tile1d_t128_ch1024", dict(cls=T, tile=128, chunk=1024,
                                    bucket2d=False, **b1)),
        ("str1d_t128_ch1024_n4", dict(cls=S, tile=128, chunk=1024, nbuf=4,
                                      work_cap=65536, bucket2d=False, **b1)),
        ("str1d_t128_ch1024_n8", dict(cls=S, tile=128, chunk=1024, nbuf=8,
                                      work_cap=65536, bucket2d=False, **b1)),
        ("str1d_t128_ch512_n8", dict(cls=S, tile=128, chunk=512, nbuf=8,
                                     work_cap=98304, bucket2d=False, **b1)),
        ("str2d_t64_ch1024_n8_merge", dict(cls=S, tile=64, chunk=1024,
                                           nbuf=8, work_cap=65536,
                                           **bounds)),
        ("str1d_t128_ch1024_n8_packed", dict(cls=S, tile=128, chunk=1024,
                                             nbuf=8, work_cap=65536,
                                             bucket2d=False, packed=True,
                                             **b1)),
        ("tile1d_t512_ch1024_packed", dict(cls=T, tile=512, chunk=1024,
                                           bucket2d=False, packed=True,
                                           **b1)),
    ]
    # Round-5 anchor: the bench default (tile-loop 1-D t128 ch1024, packed
    # layout-space call) — what the z-tile variants must beat.
    configs.append(("tile1d_t128_ch1024_packed",
                    dict(cls=T, tile=128, chunk=1024, bucket2d=False,
                         packed=True, **b1)))
    # Round-5 sweep #7: coarse-z two-level banding (PallasDepositZTile) —
    # scale-separated z-buckets inside each 2r x-band; attacks the
    # dense-slab floor (1/3 of points in one x-slab -> y-windows fetch
    # every z).  All timed as packed (layout-space) calls like the bench.
    Z = PallasDepositZTile
    zb = dict(x_lo=-4.0, x_hi=104.0, z_lo=-4.0, z_hi=184.0)
    for zc in (11.3, 16.0, 22.6, 32.0, 45.0):
        for t_, ch in ((128, 1024), (128, 512), (256, 1024), (64, 512)):
            configs.append((
                f"ztile_zc{zc}_t{t_}_ch{ch}_packed",
                dict(cls=Z, tile=t_, chunk=ch, z_coarse=zc, packed=True,
                     **zb)))
    # Round-5 sweep #8 (post-#7 reading): at ch1024 the per-window chunk
    # CEILING (6 windows x >= 1 chunk) eats the z-cut's pair-volume win,
    # and at t128 the anchor is fetch-bound while t256 is pair-bound.
    # Probe the two remaining directions: bigger chunks on the 1-D anchor
    # (halve the ~0.5us DMA issues; +ceiling pairs are VPU-cheap), and the
    # z-variant at shapes that amortise its window count.
    for name, kw in [
        ("tile1d_t128_ch2048_packed", dict(cls=T, tile=128, chunk=2048,
                                           bucket2d=False, packed=True,
                                           **b1)),
        ("tile1d_t256_ch2048_packed", dict(cls=T, tile=256, chunk=2048,
                                           bucket2d=False, packed=True,
                                           **b1)),
        ("tile1d_t128_ch1536_packed", dict(cls=T, tile=128, chunk=1536,
                                           bucket2d=False, packed=True,
                                           **b1)),
        ("ztile_zc8.0_t128_ch1024_packed",
         dict(cls=Z, tile=128, chunk=1024, z_coarse=8.0, packed=True, **zb)),
        ("ztile_zc11.3_t256_ch2048_packed",
         dict(cls=Z, tile=256, chunk=2048, z_coarse=11.3, packed=True,
              **zb)),
        ("ztile_zc11.3_t384_ch1024_packed",
         dict(cls=Z, tile=384, chunk=1024, z_coarse=11.3, packed=True,
              **zb)),
        ("tile1d_t512_ch2048_packed", dict(cls=T, tile=512, chunk=2048,
                                           bucket2d=False, packed=True,
                                           **b1)),
    ]:
        configs.append((name, kw))
    sel = os.environ.get("RT3_SWEEP")
    if sel:
        keep = {int(i) for i in sel.split(",")}
        configs = [c for i, c in enumerate(configs) if i in keep]

    print(f"# D={D} C={C} backend={jax.default_backend()}", file=sys.stderr,
          flush=True)
    for name, kw in configs:
        kw = dict(kw)
        cls = kw.pop("cls", PallasDeposit)
        packed = kw.pop("packed", False)
        depo = cls(interpret=jax.default_backend() != "tpu", **kw)
        try:
            prep = jax.jit(depo.prepare)(hp)
            jax.block_until_ready(prep)
            if packed:
                r2_pad, _ = jax.jit(depo.pack_state)(hp, prep)
                call = jax.jit(lambda h, d, p=prep, r=r2_pad, f=depo:
                               f.packed_call(r, d, p))
            else:
                call = jax.jit(lambda h, d, p=prep, f=depo: f(h, d, prep=p))
            out = call(hp, dep)
            _sync(out)
            t0 = time.perf_counter()
            _sync(out)
            rtt = time.perf_counter() - t0
            t0 = time.perf_counter()
            n_rep = 8
            for _ in range(n_rep):
                out = call(hp, dep)
            _sync(out)
            dt = (time.perf_counter() - t0 - rtt) / n_rep
            ovf = int(jax.device_get(out[2]))
            nb = depo.n_buckets
            n_tiles = depo._c_pad(C) // depo.tile
            rec = {"cfg": name, "ms": round(dt * 1e3, 2),
                   "overflow": ovf, "n_tiles": n_tiles, "n_buckets": nb}
            if hasattr(depo, "work_items"):
                rec["items"] = int(jax.device_get(jax.jit(
                    lambda h, d, p=prep, f=depo: f.work_items(h, d, prep=p)
                )(hp, dep)))
            print(json.dumps(rec), flush=True)
        except Exception as e:
            print(json.dumps({"cfg": name, "error": str(e)[-6000:]}),
                  flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
