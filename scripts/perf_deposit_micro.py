#!/usr/bin/env python
"""Microbench the deposit pipeline stages at bench shapes.

The deposit op per photon round is: compact (nonzero+gather) -> key argsort
-> row gather/transpose -> searchsorted work list -> Pallas pair kernel ->
un-permute scatter.  This times each stage alone (jitted, 1 warmup + N timed)
to show which dominates; all shapes mirror bench.py's teapot512 workload.
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
    """Force completion: on the remote-TPU tunnel, block_until_ready can ack
    before execution finishes; a real device->host transfer cannot."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def timed(name, fn, *args, n=8):
    fn = jax.jit(fn)
    out = fn(*args)
    _sync(out)
    # One transfer outside the loop calibrates the fetch round-trip.
    t0 = time.perf_counter()
    _sync(out)
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0 - rtt) / n
    print(json.dumps({"stage": name, "ms": round(dt * 1e3, 2),
                      "fetch_rtt_ms": round(rtt * 1e3, 2)}), flush=True)
    return out


def main() -> int:
    cache_dir = os.path.join(REPO, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from raytrace3_tpu.core.types import Deposits, make_hitpoints
    from raytrace3_tpu.ops.deposit_pallas import PallasDeposit
    from raytrace3_tpu.render.photon import compact_deposits

    segs, N = 14, 131072
    D = segs * N                      # raw deposit records per round
    Dc = int(D * 0.9)                 # compacted
    C = int(512 * 512 * 1.3)          # hit-point capacity

    key = jax.random.key(0)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    # Synthetic but realistically distributed inputs (scene box ~[0,100]^3).
    dep = Deposits(
        pos=jax.random.uniform(k1, (D, 3), jnp.float32, 0.0, 100.0),
        n=jax.random.normal(k2, (D, 3), jnp.float32),
        flux=jax.random.uniform(k3, (D, 3), jnp.float32),
        valid=jax.random.uniform(k4, (D,)) < 0.8,
    )
    hp = make_hitpoints(C, 2.0, jnp.float32)
    hp = hp.replace(
        pos=jax.random.uniform(k5, (C, 3), jnp.float32, 0.0, 100.0),
        valid=jnp.ones((C,), bool),
    )

    print(f"# D={D} Dc={Dc} C={C} backend={jax.default_backend()}",
          file=sys.stderr, flush=True)

    # Stage 1: compaction (nonzero + gather).
    depc = timed("compact_nonzero_gather",
                 lambda d: compact_deposits(d, Dc), dep)

    # Stage 2: key argsort alone (f32 keys like deposit_pallas builds).
    kx = jnp.floor(depc.pos[:, 0] / 2.83).astype(jnp.int32)
    keys = kx.astype(jnp.float32) * 4096.0 + depc.pos[:, 1]
    timed("argsort_keys", lambda a: jnp.argsort(a), keys)

    # Stage 3: row gather by permutation + pack/transpose to (16, Dc).
    d_ord = jnp.argsort(keys)

    def pack(dp, order):
        rows = jnp.concatenate(
            [dp.pos[order], dp.n[order], dp.flux[order],
             jnp.zeros((Dc, 7), jnp.float32)], axis=1)
        return jnp.zeros((16, Dc), jnp.float32).at[:, :].set(rows.T)

    timed("row_gather_transpose", pack, depc, d_ord)

    # Stage 4: full PallasDeposit call (everything incl. kernel).
    depo = PallasDeposit(tile=512, wchunk=1024, work_cap=16384,
                         interpret=jax.default_backend() != "tpu")
    prep = jax.jit(depo.prepare)(hp)
    jax.block_until_ready(prep)
    timed("pallas_deposit_full", lambda h, d: depo(h, d, prep=prep), hp, depc)

    # Stage 5: prepare itself (once per pass, amortised over rounds).
    timed("prepare_once_per_pass", depo.prepare, hp, n=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
