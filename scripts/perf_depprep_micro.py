#!/usr/bin/env python
"""A/B the deposit-side per-round prep: sort + row permute alternatives.

The round-2 profile shows the sorted-row permute gather (rows_all[d_ord],
a (D, 16) f32 gather by a 1.8M-lane permutation) costs ~11 ms/round
(181 ms/pass) — the second biggest deposit-chain item after the kernel.
Candidates measured here, at bench shapes, on the TPU:

  a) sort_key_val + (D, 16) row gather          (round-2 current)
  b) sort_key_val + (D, 12) row gather          (narrower rows)
  c) sort_key_val + (D, 8) row gather           (lower bound for row width)
  d) variadic lax.sort: key + 9 payload columns (no gather at all)
  e) variadic lax.sort: key + 12 payload columns
  f) sort_key_val + gather via take_along_axis on (D, 16)

Usage: python scripts/perf_depprep_micro.py
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


def _sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def main() -> int:
    cache_dir = os.path.join(REPO, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    D = 14 * 131072
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 1 << 20, D).astype(np.int32))
    cols = jnp.asarray(rng.normal(size=(D, 16)).astype(np.float32))

    def a_rowgather16(k, c):
        ks, ordr = jax.lax.sort_key_val(k, jnp.arange(D, dtype=jnp.int32))
        return ks, c[ordr]

    def b_rowgather12(k, c):
        ks, ordr = jax.lax.sort_key_val(k, jnp.arange(D, dtype=jnp.int32))
        return ks, c[:, :12][ordr]

    def c_rowgather8(k, c):
        ks, ordr = jax.lax.sort_key_val(k, jnp.arange(D, dtype=jnp.int32))
        return ks, c[:, :8][ordr]

    def d_varsort9(k, c):
        ops = (k,) + tuple(c[:, i] for i in range(9))
        out = jax.lax.sort(ops, num_keys=1)
        return out[0], jnp.stack(out[1:], axis=1)

    def e_varsort12(k, c):
        ops = (k,) + tuple(c[:, i] for i in range(12))
        out = jax.lax.sort(ops, num_keys=1)
        return out[0], jnp.stack(out[1:], axis=1)

    def f_take_along(k, c):
        ks, ordr = jax.lax.sort_key_val(k, jnp.arange(D, dtype=jnp.int32))
        return ks, jnp.take_along_axis(c, ordr[:, None], axis=0)

    cands = [("a_rowgather16", a_rowgather16), ("b_rowgather12", b_rowgather12),
             ("c_rowgather8", c_rowgather8), ("d_varsort9", d_varsort9),
             ("e_varsort12", e_varsort12), ("f_take_along", f_take_along)]
    print(f"# D={D} backend={jax.default_backend()}", file=sys.stderr,
          flush=True)
    for name, fn in cands:
        try:
            call = jax.jit(fn)
            out = call(key, cols)
            _sync(out)
            t0 = time.perf_counter()
            _sync(out)
            rtt = time.perf_counter() - t0
            n = 16
            t0 = time.perf_counter()
            for _ in range(n):
                out = call(key, cols)
            _sync(out)
            dt = (time.perf_counter() - t0 - rtt) / n
            print(json.dumps({"cand": name, "ms": round(dt * 1e3, 3)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"cand": name, "error": str(e)[:160]}),
                  flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
