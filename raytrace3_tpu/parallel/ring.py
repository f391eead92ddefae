"""Hit-point-sharded photon rounds with a ring exchange of deposits.

SURVEY.md section 2 parallel axis #3: "Hit-point sharding for large
canvases: shard hit points, all-gather/permute photons past shards
(ring-style exchange over ICI) — the renderer's analogue of ring attention;
needed only at 1024x1024+ with splitting (hitpoints > pixels)."

Memory layout vs parallel/shard.py: there the hit-point state is REPLICATED
in each pass group (fine up to ~10^6 hit points); here each device owns only
C/n hit points and the per-round DEPOSIT BATCH rotates around the ring via
``jax.lax.ppermute`` — n-1 hops overlap compute (the local deposit op) with
ICI transfers exactly like ring attention overlaps KV block transfer with
attention compute.  No psum of (C,)-sized tensors is needed at all: each
shard's (d_nphot, d_tao) increments are complete after the full rotation.

All collectives are XLA-inserted; determinism: the accumulation order over
ring steps is fixed by the rotation schedule, so results are bitwise
reproducible for a given mesh size.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.types import Deposits, HitPoints
from ..geometry.scene import Scene
from ..render.deposit import deposit_bruteforce
from ..render.eye import MAX_DEPTH
from ..render.light import emit_photons
from ..render.photon import compact_deposits, photon_trace
from ..render.sppm import ppm_update


def photon_rounds_ring(
    scene: Scene,
    key: jax.Array,
    hp_local: HitPoints,
    n_rounds: int,
    local_photons: int,
    axis_name: str,
    max_depth: int = MAX_DEPTH,
    update_mode: str = "sppm",
    deposit_fn=deposit_bruteforce,
    newton_fn=None,
    deposit_compact_frac: float = 1.0,
) -> HitPoints:
    """Photon rounds over hit-point shards (call inside shard_map).

    Args:
      hp_local: this device's hit-point shard (C/n records).
      local_photons: photons traced per device per round.
      axis_name: the mesh axis the hit points are sharded over.
    Returns (updated LOCAL hit-point shard, local drop/overflow count).
    """
    n = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    returns_aux = getattr(deposit_fn, "returns_aux", False)

    # Backends with a prepare() hook (ops/deposit_pallas.py) amortise the
    # hit-point layout across all rounds x ring hops of the pass.
    dep_call = deposit_fn
    if hasattr(deposit_fn, "prepare"):
        dep_call = partial(deposit_fn, prep=deposit_fn.prepare(hp_local))

    def round_body(carry, k):
        hp, drops = carry
        ke, kt = jax.random.split(jax.random.fold_in(k, me))
        org, dir, flux = emit_photons(
            ke, scene.light_pos, scene.light_color, local_photons
        )
        dep = photon_trace(scene, kt, org, dir, flux, max_depth,
                           newton_fn=newton_fn)
        if deposit_compact_frac < 1.0:
            cap = int(dep.valid.shape[0] * deposit_compact_frac)
            dep = compact_deposits(dep, max(cap, 128))

        def ring_step(carry, _):
            dep, d_n, d_tao, ovf = carry
            out = dep_call(hp, dep)                    # local compute ...
            dn_i, dt_i = out[0], out[1]
            if returns_aux:
                ovf = ovf + out[2]
            dep = jax.tree.map(
                lambda x: jax.lax.ppermute(x, axis_name, perm), dep
            )                                          # ... overlaps the hop
            return (dep, d_n + dn_i, d_tao + dt_i, ovf), None

        init = (
            dep,
            jnp.zeros(hp.capacity, dep.pos.dtype),
            jnp.zeros((hp.capacity, 3), dep.pos.dtype),
            jnp.zeros((), jnp.int32),
        )
        (dep, d_n, d_tao, ovf), _ = jax.lax.scan(
            ring_step, init, None, length=n
        )
        return (ppm_update(hp, d_n, d_tao, update_mode), drops + ovf), None

    keys = jax.random.split(key, n_rounds)
    (hp_local, drops), _ = jax.lax.scan(
        round_body, (hp_local, jnp.zeros((), jnp.int32)), keys
    )
    return hp_local, drops
