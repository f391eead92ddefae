"""Pallas TPU deposit kernel: exact banded flux accumulation, hot kernel #2.

Replaces the reference's per-photon FLANN kd-tree radius query
(raytracer/Raytracer.h:92-98, 137-159, 370-381).  It superseded two earlier
pure-XLA banded backends (ops/banded.py, ops/banded2.py, removed in round 2
— see git history) whose (tile x window) pair intermediates round-tripped
through HBM and whose fixed window had to be sized for the WORST tile
(caustic hot spots), wasting ~10x work on average tiles.  The backend
hierarchy is now: ``render/deposit.py`` bruteforce (the O(C x D) MXU oracle,
always exact), ``ops/grid.py`` (sorted uniform grid, large-canvas default),
and this kernel (fastest measured on the v5e).

Layout (banded keys):
  * key = bucket_id * Y_STRIDE + quantized(y), with bucket width 2r along
    the x axis (``bucket2d=False``) or along BOTH x and z (``bucket2d=True``
    — bucket_id = kx * n_bz + kz).  Keys are int32 with y quantized to 1/8
    unit and CONSERVATIVE floor/ceil window bounds, so no fp key-resolution
    margin is needed and exactness is preserved (windows are supersets; the
    in-kernel d2/r2/normal test is the true filter);
  * hit points live in a BUCKET-ALIGNED, tile-padded layout so every tile of
    ``tile`` consecutive slots belongs to exactly one bucket — this layout
    depends only on positions and is built ONCE PER PASS (``prepare``), not
    per photon round;
  * a tile's neighbours lie in the 3 (1D) or 9 (2D) adjacent buckets within
    the tile's y-range +/- r: K EXACT deposit-lane intervals per tile, found
    by searchsorted against this round's sorted deposit keys.  2D bucketing
    shrinks the candidate volume by ~the z-extent / 2r ratio (the 1D window
    spans ALL z); z-boundary bucket wraparound only ever ADDS candidates
    (killed by the exact distance test), never drops one.

Work list: each tile's intervals are block-aligned (``wchunk`` lanes),
disjoint-ified at block granularity, and flattened into a single work array
of (tile, deposit-block) items — the Pallas grid.  Exactness needs NO lane
masks: disjoint blocks prevent double counting, and any non-neighbour lane
inside a fetched block fails the exact distance test (adjacent-bucket
separation >= 2r > r; invalid/padding lanes carry positions of 1e9 and
r2 = -1).  Per grid step the kernel accumulates a (tile, wchunk) pair test
into a VMEM scratch accumulator; only (tile, 8)-sized results ever reach HBM.

Pair math is the exact elementwise |h-d|^2 (see render/deposit.py
``pair_d2_ndot`` — the bf16-matmul identity is numerically unusable on TPU).

Cost: O(true candidate volume) VPU work + one deposit argsort per round.
"""

from __future__ import annotations

import functools
import math

import flax.struct
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import Deposits, HitPoints
from ..render.deposit import NORMAL_DOT_MIN

#: Reference fixed search radius^2 = 2.0 (Raytracer.h:85).
SEARCH_R = math.sqrt(2.0)
#: Static scene bounds along the bucket axes (reference scene fits easily).
DEFAULT_X_LO = -40.0
DEFAULT_X_HI = 200.0
DEFAULT_Z_LO = -40.0
DEFAULT_Z_HI = 200.0

#: Sentinel position for invalid/padding deposit lanes (fails any d2 test).
FAR = 1e9
#: Sort-key y quantisation: 1/8 scene unit over [y_lo, y_hi) (constructor
#: params; these are the reference-scene defaults).  int32 keys with
#: floor/ceil window bounds are exactly conservative — no fp margin.
Y_LO = -40.0
Y_HI = 240.0
YQ = 8.0


@flax.struct.dataclass
class HpLayout:
    """Round-invariant hit-point side of the banded deposit (one per pass)."""

    packed: jnp.ndarray    # (c_pad, 8): pos xyz, n xyz, r2 slot, unused
    g: jnp.ndarray         # (C,) layout slot of hit point i (dest o h_ord^-1)
    lo_keys: jnp.ndarray   # (n_tiles, K) window lower keys, K = len(win_offs)
    hi_keys: jnp.ndarray   # (n_tiles, K) window upper keys


def _deposit_kernel(wt_ref, wb_ref, wc_ref, hp_ref, dep_ref, out_ref,
                    acc_ref, *, n_steps: int):
    s = pl.program_id(0)
    tile = wt_ref[s]
    prev = wt_ref[jnp.maximum(s - 1, 0)]
    nxt = wt_ref[jnp.minimum(s + 1, n_steps - 1)]
    is_first = (s == 0) | (tile != prev)
    is_last = (s == n_steps - 1) | (tile != nxt)

    @pl.when(is_first)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(wc_ref[s] == 1)
    def _():
        hp = hp_ref[...]                                   # (t, 8)
        dep = dep_ref[...]                                 # (16, wchunk)
        dx = hp[:, 0:1] - dep[0:1, :]
        dy = hp[:, 1:2] - dep[1:2, :]
        dz = hp[:, 2:3] - dep[2:3, :]
        d2 = dx * dx + dy * dy + dz * dz                   # (t, wchunk)
        ndot = (hp[:, 3:4] * dep[3:4, :]
                + hp[:, 4:5] * dep[4:5, :]
                + hp[:, 5:6] * dep[5:6, :])
        m = ((d2 <= hp[:, 6:7]) & (ndot > NORMAL_DOT_MIN)).astype(jnp.float32)
        acc_ref[:, 0:1] += jnp.sum(m, axis=1, keepdims=True)
        acc_ref[:, 1:2] += jnp.sum(m * dep[6:7, :], axis=1, keepdims=True)
        acc_ref[:, 2:3] += jnp.sum(m * dep[7:8, :], axis=1, keepdims=True)
        acc_ref[:, 3:4] += jnp.sum(m * dep[8:9, :], axis=1, keepdims=True)

    @pl.when(is_last)
    def _():
        out_ref[...] = acc_ref[...]


class PallasDeposit:
    """deposit_fn(hp, dep) -> (d_nphot, d_tao, overflow), Pallas-backed.

    ``prepare(hp)`` builds the round-invariant hit-point layout; pass its
    result back via ``prep=`` from inside the rounds loop to amortise the
    hit-point sort/scatter across all photon rounds of a pass.

    ``work_cap`` bounds the per-call work list (tiles + deposit blocks);
    overflowing chunks are dropped (lost flux) — size it ~2x the expected
    candidate volume / wchunk.  The third return value is UNCONDITIONAL: an
    int32 upper bound on candidate deposit lanes skipped by the cap (0 =
    exact); ``photon_rounds`` folds it into the ``deposits_dropped`` stat so
    a mis-sized cap is never silent in any entry point.
    ``interpret=True`` for CPU tests.
    """

    #: calls return (d_nphot, d_tao, overflow) — see class doc.
    returns_aux = True

    def __init__(self, tile: int = 512, wchunk: int = 1024,
                 work_cap: int = 8192, axes=(0, 1),
                 search_r: float = SEARCH_R, x_lo: float = DEFAULT_X_LO,
                 x_hi: float = DEFAULT_X_HI, interpret: bool = False,
                 bucket2d: bool = False, z_axis: int = 2,
                 z_lo: float = DEFAULT_Z_LO, z_hi: float = DEFAULT_Z_HI,
                 y_lo: float = Y_LO, y_hi: float = Y_HI):
        self.tile = tile
        self.wchunk = wchunk
        self.work_cap = work_cap
        self.ax, self.ay = axes
        self.search_r = search_r
        self.bucket = 2.0 * search_r
        self.x_lo = x_lo
        self.n_bx = int(math.ceil((x_hi - x_lo) / self.bucket)) + 1
        self.bucket2d = bucket2d
        self.az = z_axis
        self.z_lo = z_lo
        self.n_bz = (int(math.ceil((z_hi - z_lo) / self.bucket)) + 1
                     if bucket2d else 1)
        self.n_buckets = self.n_bx * self.n_bz
        # y sort-axis quantisation (constructor params since round 3 — the
        # hard-coded module constants were a latent footgun for other scenes).
        self.y_lo = y_lo
        self.y_range = int(math.ceil((y_hi - y_lo) * YQ))
        self.y_stride = self.y_range + 2
        # Window bucket-id offsets, ascending (key order): 1D = the x
        # neighbours; 2D = the 3x3 (x, z) neighbourhood.  A kz at the z
        # boundary wraps into a real (kx+-1, *) bucket — that only ADDS
        # candidate lanes (the exact d2 test rejects them), never drops one.
        if bucket2d:
            self.win_offs = [dx * self.n_bz + dz
                             for dx in (-1, 0, 1) for dz in (-1, 0, 1)]
        else:
            self.win_offs = [-1, 0, 1]
        # Lower/upper bucket offsets per window: equal here (each window is
        # one bucket's y-range); PallasDepositLane merges z-triplets by
        # giving lo/hi DIFFERENT offsets.
        self.win_offs_lo = self.win_offs
        self.win_offs_hi = self.win_offs
        self.interpret = interpret

    # -- helpers -----------------------------------------------------------
    def _bid(self, pos):
        """Combined bucket id per row of ``pos``."""
        kx = jnp.clip(
            jnp.floor((pos[:, self.ax] - self.x_lo) / self.bucket)
            .astype(jnp.int32),
            0, self.n_bx - 1,
        )
        if not self.bucket2d:
            return kx
        kz = jnp.clip(
            jnp.floor((pos[:, self.az] - self.z_lo) / self.bucket)
            .astype(jnp.int32),
            0, self.n_bz - 1,
        )
        return kx * self.n_bz + kz

    def _yq(self, y):
        """Quantized sort coordinate (floor -> conservative with ceil hi)."""
        return jnp.clip(jnp.floor((y - self.y_lo) * YQ).astype(jnp.int32),
                        0, self.y_range - 1)

    def _c_pad(self, C: int) -> int:
        t = self.tile
        return ((C + t - 1) // t) * t + (self.n_buckets + 1) * t

    def _build_windows(self, packed, tv, kb, ylo_q, yhi_q):
        """Per-tile (lo_keys, hi_keys), each (n_tiles, K): the deposit-key
        windows whose union covers every possible neighbour.  Base form:
        static bucket-id offsets around the tile's own bucket."""
        offs_lo = jnp.asarray(self.win_offs_lo, jnp.int32)
        offs_hi = jnp.asarray(self.win_offs_hi, jnp.int32)
        lo_keys = ((kb[:, None] + offs_lo[None, :]) * self.y_stride
                   + ylo_q[:, None])
        hi_keys = ((kb[:, None] + offs_hi[None, :]) * self.y_stride
                   + yhi_q[:, None])
        return lo_keys, hi_keys

    def _sentinel_key(self) -> int:
        """Key for invalid deposit lanes: beyond every window, including
        windows of the sentinel hit-point bucket and wrapped neighbours."""
        return (self.n_buckets + self.n_bz + 2) * self.y_stride

    # -- once per pass -----------------------------------------------------
    def prepare(self, hp: HitPoints) -> HpLayout:
        t = self.tile
        C = hp.capacity
        nb = self.n_buckets
        hkx = jnp.where(hp.valid, self._bid(hp.pos), nb)
        hkey = hkx * self.y_stride + jnp.where(
            hp.valid, self._yq(hp.pos[:, self.ay]), 0
        )
        # one variadic sort: permutation + bucket ids, no re-gather
        _, h_ord, kx_sorted = jax.lax.sort(
            (hkey, jnp.arange(C, dtype=jnp.int32), hkx), num_keys=1
        )

        counts = jnp.bincount(kx_sorted, length=nb + 1)
        padded = ((counts + t - 1) // t) * t
        offsets = jnp.concatenate(
            [jnp.zeros((1,), padded.dtype), jnp.cumsum(padded)[:-1]]
        )
        # Rank within the bucket run: first_idx[i] = index of the first
        # element sharing kx_sorted[i].  A cummax over run starts is O(C)
        # elementwise; searchsorted(kx_sorted, kx_sorted) here profiled at
        # 46 ms/pass (binary search = log2(C) serialized gathers).
        i_arange = jnp.arange(C, dtype=jnp.int32)
        is_start = jnp.concatenate(
            [jnp.ones((1,), bool), kx_sorted[1:] != kx_sorted[:-1]]
        )
        first_idx = jax.lax.cummax(jnp.where(is_start, i_arange, 0))
        dest = offsets[kx_sorted] + (i_arange - first_idx)

        c_pad = self._c_pad(C)
        packed = jnp.full((c_pad, 8), FAR, jnp.float32)
        rows = jnp.concatenate(
            [hp.pos, hp.n,
             jnp.full((C, 1), -1.0), jnp.zeros((C, 1))], axis=1,
        )
        # dest is ascending and unique by construction (bucket offsets +
        # within-bucket ranks) — the hints keep the TPU scatter parallel.
        packed = packed.at[dest].set(rows[h_ord], unique_indices=True,
                                     indices_are_sorted=True)
        # normals of padding slots don't matter (r2 = -1 kills the test) but
        # keep them finite:
        packed = packed.at[:, 3:6].set(
            jnp.where(packed[:, 3:6] >= FAR, 0.0, packed[:, 3:6])
        )

        n_tiles = c_pad // t
        slot_kx = jnp.zeros((c_pad,), jnp.int32).at[dest].set(
            kx_sorted, mode="drop", unique_indices=True,
            indices_are_sorted=True,
        )
        kb = jnp.max(slot_kx.reshape(n_tiles, t), axis=1)

        tv = jnp.zeros((c_pad,), bool).at[dest].set(
            hp.valid[h_ord], mode="drop", unique_indices=True,
            indices_are_sorted=True,
        ).reshape(n_tiles, t)
        ty = packed[:, self.ay].reshape(n_tiles, t)
        y_lo = jnp.where(tv, ty, jnp.inf).min(1) - self.search_r
        y_hi = jnp.where(tv, ty, -jnp.inf).max(1) + self.search_r
        dead1 = ~jnp.isfinite(y_lo)
        # Conservative quantized window bounds: floor for lo, ceil for hi.
        # The lo clip tops out at y_range - 1 to MATCH _yq's clip — clipping
        # to y_range made a window whose y_lo lands above y_hi empty while
        # deposits up there still quantise to y_range - 1 (ADVICE round 2:
        # the one edge where "windows are supersets" broke).
        ylo_q = jnp.clip(jnp.floor((y_lo - self.y_lo) * YQ), -1e9,
                         self.y_range - 1).astype(jnp.int32)
        yhi_q = jnp.clip(jnp.ceil((y_hi - self.y_lo) * YQ), -1e9,
                         self.y_range).astype(jnp.int32)

        lo_keys, hi_keys = self._build_windows(packed, tv, kb, ylo_q, yhi_q)
        big = self._sentinel_key() + self.y_stride
        lo_keys = jnp.where(dead1[:, None], big, lo_keys)
        hi_keys = jnp.where(dead1[:, None], big, hi_keys)
        # hp-id -> layout slot, so per-round r2 refresh and result unpacking
        # are ONE scatter / ONE gather instead of permutation chains.
        g = jnp.zeros((C,), dest.dtype).at[h_ord].set(
            dest, unique_indices=True
        )
        return HpLayout(packed=packed, g=g, lo_keys=lo_keys, hi_keys=hi_keys)

    def _dep_sorted(self, dep: Deposits, granularity: int,
                    with_order: bool = False):
        """Sort + pack the round's deposits: (dkeys, d_ord, dep_packed, Dp).

        ``dep_packed`` is (16, Dp) with Dp a multiple of ``granularity``;
        rows: pos xyz (FAR for invalid), n xyz, flux rgb, zeros.

        Default path: ONE variadic ``lax.sort`` carrying the key plus all 9
        payload columns — measured 10.9 ms/round at bench shapes vs 13.9 for
        sort_key_val + a (D, 16) row-permute gather
        (scripts/perf_depprep_micro.py); ``d_ord`` is None.  Pass
        ``with_order=True`` (the VJP backward needs the permutation to
        unsort d_flux) for the gather path."""
        D = dep.pos.shape[0]
        Dp = ((D + granularity - 1) // granularity) * granularity
        dkey = jnp.where(
            dep.valid,
            self._bid(dep.pos) * self.y_stride
            + self._yq(dep.pos[:, self.ay]),
            self._sentinel_key(),
        )
        okc = dep.valid[:, None]
        pos = jnp.where(okc, dep.pos, FAR)
        flux = jnp.where(okc, dep.flux, 0.0)
        dep_packed = jnp.zeros((16, Dp), jnp.float32).at[0:3, :].set(FAR)
        if not with_order:
            out = jax.lax.sort(
                (dkey,
                 pos[:, 0], pos[:, 1], pos[:, 2],
                 dep.n[:, 0], dep.n[:, 1], dep.n[:, 2],
                 flux[:, 0], flux[:, 1], flux[:, 2]),
                num_keys=1,
            )
            dkeys, d_ord = out[0], None
            rows = jnp.stack(out[1:], axis=0)               # (9, D)
        else:
            dkeys, d_ord = jax.lax.sort_key_val(
                dkey, jnp.arange(D, dtype=jnp.int32)
            )
            # Pack BEFORE permuting: one (D, 16)-row gather instead of
            # three (D, 3) gathers (TPU gathers cost per index).
            rows_all = jnp.concatenate(
                [pos, dep.n, flux, jnp.zeros((D, 7), jnp.float32)], axis=1,
            )                                               # (D, 16)
            rows = rows_all[d_ord].T
        dep_packed = jax.lax.dynamic_update_slice(dep_packed, rows, (0, 0))
        return dkeys, d_ord, dep_packed, Dp

    def _window_lanes(self, prep: HpLayout, dkeys, n_tiles: int):
        """Exact per-(tile, window) lane intervals, disjoint via cascade.

        Returns (s, e) each (n_tiles, K): window k of tile i covers sorted
        deposit lanes [s[i,k], e[i,k]).  Windows are key-ordered so
        cascading each start past the previous end removes overlap without
        dropping any lane."""
        K = len(self.win_offs)
        s_lane = jnp.searchsorted(dkeys, prep.lo_keys.reshape(-1),
                                  side="left").reshape(n_tiles, K)
        e_lane = jnp.searchsorted(dkeys, prep.hi_keys.reshape(-1),
                                  side="right").reshape(n_tiles, K)
        prev_e = jnp.zeros((n_tiles,), s_lane.dtype)
        s_cols, e_cols = [], []
        for k in range(K):
            s_k = jnp.maximum(s_lane[:, k], prev_e)
            e_k = jnp.maximum(e_lane[:, k], s_k)
            s_cols.append(s_k)
            e_cols.append(e_k)
            prev_e = e_k
        return jnp.stack(s_cols, 1), jnp.stack(e_cols, 1)

    # -- layout-space interface (state packed for the whole pass) ----------
    def pack_state(self, hp: HitPoints, prep: HpLayout):
        """Scatter per-pass hit-point state into layout space ONCE.

        Returns (r2_pad, wgt_pad): the rounds loop then runs entirely in
        layout space (``packed_call`` + elementwise PPM updates), unpacking
        once at pass end — the per-round (C, 8) result gather and (C,)
        r2-refresh scatter (both per-index costs) disappear.
        """
        c_pad = self._c_pad(hp.capacity)
        r2_pad = jnp.full((c_pad,), -1.0, jnp.float32).at[prep.g].set(
            jnp.where(hp.valid, hp.r2, -1.0), unique_indices=True,
            mode="drop",
        )
        wgt_pad = jnp.zeros((c_pad, 3), jnp.float32).at[prep.g].set(
            hp.wgt, unique_indices=True, mode="drop",
        )
        return r2_pad, wgt_pad

    def unpack_state(self, prep: HpLayout, *cols):
        """Gather layout-space per-hit-point arrays back to hp order."""
        return tuple(c[prep.g] for c in cols)

    def packed_call(self, r2_pad: jnp.ndarray, dep: Deposits,
                    prep: HpLayout):
        """Layout-space deposit: (cnt_pad, flux_pad, overflow).

        ``flux_pad`` is the raw neighbour-flux sum; the caller applies
        wgt * flux / pi with its layout-space wgt (Raytracer.h:156).
        Invalid/padding slots carry r2 = -1 so the d2 <= r2 test kills
        them — no valid mask is needed in layout space.
        """
        packed = prep.packed.at[:, 6].set(r2_pad)
        return self._kernel_call(packed, dep, prep)

    # -- per round ---------------------------------------------------------
    def __call__(self, hp: HitPoints, dep: Deposits,
                 prep: HpLayout | None = None):
        if prep is None:
            prep = self.prepare(hp)

        # refresh the per-round r2 slot (radius shrink between rounds)
        packed = prep.packed.at[prep.g, 6].set(
            jnp.where(hp.valid, hp.r2, -1.0), unique_indices=True
        )
        cnt_pad, fl_pad, overflow = self._kernel_call(packed, dep, prep)
        res_cnt, res_fl = self.unpack_state(prep, cnt_pad, fl_pad)
        d_tao = hp.wgt * res_fl / jnp.pi                    # Raytracer.h:156
        return res_cnt, d_tao, overflow

    def _kernel_call(self, packed: jnp.ndarray, dep: Deposits,
                     prep: HpLayout):
        """(cnt_pad, flux_pad, overflow) in layout space."""
        t, wc = self.tile, self.wchunk
        c_pad = packed.shape[0]
        n_tiles = c_pad // t
        W = self.work_cap
        assert W >= n_tiles + 1, (
            f"work_cap {W} must exceed the tile count {n_tiles}"
        )

        dkeys, d_ord, dep_packed, Dp = self._dep_sorted(dep, wc)
        n_blocks = Dp // wc

        # ---- exact per-tile lane intervals -> disjoint block intervals ----
        K = len(self.win_offs)
        s_lane = jnp.searchsorted(dkeys, prep.lo_keys.reshape(-1),
                                  side="left").reshape(n_tiles, K)
        e_lane = jnp.searchsorted(dkeys, prep.hi_keys.reshape(-1),
                                  side="right").reshape(n_tiles, K)
        sb = s_lane // wc
        eb = (e_lane + wc - 1) // wc
        sb = jnp.where(e_lane > s_lane, sb, 0)
        eb = jnp.where(e_lane > s_lane, eb, 0)
        # windows are key-ordered (win_offs ascending): disjoint-ify the K
        # block intervals by cascading each start past the previous end
        prev_e = jnp.zeros((n_tiles,), sb.dtype)
        s_cols, n_cols = [], []
        for k in range(K):
            s_k = jnp.maximum(sb[:, k], prev_e)
            e_k = jnp.maximum(eb[:, k], s_k)
            s_cols.append(s_k)
            n_cols.append(e_k - s_k)
            prev_e = e_k
        s_win = jnp.stack(s_cols, 1)                        # (n_tiles, K)
        nc = jnp.maximum(jnp.stack(n_cols, 1), 0)
        nc_tile = nc.sum(1)                                 # (n_tiles,)

        items = jnp.maximum(nc_tile, 1)  # >=1 so every out tile initialises
        cum = jnp.cumsum(items)
        total = cum[-1]

        s_idx = jnp.arange(W)
        wt = jnp.searchsorted(cum, s_idx, side="right")     # (W,)
        wt = jnp.minimum(wt, n_tiles - 1)
        base = cum[wt] - items[wt]
        j = s_idx - base
        # which window of the item's tile does offset j fall in?
        ncc = jnp.cumsum(nc, axis=1)                        # (n_tiles, K)
        ncc_w = ncc[wt]                                     # (W, K)
        w_id = jnp.sum((j[:, None] >= ncc_w).astype(jnp.int32), axis=1)
        w_id = jnp.minimum(w_id, K - 1)
        prev_cnt = jnp.where(
            w_id > 0,
            jnp.take_along_axis(ncc_w, jnp.maximum(w_id - 1, 0)[:, None],
                                axis=1)[:, 0],
            0,
        )
        blk = (jnp.take_along_axis(s_win[wt], w_id[:, None], axis=1)[:, 0]
               + (j - prev_cnt))
        compute = (s_idx < total) & (j < nc_tile[wt])
        blk = jnp.clip(blk, 0, n_blocks - 1)
        # pad items: freeze tile/block at the last real item's values so the
        # trailing steps issue no new DMAs and never flush a wrong out tile
        last = jnp.minimum(total - 1, W - 1)
        wt = jnp.where(s_idx < total, wt, wt[last]).astype(jnp.int32)
        blk = jnp.where(s_idx < total, blk, blk[last]).astype(jnp.int32)
        wcmp = compute.astype(jnp.int32)

        kernel = functools.partial(_deposit_kernel, n_steps=W)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(W,),
            in_specs=[
                pl.BlockSpec((t, 8), lambda s, wt, wb, wcp: (wt[s], 0)),
                pl.BlockSpec((16, wc), lambda s, wt, wb, wcp: (0, wb[s])),
            ],
            out_specs=pl.BlockSpec((t, 8),
                                   lambda s, wt, wb, wcp: (wt[s], 0)),
            scratch_shapes=[pltpu.VMEM((t, 8), jnp.float32)],
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((c_pad, 8), jnp.float32),
            interpret=self.interpret,
        )(wt, blk, wcmp, packed, dep_packed)

        # A tile whose FIRST item index falls beyond the work cap never
        # executes, so its out tile is UNINITIALISED memory — zero those
        # tiles (their skipped flux is already counted in `overflow`;
        # without this, an overflowing 1024^2 run read garbage/NaN counts).
        # jnp.where, not multiply: garbage may be NaN and NaN * 0 = NaN.
        handled = (cum - items) < W                         # (n_tiles,)
        out = jnp.where(handled[:, None, None],
                        out.reshape(n_tiles, t, 8), 0.0).reshape(c_pad, 8)
        # Upper bound on candidate lanes in work items beyond the cap.
        overflow = jnp.maximum(total - W, 0).astype(jnp.int32) * wc
        return out[:, 0], out[:, 1:4], overflow


def _lane_kernel(wt_ref, wf_ref, wa_ref, wb_ref, hp_ref, dep_hbm, out_ref,
                 acc_ref, dbuf, sems, *, n_steps: int, ch: int):
    """Lane-granular deposit step: manual double-buffered HBM->VMEM DMA.

    Work item s: hit-point tile ``wt[s]`` (auto-pipelined BlockSpec) vs the
    deposit lane chunk fetched from ``dep_hbm[:, wf[s]:wf[s]+ch]`` (128-
    aligned start); only lanes with global index in [wa[s], wb[s]) count —
    the mask is what makes lane-granular (not block-aligned) work items
    exact without disjoint block inflation (docs/PERF.md round-2 finding:
    2-D bucketing's ~10x pair-volume cut was unusable at wchunk-block
    granularity).  The deposit side deliberately bypasses the BlockSpec
    pipeline: its block indices are data-dependent AND unaligned, so the
    kernel DMAs exactly the lanes it needs, overlapped one step ahead.
    """
    s = pl.program_id(0)
    tile = wt_ref[s]
    prev = wt_ref[jnp.maximum(s - 1, 0)]
    nxt = wt_ref[jnp.minimum(s + 1, n_steps - 1)]
    is_first = (s == 0) | (tile != prev)
    is_last = (s == n_steps - 1) | (tile != nxt)

    def dma(slot, step):
        # Work-item fetch starts are 128-aligned by construction
        # (_build_items anchors chunk grids at (start // 128) * 128 and
        # Dp is a multiple of chunk); multiple_of carries the proof to
        # Mosaic, which otherwise rejects the dynamic lane-dim slice.
        f = pl.multiple_of(wf_ref[step], 128)
        return pltpu.make_async_copy(
            dep_hbm.at[:, pl.ds(f, ch)], dbuf.at[slot],
            sems.at[slot],
        )

    # Pad items (wa >= wb) issue NO DMA: start (lookahead from the previous
    # step / warm-up) and wait are guarded by the SAME per-item predicate,
    # so semaphore signals and waits always match 1:1.
    @pl.when((s == 0) & (wa_ref[0] < wb_ref[0]))
    def _():
        dma(0, 0).start()

    @pl.when((s + 1 < n_steps) & (wa_ref[jnp.minimum(s + 1, n_steps - 1)]
                                  < wb_ref[jnp.minimum(s + 1, n_steps - 1)]))
    def _():
        dma((s + 1) % 2, s + 1).start()

    @pl.when(is_first)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    slot = s % 2

    @pl.when(wa_ref[s] < wb_ref[s])
    def _():
        dma(slot, s).wait()
        hp = hp_ref[...]                                   # (t, 8)
        dep = dbuf[slot]                                   # (16, ch)
        gidx = wf_ref[s] + jax.lax.broadcasted_iota(jnp.int32, (1, ch), 1)
        lane_ok = (gidx >= wa_ref[s]) & (gidx < wb_ref[s])
        dx = hp[:, 0:1] - dep[0:1, :]
        dy = hp[:, 1:2] - dep[1:2, :]
        dz = hp[:, 2:3] - dep[2:3, :]
        d2 = dx * dx + dy * dy + dz * dz                   # (t, ch)
        ndot = (hp[:, 3:4] * dep[3:4, :]
                + hp[:, 4:5] * dep[4:5, :]
                + hp[:, 5:6] * dep[5:6, :])
        m = ((d2 <= hp[:, 6:7]) & (ndot > NORMAL_DOT_MIN)
             & lane_ok).astype(jnp.float32)
        acc_ref[:, 0:1] += jnp.sum(m, axis=1, keepdims=True)
        acc_ref[:, 1:2] += jnp.sum(m * dep[6:7, :], axis=1, keepdims=True)
        acc_ref[:, 2:3] += jnp.sum(m * dep[7:8, :], axis=1, keepdims=True)
        acc_ref[:, 3:4] += jnp.sum(m * dep[8:9, :], axis=1, keepdims=True)

    @pl.when(is_last)
    def _():
        out_ref[...] = acc_ref[...]


class PallasDepositLane(PallasDeposit):
    """Lane-granular banded deposit: the round-3 successor to the block
    kernel above (the kd-tree deposit loop replacement,
    raytracer/Raytracer.h:137-159).

    Differences from ``PallasDeposit``:
      * work items are ``chunk``-lane spans at 128-lane alignment with an
        EXACT per-item lane mask — no wchunk-block ceiling inflation, so
        2-D (x, z) bucketing's ~10x candidate-volume cut is finally usable;
      * with ``bucket2d`` + ``merge_z`` (default), the 9-window 3x3
        neighbourhood collapses to 3 key-contiguous merged windows
        [key(kx', kz-1, y_lo) .. key(kx', kz+1, y_hi)] — the middle
        bucket's full y-range is the (small) superset price for 3x fewer
        partial chunks; extra lanes die on the exact d2 test as always;
      * the deposit side is fetched by in-kernel double-buffered DMA from
        HBM (``_lane_kernel``), not the BlockSpec pipeline;
      * tiles with no candidate lanes get NO grid step (their out tiles are
        zeroed on the host side) — with 2-D bucketing most padding tiles
        are dead and the old 1-step-per-tile floor dominated.

    Exactness: window supersets + the in-kernel d2/r2/normal test, as
    before; the lane mask replaces block disjointness, and the cascade in
    ``_window_lanes`` keeps multi-window tiles from double counting.
    """

    def __init__(self, tile: int = 256, chunk: int = 512,
                 work_cap: int = 16384, merge_z: bool = True,
                 differentiable: bool = False, **kw):
        kw.setdefault("bucket2d", True)
        super().__init__(tile=tile, wchunk=chunk, work_cap=work_cap, **kw)
        assert chunk % 128 == 0, "chunk must be a multiple of 128 lanes"
        self.chunk = chunk
        self.merge_z = merge_z and self.bucket2d
        #: route calls through the custom VJP (gradients into hp.wgt and
        #: dep.flux via the transposed banded kernel, _lane_bwd_kernel).
        self.differentiable = differentiable
        if self.merge_z:
            # One merged window per dx: lo at (dx, kz-1) with the tile's
            # y_lo, hi at (dx, kz+1) with the tile's y_hi.
            self.win_offs = [dx * self.n_bz for dx in (-1, 0, 1)]
            self.win_offs_lo = [dx * self.n_bz - 1 for dx in (-1, 0, 1)]
            self.win_offs_hi = [dx * self.n_bz + 1 for dx in (-1, 0, 1)]

    def work_items(self, hp: HitPoints, dep: Deposits,
                   prep: HpLayout | None = None):
        """True work-item count for these inputs (for sizing ``work_cap``)."""
        if prep is None:
            prep = self.prepare(hp)
        n_tiles = self._c_pad(hp.capacity) // self.tile
        dkeys, _, _, _ = self._dep_sorted(dep, self.chunk)
        sk, ek = self._window_lanes(prep, dkeys, n_tiles)
        a0 = (sk // 128) * 128
        nch = jnp.where(ek > sk, (ek - a0 + self.chunk - 1) // self.chunk, 0)
        return nch.sum()

    def _build_items(self, sk, ek, n_tiles: int, W: int, Dp: int,
                     align: int):
        """Flatten the (tile, window) lane intervals into W work items.

        Chunks live on an ``align``-aligned grid anchored at each window's
        start; the chunk's LOGICAL lane interval [wa, wb) is what the
        kernel masks to, so alignment slop and chunk-grid overshoot never
        double count or miss a lane.  The forward kernel uses align=128
        (min DMA alignment); the backward uses align=chunk so output
        blocks land on the BlockSpec grid.

        Returns (wt, f, wa, wb, nc_tile, cum, total); pad items beyond
        ``total`` have wa == wb == 0 and frozen tile/fetch.
        """
        ch = self.chunk
        K = sk.shape[1]
        a0 = (sk // align) * align                          # (n_tiles, K)
        nch = jnp.where(ek > sk, (ek - a0 + ch - 1) // ch, 0)
        nc_tile = nch.sum(1)                                # (n_tiles,)
        cum = jnp.cumsum(nc_tile)
        total = cum[-1]

        s_idx = jnp.arange(W)
        wt = jnp.searchsorted(cum, s_idx, side="right")     # (W,)
        wt = jnp.minimum(wt, n_tiles - 1)
        base = cum[wt] - nc_tile[wt]
        j = s_idx - base                                    # chunk within tile
        ncc = jnp.cumsum(nch, axis=1)                       # (n_tiles, K)
        ncc_w = ncc[wt]                                     # (W, K)
        w_id = jnp.sum((j[:, None] >= ncc_w).astype(jnp.int32), axis=1)
        w_id = jnp.minimum(w_id, K - 1)
        jk = j - jnp.where(
            w_id > 0,
            jnp.take_along_axis(ncc_w, jnp.maximum(w_id - 1, 0)[:, None],
                                axis=1)[:, 0],
            0,
        )
        pick = lambda arr: jnp.take_along_axis(
            arr[wt], w_id[:, None], axis=1)[:, 0]
        f = pick(a0) + jk * ch
        wa = jnp.maximum(pick(sk), f)
        wb = jnp.minimum(pick(ek), f + ch)
        # Clamping f into [0, Dp - ch] keeps the DMA in bounds; the mask
        # interval stays within the clamped span (wb <= Dp = f + ch).
        f = jnp.clip(f, 0, Dp - ch)
        live = s_idx < total
        last = jnp.clip(total - 1, 0, W - 1)
        # pad items: freeze tile/fetch at the last real item, empty mask
        wt = jnp.where(live, wt, wt[last]).astype(jnp.int32)
        f = jnp.where(live, f, f[last]).astype(jnp.int32)
        wa = jnp.where(live, wa, 0).astype(jnp.int32)
        wb = jnp.where(live, wb, 0).astype(jnp.int32)
        return wt, f, wa, wb, nc_tile, cum, total

    def __call__(self, hp: HitPoints, dep: Deposits,
                 prep: HpLayout | None = None):
        if self.differentiable:
            if prep is None:
                prep = self.prepare(hp)
            # prepare() only orders/pads by positions (box-kernel: a.e. zero
            # cotangent); stop_gradient skips a useless backward graph.
            return _lane_deposit_diff(
                self, hp, dep, jax.lax.stop_gradient(prep))
        cnt, d_tao, overflow, _ = self._forward_full(hp, dep, prep)
        return cnt, d_tao, overflow

    def _forward_full(self, hp: HitPoints, dep: Deposits,
                      prep: HpLayout | None = None):
        if prep is None:
            prep = self.prepare(hp)
        packed = prep.packed.at[prep.g, 6].set(
            jnp.where(hp.valid, hp.r2, -1.0), unique_indices=True
        )
        cnt_pad, fl_pad, overflow = self._kernel_call(packed, dep, prep)
        cnt, fl = self.unpack_state(prep, cnt_pad, fl_pad)
        d_tao = hp.wgt * fl / jnp.pi                        # Raytracer.h:156
        return cnt, d_tao, overflow, fl

    def _kernel_call(self, packed: jnp.ndarray, dep: Deposits,
                     prep: HpLayout):
        t, ch = self.tile, self.chunk
        c_pad = packed.shape[0]
        n_tiles = c_pad // t
        W = self.work_cap

        dkeys, d_ord, dep_packed, Dp = self._dep_sorted(dep, ch)
        sk, ek = self._window_lanes(prep, dkeys, n_tiles)   # (n_tiles, K)
        wt, f, wa, wb, nc_tile, cum, total = self._build_items(
            sk, ek, n_tiles, W, Dp, align=128)

        kernel = functools.partial(_lane_kernel, n_steps=W, ch=ch)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(W,),
            in_specs=[
                pl.BlockSpec((t, 8), lambda s, wt, wf, wa, wb: (wt[s], 0)),
                pl.BlockSpec(memory_space=pl.ANY),       # (16, Dp) in HBM
            ],
            out_specs=pl.BlockSpec((t, 8),
                                   lambda s, wt, wf, wa, wb: (wt[s], 0)),
            scratch_shapes=[
                pltpu.VMEM((t, 8), jnp.float32),            # accumulator
                pltpu.VMEM((2, 16, ch), jnp.float32),       # DMA buffers
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((c_pad, 8), jnp.float32),
            interpret=self.interpret,
        )(wt, f, wa, wb, packed, dep_packed)

        # Tiles that never got an executed step carry uninitialised memory:
        # dead tiles (no candidates) and tiles whose first item fell beyond
        # the cap.  jnp.where, not multiply (garbage may be NaN).
        handled = (nc_tile > 0) & ((cum - nc_tile) < W)
        out = jnp.where(handled[:, None, None],
                        out.reshape(n_tiles, t, 8), 0.0).reshape(c_pad, 8)
        overflow = jnp.maximum(total - W, 0).astype(jnp.int32) * ch
        return out[:, 0], out[:, 1:4], overflow

    def _backward_flux(self, hp: HitPoints, dep: Deposits, prep: HpLayout,
                       u: jnp.ndarray) -> jnp.ndarray:
        """Transposed banded product: d_flux[j] = sum_i m_ij u_i, (D, 3).

        Same prepared layout and lane intervals as the forward; work items
        are rebuilt chunk-ALIGNED (align=chunk) and sorted by deposit block
        so each output block accumulates over a contiguous run of grid
        steps — the exact mirror of the forward's per-tile accumulation.
        ``u`` is the hit-point-side cotangent row wgt * g_tao / pi.
        """
        t, ch = self.tile, self.chunk
        C = hp.capacity
        c_pad = self._c_pad(C)
        n_tiles = c_pad // t
        K = len(self.win_offs)
        # Chunk-alignment adds at most one chunk per window vs the forward's
        # 128-alignment, so this cap never truncates when the forward's
        # didn't (overflowing calls get a correspondingly truncated grad).
        W = self.work_cap + K * n_tiles

        packed = prep.packed.at[prep.g, 6].set(
            jnp.where(hp.valid, hp.r2, -1.0), unique_indices=True
        )
        D = dep.pos.shape[0]
        dkeys, d_ord, dep_packed, Dp = self._dep_sorted(dep, ch,
                                                        with_order=True)
        n_blocks = Dp // ch
        sk, ek = self._window_lanes(prep, dkeys, n_tiles)
        wt, f, wa, wb, nc_tile, cum, total = self._build_items(
            sk, ek, n_tiles, W, Dp, align=ch)
        # order items by deposit block (pads, wa == wb, sort last)
        fkey = jnp.where(wa < wb, f, jnp.int32(2**30))
        fkey, wt, f, wa, wb = jax.lax.sort(
            (fkey, wt, f, wa, wb), num_keys=1
        )
        live = wa < wb
        last = jnp.clip(total - 1, 0, W - 1)
        f = jnp.where(live, f, f[last]).astype(jnp.int32)
        wt = jnp.where(live, wt, wt[last]).astype(jnp.int32)
        wfb = f // ch

        u_rows = jnp.concatenate(
            [u.astype(jnp.float32), jnp.zeros((C, 5), jnp.float32)], axis=1
        )
        u_packed = jnp.zeros((c_pad, 8), jnp.float32).at[prep.g].set(
            u_rows, mode="drop", unique_indices=True
        )

        kernel = functools.partial(_lane_bwd_kernel, n_steps=W, ch=ch)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(W,),
            in_specs=[
                pl.BlockSpec((t, 8),
                             lambda s, wt, wfb, wa, wb: (wt[s], 0)),
                pl.BlockSpec((t, 8),
                             lambda s, wt, wfb, wa, wb: (wt[s], 0)),
                pl.BlockSpec((16, ch),
                             lambda s, wt, wfb, wa, wb: (0, wfb[s])),
            ],
            out_specs=pl.BlockSpec((8, ch),
                                   lambda s, wt, wfb, wa, wb: (0, wfb[s])),
            scratch_shapes=[pltpu.VMEM((8, ch), jnp.float32)],
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((8, Dp), jnp.float32),
            interpret=self.interpret,
        )(wt, wfb, wa, wb, packed, u_packed, dep_packed)

        covered = jnp.zeros((n_blocks,), bool).at[
            jnp.where(live, wfb, n_blocks)
        ].set(True, mode="drop")
        out = jnp.where(jnp.repeat(covered, ch)[None, :], out, 0.0)
        rows = out[0:3, :].T                                # (Dp, 3)
        return jnp.zeros((D, 3), jnp.float32).at[d_ord].set(rows[:D])


def _tile_loop_kernel(sk_ref, ek_ref, hp_ref, dep_hbm, out_ref,
                      acc_ref, dbuf, sems, *, K: int, ch: int, Dp: int):
    # NB: sk/ek arrive FLATTENED (n_tiles * K,): 2-D SMEM prefetch operands
    # are padded to 512 B per ROW (128 int32 lanes), so (n_tiles, 3) cost
    # n_tiles x 512 B and blew the 1 MB SMEM budget at tile <= 256 (measured:
    # "Used 1.34M of 1.00M smem", u8[704512] per operand at t=256).
    """One grid step per hit-point TILE; a dynamic in-kernel loop walks the
    tile's candidate lane chunks with double-buffered DMA.

    Against the flat work-item grid (``_lane_kernel``) this removes the
    per-chunk Pallas grid-step tax (~0.7 us/step — the dominant kernel cost
    once chunks shrink), the static ``work_cap`` (the chunk count per tile
    is a runtime value, so there is NO overflow/drop path at all), and the
    host-side work-list build (searchsorted flattening, pad freezing).
    The windows' cascaded lane intervals [sk, ek) arrive as scalar-prefetch
    arrays; chunk j of window k covers the 128-aligned grid anchored at
    floor(sk/128)*128, masked to the exact interval as before.
    """
    i = pl.program_id(0)
    s_k = [sk_ref[i * K + k] for k in range(K)]
    e_k = [ek_ref[i * K + k] for k in range(K)]
    a0_k = [(s // 128) * 128 for s in s_k]
    n_k = [jnp.where(e > s, (e - a + ch - 1) // ch, 0)
           for s, e, a in zip(s_k, e_k, a0_k)]
    cum_k = []
    tot = jnp.int32(0)
    for nk in n_k:
        tot = tot + nk
        cum_k.append(tot)

    def chunk_of(j):
        """(fetch addr, mask lo, mask hi) for the tile's j-th chunk."""
        k_id = jnp.int32(0)
        for k in range(1, K):
            k_id = k_id + (j >= cum_k[k - 1]).astype(jnp.int32)
        base = jnp.int32(0)
        a0 = a0_k[0]
        s = s_k[0]
        e = e_k[0]
        for k in range(1, K):
            sel = k_id == k
            base = jnp.where(sel, cum_k[k - 1], base)
            a0 = jnp.where(sel, a0_k[k], a0)
            s = jnp.where(sel, s_k[k], s)
            e = jnp.where(sel, e_k[k], e)
        f = a0 + (j - base) * ch
        wa = jnp.maximum(s, f)
        wb = jnp.minimum(e, f + ch)
        return jnp.clip(f, 0, Dp - ch), wa, wb

    def dma(slot, j):
        f, _, _ = chunk_of(j)
        f = pl.multiple_of(f, 128)
        return pltpu.make_async_copy(
            dep_hbm.at[:, pl.ds(f, ch)], dbuf.at[slot], sems.at[slot],
        )

    acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(tot > 0)
    def _():
        dma(0, 0).start()

        hp = hp_ref[...]                                   # (t, 8)

        def body(j, _):
            slot = j % 2

            @pl.when(j + 1 < tot)
            def _():
                dma((j + 1) % 2, j + 1).start()

            dma(slot, j).wait()
            f, wa, wb = chunk_of(j)
            dep = dbuf[slot]                               # (16, ch)
            gidx = f + jax.lax.broadcasted_iota(jnp.int32, (1, ch), 1)
            lane_ok = (gidx >= wa) & (gidx < wb)
            dx = hp[:, 0:1] - dep[0:1, :]
            dy = hp[:, 1:2] - dep[1:2, :]
            dz = hp[:, 2:3] - dep[2:3, :]
            d2 = dx * dx + dy * dy + dz * dz               # (t, ch)
            ndot = (hp[:, 3:4] * dep[3:4, :]
                    + hp[:, 4:5] * dep[4:5, :]
                    + hp[:, 5:6] * dep[5:6, :])
            m = ((d2 <= hp[:, 6:7]) & (ndot > NORMAL_DOT_MIN)
                 & lane_ok).astype(jnp.float32)
            acc_ref[:, 0:1] += jnp.sum(m, axis=1, keepdims=True)
            acc_ref[:, 1:2] += jnp.sum(m * dep[6:7, :], axis=1,
                                       keepdims=True)
            acc_ref[:, 2:3] += jnp.sum(m * dep[7:8, :], axis=1,
                                       keepdims=True)
            acc_ref[:, 3:4] += jnp.sum(m * dep[8:9, :], axis=1,
                                       keepdims=True)
            return 0

        jax.lax.fori_loop(0, tot, body, 0)

    out_ref[...] = acc_ref[...]


class PallasDepositTile(PallasDepositLane):
    """Tile-loop variant of the lane-granular deposit (round 3 kernel v2).

    Same banding/layout/window machinery as ``PallasDepositLane``; the
    kernel walks each tile's chunks in an in-kernel ``fori_loop`` with
    double-buffered DMA instead of a flat work-item grid.  Consequences:
      * NO work cap and NO overflow: the per-tile chunk count is a runtime
        scalar, so every candidate lane is always visited (the third
        return stays for interface parity and is always 0);
      * grid = n_tiles steps regardless of load — the ~0.7 us/step grid
        tax no longer scales with candidate volume;
      * the backward pass reuses the Lane work-item machinery (a cap
        applies there; it is sized with slack in ``_backward_flux``).
    """

    def _kernel_call(self, packed: jnp.ndarray, dep: Deposits,
                     prep: HpLayout):
        t, ch = self.tile, self.chunk
        c_pad = packed.shape[0]
        n_tiles = c_pad // t
        K = len(self.win_offs)

        dkeys, d_ord, dep_packed, Dp = self._dep_sorted(dep, ch)
        sk, ek = self._window_lanes(prep, dkeys, n_tiles)   # (n_tiles, K)

        kernel = functools.partial(_tile_loop_kernel, K=K, ch=ch, Dp=Dp)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((t, 8), lambda i, sk, ek: (i, 0)),
                pl.BlockSpec(memory_space=pl.ANY),       # (16, Dp) HBM
            ],
            out_specs=pl.BlockSpec((t, 8), lambda i, sk, ek: (i, 0)),
            scratch_shapes=[
                pltpu.VMEM((t, 8), jnp.float32),            # accumulator
                pltpu.VMEM((2, 16, ch), jnp.float32),       # DMA buffers
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((c_pad, 8), jnp.float32),
            interpret=self.interpret,
        )(sk.astype(jnp.int32).reshape(-1),
          ek.astype(jnp.int32).reshape(-1), packed, dep_packed)

        # Every tile gets a grid step and writes its out block (the chunk
        # loop is in-kernel), so no handled-masking and no overflow path.
        return out[:, 0], out[:, 1:4], jnp.zeros((), jnp.int32)


class PallasDepositZTile(PallasDepositTile):
    """Two-level banded tile-loop deposit: COARSE z-buckets inside each
    2r x-band (round-5 kernel; the kd-tree radius-query replacement,
    raytracer/Raytracer.h:137-159).

    Attacks the measured dense-slab floor of 1-D banding (docs/PERF.md
    round 3): the wall planes concentrate ~1/3 of hit points AND deposits
    in single x-slabs, and a y-sorted tile there spans the slab's FULL
    z-extent, so its y-window fetches every z.  Round-3's fix attempt —
    2r-square (x, z) buckets — broke y-locality instead (a 2.83-unit
    bucket holds < 1 tile, so tiles spanned the bucket's whole y-range).

    The resolution is SCALE SEPARATION: z-buckets much COARSER than 2r
    (``z_coarse``, default 8 x 2r ~ 22 units) so each (x-band, z-bucket)
    still holds many tiles and y-sorting inside stays effective, while a
    tile's deposit fetch drops to its own z-bucket's y-window plus (only
    when the tile's z-range +- r crosses a coarse boundary) a neighbour
    z-bucket — cutting the dense-slab candidate volume by ~ z-extent /
    z_coarse instead of 1-D's nothing.

    Sort keys become (kx, kz_coarse, quantized y); hit points are sorted
    and tile-padded per (kx, kz) bucket; per tile the K = 6 window slots
    are 3 dx x {[kz_lo], [kz_lo+1 .. kz_hi]} with the tile's own y-window
    (the second slot is empty when the tile fits one z-bucket; a > 2-bucket
    z-span — rare, only tiles crossing geometry — widens to the full key
    range between, a conservative superset).  Exactness is unchanged:
    windows are supersets and the in-kernel d2/r2/normal test is the true
    filter, exactly as the base class.
    """

    def __init__(self, tile: int = 128, chunk: int = 1024,
                 z_coarse: float = 8.0 * 2.0 * SEARCH_R,
                 z_lo: float = DEFAULT_Z_LO, z_hi: float = DEFAULT_Z_HI,
                 **kw):
        kw["bucket2d"] = False
        super().__init__(tile=tile, chunk=chunk, z_lo=z_lo, z_hi=z_hi, **kw)
        self.z_coarse = float(z_coarse)
        self.n_bzc = int(math.ceil((z_hi - z_lo) / self.z_coarse)) + 1
        self.n_buckets = self.n_bx * self.n_bzc
        # K = 6 window slots (3 dx x 2 z-slots); windows are built per tile
        # in _build_windows — only len(win_offs) is consumed downstream.
        self.win_offs = [0] * 6
        self.win_offs_lo = self.win_offs
        self.win_offs_hi = self.win_offs

    def _bid(self, pos):
        kx = jnp.clip(
            jnp.floor((pos[:, self.ax] - self.x_lo) / self.bucket)
            .astype(jnp.int32),
            0, self.n_bx - 1,
        )
        kz = jnp.clip(
            jnp.floor((pos[:, self.az] - self.z_lo) / self.z_coarse)
            .astype(jnp.int32),
            0, self.n_bzc - 1,
        )
        return kx * self.n_bzc + kz

    def _sentinel_key(self) -> int:
        # Above every window key: hi windows reach at most bucket
        # (n_bx)*n_bzc + n_bzc - 1 = n_buckets + n_bzc - 1.
        return (self.n_buckets + self.n_bzc + 2) * self.y_stride

    def _build_windows(self, packed, tv, kb, ylo_q, yhi_q):
        n_tiles = kb.shape[0]
        t = self.tile
        kx_t = kb // self.n_bzc
        tz = packed[:, self.az].reshape(n_tiles, t)
        z_lo_t = jnp.where(tv, tz, jnp.inf).min(1) - self.search_r
        z_hi_t = jnp.where(tv, tz, -jnp.inf).max(1) + self.search_r
        # inf on dead tiles: clip BEFORE astype (prepare() masks them to
        # the sentinel afterwards via dead1, values here are don't-cares).
        kz_lo = jnp.clip(
            jnp.floor((z_lo_t - self.z_lo) / self.z_coarse),
            0, self.n_bzc - 1).astype(jnp.int32)
        kz_hi = jnp.clip(
            jnp.floor((z_hi_t - self.z_lo) / self.z_coarse),
            0, self.n_bzc - 1).astype(jnp.int32)
        cols_lo, cols_hi = [], []
        for dx in (-1, 0, 1):
            b = (kx_t + dx) * self.n_bzc
            # slot A: the tile's lowest overlapped z-bucket, y-window
            cols_lo.append((b + kz_lo) * self.y_stride + ylo_q)
            cols_hi.append((b + kz_lo) * self.y_stride + yhi_q)
            # slot B: remaining z-buckets [kz_lo+1 .. kz_hi]; when the
            # tile fits one bucket (kz_hi == kz_lo) lo > hi -> empty.
            cols_lo.append((b + kz_lo + 1) * self.y_stride + ylo_q)
            cols_hi.append((b + kz_hi) * self.y_stride + yhi_q)
        return jnp.stack(cols_lo, 1), jnp.stack(cols_hi, 1)


def _stream_kernel(itf_ref, itab_ref, st_ref, en_ref, hp_ref, dep_hbm,
                   out_ref, acc_ref, dbuf, sems, *, ch: int, nbuf: int):
    """Item-stream tile kernel (round 3 kernel v3): one grid step per tile,
    in-kernel double-buffered loop over the tile's PRECOMPUTED work items.

    ``_tile_loop_kernel`` recomputes each chunk's (fetch, mask) from the
    window bounds with ~40 scalar ops (K-way selects + cumulative-count
    search) — at bench shapes the per-chunk scalar overhead, not the pair
    math, bounds the kernel (docs/PERF.md round-3 sweep: all tile/chunk
    shapes land within 10%).  Here the host's ``_build_items`` list is
    passed straight down: per chunk the kernel does TWO SMEM loads + a
    shift/mask decode.  SMEM cost is 2 x work_cap x 4 B (1-D arrays;
    2-D prefetch operands pad each row to 512 B — see _tile_loop_kernel).

    items: itf[j] = 128-aligned fetch address; itab[j] packs the exact
    lane-mask interval as ((wa - f) << 16) | (wb - f).
    """
    i = pl.program_id(0)
    j0 = st_ref[i]
    tot = en_ref[i] - j0

    def item(j):
        f = itf_ref[j]
        ab = itab_ref[j]
        return f, f + (ab >> 16), f + (ab & 0xFFFF)

    def dma(slot, j):
        f = pl.multiple_of(itf_ref[j], 128)
        return pltpu.make_async_copy(
            dep_hbm.at[:, pl.ds(f, ch)], dbuf.at[slot], sems.at[slot],
        )

    acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(tot > 0)
    def _():
        # nbuf-deep pipelining: at small tiles the pair compute per chunk
        # (~0.4 us at t=128, ch=1024) is below the DMA issue+completion
        # latency, so double buffering leaves the kernel latency-bound —
        # keep nbuf-1 fetches in flight instead.
        for k in range(nbuf - 1):
            @pl.when(k < tot)
            def _(k=k):
                dma(k % nbuf, j0 + k).start()

        hp = hp_ref[...]                                   # (t, 8)

        def body(jj, _):
            j = j0 + jj
            slot = jj % nbuf

            @pl.when(jj + nbuf - 1 < tot)
            def _():
                dma((jj + nbuf - 1) % nbuf, j + nbuf - 1).start()

            dma(slot, j).wait()
            f, wa, wb = item(j)
            dep = dbuf[slot]                               # (16, ch)
            gidx = f + jax.lax.broadcasted_iota(jnp.int32, (1, ch), 1)
            lane_ok = (gidx >= wa) & (gidx < wb)
            dx = hp[:, 0:1] - dep[0:1, :]
            dy = hp[:, 1:2] - dep[1:2, :]
            dz = hp[:, 2:3] - dep[2:3, :]
            d2 = dx * dx + dy * dy + dz * dz               # (t, ch)
            ndot = (hp[:, 3:4] * dep[3:4, :]
                    + hp[:, 4:5] * dep[4:5, :]
                    + hp[:, 5:6] * dep[5:6, :])
            m = ((d2 <= hp[:, 6:7]) & (ndot > NORMAL_DOT_MIN)
                 & lane_ok).astype(jnp.float32)
            acc_ref[:, 0:1] += jnp.sum(m, axis=1, keepdims=True)
            acc_ref[:, 1:2] += jnp.sum(m * dep[6:7, :], axis=1,
                                       keepdims=True)
            acc_ref[:, 2:3] += jnp.sum(m * dep[7:8, :], axis=1,
                                       keepdims=True)
            acc_ref[:, 3:4] += jnp.sum(m * dep[8:9, :], axis=1,
                                       keepdims=True)
            return 0

        jax.lax.fori_loop(0, tot, body, 0)

    out_ref[...] = acc_ref[...]


class PallasDepositStream(PallasDepositLane):
    """Item-stream tile-loop deposit: ``_stream_kernel`` + the Lane work
    list.  Work items beyond ``work_cap`` are dropped AND reported via the
    overflow count, exactly like ``PallasDepositLane`` (the stream arrays
    are static SMEM allocations, so the no-cap property of
    ``PallasDepositTile`` does not carry over)."""

    def __init__(self, *a, nbuf: int = 2, **kw):
        super().__init__(*a, **kw)
        self.nbuf = nbuf

    def _kernel_call(self, packed: jnp.ndarray, dep: Deposits,
                     prep: HpLayout):
        t, ch = self.tile, self.chunk
        c_pad = packed.shape[0]
        n_tiles = c_pad // t
        W = self.work_cap

        dkeys, d_ord, dep_packed, Dp = self._dep_sorted(dep, ch)
        sk, ek = self._window_lanes(prep, dkeys, n_tiles)
        wt, f, wa, wb, nc_tile, cum, total = self._build_items(
            sk, ek, n_tiles, W, Dp, align=128)
        itab = (jnp.clip(wa - f, 0, 2 * ch) << 16) | jnp.clip(
            wb - f, 0, 2 * ch)
        starts = jnp.minimum(cum - nc_tile, W).astype(jnp.int32)
        ends = jnp.minimum(cum, W).astype(jnp.int32)

        kernel = functools.partial(_stream_kernel, ch=ch, nbuf=self.nbuf)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((t, 8), lambda i, *_: (i, 0)),
                pl.BlockSpec(memory_space=pl.ANY),       # (16, Dp) HBM
            ],
            out_specs=pl.BlockSpec((t, 8), lambda i, *_: (i, 0)),
            scratch_shapes=[
                pltpu.VMEM((t, 8), jnp.float32),            # accumulator
                pltpu.VMEM((self.nbuf, 16, ch), jnp.float32),
                pltpu.SemaphoreType.DMA((self.nbuf,)),
            ],
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((c_pad, 8), jnp.float32),
            interpret=self.interpret,
        )(f.astype(jnp.int32), itab.astype(jnp.int32), starts, ends,
          packed, dep_packed)

        overflow = jnp.maximum(total - W, 0).astype(jnp.int32) * ch
        return out[:, 0], out[:, 1:4], overflow


def _lane_bwd_kernel(wt_ref, wfb_ref, wa_ref, wb_ref, hp_ref, u_ref, dep_ref,
                     out_ref, acc_ref, *, n_steps: int, ch: int):
    """Transpose of ``_lane_kernel``: accumulate per-DEPOSIT-lane cotangent
    sums d_flux[:, j] += m_ij * u_i over the same masked pair tests.

    Items arrive sorted by deposit block (``wfb``); the (8, ch) accumulator
    flushes when the block changes.  The deposit side is chunk-aligned here,
    so the regular BlockSpec pipeline fetches it (no manual DMA needed)."""
    s = pl.program_id(0)
    fb = wfb_ref[s]
    prev = wfb_ref[jnp.maximum(s - 1, 0)]
    nxt = wfb_ref[jnp.minimum(s + 1, n_steps - 1)]
    is_first = (s == 0) | (fb != prev)
    is_last = (s == n_steps - 1) | (fb != nxt)

    @pl.when(is_first)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(wa_ref[s] < wb_ref[s])
    def _():
        hp = hp_ref[...]                                   # (t, 8)
        u = u_ref[...]                                     # (t, 8)
        dep = dep_ref[...]                                 # (16, ch)
        gidx = fb * ch + jax.lax.broadcasted_iota(jnp.int32, (1, ch), 1)
        lane_ok = (gidx >= wa_ref[s]) & (gidx < wb_ref[s])
        dx = hp[:, 0:1] - dep[0:1, :]
        dy = hp[:, 1:2] - dep[1:2, :]
        dz = hp[:, 2:3] - dep[2:3, :]
        d2 = dx * dx + dy * dy + dz * dz
        ndot = (hp[:, 3:4] * dep[3:4, :]
                + hp[:, 4:5] * dep[4:5, :]
                + hp[:, 5:6] * dep[5:6, :])
        m = ((d2 <= hp[:, 6:7]) & (ndot > NORMAL_DOT_MIN)
             & lane_ok).astype(jnp.float32)
        acc_ref[0:1, :] += jnp.sum(m * u[:, 0:1], axis=0, keepdims=True)
        acc_ref[1:2, :] += jnp.sum(m * u[:, 1:2], axis=0, keepdims=True)
        acc_ref[2:3, :] += jnp.sum(m * u[:, 2:3], axis=0, keepdims=True)

    @pl.when(is_last)
    def _():
        out_ref[...] = acc_ref[...]


def _zero_cot(x):
    """Zero cotangent of the right type (float0 for int/bool leaves)."""
    import numpy as np

    if jnp.issubdtype(x.dtype, jnp.inexact):
        return jnp.zeros_like(x)
    return np.zeros(x.shape, jax.dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _lane_deposit_diff(depo: PallasDepositLane, hp: HitPoints,
                       dep: Deposits, prep: HpLayout):
    """Differentiable lane deposit: gradients flow into ``hp.wgt`` and
    ``dep.flux`` through the banded kernel pair; position/normal/radius
    cotangents are the a.e.-zero box-kernel derivative, exactly like
    ``diff.vjp.deposit_bruteforce_vjp`` (the deposit line being
    differentiated is raytracer/Raytracer.h:156)."""
    cnt, d_tao, ovf, _ = depo._forward_full(hp, dep, prep)
    return cnt, d_tao, ovf


def _lane_diff_fwd(depo, hp, dep, prep):
    cnt, d_tao, ovf, fl = depo._forward_full(hp, dep, prep)
    return (cnt, d_tao, ovf), (hp, dep, prep, fl)


def _lane_diff_bwd(depo, res, g):
    hp, dep, prep, fl = res
    _g_cnt, g_tao, _g_ovf = g  # cnt/overflow are piecewise constant
    d_wgt = g_tao * fl / jnp.pi
    u = hp.wgt * g_tao / jnp.pi                             # (C, 3)
    d_flux = depo._backward_flux(hp, dep, prep, u)
    d_hp = HitPoints(
        pos=_zero_cot(hp.pos), n=_zero_cot(hp.n), wgt=d_wgt,
        pixel=_zero_cot(hp.pixel), valid=_zero_cot(hp.valid),
        r2=_zero_cot(hp.r2), nphot=_zero_cot(hp.nphot),
        tao=_zero_cot(hp.tao),
    )
    d_dep = Deposits(
        pos=_zero_cot(dep.pos), n=_zero_cot(dep.n), flux=d_flux,
        valid=_zero_cot(dep.valid),
    )
    d_prep = HpLayout(
        packed=_zero_cot(prep.packed), g=_zero_cot(prep.g),
        lo_keys=_zero_cot(prep.lo_keys), hi_keys=_zero_cot(prep.hi_keys),
    )
    return d_hp, d_dep, d_prep


_lane_deposit_diff.defvjp(_lane_diff_fwd, _lane_diff_bwd)


def world_bounds_from_scene(scene, margin: float = 4.0 * SEARCH_R,
                            extra_points=None) -> dict:
    """Derive banded-deposit world bounds from a scene's finite geometry.

    Collects sphere extents, Bezier control points, light positions, the
    pinned axes of axis-aligned planes, and optional ``extra_points`` (e.g.
    the camera position, which bounds where eye hit points can land), then
    pads by ``margin``.  Returns the PallasDeposit/Lane constructor kwargs
    ``x_lo/x_hi/y_lo/y_hi/z_lo/z_hi``.

    Bounds only ever affect PERFORMANCE: out-of-range positions clamp into
    boundary buckets (exactness is preserved by the in-kernel d2 test) but
    crowd them — deriving from the scene replaces the round-2 hard-coded
    reference-scene constants (VERDICT round 2, missing item 7).
    """
    import numpy as np

    pts = [np.asarray(scene.light_pos, np.float64)]
    if scene.spheres.count:
        c = np.asarray(scene.spheres.center, np.float64)
        r = np.asarray(scene.spheres.radius, np.float64)[:, None]
        pts += [c - r, c + r]
    if scene.has_bezier:
        pts.append(np.asarray(scene.bezier.ctrl, np.float64).reshape(-1, 3))
    if extra_points is not None:
        pts.append(np.asarray(extra_points, np.float64).reshape(-1, 3))
    P = np.concatenate(pts, 0)
    lo, hi = P.min(0), P.max(0)
    n = np.asarray(scene.planes.normal, np.float64)
    p0 = np.asarray(scene.planes.p0, np.float64)
    for i in range(n.shape[0]):
        ax = int(np.argmax(np.abs(n[i])))
        if abs(n[i, ax]) > 0.999:       # axis-aligned plane pins its axis
            lo[ax] = min(lo[ax], p0[i, ax])
            hi[ax] = max(hi[ax], p0[i, ax])
    lo -= margin
    hi += margin
    return dict(x_lo=float(lo[0]), x_hi=float(hi[0]),
                y_lo=float(lo[1]), y_hi=float(hi[1]),
                z_lo=float(lo[2]), z_hi=float(hi[2]))


def make_pallas_deposit(**kw):
    """The measured-best Pallas deposit backend (round-5 sweep #8,
    docs/PERF.md): the tile-loop kernel at tile=256/chunk=2048 — no work
    cap, no overflow path, layout-space rounds via ``packed_call``.
    Larger chunks halve the per-chunk DMA-issue floor (the measured
    binding cost); the extra ceiling pairs are VPU-cheap."""
    kw.setdefault("tile", 256)
    kw.setdefault("chunk", 2048)
    return PallasDepositTile(**kw)
