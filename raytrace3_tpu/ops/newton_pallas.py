"""Pallas TPU kernel: batched Newton ray-Bezier-patch intersection.

The north-star kernel (BASELINE.json): replaces the reference's per-ray
50-random-restart x 10-iteration Newton loop with OpenCV 3x3 inverses
(raytracer/Bezier.h:112-159) by a fixed-iteration, fully-vectorised VPU
program.

Layout — the key idea: one VPU lane = one (patch, restart) pair.
  * 128 lanes = 8 patches x 16 stratified restarts (4x4 grid), so a single
    (TILE_R, 128) f32 array carries TILE_R rays x 8 patches x 16 restarts.
  * The 16 control points x 3 coords of each patch are SCALARS per lane —
    prebroadcast into 48 coefficient rows of shape (128,) — so the whole
    Newton iteration (Bernstein bases, patch eval, Jacobian, Cramer solve,
    residual test) is pure elementwise arithmetic on (TILE_R, 128) tiles.
    No gathers, no MXU, no divergence: speed-of-light VPU work.
  * Grid = (ray_tiles, patch_groups); the output block revisits the same
    ray tile across patch groups (sequential innermost grid dim on TPU) and
    accumulates the running min-t winner in place.
  * Per-lane patch AABB slab test masks acceptance (the reference's
    per-patch AABB gate, Bezier.h:176-186); a whole (tile, group) step is
    skipped via @pl.when if no lane can hit.

The kernel implements the winner contract (t, u, v, patch_id, hit) used by
``geometry.bezier.intersect_bezier``; gradients come from the implicit-
function-theorem VJP in ``geometry.bezier.winner_root``, so this kernel
needs no backward pass of its own.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.vecmath import M_EPS, MAX_DIST

LANES = 128
#: default restart count; 8 = 2x4 stratified grid, 16 patches per group —
#: certified per-ray against a 64-restart oracle on eye/photon/grazing ray
#: populations (docs/NEWTON_RESTARTS.json: ZERO missed intersections, ~1%
#: different-valid-root picks with t within 4% — the same character as the
#: reference's own 50-RANDOM-restart run-to-run variation, Bezier.h:6,115)
#: and in aggregate by the pallas-newton crossval (docs/CROSSVAL_PN8.json,
#: rel_err 1.57% == the 16-restart record's 1.56%).  16 (4x4 grid) doubles
#: the kernel cost and removes the ~1% root variation.
DEFAULT_RESTARTS = 8
BIG = float(MAX_DIST)


def _build_tables(ctrl: np.ndarray | jnp.ndarray, restarts: int):
    """Precompute per-lane coefficient tables.

    ctrl (B, 4, 4, 3) ->
      coef:  (G, 48, LANES)  rows = ctrl[i, k, c] flattened (c*16 + i*4 + k),
      aabb:  (G, 6, LANES)   rows = (min_xyz, max_xyz),
      pid:   (G, 1, LANES)   global patch id per lane (int32),
      valid: (G, 1, LANES)   lane has a real patch (padding mask).
    """
    ppg = LANES // restarts
    ctrl = jnp.asarray(ctrl, jnp.float32)
    b = ctrl.shape[0]
    g = -(-b // ppg)
    pad = g * ppg - b
    ctrl_p = jnp.pad(ctrl, ((0, pad), (0, 0), (0, 0), (0, 0)))
    valid_p = jnp.concatenate([
        jnp.ones((b,), bool), jnp.zeros((pad,), bool)
    ])

    flat = ctrl_p.transpose(0, 3, 1, 2).reshape(g, ppg, 48)
    # lane = patch_sub * restarts + restart -> repeat each patch coefficient
    coef = jnp.repeat(flat, restarts, axis=1)            # (G, ppg*restarts, 48)
    coef = coef.transpose(0, 2, 1)                       # (G, 48, LANES)

    pts = ctrl_p.reshape(g, ppg, 16, 3)
    lo = pts.min(2)                                      # (G, ppg, 3)
    hi = pts.max(2)
    aabb = jnp.concatenate([lo, hi], axis=-1)            # (G, ppg, 6)
    aabb = jnp.repeat(aabb, restarts, axis=1).transpose(0, 2, 1)  # (G,6,LANES)

    pid = jnp.repeat(
        jnp.arange(g * ppg, dtype=jnp.int32).reshape(g, -1),
        restarts, axis=1,
    ).reshape(g, 1, LANES)  # leading singleton: Mosaic requires the block's
    #                         second-to-last dim to equal the array's
    vld = jnp.repeat(valid_p.reshape(g, -1), restarts, axis=1)
    vld = vld.astype(jnp.float32).reshape(g, 1, LANES)
    return coef, aabb, pid, vld


def _uv0_rows(restarts: int):
    """Initial (u0, v0) per lane: a stratified (gu x gv) cell-centre grid
    tiled over the patch sub-slots (gu*gv = restarts)."""
    gu = int(math.isqrt(restarts))
    while restarts % gu:
        gu -= 1
    gv = restarts // gu
    cu = (np.arange(gu) + 0.5) / gu
    cv = (np.arange(gv) + 0.5) / gv
    uu, vv = np.meshgrid(cu, cv, indexing="ij")
    u0 = np.tile(uu.ravel(), LANES // restarts)
    v0 = np.tile(vv.ravel(), LANES // restarts)
    return (np.asarray(u0, np.float32)[None, :],
            np.asarray(v0, np.float32)[None, :])         # (1, LANES) numpy


def _bern(t):
    s = 1.0 - t
    return s * s * s, 3.0 * t * s * s, 3.0 * t * t * s, t * t * t


def _dbern(t):
    s = 1.0 - t
    return (-3.0 * s * s, 3.0 * s * s - 6.0 * t * s,
            6.0 * t * s - 3.0 * t * t, 3.0 * t * t)


def _newton_kernel(org_ref, dir_ref, coef_ref, aabb_ref, pid_ref, vld_ref,
                   uv0_ref, t_ref, u_ref, v_ref, p_ref, *, iters: int,
                   residual2_eps: float):
    g = pl.program_id(1)

    @pl.when(g == 0)
    def _():
        t_ref[:] = jnp.full_like(t_ref, BIG)
        u_ref[:] = jnp.zeros_like(u_ref)
        v_ref[:] = jnp.zeros_like(v_ref)
        p_ref[:] = jnp.zeros_like(p_ref)

    # Ray components, broadcast over lanes: (TILE_R, 1).
    ox, oy, oz = (org_ref[:, 0:1], org_ref[:, 1:2], org_ref[:, 2:3])
    dx, dy, dz = (dir_ref[:, 0:1], dir_ref[:, 1:2], dir_ref[:, 2:3])

    # Per-lane AABB slab test (exact branchless form, geometry/aabb.py).
    inv_x, inv_y, inv_z = 1.0 / dx, 1.0 / dy, 1.0 / dz
    box = aabb_ref[:][0]                                  # (6, LANES)
    t0x = (box[0:1, :] - ox) * inv_x
    t1x = (box[3:4, :] - ox) * inv_x
    t0y = (box[1:2, :] - oy) * inv_y
    t1y = (box[4:5, :] - oy) * inv_y
    t0z = (box[2:3, :] - oz) * inv_z
    t1z = (box[5:6, :] - oz) * inv_z
    nanfix = lambda x, rep: jnp.where(jnp.isnan(x), rep, x)
    tnear = jnp.maximum(
        jnp.maximum(nanfix(jnp.minimum(t0x, t1x), -BIG),
                    nanfix(jnp.minimum(t0y, t1y), -BIG)),
        nanfix(jnp.minimum(t0z, t1z), -BIG),
    )
    tfar = jnp.minimum(
        jnp.minimum(nanfix(jnp.maximum(t0x, t1x), BIG),
                    nanfix(jnp.maximum(t0y, t1y), BIG)),
        nanfix(jnp.maximum(t0z, t1z), BIG),
    )
    box_ok = (tfar >= jnp.maximum(tnear, 0.0)) & (vld_ref[:][0] > 0.5)

    @pl.when(jnp.any(box_ok))
    def _():
        c = coef_ref[:][0]                                # (48, LANES)

        def crow(i):                                      # (1, LANES)
            return c[i:i + 1, :]

        def patch_eval(u, v, want_derivs):
            bu0, bu1, bu2, bu3 = _bern(u)
            bv0, bv1, bv2, bv3 = _bern(v)
            bus = (bu0, bu1, bu2, bu3)
            bvs = (bv0, bv1, bv2, bv3)
            s = [None] * 3
            su = [None] * 3
            sv = [None] * 3
            if want_derivs:
                du0, du1, du2, du3 = _dbern(u)
                dv0, dv1, dv2, dv3 = _dbern(v)
                dus = (du0, du1, du2, du3)
                dvs = (dv0, dv1, dv2, dv3)
            for ccoord in range(3):
                acc = 0.0
                accu = 0.0
                accv = 0.0
                for i in range(4):
                    rowu = 0.0
                    rowdu = 0.0
                    for k in range(4):
                        gik = crow(ccoord * 16 + i * 4 + k)
                        rowu = rowu + bus[k] * gik
                        if want_derivs:
                            rowdu = rowdu + dus[k] * gik
                    acc = acc + bvs[i] * rowu
                    if want_derivs:
                        accu = accu + bvs[i] * rowdu
                        accv = accv + dvs[i] * rowu
                s[ccoord] = acc
                if want_derivs:
                    su[ccoord] = accu
                    sv[ccoord] = accv
            return s, su, sv

        lane_shape = (t_ref.shape[0], LANES)
        u = jnp.broadcast_to(uv0_ref[0:1, :], lane_shape)
        v = jnp.broadcast_to(uv0_ref[1:2, :], lane_shape)
        s0, _, _ = patch_eval(u, v, False)
        # t0 = (S0 - org) . dir  (unit dir assumed, like the reference)
        t = (s0[0] - ox) * dx + (s0[1] - oy) * dy + (s0[2] - oz) * dz

        best_t = jnp.full_like(t, BIG)
        best_u = jnp.zeros_like(t)
        best_v = jnp.zeros_like(t)

        for _ in range(iters):
            s, su, sv = patch_eval(u, v, True)
            rx = ox + t * dx - s[0]
            ry = oy + t * dy - s[1]
            rz = oz + t * dz - s[2]
            # Solve J dx = -r, J = [dir | -Su | -Sv], via Cramer:
            # c1 x c2 with c1 = -Su, c2 = -Sv  ->  Su x Sv
            cx = su[1] * sv[2] - su[2] * sv[1]
            cy = su[2] * sv[0] - su[0] * sv[2]
            cz = su[0] * sv[1] - su[1] * sv[0]
            det = dx * cx + dy * cy + dz * cz
            ok = jnp.abs(det) > 1e-12
            inv_det = 1.0 / jnp.where(ok, det, 1.0)
            # dt = -r . (c1 x c2) / det
            dt = -(rx * cx + ry * cy + rz * cz) * inv_det
            # du = dir . (-r x c2) / det, c2 = -Sv -> dir.(r x Sv)/det
            ex = ry * sv[2] - rz * sv[1]
            ey = rz * sv[0] - rx * sv[2]
            ez = rx * sv[1] - ry * sv[0]
            du = (dx * ex + dy * ey + dz * ez) * inv_det
            # dv = dir . (c1 x -r) / det, c1 = -Su -> dir.(Su x r)... sign:
            fx = su[1] * rz - su[2] * ry
            fy = su[2] * rx - su[0] * rz
            fz = su[0] * ry - su[1] * rx
            dv = (dx * fx + dy * fy + dz * fz) * inv_det
            okf = ok.astype(jnp.float32)
            t = jnp.clip(t + jnp.clip(dt, -1e4, 1e4) * okf, -1e4, 1e4)
            u = jnp.clip(u + jnp.clip(du, -8.0, 8.0) * okf, -8.0, 8.0)
            v = jnp.clip(v + jnp.clip(dv, -8.0, 8.0) * okf, -8.0, 8.0)

            s2, _, _ = patch_eval(u, v, False)
            r2 = (
                (ox + t * dx - s2[0]) ** 2
                + (oy + t * dy - s2[1]) ** 2
                + (oz + t * dz - s2[2]) ** 2
            )
            accept = (
                (r2 < residual2_eps)
                & (u >= 0.0) & (u <= 1.0)
                & (v >= 0.0) & (v <= 1.0)
                & (t > M_EPS) & (t < best_t)
                & box_ok
            )
            best_t = jnp.where(accept, t, best_t)
            best_u = jnp.where(accept, u, best_u)
            best_v = jnp.where(accept, v, best_v)

        # Lane reduction: min-t winner and its u/v/pid.
        tile_min = jnp.min(best_t, axis=1, keepdims=True)  # (TILE_R, 1)
        winner = best_t <= tile_min                        # ties -> any
        sel = lambda x: jnp.min(jnp.where(winner, x, BIG), axis=1,
                                keepdims=True)
        w_u = sel(best_u)
        w_v = sel(best_v)
        pidf = pid_ref[:][0].astype(jnp.float32)           # (1, LANES)
        w_p = jnp.min(
            jnp.where(winner, jnp.broadcast_to(pidf, best_t.shape), BIG),
            axis=1, keepdims=True,
        )

        improved = tile_min < t_ref[:, 0:1]
        t_ref[:, 0:1] = jnp.where(improved, tile_min, t_ref[:, 0:1])
        u_ref[:, 0:1] = jnp.where(improved, w_u, u_ref[:, 0:1])
        v_ref[:, 0:1] = jnp.where(improved, w_v, v_ref[:, 0:1])
        p_ref[:, 0:1] = jnp.where(improved, w_p, p_ref[:, 0:1])


def make_newton_pallas(iters: int = 10, tile_r: int = 256,
                       residual2_eps: float = M_EPS, interpret: bool = False,
                       restarts: int = DEFAULT_RESTARTS):
    """Build a winner-contract solver backed by the Pallas kernel.

    Returns solver(org, dir, ctrl) -> (t, u, v, patch_id, hit), each (R,).
    ``interpret=True`` runs the kernel in interpreter mode (CPU tests).
    """

    def solver(org, dir, ctrl):
        R = org.shape[0]
        pad = (-R) % tile_r
        org_p = jnp.pad(org, ((0, pad), (0, 0)))
        dir_p = jnp.pad(
            dir, ((0, pad), (0, 0)), constant_values=1.0
        )  # nonzero dir on pad lanes avoids 0-division noise
        rp = R + pad
        coef, aabb, pid, vld = _build_tables(ctrl, restarts)
        g = coef.shape[0]

        kernel = functools.partial(
            _newton_kernel, iters=iters, residual2_eps=residual2_eps
        )
        grid = (rp // tile_r, g)
        kernel_call = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_r, 3), lambda i, g_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_r, 3), lambda i, g_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 48, LANES), lambda i, g_: (g_, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 6, LANES), lambda i, g_: (g_, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, LANES), lambda i, g_: (g_, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, LANES), lambda i, g_: (g_, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, LANES), lambda i, g_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((tile_r, 1), lambda i, g_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_r, 1), lambda i, g_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_r, 1), lambda i, g_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_r, 1), lambda i, g_: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((rp, 1), jnp.float32),
                jax.ShapeDtypeStruct((rp, 1), jnp.float32),
                jax.ShapeDtypeStruct((rp, 1), jnp.float32),
                jax.ShapeDtypeStruct((rp, 1), jnp.float32),
            ],
            interpret=interpret,
        )
        u0r, v0r = _uv0_rows(restarts)
        uv0 = jnp.asarray(np.concatenate([u0r, v0r], 0))
        out = kernel_call(org_p, dir_p, coef, aabb, pid, vld, uv0)
        t, u, v, p = out

        t = t[:R, 0]
        hit = t < MAX_DIST * 0.5
        return (t, u[:R, 0], v[:R, 0],
                jnp.clip(p[:R, 0], 0, ctrl.shape[0] - 1).astype(jnp.int32),
                hit)

    return solver
