"""Fused walk-segment Pallas kernel: one kernel per trace segment, hot loop B.

Replaces the XLA op-chain for a photon/eye walk segment — plane + sphere
intersection, nearest-hit argmin (merged with the separately-solved Bezier
lanes), winner normal/UV/material resolution, and the branch/bounce math —
with ONE Pallas kernel that keeps all lane state in VMEM for the whole
segment.  Reference: the per-ray recursion bodies ``RayTracer::PhotonTrace``
(raytracer/Raytracer.h:117-209) and ``RayTracer::ViewTrace``
(raytracer/Raytracer.h:296-357) plus ``Scene::NearCollide``
(raytracer/Scene.h:165-182).

Why: the jnp segment compiles to ~30 small VPU fusions whose boundaries each
round-trip the full lane state through HBM — measured ~100 ms/pass of "walk
misc" at bench shapes (docs/PERF.md round-2 cost map) that is pure fusion-
boundary bandwidth, not math.  In-kernel, the state crosses HBM exactly
twice (one read, one write).

What stays OUTSIDE the kernel (by design):
  * the Bezier Newton solve (``ops/newton_pallas.py`` on AABB-compacted
    lanes) — its dense per-lane results enter this kernel as plain inputs;
  * texture sampling — the packed-atlas gather is an XLA strength; the
    kernel emits (u, v, tex_id, flat_rgb) and the caller mixes
    ``where(tex_id >= 0, atlas_sample, flat_rgb)``;
  * ALL randomness — the caller passes uniforms drawn with the exact
    ``jax.random`` split structure of the jnp path, so fused and unfused
    walks consume identical random streams (determinism/golden tests keep
    meaning across backends);
  * lane lifetime (alive masks, regen refill, depth counters) — cheap
    elementwise ops that differ between photon/eye/regen drivers.

Layouts: lane fields travel as (rows, M, 128) f32 with M = N / 128; the
grid tiles M into blocks of ``block`` sublanes, so every in-kernel op runs
on (block, 128) tiles — full VPU utilisation, no (1, N) sublane waste.

The kernel is NOT differentiable (no VJP): the training path keeps the jnp
walk; this is the inference/bench fast path.  Numerical parity with the jnp
path is tested to ~1e-5 (XLA may lower the jnp einsums through a different
mult-add order), with image-level golden equality in tests/test_walk.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..core.vecmath import M_EPS, MAX_DIST

#: Table rows (see pack_walk_table).
TBL_ROWS = 40
_LIM = 1.0 - 1e-6  # sphere_uv arccos clip (textures run for every segment)


def pack_walk_table(scene) -> jnp.ndarray:
    """Pack every per-primitive/per-object scalar the kernel needs into one
    (40, 128) f32 table (cols = index within the family).

    Rows:
      0-2   plane p0 xyz            3-5   plane normal xyz
      6     plane tex_u_mod         7     plane tex_v_mod
      8     plane udex (f32)        9     plane vdex (f32)
      10-12 sphere center xyz       13    sphere radius
      14    sphere tex_u (cols 0-2) 15    sphere tex_v (cols 0-2)
      16    cross(tex_u, tex_v)     (cols 0-2)
      17-19 mat diff_p/refl_p/refr_p   20-22  is_diff/is_refl/is_refr
      23    refrn                   24    obj_tex id (f32, -1 = flat)
      25-27 obj_color rgb           28-30 m_diff rgb
      31-33 m_refl rgb              34-36 m_refr rgb
    """
    from ..geometry.plane import plane_axis_indices

    P, S = scene.n_planes, scene.n_spheres
    tbl = jnp.zeros((TBL_ROWS, 128), jnp.float32)

    def put(row, col0, vals):
        vals = jnp.asarray(vals, jnp.float32)
        return tbl.at[row, col0:col0 + vals.shape[0]].set(vals)

    for c in range(3):
        tbl = put(0 + c, 0, scene.planes.p0[:, c])
        tbl = put(3 + c, 0, scene.planes.normal[:, c])
        tbl = put(10 + c, 0, scene.spheres.center[:, c])
    tbl = put(6, 0, scene.planes.tex_u_mod)
    tbl = put(7, 0, scene.planes.tex_v_mod)
    udex, vdex = plane_axis_indices(scene.planes.normal)
    tbl = put(8, 0, udex.astype(jnp.float32))
    tbl = put(9, 0, vdex.astype(jnp.float32))
    tbl = put(13, 0, scene.spheres.radius)
    tbl = put(14, 0, scene.spheres.tex_u)
    tbl = put(15, 0, scene.spheres.tex_v)
    tbl = put(16, 0, jnp.cross(scene.spheres.tex_u, scene.spheres.tex_v))
    dp, rp, rr = scene.materials.powers()
    m = scene.materials
    tbl = put(17, 0, dp)
    tbl = put(18, 0, rp)
    tbl = put(19, 0, rr)
    tbl = put(20, 0, m.is_diff().astype(jnp.float32))
    tbl = put(21, 0, m.is_refl().astype(jnp.float32))
    tbl = put(22, 0, m.is_refr().astype(jnp.float32))
    tbl = put(23, 0, m.refrn)
    tbl = put(24, 0, scene.obj_tex.astype(jnp.float32))
    for c in range(3):
        tbl = put(25 + c, 0, scene.obj_color[:, c])
        tbl = put(28 + c, 0, m.diff[:, c])
        tbl = put(31 + c, 0, m.refl[:, c])
        tbl = put(34 + c, 0, m.refr[:, c])
    return tbl


# ---------------------------------------------------------------------------
# In-kernel math (shared by the photon and eye kernels).  Everything below
# operates on (block, 128) f32 tiles; ``tbl`` scalar reads broadcast.
# ---------------------------------------------------------------------------


def _normalize3(x, y, z):
    """vecmath.normalize on component tiles (guards |v| < M_EPS)."""
    n2 = x * x + y * y + z * z
    small = n2 < M_EPS * M_EPS
    m = jnp.sqrt(jnp.where(small, 1.0, n2))
    return (jnp.where(small, x, x / m), jnp.where(small, y, y / m),
            jnp.where(small, z, z / m))


def _segment_core(tbl, st, bz, *, P: int, S: int, has_bezier: bool,
                  n_obj: int):
    """Nearest hit + winner attribute resolution for one lane block.

    Mirrors geometry/scene.py::intersect_scene step for step (minus the
    texture gather).  Returns a dict of (block, 128) tiles.
    """
    ox, oy, oz = st[0], st[1], st[2]
    dx, dy, dz = st[3], st[4], st[5]

    t_min = jnp.full_like(ox, MAX_DIST)
    obj = jnp.zeros_like(ox)                       # f32 winner id

    # --- planes (Obj.h:65-85) ---
    for p in range(P):
        nx, ny, nz = tbl[3, p], tbl[4, p], tbl[5, p]
        px, py, pz = tbl[0, p], tbl[1, p], tbl[2, p]
        proj = dx * nx + dy * ny + dz * nz
        num = (px - ox) * nx + (py - oy) * ny + (pz - oz) * nz
        safe = jnp.where(jnp.abs(proj) < M_EPS, 1.0, proj)
        t = num / safe
        h = (jnp.abs(proj) >= M_EPS) & (t > M_EPS)
        t = jnp.where(h, t, MAX_DIST)
        take = t < t_min
        t_min = jnp.where(take, t, t_min)
        obj = jnp.where(take, jnp.float32(p), obj)

    # --- spheres (Obj.h:111-139) ---
    ins_win = jnp.zeros_like(ox)
    for s in range(S):
        cx, cy, cz, r = tbl[10, s], tbl[11, s], tbl[12, s], tbl[13, s]
        lx, ly, lz = cx - ox, cy - oy, cz - oz
        proj = lx * dx + ly * dy + lz * dz
        det2 = r * r - ((lx * lx + ly * ly + lz * lz) - proj * proj)
        miss = det2 < M_EPS
        det = jnp.sqrt(jnp.where(miss, 1.0, det2))
        d1 = proj - det
        d2 = proj + det
        inside = d1 < M_EPS
        t = jnp.where(inside, d2, d1)
        h = ~miss & (d2 >= M_EPS)
        t = jnp.where(h, t, MAX_DIST)
        take = t < t_min
        t_min = jnp.where(take, t, t_min)
        obj = jnp.where(take, jnp.float32(P + s), obj)
        ins_win = jnp.where(take, inside.astype(jnp.float32), ins_win)

    # --- bezier lanes solved outside (ops/newton_pallas.py) ---
    if has_bezier:
        tb = jnp.where(bz[1] > 0.5, bz[0], MAX_DIST)
        take = tb < t_min
        t_min = jnp.where(take, tb, t_min)
        obj = jnp.where(take, jnp.float32(P + S), obj)

    hit = t_min < MAX_DIST
    tcl = jnp.minimum(t_min, 1e6)
    hx = ox + tcl * dx
    hy = oy + tcl * dy
    hz = oz + tcl * dz

    is_plane = obj < jnp.float32(P)
    is_sphere = (obj >= jnp.float32(P)) & (obj < jnp.float32(P + S))
    is_bez = ~is_plane & ~is_sphere
    inside = is_sphere & (ins_win > 0.5)

    # Winner-plane scalars by masked accumulation (P, S <= 8: cheap).
    zero = jnp.zeros_like(ox)

    def acc(sel_fn, rows, count):
        outs = [zero] * len(rows)
        for j in range(count):
            m = sel_fn(j)
            for k, r in enumerate(rows):
                outs[k] = outs[k] + jnp.where(m, tbl[r, j], 0.0)
        return outs

    psel = lambda j: obj == jnp.float32(j)
    pn_x, pn_y, pn_z, pp_x, pp_y, pp_z, p_umod, p_vmod, p_ud, p_vd = acc(
        psel, [3, 4, 5, 0, 1, 2, 6, 7, 8, 9], P)

    ssel = lambda j: obj == jnp.float32(P + j)
    sc_x, sc_y, sc_z = zero, zero, zero
    for j in range(S):
        m = ssel(j)
        sc_x = sc_x + jnp.where(m, tbl[10, j], 0.0)
        sc_y = sc_y + jnp.where(m, tbl[11, j], 0.0)
        sc_z = sc_z + jnp.where(m, tbl[12, j], 0.0)

    # Normal (Obj.h:80 planes unflipped, Obj.h:133 spheres outward).
    sn_x, sn_y, sn_z = _normalize3(hx - sc_x, hy - sc_y, hz - sc_z)
    nx = jnp.where(is_sphere, sn_x, pn_x)
    ny = jnp.where(is_sphere, sn_y, pn_y)
    nz = jnp.where(is_sphere, sn_z, pn_z)
    if has_bezier:
        nx = jnp.where(is_bez, bz[4], nx)
        ny = jnp.where(is_bez, bz[5], ny)
        nz = jnp.where(is_bez, bz[6], nz)

    # Plane UV (Obj.h:86-100 with the swapped-scale quirk).
    ddx, ddy, ddz = hx - pp_x, hy - pp_y, hz - pp_z
    pick = lambda idx: jnp.where(
        idx == 0.0, ddx, jnp.where(idx == 1.0, ddy, ddz))
    safe_um = jnp.where(p_umod == 0.0, 1.0, p_umod)
    safe_vm = jnp.where(p_vmod == 0.0, 1.0, p_vmod)
    up = 0.5 + pick(p_ud) / safe_vm
    vp = 0.5 + pick(p_vd) / safe_um

    # Sphere UV is resolved OUTSIDE the kernel (Mosaic has no acos lowering;
    # the caller computes it from the output normal with XLA's arccos —
    # exact jnp-path parity).  Here u/v carry the plane/bezier values and
    # ``is_sphere`` is emitted for the caller-side merge.
    u, v = up, vp
    if has_bezier:
        u = jnp.where(is_bez, bz[2], u)
        v = jnp.where(is_bez, bz[3], v)        # caller pre-applies UV quirk

    # Winner material/object scalars (one masked-accumulate sweep).
    osel = lambda j: obj == jnp.float32(j)
    mat_rows = [17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27,
                28, 29, 30, 31, 32, 33, 34, 35, 36]
    mats = acc(osel, mat_rows, n_obj)
    (dp, rp, rr, isd, isl, isr, rn, tex, fcr, fcg, fcb,
     mdr, mdg, mdb, mlr, mlg, mlb, mrr, mrg, mrb) = mats

    return dict(
        hit=hit, t=t_min, obj=obj, inside=inside, is_sphere=is_sphere,
        hx=hx, hy=hy, hz=hz, nx=nx, ny=ny, nz=nz, u=u, v=v,
        dp=dp, rp=rp, rr=rr, isd=isd, isl=isl, isr=isr, rn=rn,
        tex=tex, fcr=fcr, fcg=fcg, fcb=fcb,
        mdiff=(mdr, mdg, mdb), mrefl=(mlr, mlg, mlb),
        mrefr=(mrr, mrg, mrb),
        dx=st[3], dy=st[4], dz=st[5],
    )


def _branch_dirs(c):
    """Mirror-reflection and refraction of the incoming dir (both
    normalized, as in the jnp walk: Vec3.h:80-84, 120-134)."""
    dx, dy, dz = c["dx"], c["dy"], c["dz"]
    nx, ny, nz = c["nx"], c["ny"], c["nz"]
    dn = dx * nx + dy * ny + dz * nz
    rx, ry, rz = dx - 2.0 * dn * nx, dy - 2.0 * dn * ny, dz - 2.0 * dn * nz
    rlx, rly, rlz = _normalize3(rx, ry, rz)

    # eta_from_refrn (core/types.py:62-67) + inside normal flip.
    rn = c["rn"]
    safe = jnp.where(jnp.abs(rn) < 1e-6, 1.0, rn)
    eta = jnp.where(c["inside"], safe, 1.0 / safe)
    sgn = jnp.where(c["inside"], -1.0, 1.0)
    ex, ey, ez = sgn * nx, sgn * ny, sgn * nz
    cos_i = -(ex * dx + ey * dy + ez * dz)
    cos_r2 = 1.0 - (1.0 - cos_i * cos_i) * eta * eta
    ok = cos_r2 > M_EPS
    cos_r = jnp.sqrt(jnp.where(ok, cos_r2, 1.0))
    k = eta * cos_i - cos_r
    fx = dx * eta + ex * k
    fy = dy * eta + ey * k
    fz = dz * eta + ez * k
    # TIR falls back to the mirror about the FLIPPED normal (Vec3.h:132).
    de = dx * ex + dy * ey + dz * ez
    tx, ty, tz = dx - 2.0 * de * ex, dy - 2.0 * de * ey, dz - 2.0 * de * ez
    fx = jnp.where(ok, fx, tx)
    fy = jnp.where(ok, fy, ty)
    fz = jnp.where(ok, fz, tz)
    frx, fry, frz = _normalize3(fx, fy, fz)
    return (rlx, rly, rlz), (frx, fry, frz)


def _cosine_dir(c, u1, u2):
    """cosine_hemisphere about the winner normal (core/sampling.py:40-62):
    Duff frame + (sqrt(u1), 2 pi u2) — same law, same op order."""
    nx, ny, nz = c["nx"], c["ny"], c["nz"]
    ct = jnp.sqrt(u1)
    st = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
    phi = (2.0 * jnp.pi) * u2
    s = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + nz)
    b = nx * ny * a
    t1x, t1y, t1z = 1.0 + s * nx * nx * a, s * b, -s * nx
    t2x, t2y, t2z = b, s + ny * ny * a, -ny
    ca = st * jnp.cos(phi)
    cb = st * jnp.sin(phi)
    return (t1x * ca + t2x * cb + nx * ct,
            t1y * ca + t2y * cb + ny * ct,
            t1z * ca + t2z * cb + nz * ct)


def _photon_kernel(tbl_ref, st_ref, un_ref, bz_ref, out_ref, *, P, S,
                   has_bezier, n_obj):
    tbl = tbl_ref[...]
    st = st_ref[...]
    c = _segment_core(tbl, st, bz_ref[...], P=P, S=S,
                      has_bezier=has_bezier, n_obj=n_obj)
    un = un_ref[...]
    u_r, u1, u2 = un[0], un[1], un[2]

    # Roulette (Obj.h:30-45; sampling.roulette): r ~ U * allr.
    allr = c["dp"] + c["rp"] + c["rr"]
    r = u_r * allr
    branch = jnp.where(c["dp"] > r, 0.0, jnp.where(c["dp"] + c["rp"] > r,
                                                   1.0, 2.0))
    (rlx, rly, rlz), (frx, fry, frz) = _branch_dirs(c)
    cdx, cdy, cdz = _cosine_dir(c, u1, u2)
    b0 = branch == 0.0
    b1 = branch == 1.0
    ndx = jnp.where(b0, cdx, jnp.where(b1, rlx, frx))
    ndy = jnp.where(b0, cdy, jnp.where(b1, rly, fry))
    ndz = jnp.where(b0, cdz, jnp.where(b1, rlz, frz))

    out_ref[0], out_ref[1], out_ref[2] = c["hx"], c["hy"], c["hz"]
    out_ref[3], out_ref[4], out_ref[5] = c["nx"], c["ny"], c["nz"]
    out_ref[6], out_ref[7], out_ref[8] = ndx, ndy, ndz
    out_ref[9], out_ref[10], out_ref[11] = c["u"], c["v"], c["tex"]
    out_ref[12] = c["hit"].astype(jnp.float32)
    out_ref[13] = c["isd"]
    out_ref[14], out_ref[15], out_ref[16] = c["fcr"], c["fcg"], c["fcb"]
    out_ref[17] = c["obj"]
    out_ref[18] = c["dp"]
    out_ref[19] = c["rp"]
    out_ref[20] = c["rr"]
    out_ref[21] = branch
    out_ref[22] = c["is_sphere"].astype(jnp.float32)
    out_ref[23] = jnp.zeros_like(c["u"])


def _eye_kernel(tbl_ref, st_ref, bz_ref, out_ref, *, P, S, has_bezier,
                n_obj):
    tbl = tbl_ref[...]
    st = st_ref[...]
    c = _segment_core(tbl, st, bz_ref[...], P=P, S=S,
                      has_bezier=has_bezier, n_obj=n_obj)
    (rlx, rly, rlz), (frx, fry, frz) = _branch_dirs(c)
    # Primary continuation: mirror when the refl lobe fires, else refraction
    # (render/eye.py:174-176 — refl_v priority).
    isl_h = (c["isl"] > 0.5) & c["hit"]
    pdx = jnp.where(isl_h, rlx, frx)
    pdy = jnp.where(isl_h, rly, fry)
    pdz = jnp.where(isl_h, rlz, frz)
    mlr, mlg, mlb = c["mrefl"]
    mrr, mrg, mrb = c["mrefr"]
    mpr = jnp.where(isl_h, mlr, mrr)
    mpg = jnp.where(isl_h, mlg, mrg)
    mpb = jnp.where(isl_h, mlb, mrb)
    mdr, mdg, mdb = c["mdiff"]

    out_ref[0], out_ref[1], out_ref[2] = c["hx"], c["hy"], c["hz"]
    out_ref[3], out_ref[4], out_ref[5] = c["nx"], c["ny"], c["nz"]
    out_ref[6], out_ref[7], out_ref[8] = pdx, pdy, pdz
    out_ref[9], out_ref[10], out_ref[11] = c["u"], c["v"], c["tex"]
    out_ref[12] = c["hit"].astype(jnp.float32)
    out_ref[13] = c["isd"]
    out_ref[14] = c["isl"]
    out_ref[15] = c["isr"]
    out_ref[16], out_ref[17], out_ref[18] = mdr, mdg, mdb
    out_ref[19], out_ref[20], out_ref[21] = mpr, mpg, mpb
    out_ref[22], out_ref[23], out_ref[24] = c["fcr"], c["fcg"], c["fcb"]
    out_ref[25] = c["obj"]
    out_ref[26] = c["is_sphere"].astype(jnp.float32)
    for k in range(27, 32):
        out_ref[k] = jnp.zeros_like(c["u"])


def choose_block(m: int, cap: int = 64) -> int:
    """Largest power-of-two sublane block <= cap dividing m.

    Mosaic requires the second-to-last block dim be a multiple of 8 OR the
    whole array dim — when m isn't divisible by 8 (staged eye widths like
    81 x 128 lanes), fall back to one grid step over the full dim."""
    b = 1
    while b < cap and m % (b * 2) == 0:
        b *= 2
    return b if b % 8 == 0 else m


def _rows(arrs) -> jnp.ndarray:
    """Stack (N,)/(N,3) arrays into a (rows, M, 128) f32 tensor."""
    cols = []
    for a in arrs:
        a = jnp.asarray(a)
        if a.ndim == 2:
            cols += [a[:, i] for i in range(a.shape[1])]
        else:
            cols.append(a)
    n = cols[0].shape[0]
    r = len(cols)
    pad = (-r) % 8
    cols += [jnp.zeros((n,), jnp.float32)] * pad
    return jnp.stack([c.astype(jnp.float32) for c in cols]).reshape(
        r + pad, n // 128, 128)


def _call(kernel, n_out_rows, tbl, ins, n, block, interpret):
    m = n // 128
    b = choose_block(m)
    if block:
        b = min(b, block)
    grid = (m // b,)
    in_specs = [pl.BlockSpec((TBL_ROWS, 128), lambda i: (0, 0))]
    for a in ins:
        rr = a.shape[0]
        in_specs.append(pl.BlockSpec((rr, b, 128),
                                     lambda i, rr=rr: (0, i, 0)))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((n_out_rows, b, 128), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_out_rows, m, 128), jnp.float32),
        interpret=interpret,
    )(tbl, *ins)
    return out.reshape(n_out_rows, n)


def _bez_rows(scene, o, d, newton_fn, compact_frac, t_for_quirk=None):
    """Dense Bezier lane rows (8, M, 128) via the existing Newton path."""
    from ..geometry.bezier import intersect_bezier

    n = o.shape[0]
    if not scene.has_bezier:
        return jnp.zeros((8, n // 128, 128), jnp.float32)
    tb, hb, ub, vb, nb = intersect_bezier(
        o, d, scene.bezier, iters=scene.newton_iters,
        restarts=scene.newton_restarts, newton_fn=newton_fn,
        compact_frac=compact_frac,
    )
    # The caller-side UV quirk (Bezier.h:278): v = ray distance t.
    if scene.bezier_uv_quirk:
        vb = jnp.where(hb, tb, vb)
    return _rows([tb, hb.astype(jnp.float32), ub, vb, nb])


def _merge_sphere_uv(scene, n, is_sphere, u, v):
    """Caller-side sphere UV (Obj.h:140-153) from the winner normal.

    Exactly geometry/sphere.py::sphere_uv's math on XLA's arccos (Mosaic has
    no acos lowering); non-sphere lanes keep the kernel's plane/bezier UV.
    """
    sp = scene.spheres
    if sp.count == 0:
        return u, v
    ct = jnp.clip(jnp.sum(n * sp.tex_v, -1), -_LIM, _LIM)
    theta = jnp.arccos(ct)
    st = jnp.sin(theta)
    t = jnp.sum(n * sp.tex_u, -1) / jnp.where(st < 1e-12, 1e-12, st)
    phi = jnp.arccos(jnp.clip(t, -_LIM, _LIM))
    us = theta / jnp.pi
    vs = phi / (2.0 * jnp.pi)
    flip = jnp.sum(n * jnp.cross(sp.tex_u, sp.tex_v), -1) < 0.0
    vs = jnp.where(flip, 1.0 - vs, vs)
    return jnp.where(is_sphere, us, u), jnp.where(is_sphere, vs, v)


def _color(scene, u, v, tex, flat_rgb):
    """Texture-or-flat colour mix, exactly as intersect_scene's epilogue."""
    from ..textures.texture import sample_atlas

    tex_id = tex.astype(jnp.int32)
    tc = sample_atlas(scene.atlas, tex_id, u, v)
    return jnp.where((tex_id >= 0)[:, None], tc, flat_rgb)


def photon_segment(scene, tbl, o, d, u_r, u1, u2, newton_fn=None,
                   compact_frac: float = 1.0, block: int = 0,
                   interpret: bool = False):
    """One fused photon-walk segment (Raytracer.h:117-209 body).

    Args:
      tbl: pack_walk_table(scene); o, d: (N, 3); u_r/u1/u2: (N,) uniforms
      drawn exactly like the jnp path (roulette key, cosine key splits).
    Returns dict with pos, n (N, 3); new_d (N, 3); hit, isd (N,) bool;
      color (N, 3) — texture-resolved surface colour at the hit.
    """
    n = o.shape[0]
    st = _rows([o, d])
    un = _rows([u_r, u1, u2])
    bz = _bez_rows(scene, o, d, newton_fn, compact_frac)
    kern = functools.partial(
        _photon_kernel, P=scene.n_planes, S=scene.n_spheres,
        has_bezier=scene.has_bezier, n_obj=scene.n_objects)
    out = _call(kern, 24, tbl, [st, un, bz], n, block, interpret)
    u, v = _merge_sphere_uv(scene, out[3:6].T, out[22] > 0.5,
                            out[9], out[10])
    color = _color(scene, u, v, out[11], out[14:17].T)
    return dict(
        pos=out[0:3].T, n=out[3:6].T, new_d=out[6:9].T,
        hit=out[12] > 0.5, isd=out[13] > 0.5, color=color,
        branch=out[21], powers=(out[18], out[19], out[20]),
    )


def eye_segment(scene, tbl, o, d, newton_fn=None, compact_frac: float = 1.0,
                block: int = 0, interpret: bool = False):
    """One fused eye-trace segment (Raytracer.h:296-357 body).

    Returns dict with pos, n, prim_d, m_diff, m_prim, color (N, 3);
    hit, isd, isl, isr (N,) bool.
    """
    n = o.shape[0]
    st = _rows([o, d])
    bz = _bez_rows(scene, o, d, newton_fn, compact_frac)
    kern = functools.partial(
        _eye_kernel, P=scene.n_planes, S=scene.n_spheres,
        has_bezier=scene.has_bezier, n_obj=scene.n_objects)
    out = _call(kern, 32, tbl, [st, bz], n, block, interpret)
    u, v = _merge_sphere_uv(scene, out[3:6].T, out[26] > 0.5,
                            out[9], out[10])
    color = _color(scene, u, v, out[11], out[22:25].T)
    return dict(
        pos=out[0:3].T, n=out[3:6].T, prim_d=out[6:9].T,
        hit=out[12] > 0.5, isd=out[13] > 0.5,
        isl=out[14] > 0.5, isr=out[15] > 0.5,
        m_diff=out[16:19].T, m_prim=out[19:22].T, color=color,
    )
