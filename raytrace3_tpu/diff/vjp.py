"""Custom VJPs for the SPPM hot path.

BASELINE.json names this deliverable: "pixel gradients w.r.t. material
albedo, texture maps, and Bezier control points flowing through the
iterative flux-update via custom_vjp".  Two pieces live here:

1. ``deposit_bruteforce_vjp`` — the scatter-add deposit with a
   RECOMPUTING backward.  Naive AD through the chunked all-pairs deposit
   saves every chunk's (C x J) neighbour mask — i.e. the full C x D boolean
   matrix — as residuals.  The custom VJP stores only the inputs and
   rebuilds each mask chunk on the backward pass (hard part (c)/(d) in
   SURVEY.md section 7): memory drops from O(C*D) to O(C + D).

   Gradient semantics: the neighbour mask is a box kernel — piecewise
   constant in positions/radii — so its a.e.-correct derivative w.r.t.
   pos/r2/n is zero and the VJP propagates only into ``hp.wgt`` and
   ``dep.flux`` (the photon-side flux chain then carries d(albedo),
   d(texture) back through the walk; the camera-side wgt chain carries the
   eye-path products).

2. ``make_checkpointed_rounds`` — ``jax.checkpoint`` over the per-round
   body so backward recomputes each photon round instead of storing its
   intermediates (the (R2, tao) shrink recurrence k = (N+a dN)/(N+dN) is
   re-run forward per round during the backward sweep).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.types import Deposits, HitPoints
from ..render.deposit import NORMAL_DOT_MIN, _PREC, pair_d2_ndot


def _pad_to(x, n):
    pad = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)


def _masks_and_sums(hp_pos, hp_n, hp_r2, hp_valid, wgt, dep, chunk):
    """Forward helper: returns (cnt, flux_sum) without materialising C x D."""
    D = dep.pos.shape[0]
    padded = D + ((-D) % chunk)
    dp, dn, df = (_pad_to(dep.pos, padded), _pad_to(dep.n, padded),
                  _pad_to(dep.flux, padded))
    dv = _pad_to(dep.valid, padded)

    def body(carry, idx):
        cnt, fl = carry
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, idx * chunk, chunk)
        dpc, dnc, dfc, dvc = sl(dp), sl(dn), sl(df), sl(dv)
        d2, ndot = pair_d2_ndot(hp_pos, hp_n, dpc, dnc)
        m = (
            (d2 <= hp_r2[:, None])
            & (ndot > NORMAL_DOT_MIN)
            & dvc[None, :]
            & hp_valid[:, None]
        ).astype(dpc.dtype)
        return (cnt + m.sum(1),
                fl + jnp.matmul(m, dfc, precision=_PREC)), None

    init = (jnp.zeros(hp_pos.shape[0], dp.dtype),
            jnp.zeros((hp_pos.shape[0], 3), dp.dtype))
    (cnt, fl), _ = jax.lax.scan(body, init, jnp.arange(padded // chunk))
    return cnt, fl


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def deposit_bruteforce_vjp(hp: HitPoints, dep: Deposits, chunk: int = 4096):
    """Drop-in for ``render.deposit.deposit_bruteforce`` with O(C+D) memory
    on the backward pass."""
    cnt, fl = _masks_and_sums(hp.pos, hp.n, hp.r2, hp.valid, hp.wgt, dep, chunk)
    return cnt, hp.wgt * fl / jnp.pi


def _fwd(hp, dep, chunk):
    cnt, fl = _masks_and_sums(hp.pos, hp.n, hp.r2, hp.valid, hp.wgt, dep, chunk)
    # Residuals: inputs + the flux row-sums (cheap, (C,3)); masks recompute.
    return (cnt, hp.wgt * fl / jnp.pi), (hp, dep, fl)


def _bwd(chunk, res, g):
    hp, dep, fl = res
    g_cnt, g_tao = g  # d(cnt)/d(anything smooth) = 0 (piecewise constant)

    # d wgt = g_tao * fl / pi
    d_wgt = g_tao * fl / jnp.pi

    # d flux_j = sum_i m_ij * (g_tao_i . wgt_i scaled) / pi  -> recompute
    # mask chunks and apply the transposed matmul.
    gw = g_tao * hp.wgt / jnp.pi                       # (C, 3)
    D = dep.pos.shape[0]
    padded = D + ((-D) % chunk)
    dp, dn = _pad_to(dep.pos, padded), _pad_to(dep.n, padded)
    dv = _pad_to(dep.valid, padded)

    def body(_, idx):
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, idx * chunk, chunk)
        dpc, dnc, dvc = sl(dp), sl(dn), sl(dv)
        d2, ndot = pair_d2_ndot(hp.pos, hp.n, dpc, dnc)
        m = (
            (d2 <= hp.r2[:, None])
            & (ndot > NORMAL_DOT_MIN)
            & dvc[None, :]
            & hp.valid[:, None]
        ).astype(dpc.dtype)
        return None, jnp.matmul(m.T, gw, precision=_PREC)  # (chunk, 3)

    _, d_flux_chunks = jax.lax.scan(body, None, jnp.arange(padded // chunk))
    d_flux = d_flux_chunks.reshape(padded, 3)[:D]

    def zero_cot(x):
        """Zero cotangent with the right type (float0 for int/bool leaves)."""
        import numpy as np

        if jnp.issubdtype(x.dtype, jnp.inexact):
            return jnp.zeros_like(x)
        return np.zeros(x.shape, jax.dtypes.float0)

    d_hp = HitPoints(
        pos=zero_cot(hp.pos), n=zero_cot(hp.n), wgt=d_wgt,
        pixel=zero_cot(hp.pixel), valid=zero_cot(hp.valid),
        r2=zero_cot(hp.r2), nphot=zero_cot(hp.nphot),
        tao=zero_cot(hp.tao),
    )
    d_dep = Deposits(
        pos=zero_cot(dep.pos), n=zero_cot(dep.n), flux=d_flux,
        valid=zero_cot(dep.valid),
    )
    return d_hp, d_dep


deposit_bruteforce_vjp.defvjp(_fwd, _bwd)
