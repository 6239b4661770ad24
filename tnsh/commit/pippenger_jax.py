"""Work-efficient Pippenger MSM on TPU (the flagship kernel).

The double-and-add MSM (msm_jax) costs ~4800 field muls per point; Pippenger
costs ~W * (n + 2 * 2^c) group adds total.  This implementation keeps the
bucket accumulation *work-efficient* on TPU by making lanes = buckets:

  1. **Host schedule** (numpy): for each of the W = ceil(254/c) windows,
     points are bucketed by scalar digit; the schedule tensor
     ``idx[w, s, b]`` holds the point index of the s-th member of bucket b
     (-1 = empty slot).  R = the maximum bucket occupancy over all windows
     bounds the sequential depth.
  2. **Device kernel** (jit): for each window, R steps of batched mixed-add
     insert one scheduled point into every bucket lane simultaneously
     (gather + masked group add over (22, 2^c) planes).  Bucket aggregation
     Σ d * B_d runs as a Hillis-Steele suffix scan (log2(2^c) batched adds)
     plus a tree reduction; windows combine with c doublings each.

Total group work: W * (n + ~2 * 2^c * log) adds — the Pippenger optimum up
to the scan overhead — fully lane-parallel.  All arithmetic is the exact
limb-plane 2p-domain of fr_jax, so results match the host MSM bit-for-bit.

Sharding: points partition over a mesh by lanes exactly like msm_jax; each
device runs this kernel on its block and partial results tree-combine
(tnsh.parallel.mesh).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..field.fr import Fr
from ..field.g1 import G1
from ..field.limbs import FQ_SPEC
from .msm_jax import (
    _jacobian_to_g1,
    _padd,
    _padd_mixed_safe,
    _pdouble,
    fq,
    pack_g1_points,
)

_SCALAR_BITS = 254


def _digits_np(scalars: Sequence[int], c: int) -> np.ndarray:
    """(W, N) int32 window digits of the scalars (little-endian windows)."""
    n = len(scalars)
    windows = (_SCALAR_BITS + c - 1) // c
    out = np.zeros((windows, n), dtype=np.int32)
    mask = (1 << c) - 1
    for j, s in enumerate(scalars):
        v = int(s)
        for w in range(windows):
            out[w, j] = (v >> (w * c)) & mask
    return out


def build_schedule(scalars: Sequence[int], c: int):
    """Host-side bucket schedule: returns (idx (R, W * 2^c) int32, R).

    Column w * 2^c + b is bucket b of window w; idx[s, col] is the point
    index of the s-th member of that bucket, or -1.  All windows' buckets
    occupy one flat lane axis so the device kernel inserts into EVERY
    bucket of EVERY window simultaneously — sequential depth is just R,
    the maximum bucket occupancy.  Bucket 0 columns stay empty (digit 0
    contributes nothing).
    """
    digits = _digits_np(scalars, c)
    windows, n = digits.shape
    buckets = 1 << c
    counts = np.zeros((windows, buckets), dtype=np.int64)
    for w in range(windows):
        counts[w] = np.bincount(digits[w], minlength=buckets)
    counts[:, 0] = 0
    r_max = int(counts.max()) if counts.size else 0
    # Pad the sequential depth to a multiple of 8 so minor occupancy
    # variation between calls reuses the compiled kernel shape.
    r_pad = max(((r_max + 7) // 8) * 8, 8)
    idx = np.full((r_pad, windows * buckets), -1, dtype=np.int32)
    for w in range(windows):
        order = np.argsort(digits[w], kind="stable")
        sorted_d = digits[w][order]
        starts = np.searchsorted(sorted_d, np.arange(buckets))
        ends = np.searchsorted(sorted_d, np.arange(buckets) + 1)
        for b in range(1, buckets):
            cnt = ends[b] - starts[b]
            if cnt:
                idx[:cnt, w * buckets + b] = order[starts[b]:ends[b]]
    return idx, r_pad


def _suffix_weighted_sums_per_window(X, Y, Z, windows: int, buckets: int):
    """Per-window Σ_{d>=1} d * B_d over a flat (L, W*B) bucket axis.

    Suffix scan and tree sum act WITHIN each window's bucket block: the
    roll partner is masked out when it crosses a block boundary, so one
    batched operation serves all windows.  Returns (L, W) window sums.
    """
    total = windows * buckets
    lane_in_block = np.arange(total) % buckets
    steps = buckets.bit_length() - 1

    def suffix_body(k, state):
        X, Y, Z = state
        shift = 1 << k
        Xs = jnp.roll(X, -shift, axis=1)
        Ys = jnp.roll(Y, -shift, axis=1)
        Zs = jnp.roll(Z, -shift, axis=1)
        valid = (lane_in_block + shift) < buckets
        Xn, Yn, Zn = _padd(X, Y, Z, Xs, Ys, Zs)
        return (
            fq.select(valid, Xn, X),
            fq.select(valid, Yn, Y),
            fq.select(valid, Zn, Z),
        )

    X, Y, Z = lax.fori_loop(0, steps, suffix_body, (X, Y, Z))
    # Drop every block's bucket-0 lane, then tree-sum within blocks.
    zero_mask = lane_in_block == 0
    Z = fq.select(zero_mask, jnp.zeros_like(Z), Z)

    def tree_body(k, state):
        X, Y, Z = state
        shift = buckets >> (k + 1)
        Xs = jnp.roll(X, -shift, axis=1)
        Ys = jnp.roll(Y, -shift, axis=1)
        Zs = jnp.roll(Z, -shift, axis=1)
        Xn, Yn, Zn = _padd(X, Y, Z, Xs, Ys, Zs)
        active = lane_in_block < shift
        return (
            fq.select(active, Xn, X),
            fq.select(active, Yn, Y),
            fq.select(active, Zn, Z),
        )

    X, Y, Z = lax.fori_loop(0, steps, tree_body, (X, Y, Z))
    # window sums sit at each block's lane 0
    sel = np.arange(windows) * buckets
    return X[:, sel], Y[:, sel], Z[:, sel]


def _make_kernel(c: int, windows: int):
    buckets = 1 << c

    def kernel(xs, ys, idx):
        """xs/ys: (L, N) affine Montgomery planes; idx: (R, W*B)."""
        r_depth = idx.shape[0]
        total = windows * buckets

        zero = jnp.broadcast_to(xs[:, :1] * 0, (xs.shape[0], total))
        one_np = np.asarray(FQ_SPEC.one_mont_limbs(), dtype=np.int32)[:, None]
        Xb, Yb, Zb = zero, zero + one_np, zero

        def step(s, state):
            X, Y, Z = state
            ind = idx[s]
            take = ind >= 0
            safe = jnp.maximum(ind, 0)
            px = jnp.take(xs, safe, axis=1)
            py = jnp.take(ys, safe, axis=1)
            return _padd_mixed_safe(X, Y, Z, px, py, take)

        Xb, Yb, Zb = lax.fori_loop(0, r_depth, step, (Xb, Yb, Zb))
        Xw, Yw, Zw = _suffix_weighted_sums_per_window(
            Xb, Yb, Zb, windows, buckets
        )

        # Horner combine over windows, high to low: 1 pdouble instance,
        # c doublings per window, all in one fori_loop.
        def combine(i, state):
            X, Y, Z = state

            def dbl(_, st):
                return _pdouble(*st)

            X, Y, Z = lax.fori_loop(0, c, dbl, (X, Y, Z))
            w = windows - 1 - i
            Xw_i = lax.dynamic_slice_in_dim(Xw, w, 1, axis=1)
            Yw_i = lax.dynamic_slice_in_dim(Yw, w, 1, axis=1)
            Zw_i = lax.dynamic_slice_in_dim(Zw, w, 1, axis=1)
            return _padd(X, Y, Z, Xw_i, Yw_i, Zw_i)

        X = xs[:, :1] * 0
        Y = xs[:, :1] * 0 + one_np
        Z = xs[:, :1] * 0
        return lax.fori_loop(0, windows, combine, (X, Y, Z))

    return kernel


@lru_cache(maxsize=8)
def _compiled(c: int):
    windows = (_SCALAR_BITS + c - 1) // c
    return jax.jit(_make_kernel(c, windows))


class PippengerContext:
    """Device-resident base points for repeated Pippenger MSMs.

    NOTE: window widths above c=10 grow the flat bucket axis past ~10^5
    lanes; on the axon v5e worker the resulting gather crashed the TPU
    runtime at c=12/n=2^16 — keep c <= 10 until the round-2 Pallas bucket
    kernel (PERF_NOTES.md) replaces the XLA gather.
    """

    def __init__(self, points: Sequence[G1], c: int = 10):
        xs, ys, valid = pack_g1_points(points)
        self.c = c
        self.xs = jnp.asarray(xs)
        self.ys = jnp.asarray(ys)
        self.valid = valid
        self.num_points = len(points)

    def msm(self, scalars: Sequence[Fr]) -> G1:
        n = len(scalars)
        if n == 0:
            return G1.zero()
        if n > self.num_points:
            raise ValueError("more scalars than base points")
        # zero out scalars of invalid (identity) points
        eff = [
            int(s) if self.valid[i] else 0 for i, s in enumerate(scalars)
        ]
        idx, _ = build_schedule(eff, self.c)
        X, Y, Z = _compiled(self.c)(
            self.xs[:, :n] if n == self.num_points else self.xs[:, :n],
            self.ys[:, :n],
            jnp.asarray(idx),
        )
        return _jacobian_to_g1(X, Y, Z)


def msm_pippenger_jax(points: Sequence[G1], scalars: Sequence[Fr],
                      c: int = 12) -> G1:
    """One-shot TPU Pippenger MSM."""
    n = min(len(points), len(scalars))
    if n == 0:
        return G1.zero()
    return PippengerContext(points[:n], c=c).msm(scalars[:n])
