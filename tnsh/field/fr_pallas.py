"""Pallas TPU kernels for the hot Fr limb-plane ops.

The XLA path (tnsh.field.fr_jax) already fuses well; these kernels control
tiling explicitly for the two hottest primitives (SURVEY §7.3 item 2,
pallas_guide.md):

  * ``mont_mul_pallas`` — elementwise CIOS Montgomery multiplication over
    ``(22, N)`` planes, tiled along the lane axis so each block's limb
    planes stay VMEM-resident across the whole 22-step reduction.
  * ``fold_halves_pallas`` — one sum-check fold round in the *halves*
    layout: out = lo + r * (hi - lo) with lo = lanes [0, N/2), hi = lanes
    [N/2, N).  Folding contiguous halves (the LAST variable) instead of
    stride-2 pairs keeps Pallas block slicing trivial; packing tables with
    reversed bit order (``bit_reverse_permutation``) makes "fold halves each
    round" semantically identical to the reference's fold-variable-0
    schedule (round sums are order-independent and the final scalar is the
    same evaluation).

Pallas kernels may not capture array constants, so the field arithmetic here
is written in row form with Python-int scalar constants only (modulus limbs
as immediates, zeros derived from the inputs).  Values follow the same lazy
2p-domain as fr_jax; results are bit-identical to the XLA and host paths.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .limbs import FR_SPEC, LIMB_BITS, LIMB_MASK, NUM_LIMBS, int_to_limbs

L = NUM_LIMBS
B = LIMB_BITS
MASK = LIMB_MASK

_P_LIMBS = [int(x) for x in int_to_limbs(FR_SPEC.modulus)]
_P2_LIMBS = [int(x) for x in int_to_limbs(2 * FR_SPEC.modulus)]
_N0 = FR_SPEC.n0

#: Lane-axis block width (multiple of 128 for TPU tiling).
BLOCK = 512


# -- row-form field ops (Pallas-safe: no captured array constants) ----------

def _normalize_rows(rows):
    out = []
    carry = None
    for v in rows:
        v = v if carry is None else v + carry
        carry = v >> B
        out.append(v & MASK)
    return out, carry


def _cond_sub_rows(rows, m_limbs):
    d = [r - int(m) for r, m in zip(rows, m_limbs)]
    out, carry = _normalize_rows(d)
    ge = carry >= 0
    return [jnp.where(ge, o, r) for o, r in zip(out, rows)]


def _add_rows(a_rows, b_rows):
    s, _ = _normalize_rows([x + y for x, y in zip(a_rows, b_rows)])
    return _cond_sub_rows(s, _P2_LIMBS)


def _sub_rows(a_rows, b_rows):
    s, _ = _normalize_rows(
        [x - y + p2 for x, y, p2 in zip(a_rows, b_rows, _P2_LIMBS)]
    )
    return _cond_sub_rows(s, _P2_LIMBS)


def _mont_mul_rows(a_rows, b_rows):
    zero = a_rows[0] * 0
    t = [zero] * (L + 1)
    for i in range(L):
        ai = a_rows[i]
        for j in range(L):
            t[j] = t[j] + ai * b_rows[j]
        m = (t[0] * _N0) & MASK
        for j in range(L):
            if _P_LIMBS[j]:
                t[j] = t[j] + m * _P_LIMBS[j]
        carry = t[0] >> B
        t = t[1:] + [zero]
        t[0] = t[0] + carry
    out, _ = _normalize_rows(t)
    return out[:L]


def _rows(ref_val):
    return [ref_val[i] for i in range(L)]


# -- kernels ----------------------------------------------------------------

def _mul_kernel(a_ref, b_ref, out_ref):
    out = _mont_mul_rows(_rows(a_ref[:]), _rows(b_ref[:]))
    out_ref[:] = jnp.stack(out)


@jax.jit
def mont_mul_pallas(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise Montgomery product of (22, N) planes, N % BLOCK == 0."""
    n = a.shape[1]
    if n % BLOCK:
        raise ValueError(f"lane count {n} must be a multiple of {BLOCK}")
    grid = (n // BLOCK,)
    spec = pl.BlockSpec((L, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _mul_kernel,
        out_shape=jax.ShapeDtypeStruct(a.shape, jnp.int32),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
    )(a, b)


def _fold_kernel(lo_ref, hi_ref, r_ref, out_ref):
    lo = _rows(lo_ref[:])
    hi = _rows(hi_ref[:])
    r_col = r_ref[:]  # (L, 1)
    width = lo_ref.shape[1]
    r_rows = [jnp.broadcast_to(r_col[i], lo[0].shape) for i in range(L)]
    d = _sub_rows(hi, lo)
    prod = _mont_mul_rows(r_rows, d)
    out = _add_rows(lo, prod)
    out_ref[:] = jnp.stack(out)


@jax.jit
def fold_halves_pallas(table: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """One fold round in halves layout: (22, N) -> (22, N/2).

    ``r`` is a (22, 1) plane scalar.  For N/2 < BLOCK falls back to the XLA
    fold (tiny tails of the fold schedule are latency-bound anyway).
    """
    from .fr_jax import fr_ops

    n = table.shape[1]
    half = n // 2
    lo = table[:, :half]
    hi = table[:, half:]
    if half % BLOCK:
        d = fr_ops.sub(hi, lo)
        return fr_ops.add(lo, fr_ops.mont_mul(jnp.broadcast_to(r, d.shape), d))
    grid = (half // BLOCK,)
    spec = pl.BlockSpec((L, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)
    r_spec = pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _fold_kernel,
        out_shape=jax.ShapeDtypeStruct((L, half), jnp.int32),
        grid=grid,
        in_specs=[spec, spec, r_spec],
        out_specs=spec,
    )(lo, hi, r)


def bit_reverse_permutation(num_vars: int) -> np.ndarray:
    """Lane permutation that reverses index bit order.

    Packing an MLE table through this permutation turns the reference's
    fold-variable-0 schedule into fold-halves: after the permutation,
    variable 0 is the slowest bit, so each round folds contiguous halves.
    """
    n = 1 << num_vars
    out = np.zeros(n, dtype=np.int64)
    for i in range(n):
        rev = 0
        x = i
        for _ in range(num_vars):
            rev = (rev << 1) | (x & 1)
            x >>= 1
        out[i] = rev
    return out
