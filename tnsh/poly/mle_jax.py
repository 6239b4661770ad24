"""MLE evaluation-table kernels on limb planes (TPU path).

TPU-side twin of ``tnsh.poly.mle`` (SURVEY §7.0 "MLE as a sharded dense eval
table").  Tables are ``(22, N)`` int32 Fr limb planes (Montgomery,
2p-domain); index bit j of a lane is variable j, little-endian, matching the
reference's convention (polynomials.rs:108-122) exactly.

Kernels:
  * ``fold(table, r)`` — fix variable 0 (fastest bit): even/odd lane pairs
    combine as lo + r * (hi - lo).  This is THE sum-check round primitive;
    2^n mults total across a full fold schedule (vs the reference's O(4^n)
    partial_evaluate).
  * ``evaluate(table, point)`` — iterated fold.
  * ``sum_tree(table)`` — exact field sum of all lanes by halving tree.
  * ``product_round_evals(tables)`` — [g(0..3)] for a product-of-MLEs
    sum-check round: per-pair values at X = 0,1,2,3 from lo/hi (0 and 1 are
    free; 2 and 3 are two adds), multiplied across factors, tree-summed.

Under ``shard_map``/pjit the lane axis is block-sharded across the mesh:
blocks correspond to the SLOWEST variables, so folding variable 0 is
shard-local and the round sums reduce with one psum
(tnsh.parallel.mesh).  All arithmetic is exact — device rounds match the
host oracle bit-for-bit.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field.fr import Fr
from ..field.fr_jax import fr_ops
from ..field.limbs import FR_SPEC, pack_ints, unpack_ints

fr = fr_ops


def pack_mle(evaluations: Sequence[Fr]) -> np.ndarray:
    """Host -> device: pack an MLE evaluation table (Montgomery planes)."""
    return pack_ints([int(e) for e in evaluations], FR_SPEC)


def unpack_fr(planes) -> List[Fr]:
    """Device -> host canonical field elements."""
    return [Fr(v) for v in unpack_ints(np.asarray(planes), FR_SPEC)]


def pack_fr_scalar(x: Fr) -> np.ndarray:
    """A single field element as (22, 1) planes."""
    return pack_ints([int(x)], FR_SPEC)


def fold(table: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Fix variable 0 to r: out[i] = t[2i] + r * (t[2i+1] - t[2i])."""
    lo = table[:, 0::2]
    hi = table[:, 1::2]
    d = fr.sub(hi, lo)
    return fr.add(lo, fr.mont_mul(jnp.broadcast_to(r, d.shape), d))


def evaluate(table: jnp.ndarray, point_planes: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Evaluate at a point given as a list of (22, 1) plane scalars."""
    for r in point_planes:
        table = fold(table, r)
    return table


def sum_tree(table: jnp.ndarray) -> jnp.ndarray:
    """Exact field sum over all lanes -> (22, 1)."""
    n = table.shape[1]
    while n > 1:
        half = n // 2
        table = fr.add(table[:, :half], table[:, half:n])
        n = half
    return table


def product_round_evals(
    tables: Sequence[jnp.ndarray], scale: jnp.ndarray = None
) -> jnp.ndarray:
    """[g(0), g(1), g(2), g(3)] for a product-of-MLEs round -> (22, 4).

    g(x) = Σ_pairs Π_f (lo_f + x (hi_f - lo_f)).  Values at 0/1 are the
    table entries; at 2/3 they extend by the pair difference.
    """
    prods = None
    for t in tables:
        lo = t[:, 0::2]
        hi = t[:, 1::2]
        d = fr.sub(hi, lo)
        v2 = fr.add(hi, d)
        v3 = fr.add(v2, d)
        vals = jnp.concatenate([lo, hi, v2, v3], axis=1)  # (L, 4*half)
        if prods is None:
            prods = vals
        else:
            prods = fr.mont_mul(prods, vals)
    if scale is not None:
        prods = fr.mont_mul(jnp.broadcast_to(scale, prods.shape), prods)
    half = prods.shape[1] // 4
    # Sum each X-block: (L, 4*half) -> four (L, 1) sums, kept adjacent.
    sums = [
        sum_tree(prods[:, k * half:(k + 1) * half]) for k in range(4)
    ]
    return jnp.concatenate(sums, axis=1)  # (L, 4)


def sum_of_products_round_evals(
    tables: Sequence[jnp.ndarray],
    coeffs: Sequence[jnp.ndarray],
    term_idxs: Tuple[Tuple[int, ...], ...],
) -> jnp.ndarray:
    """[g(0..3)] for f = Σ_t coeff_t * Π_{f in term_t} T_f -> (22, 4).

    The TPU oracle behind the verifier-enforced sound-mode constraints
    (tnsh.protocols.sound): per lane pair the four X-point values are
    computed ONCE per distinct table, then combined per term and
    accumulated before a single tree sum.  ``term_idxs`` is static
    structure (baked into the jitted program); tables/coeffs are operands.
    """
    vals = []
    for t in tables:
        lo = t[:, 0::2]
        hi = t[:, 1::2]
        d = fr.sub(hi, lo)
        v2 = fr.add(hi, d)
        v3 = fr.add(v2, d)
        vals.append(jnp.concatenate([lo, hi, v2, v3], axis=1))
    acc = None
    for coeff, idxs in zip(coeffs, term_idxs):
        prods = None
        for f in idxs:
            prods = vals[f] if prods is None else fr.mont_mul(prods, vals[f])
        prods = fr.mont_mul(jnp.broadcast_to(coeff, prods.shape), prods)
        acc = prods if acc is None else fr.add(acc, prods)
    half = acc.shape[1] // 4
    sums = [sum_tree(acc[:, k * half:(k + 1) * half]) for k in range(4)]
    return jnp.concatenate(sums, axis=1)  # (L, 4)


def sum_of_products_round_evals_d(
    tables: Sequence[jnp.ndarray],
    coeffs: Sequence[jnp.ndarray],
    term_idxs: Tuple[Tuple[int, ...], ...],
    npts: int,
) -> jnp.ndarray:
    """[g(0..npts-1)] for a GENERIC-DEGREE sum of products -> (22, npts).

    The TPU oracle behind the bit-column protocols (tnsh.protocols.
    twist_bits): identical structure to ``sum_of_products_round_evals``
    but with ``npts`` X-points per pair (round degree npts-1), extended
    incrementally (v_{x+1} = v_x + d costs one add)."""
    vals = []
    for t in tables:
        lo = t[:, 0::2]
        hi = t[:, 1::2]
        d = fr.sub(hi, lo)
        xs = [lo, hi]
        cur = hi
        for _ in range(npts - 2):
            cur = fr.add(cur, d)
            xs.append(cur)
        vals.append(jnp.concatenate(xs, axis=1))  # (L, npts*half)
    acc = None
    for coeff, idxs in zip(coeffs, term_idxs):
        prods = vals[idxs[0]]
        for f in idxs[1:]:
            prods = fr.mont_mul(prods, vals[f])
        prods = fr.mont_mul(jnp.broadcast_to(coeff, prods.shape), prods)
        acc = prods if acc is None else fr.add(acc, prods)
    half = acc.shape[1] // npts
    sums = [sum_tree(acc[:, k * half:(k + 1) * half]) for k in range(npts)]
    return jnp.concatenate(sums, axis=1)  # (L, npts)


_sop_round_evals_d_jit_xla = jax.jit(
    sum_of_products_round_evals_d, static_argnums=(2, 3)
)


def sum_of_products_round_evals_d_jit(tables, coeffs, term_idxs,
                                      npts) -> jnp.ndarray:
    from ..field import fr_pallas

    if fr_pallas.enabled() and fr_pallas.can_round(tables[0].shape[1]):
        return fr_pallas.sum_of_products_round_evals(
            tables, coeffs, term_idxs, npts
        )
    return _sop_round_evals_d_jit_xla(tables, coeffs, term_idxs, npts)


# jitted wrappers (shapes cached by XLA)
_fold_jit_xla = jax.jit(fold)
sum_tree_jit = jax.jit(sum_tree)
_product_round_evals_jit_xla = jax.jit(product_round_evals)
_sop_round_evals_jit_xla = jax.jit(
    sum_of_products_round_evals, static_argnums=(2,)
)


# Routed entry points: on TPU backends large tables run the VMEM-resident
# Pallas kernels (tnsh.field.fr_pallas — the XLA CIOS chain round-trips
# HBM and sustains ~54 M muls/s vs Pallas's ~230 M, PERF_NOTES round-3
# finding 9); small/odd shapes and CPU keep the XLA path.  Both are
# exact, so proofs are identical either way.

def fold_jit(table: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    from ..field import fr_pallas

    if fr_pallas.enabled() and fr_pallas.can_fold(table.shape[1]):
        return fr_pallas.fold(table, r)
    return _fold_jit_xla(table, r)


def product_round_evals_jit(tables, scale=None) -> jnp.ndarray:
    from ..field import fr_pallas

    if fr_pallas.enabled() and fr_pallas.can_round(tables[0].shape[1]):
        return fr_pallas.product_round_evals(tables, scale)
    return _product_round_evals_jit_xla(tables, scale)


def sum_of_products_round_evals_jit(tables, coeffs, term_idxs) -> jnp.ndarray:
    from ..field import fr_pallas

    if fr_pallas.enabled() and fr_pallas.can_round(tables[0].shape[1]):
        return fr_pallas.sum_of_products_round_evals(
            tables, coeffs, term_idxs
        )
    return _sop_round_evals_jit_xla(tables, coeffs, term_idxs)


@jax.jit
def product_round_step(tables, r):
    """One full sum-check round for a product oracle: returns
    ([g(0..3)] BEFORE folding, folded tables AFTER binding r).

    Callers use g from the PREVIOUS round's output, draw the challenge on
    the host transcript, then invoke with that r.
    """
    folded = [fold(t, r) for t in tables]
    evals = product_round_evals(tables)
    return evals, folded
