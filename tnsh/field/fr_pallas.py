"""VMEM-resident Pallas kernels for the Fr elementwise hot path (TPU).

Why this module exists: the XLA CIOS Montgomery-mul body is ~650
primitives — beyond XLA's fusion budget — so chained field ops round-trip
intermediates through HBM and sustain ~54 M muls/s on a v5e, ~25x below
the VPU's measured 0.77 T int-ops/s (PERF_NOTES round-3 findings 7/9).
Running the whole chain inside one Pallas kernel keeps every CIOS
intermediate in VMEM; the same arithmetic sustains ~230 M muls/s
(measured via the MSM insertion kernel, tools/exp_pallas_insert.py).

This module ships that win into the production sum-check path — the
kernels behind ``tnsh.poly.mle_jax``'s jitted entry points (fold and the
product / sum-of-products round evaluations used by the Jax oracles and
the sound provers), re-designing the reference's rayon table fold
(/root/reference/src/polynomials.rs:92-122) for the TPU VPU:

  * ``fold(table, r)`` — lo/hi de-interleave in XLA (one bandwidth pass),
    then a Pallas grid over 2048-lane blocks computes
    lo + r*(hi - lo) with the CIOS chain VMEM-resident.
  * ``product_round_evals(tables)`` / ``sum_of_products_round_evals``
    — per 2048-lane block, the four X-point values, the factor products
    and an in-block tree reduction to 128 lanes all happen in VMEM; the
    per-block (L, 4*128) partial sums accumulate across grid steps in a
    revisited output block, and XLA finishes the final 128-lane tree.
    Field sums are exact in any association, so results unpack to the
    same canonical elements as the XLA/host paths (tested).
  * ``mont_mul_chain(x, y, iters)`` — iters back-to-back Montgomery
    multiplications with the accumulator VMEM-resident across a
    (block, iter) grid.  This is the driver bench's fr_mont_mul probe
    AND the building block for batched exponentiation.

Routing: ``enabled()`` is true on real TPU backends (or when
TNSH_PALLAS_INTERPRET opts tests into Mosaic interpret mode) unless
TNSH_PALLAS_ELEMWISE=0.  ``mle_jax``'s jitted entry points consult it
per call and fall back to the XLA kernels for small or odd-shaped
inputs, so callers never change.

All arithmetic is exact 2p-domain limb math (tnsh.field.fr_jax) —
bit-compatible with the host golden path by construction and locked by
tests/test_jax_backend.py.
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np

from .limbs import FR_SPEC, NUM_LIMBS, int_to_limbs

L = NUM_LIMBS

#: Lanes per Pallas block.  (L, 2048) int32 = 180 KB per operand; the
#: CIOS chain's live intermediates at 2048 lanes need ~10 MB of scoped
#: VMEM — comfortably under the 64 MB limit we request.
BLOCK = 2048

#: Lane width of the in-block reduction output (the TPU vreg lane count —
#: narrower would force sub-lane layouts in Mosaic).
RED = 128


def _get():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return jax, jnp, pl, pltpu


def _interpret() -> bool:
    return bool(os.environ.get("TNSH_PALLAS_INTERPRET"))


def enabled() -> bool:
    """Pallas elementwise kernels: on for TPU backends and interpret-mode
    tests, off otherwise (XLA fallback)."""
    if os.environ.get("TNSH_PALLAS_ELEMWISE", "") == "0":
        return False
    if _interpret():
        return True
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - jax always importable here
        return False


@lru_cache(maxsize=1)
def _consts():
    """(L, RED) broadcast field constants the kernels take as inputs
    (Mosaic forbids captured device arrays)."""
    p_b = np.ascontiguousarray(np.broadcast_to(
        np.asarray(FR_SPEC.modulus_limbs(), np.int32)[:, None], (L, RED)))
    p2_b = np.ascontiguousarray(np.broadcast_to(
        np.asarray(int_to_limbs(2 * FR_SPEC.modulus), np.int32)[:, None],
        (L, RED)))
    one_b = np.ascontiguousarray(np.broadcast_to(
        np.asarray(FR_SPEC.one_mont_limbs(), np.int32)[:, None], (L, RED)))
    return p_b, p2_b, one_b


def _kernel_ops(p_ref, p2_ref, one_ref):
    from .fr_jax import make_field_ops

    return make_field_ops(
        FR_SPEC, consts=(p_ref[:, :1], p2_ref[:, :1], one_ref[:, :1])
    )


def _tree_to_red(fr, v):
    """In-block exact tree sum (L, BLOCK) -> (L, RED)."""
    n = v.shape[1]
    while n > RED:
        half = n // 2
        v = fr.add(v[:, :half], v[:, half:n])
        n = half
    return v


# ---------------------------------------------------------------------------
# fold
# ---------------------------------------------------------------------------

@lru_cache(maxsize=32)
def _fold_call(half: int, interpret: bool):
    jax, jnp, pl, pltpu = _get()
    nblk = half // BLOCK

    def kern(lo_ref, hi_ref, r_ref, p_ref, p2_ref, one_ref, out_ref):
        # r arrives pre-broadcast at full block width: Mosaic rejects
        # in-kernel (L, 1) -> (L, BLOCK) broadcasts ("Broadcast in both
        # sublanes and lanes"), which interpret-mode tests never see
        fr = _kernel_ops(p_ref, p2_ref, one_ref)
        lo = lo_ref[:]
        hi = hi_ref[:]
        d = fr.sub(hi, lo)
        out_ref[:] = fr.add(lo, fr.mont_mul(r_ref[:], d))

    blk = pl.BlockSpec((L, BLOCK), lambda s: (0, s),
                       memory_space=pltpu.VMEM)
    rblk = pl.BlockSpec((L, BLOCK), lambda s: (0, 0),
                        memory_space=pltpu.VMEM)
    cst = pl.BlockSpec((L, RED), lambda s: (0, 0),
                       memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kern,
        grid=(nblk,),
        in_specs=[blk, blk, rblk, cst, cst, cst],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((L, half), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )
    p_b, p2_b, one_b = _consts()

    @jax.jit
    def fold(table, r):
        lo = table[:, 0::2]
        hi = table[:, 1::2]
        r_full = jnp.broadcast_to(r, (L, BLOCK))
        return call(lo, hi, r_full, p_b, p2_b, one_b)

    return fold


def can_fold(n_lanes: int) -> bool:
    return n_lanes >= 2 * BLOCK and (n_lanes // 2) % BLOCK == 0


def fold(table, r):
    """Pallas fold: same contract as ``mle_jax.fold`` (exact)."""
    half = table.shape[1] // 2
    return _fold_call(half, _interpret())(table, r)


# ---------------------------------------------------------------------------
# round evaluations
# ---------------------------------------------------------------------------

def _xpoint_vals(fr, lo, hi, npts: int = 4):
    """Values of one table's pair-polynomial at X = 0..npts-1."""
    d = fr.sub(hi, lo)
    out = [lo, hi]
    cur = hi
    for _ in range(npts - 2):
        cur = fr.add(cur, d)
        out.append(cur)
    return tuple(out)


@lru_cache(maxsize=32)
def _product_evals_call(num_factors: int, half: int, interpret: bool):
    jax, jnp, pl, pltpu = _get()
    nblk = half // BLOCK

    def kern(*refs):
        # refs: lo_0, hi_0, ..., lo_{F-1}, hi_{F-1}, p, p2, one, acc
        tabs = refs[: 2 * num_factors]
        p_ref, p2_ref, one_ref = refs[2 * num_factors: 2 * num_factors + 3]
        acc_ref = refs[-1]
        fr = _kernel_ops(p_ref, p2_ref, one_ref)
        s = pl.program_id(0)

        @pl.when(s == 0)
        def _init():
            acc_ref[:] = jnp.zeros((L, 4 * RED), jnp.int32)

        vals = [
            _xpoint_vals(fr, tabs[2 * f][:], tabs[2 * f + 1][:])
            for f in range(num_factors)
        ]
        for x in range(4):
            prods = vals[0][x]
            for f in range(1, num_factors):
                prods = fr.mont_mul(prods, vals[f][x])
            part = _tree_to_red(fr, prods)
            sl = slice(x * RED, (x + 1) * RED)
            acc_ref[:, sl] = fr.add(acc_ref[:, sl], part)

    blk = pl.BlockSpec((L, BLOCK), lambda s: (0, s),
                       memory_space=pltpu.VMEM)
    cst = pl.BlockSpec((L, RED), lambda s: (0, 0),
                       memory_space=pltpu.VMEM)
    acc = pl.BlockSpec((L, 4 * RED), lambda s: (0, 0),
                       memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kern,
        grid=(nblk,),
        in_specs=[blk] * (2 * num_factors) + [cst] * 3,
        out_specs=acc,
        out_shape=jax.ShapeDtypeStruct((L, 4 * RED), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )
    p_b, p2_b, one_b = _consts()

    @jax.jit
    def evals(tables, scale):
        from ..poly import mle_jax

        args = []
        for t in tables:
            args.append(t[:, 0::2])
            args.append(t[:, 1::2])
        acc128 = call(*args, p_b, p2_b, one_b)
        sums = [
            mle_jax.sum_tree(acc128[:, x * RED:(x + 1) * RED])
            for x in range(4)
        ]
        out = jnp.concatenate(sums, axis=1)  # (L, 4)
        if scale is not None:
            # g scaled after summation — distributive, exact
            from ..field.fr_jax import fr_ops

            out = fr_ops.mont_mul(jnp.broadcast_to(scale, out.shape), out)
        return out

    return evals


def can_round(n_lanes: int) -> bool:
    return n_lanes >= 2 * BLOCK and (n_lanes // 2) % BLOCK == 0


def product_round_evals(tables, scale=None):
    """Pallas product-of-MLEs round evals: same contract as
    ``mle_jax.product_round_evals`` (canonically equal; the in-block
    summation order differs, which is invisible after unpacking)."""
    half = tables[0].shape[1] // 2
    fn = _product_evals_call(len(tables), half, _interpret())
    return fn(tuple(tables), scale)


@lru_cache(maxsize=64)
def _sop_evals_call(num_tables: int, term_idxs, half: int, interpret: bool,
                    npts: int = 4):
    jax, jnp, pl, pltpu = _get()
    # Generic-degree kernels hold npts X-point values per table in VMEM;
    # Mosaic's measured live set is ~6.3x (tables x npts x L x lanes x
    # 4 B) — 101.47 MB at 9 tables x npts 10 x 2048 lanes.  Halve the
    # block until the calibrated estimate fits the 100 MB scoped limit;
    # the (half % block) divisibility guarantee survives because blocks
    # only shrink by powers of two.
    blk_lanes = BLOCK
    while blk_lanes > RED and (
        num_tables * npts * L * blk_lanes * 4 * 7 > 90 * 2**20
    ):
        blk_lanes //= 2
    nblk = half // blk_lanes
    num_terms = len(term_idxs)

    def kern(*refs):
        # refs: lo/hi per table, coeff per term, p, p2, one, acc
        tabs = refs[: 2 * num_tables]
        coeffs = refs[2 * num_tables: 2 * num_tables + num_terms]
        p_ref, p2_ref, one_ref = refs[
            2 * num_tables + num_terms: 2 * num_tables + num_terms + 3]
        acc_ref = refs[-1]
        fr = _kernel_ops(p_ref, p2_ref, one_ref)
        s = pl.program_id(0)

        @pl.when(s == 0)
        def _init():
            acc_ref[:] = jnp.zeros((L, npts * RED), jnp.int32)

        vals = [
            _xpoint_vals(fr, tabs[2 * f][:], tabs[2 * f + 1][:], npts)
            for f in range(num_tables)
        ]
        for x in range(npts):
            sl = slice(x * RED, (x + 1) * RED)
            for t, idxs in enumerate(term_idxs):
                prods = vals[idxs[0]][x]
                for f in idxs[1:]:
                    prods = fr.mont_mul(prods, vals[f][x])
                # coeff applied AFTER the in-block reduction, at the
                # coeff ref's own (L, RED) width: Mosaic rejects the
                # (L, 1) -> (L, BLOCK) broadcast ("Broadcast in both
                # sublanes and lanes"); distributivity keeps this exact
                part = fr.mont_mul(coeffs[t][:], _tree_to_red(fr, prods))
                acc_ref[:, sl] = fr.add(acc_ref[:, sl], part)

    blk = pl.BlockSpec((L, blk_lanes), lambda s: (0, s),
                       memory_space=pltpu.VMEM)
    cst = pl.BlockSpec((L, RED), lambda s: (0, 0),
                       memory_space=pltpu.VMEM)
    acc = pl.BlockSpec((L, npts * RED), lambda s: (0, 0),
                       memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kern,
        grid=(nblk,),
        in_specs=[blk] * (2 * num_tables) + [cst] * (num_terms + 3),
        out_specs=acc,
        out_shape=jax.ShapeDtypeStruct((L, npts * RED), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )
    p_b, p2_b, one_b = _consts()

    @jax.jit
    def evals(tables, coeffs):
        from ..poly import mle_jax

        args = []
        for t in tables:
            args.append(t[:, 0::2])
            args.append(t[:, 1::2])
        for c in coeffs:
            args.append(jnp.broadcast_to(c, (L, RED)))
        acc128 = call(*args, p_b, p2_b, one_b)
        sums = [
            mle_jax.sum_tree(acc128[:, x * RED:(x + 1) * RED])
            for x in range(npts)
        ]
        return jnp.concatenate(sums, axis=1)  # (L, npts)

    return evals


def sum_of_products_round_evals(tables, coeffs, term_idxs, npts: int = 4):
    """Pallas sum-of-products round evals: same contract as
    ``mle_jax.sum_of_products_round_evals`` (``npts`` X-points for the
    generic-degree bit-column oracles)."""
    half = tables[0].shape[1] // 2
    fn = _sop_evals_call(
        len(tables), tuple(term_idxs), half, _interpret(), npts
    )
    return fn(tuple(tables), tuple(coeffs))


# ---------------------------------------------------------------------------
# mont-mul chain (bench probe / batched exponentiation building block)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=8)
def _chain_call(n: int, iters: int, interpret: bool, block: int = BLOCK):
    jax, jnp, pl, pltpu = _get()
    nblk = n // block

    def kern(x_ref, y_ref, p_ref, p2_ref, one_ref, out_ref):
        fr = _kernel_ops(p_ref, p2_ref, one_ref)
        s = pl.program_id(1)  # chain step (fastest axis: block resident)

        @pl.when(s == 0)
        def _seed():
            out_ref[:] = x_ref[:]

        out_ref[:] = fr.mont_mul(out_ref[:], y_ref[:])

    blk_in = pl.BlockSpec((L, block), lambda b, s: (0, b),
                          memory_space=pltpu.VMEM)
    cst = pl.BlockSpec((L, RED), lambda b, s: (0, 0),
                       memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kern,
        grid=(nblk, iters),
        in_specs=[blk_in, blk_in, cst, cst, cst],
        out_specs=blk_in,
        out_shape=jax.ShapeDtypeStruct((L, n), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )
    p_b, p2_b, one_b = _consts()

    @jax.jit
    def chain(x, y):
        return call(x, y, p_b, p2_b, one_b)

    return chain


def mont_mul_chain(x, y, iters: int, block: int = None):
    """iters back-to-back Montgomery muls: x * y^iters (Montgomery form),
    accumulator VMEM-resident across the whole chain per lane block.
    Exact; bit-compatible with iterating ``fr_jax.fr_mont_mul``.

    ``block`` overrides the lane-block size (throughput tuning: fewer,
    larger blocks amortize per-grid-step overhead; VMEM-bounded)."""
    n = x.shape[1]
    blk = BLOCK if block is None else block
    if n % blk:
        raise ValueError(f"lane count must be a multiple of {blk}")
    return _chain_call(n, iters, _interpret(), blk)(x, y)
