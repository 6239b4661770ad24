"""Cell-scheduled Pippenger MSM on TPU — the round-2 flagship kernel.

Re-designs the reference's commit MSM (/root/reference/src/commitments.rs:
162-180) for TPU execution.  The round-1 XLA Pippenger (removed in round 3;
see git history) was gather-bound because every bucket-insertion step
gathered from the FULL point array (and a c=12/n=2^16 configuration crashed
the axon TPU worker).  Measured on the v5e, ``jnp.take`` is fast when the
gather *table* is chunk-sized (~0.2-1 us for a 4096-wide gather from a
<=32k-lane table) — so this kernel restructures Pippenger around
chunk-local gathers and keeps every other data structure device-resident:

  * **Signed 8-bit windows**: scalars split into W windows of signed digits
    in [-128, 127] (host numpy for explicit scalars; W adapts to the scalar
    magnitude, so small commit scalars get W≈4 instead of 32).  Bucket
    lanes = (window, |digit|-1): a flat (22, W*128) plane array of Jacobian
    accumulators that stays device-resident for the whole MSM.
  * **Chunk streaming**: points stream in m-point chunks (contiguous
    dynamic slices, no host round trips).  For each chunk the device builds
    a conflict-free insertion schedule: per-window bucket ranks via a
    cumulative one-hot sum, then the (R_c, W*128) slot table via an exact
    f32 one-hot matmul on the MXU (all values < 2^24, so f32 is exact).
  * **R_c insertion steps per chunk**: step s gathers the s-th member of
    every bucket from the chunk (table width m — the fast gather regime)
    and performs one masked mixed-add across all W*128 lanes.  R_c is the
    exact maximum bucket occupancy, computed host-side from the digits, so
    there is no overflow path.
  * **Aggregation**: per-window Σ_d d·B_d via an in-block suffix scan plus
    tree sum (Σ_b (b+1)·B_b = Σ_k S_k with S_k the inclusive suffix sums),
    then a W-window Horner combine on the host (native G1).

Group-law hazard: a mixed-add where the incoming point equals the
accumulator needs a doubling.  Inside one bucket lane the accumulator is a
partial sum of *distinct earlier points of the same bucket*, so equality is
cryptographically negligible for SRS bases — but it is *detected* (H == 0,
r == 0) and counted; a nonzero flag triggers a host-MSM fallback, so the
result is always exact.  Everything else is exact int32 limb arithmetic
(tnsh.field.fr_jax), bit-identical to the host MSM.
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import Optional, Sequence

import numpy as np

from ..field.fr import Fr
from ..field.g1 import G1
from ..field.limbs import FQ_SPEC, LIMB_BITS, NUM_LIMBS

_L = NUM_LIMBS  # 22 limb planes


# ---------------------------------------------------------------------------
# Host-side preparation (numpy, vectorized)
# ---------------------------------------------------------------------------

def scalars_to_byte_matrix(scalars, n: int) -> np.ndarray:
    """(n, 32) uint8 little-endian scalar bytes."""
    if isinstance(scalars, (bytes, bytearray)):
        out = np.frombuffer(bytes(scalars), dtype=np.uint8)
        return out.reshape(-1, 32)[:n]
    if isinstance(scalars, np.ndarray) and scalars.dtype.kind in "iu":
        out = np.zeros((n, 32), dtype=np.uint8)
        v = scalars[:n].astype(np.uint64)
        for b in range(8):
            out[:, b] = ((v >> np.uint64(8 * b)) & np.uint64(0xFF)).astype(
                np.uint8
            )
        return out
    try:
        from .. import _native

        if _native.available:
            data = _native._fr_vec_bytes(scalars[:n])
            return np.frombuffer(data, dtype=np.uint8).reshape(-1, 32)
    except Exception:
        pass
    data = b"".join(int(s).to_bytes(32, "little") for s in scalars[:n])
    return np.frombuffer(data, dtype=np.uint8).reshape(-1, 32)


def signed_digits(sb: np.ndarray) -> np.ndarray:
    """(W, n) int8 signed base-256 digits of (n, 32) uint8 scalar bytes.

    Digits lie in [-128, 127]; W adapts to the highest nonzero byte (+1
    carry window, padded to a multiple of 4 to bound kernel-shape count).
    Σ_w d_w 256^w reconstructs each scalar exactly.
    """
    n = sb.shape[0]
    used = np.nonzero(sb.any(axis=0))[0]
    hb = int(used[-1]) if used.size else 0
    w_count = min(hb + 2, 32)
    w_count = (w_count + 3) // 4 * 4
    d = sb[:, :w_count].astype(np.int16).T.copy()  # (W, n)
    carry = np.zeros(n, dtype=np.int16)
    for w in range(w_count):
        v = d[w] + carry
        carry = (v >= 128).astype(np.int16)
        d[w] = v - (carry << 8)
    if carry.any():  # only possible for byte 31 >= 0x7F: not a valid Fr
        raise ValueError("scalar out of field range for signed windows")
    return d.astype(np.int8)


#: Accumulator-lane budget per kernel: the insert step always runs at this
#: width, so the VPU stays saturated whether the MSM has 4 or 32 windows.
TOTAL_LANES = 4096
#: Max lanes one (window, digit) group may claim (=> 12 fold levels).
_MAX_GROUP_LANES = 4096


class MsmPlan:
    """Host-computed, data-dependent plan for one MSM call.

    Every (window, |digit|) group is assigned K_g = pow2 accumulator lanes
    out of a fixed TOTAL_LANES budget; insert ``rank`` maps to
    (step = rank >> log2 K_g, lane = base_g + (rank & K_g-1)).  K_g sizes
    come from a binary search equalizing the worst per-chunk step count —
    heavy groups (repeated Twist addresses, the near-constant top windows
    of small or consecutive-valued scalars, even ALL-identical scalars)
    simply claim more lanes, so total work stays ~n*W lane-adds and the
    step count stays ~n*W/TOTAL_LANES regardless of the digit
    distribution.  All plan outputs are runtime tensors — kernel shapes
    depend only on (chunks, m, W, R_c), so compile count stays bounded.
    """

    def __init__(self, d: np.ndarray, m: int):
        w_count, n_pad = d.shape
        self.w_count = w_count
        chunks = n_pad // m
        # (chunk, window, |digit|) occupancy cube: native counting loop when
        # available (this host's np.bincount measured ~4 M keys/s — 2+ s at
        # 2^18x32 windows), numpy fallback otherwise
        ccnt = None
        if not os.environ.get("TNSH_NO_NATIVE"):
            from .. import _native

            if _native.available:
                ccnt = _native.msm_digit_counts(d, m)
        if ccnt is None:
            mags32 = np.abs(d.astype(np.int16)).astype(np.int32)
            offs32 = (np.arange(w_count, dtype=np.int32) * 129)[:, None]
            keys = mags32.reshape(w_count, chunks, m) + offs32[:, None] + (
                np.arange(chunks, dtype=np.int32) * (w_count * 129)
            )[None, :, None]
            ccnt = np.bincount(
                keys.ravel(), minlength=chunks * w_count * 129
            ).reshape(chunks, w_count, 129)
        ccnt[:, :, 0] = 0
        mc = ccnt.max(axis=0).astype(np.int64)  # (W, 129) worst chunk count
        supported = mc > 0
        self.r_exact = 0
        self.base_map = np.zeros((w_count, 129), dtype=np.int32)
        self.logk_map = np.zeros((w_count, 129), dtype=np.int32)
        lanes = TOTAL_LANES
        self.fold_masks = np.zeros((12, lanes), dtype=bool)
        self.canon_src = np.zeros((w_count * 128,), dtype=np.int32)
        self.canon_mask = np.zeros((w_count * 128,), dtype=bool)
        self.rc_per_chunk = np.zeros((chunks,), dtype=np.int32)
        if not supported.any():
            return

        def lanes_needed(r: int) -> np.ndarray:
            k = -(-mc // r)  # ceil
            k = np.maximum(k, 1)
            # next_pow2, capped
            k = (1 << np.ceil(np.log2(k)).astype(np.int64)).astype(np.int64)
            return np.minimum(np.where(supported, k, 0), _MAX_GROUP_LANES)

        lo, hi = 1, int(mc.max())
        while lo < hi:
            mid = (lo + hi) // 2
            if int(lanes_needed(mid).sum()) <= lanes:
                hi = mid
            else:
                lo = mid + 1
        r = lo
        k_g = lanes_needed(r)
        assert int(k_g.sum()) <= lanes, "lane budget infeasible"
        self.r_exact = int(np.max(np.where(k_g > 0, -(-mc // np.maximum(k_g, 1)), 0)))
        # Per-chunk executed step counts (round-3 backlog item 3): chunks
        # only run the insertion steps THEY need, not the worst chunk's
        # count — recovers the cross-chunk occupancy skew (~10-20% of
        # steps for uniform scalars) without a cleanup pass.
        kq = np.maximum(k_g, 1)[None]  # (1, W, 129)
        self.rc_per_chunk = np.max(
            np.where(k_g[None] > 0, -(-ccnt // kq), 0), axis=(1, 2)
        ).astype(np.int32)
        # pack groups in (window, digit) order
        bases = np.zeros_like(k_g)
        flat_k = k_g.ravel()
        np.cumsum(flat_k[:-1], out=bases.ravel()[1:])
        self.base_map = bases.astype(np.int32)
        self.logk_map = np.where(
            supported,
            np.log2(np.maximum(k_g, 1)).astype(np.int64),
            0,
        ).astype(np.int32)
        # fold masks: tree-fold each group's K_g lanes onto its base lane
        for w in range(w_count):
            for dmag in np.nonzero(supported[w])[0]:
                base = int(bases[w, dmag])
                k = int(k_g[w, dmag])
                for t in range(k.bit_length() - 1):
                    sh = 1 << t
                    sel = base + np.arange(0, k, 2 * sh)
                    self.fold_masks[t, sel] = True
                # canonical magnitude layout: lane w*128+(b) = digit b+1
                dst = w * 128 + (int(dmag) - 1)
                self.canon_src[dst] = base
                self.canon_mask[dst] = True


def bytes_to_limb_planes(b: np.ndarray) -> np.ndarray:
    """(n, 32) uint8 LE bytes → (22, n) int32 12-bit limb planes (standard
    form; Montgomery conversion happens on device)."""
    n = b.shape[0]
    padded = np.zeros((n, 34), dtype=np.uint8)
    padded[:, :32] = b
    u = padded.astype(np.uint32)
    out = np.empty((_L, n), dtype=np.int32)
    for i in range(_L):
        b0, off = (LIMB_BITS * i) // 8, (LIMB_BITS * i) % 8
        v = (u[:, b0] | (u[:, b0 + 1] << 8) | (u[:, b0 + 2] << 16)) >> off
        out[i] = (v & ((1 << LIMB_BITS) - 1)).astype(np.int32)
    return out


# ---------------------------------------------------------------------------
# Device kernel
# ---------------------------------------------------------------------------

_CACHE_SET = False


def _get_jax():
    import os

    import jax
    import jax.numpy as jnp
    from jax import lax

    # Persistent compile cache: scheduled-Pippenger kernels compile in
    # minutes over the axon tunnel; caching them per shape makes every
    # process after the first start warm (PERF_NOTES backlog 6).
    global _CACHE_SET
    if not _CACHE_SET:
        _CACHE_SET = True
        try:
            jax.config.update(
                "jax_compilation_cache_dir",
                os.environ.get("TNSH_JAX_CACHE", "/tmp/tnsh_jax_cache"),
            )
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
        except Exception:
            pass

    return jax, jnp, lax


def _padd_mixed_flag(fq, X1, Y1, Z1, x2, y2, take):
    """Mixed Jacobian+affine add (no doubling branch) returning also the
    per-lane 'accumulator equals input' hazard flag.  Mirrors
    msm_jax._padd_mixed (11 field muls) with the flag exposed."""
    _, jnp, _ = _get_jax()
    (Z1Z1,) = fq.mont_mul_many([(Z1, Z1)])
    U2, T2 = fq.mont_mul_many([(x2, Z1Z1), (y2, Z1)])
    (S2,) = fq.mont_mul_many([(T2, Z1Z1)])
    H = fq.sub(U2, X1)
    r0 = fq.sub(S2, Y1)
    r = fq.add(r0, r0)
    H2 = fq.add(H, H)
    I, RR = fq.mont_mul_many([(H2, H2), (r, r)])
    J, V = fq.mont_mul_many([(H, I), (X1, I)])
    X3 = fq.sub(fq.sub(RR, J), fq.add(V, V))
    RVX, SJ, Z1H = fq.mont_mul_many([(r, fq.sub(V, X3)), (Y1, J), (Z1, H)])
    Y3 = fq.sub(RVX, fq.add(SJ, SJ))
    Z3 = fq.add(Z1H, Z1H)

    p_inf = fq.is_zero(Z1)
    one = fq.one(X1.shape[1:])
    X3 = fq.select(p_inf, x2, X3)
    Y3 = fq.select(p_inf, y2, Y3)
    Z3 = fq.select(p_inf, one, Z3)

    X3 = fq.select(take, X3, X1)
    Y3 = fq.select(take, Y3, Y1)
    Z3 = fq.select(take, Z3, Z1)
    same = take & fq.is_zero(H) & fq.is_zero(r0) & ~p_inf
    return X3, Y3, Z3, same


def _window_sums(fq, _padd, X, Y, Z, w_count: int):
    """Per-window Σ_{d=1..128} d·B_d over flat (·, W*128) bucket lanes.

    Lane w*128+b holds bucket magnitude b+1.  Uses Σ_b (b+1) B_b = Σ_k S_k
    with S_k the in-block inclusive suffix sums: a 7-step Hillis-Steele
    suffix scan followed by a 7-step in-block tree sum."""
    _, jnp, lax = _get_jax()
    total = w_count * 128
    lane = np.arange(total) % 128

    def suffix_body(k, state):
        X, Y, Z = state
        sh = 1 << k
        Xs = jnp.roll(X, -sh, axis=1)
        Ys = jnp.roll(Y, -sh, axis=1)
        Zs = jnp.roll(Z, -sh, axis=1)
        valid = (lane + sh) < 128
        Xn, Yn, Zn = _padd(X, Y, Z, Xs, Ys, Zs)
        return (
            fq.select(valid, Xn, X),
            fq.select(valid, Yn, Y),
            fq.select(valid, Zn, Z),
        )

    X, Y, Z = lax.fori_loop(0, 7, suffix_body, (X, Y, Z))

    def tree_body(k, state):
        X, Y, Z = state
        sh = 128 >> (k + 1)
        Xs = jnp.roll(X, -sh, axis=1)
        Ys = jnp.roll(Y, -sh, axis=1)
        Zs = jnp.roll(Z, -sh, axis=1)
        Xn, Yn, Zn = _padd(X, Y, Z, Xs, Ys, Zs)
        active = lane < sh
        return (
            fq.select(active, Xn, X),
            fq.select(active, Yn, Y),
            fq.select(active, Zn, Z),
        )

    X, Y, Z = lax.fori_loop(0, 7, tree_body, (X, Y, Z))
    sel = np.arange(w_count) * 128
    return X[:, sel], Y[:, sel], Z[:, sel]


#: (chunks, m, w_count, r_c) shapes whose kernels have been jit-compiled
#: in this process — the warm gate for ``msm_async(only_if_compiled=True)``.
_COMPILED_SHAPES: set = set()

#: (chunks, m, w_count, r_c) -> "pallas" | "xla": the engine that measured
#: faster end-to-end for this shape (``ScheduledMsmContext.measure_engines``).
#: Selection is by measurement, not platform (VERDICT r3 task 7) — a slow
#: engine can never become the silent default once a prewarm has run.
_ENGINE_CHOICE: dict = {}

#: Insertion steps per Pallas segment call: bounds the XLA-gathered point
#: stream HBM footprint while amortizing per-call launch overhead
#: (measured round 4: ~2 ms/pallas_call; 293 vs 298 M muls/s at 32 vs
#: 128, so fewer+larger calls win on launch count alone).
_SEG = 128


@lru_cache(maxsize=64)

def _compiled_msm_kernel(chunks: int, m: int, w_count: int, r_c: int):
    """Jitted MSM kernel for a static (chunks, m, W, R_c) configuration.

    Signature: (xs, ys, digits, base_map, logk_map, fold_masks, canon_src,
    canon_mask, rc_per_chunk) -> (Xw, Yw, Zw, hazard_count) where xs/ys are
    (22, n_pad >= chunks*m) Montgomery planes, digits (W, chunks*m) int8
    signed in [-128, 127] (invalid points' digits pre-zeroed), and the
    remaining inputs are MsmPlan lane-layout tensors (runtime data: no
    recompile per digit distribution).  The schedule is built by int32
    scatter — exact, and measured faster than a one-hot MXU matmul."""
    jax, jnp, lax = _get_jax()
    from .msm_jax import _padd, fq

    lanes = TOTAL_LANES
    one_np = np.asarray(FQ_SPEC.one_mont_limbs(), dtype=np.int32)[:, None]
    ids_np = np.arange(1, m + 1, dtype=np.int32)

    def kernel(xs, ys, digits, base_map, logk_map, fold_masks,
               canon_src, canon_mask, rc_per_chunk):
        accX = jnp.zeros((_L, lanes), jnp.int32)
        accY = jnp.zeros((_L, lanes), jnp.int32) + one_np
        accZ = jnp.zeros((_L, lanes), jnp.int32)
        hazards = jnp.zeros((), jnp.int32)

        def chunk_body(g, state):
            accX, accY, accZ, hazards = state
            dch = lax.dynamic_slice(digits, (0, g * m), (w_count, m))
            dch = dch.astype(jnp.int32)  # int8 upload (4x less tunnel
            # traffic); widen after the chunk slice
            px = lax.dynamic_slice(xs, (0, g * m), (_L, m))
            py = lax.dynamic_slice(ys, (0, g * m), (_L, m))

            # -- build the (R_c * lanes) schedule for this chunk -----------
            def win_body(w, flat_sched):
                dw = lax.dynamic_index_in_dim(dch, w, 0, keepdims=False)
                bmap = lax.dynamic_index_in_dim(base_map, w, 0, keepdims=False)
                kmap = lax.dynamic_index_in_dim(logk_map, w, 0, keepdims=False)
                mag = jnp.abs(dw)
                bucket = jnp.where(mag > 0, mag - 1, -1)
                oh = jax.nn.one_hot(bucket, 128, dtype=jnp.float32)
                cs = jnp.cumsum(oh, axis=0)
                rank = jnp.take_along_axis(
                    cs, jnp.clip(bucket, 0, 127)[:, None], axis=1
                )[:, 0].astype(jnp.int32) - 1
                # group (w, mag) owns K = 1<<lk lanes starting at base
                lk = jnp.take(kmap, mag)
                step_idx = rank >> lk
                lane = jnp.take(bmap, mag) + (rank & ((1 << lk) - 1))
                # masked entries scatter out of bounds -> dropped, so the
                # in-bounds indices are genuinely unique
                flat = jnp.where(
                    mag > 0, step_idx * lanes + lane, r_c * lanes
                )
                vals = jnp.where(dw < 0, -ids_np, ids_np)
                return flat_sched.at[flat].set(
                    vals, mode="drop", unique_indices=True
                )

            flat_sched = lax.fori_loop(
                0, w_count, win_body,
                jnp.zeros((r_c * lanes,), jnp.int32),
            )
            sched = flat_sched.reshape(r_c, lanes)

            # -- R_c insertion steps ---------------------------------------
            def step(s, st):
                accX, accY, accZ, hz = st
                row = lax.dynamic_index_in_dim(sched, s, 0, keepdims=False)
                idx = jnp.clip(jnp.abs(row) - 1, 0, m - 1)
                take = row != 0
                gx = jnp.take(px, idx, axis=1)
                gy = jnp.take(py, idx, axis=1)
                gy = fq.select(row < 0, fq.neg(gy), gy)
                accX, accY, accZ, same = _padd_mixed_flag(
                    fq, accX, accY, accZ, gx, gy, take
                )
                return accX, accY, accZ, hz + jnp.sum(same.astype(jnp.int32))

            # execute only this chunk's needed steps (traced bound lowers
            # to a while loop; r_c stays the static schedule capacity).
            # ADVICE round-2 item 3 considered a static-bound fallback for
            # uniform occupancy; with r_c now pow2-quantized (compile-shape
            # stability) the average skip fraction is larger, so the
            # dynamic bound is kept unconditionally.
            rc_g = jnp.minimum(rc_per_chunk[g], r_c)
            return lax.fori_loop(0, rc_g, step, (accX, accY, accZ, hazards))

        accX, accY, accZ, hazards = lax.fori_loop(
            0, chunks, chunk_body, (accX, accY, accZ, hazards)
        )

        # -- tree-fold each group's K lanes onto its base lane -------------
        def fold_body(t, st):
            X, Y, Z = st
            sh = 1 << t
            Xs = jnp.roll(X, -sh, axis=1)
            Ys = jnp.roll(Y, -sh, axis=1)
            Zs = jnp.roll(Z, -sh, axis=1)
            mask = lax.dynamic_index_in_dim(fold_masks, t, 0, keepdims=False)
            Xn, Yn, Zn = _padd(X, Y, Z, Xs, Ys, Zs)
            return (
                fq.select(mask, Xn, X),
                fq.select(mask, Yn, Y),
                fq.select(mask, Zn, Z),
            )

        accX, accY, accZ = lax.fori_loop(
            0, 12, fold_body, (accX, accY, accZ)
        )

        # -- re-canonicalize: lane w*128+b <- digit-magnitude (b+1) group --
        out_lanes = w_count * 128
        inf_x = jnp.zeros((_L, out_lanes), jnp.int32)
        inf_y = jnp.zeros((_L, out_lanes), jnp.int32) + one_np
        inf_z = jnp.zeros((_L, out_lanes), jnp.int32)
        cX = fq.select(canon_mask, jnp.take(accX, canon_src, axis=1), inf_x)
        cY = fq.select(canon_mask, jnp.take(accY, canon_src, axis=1), inf_y)
        cZ = fq.select(canon_mask, jnp.take(accZ, canon_src, axis=1), inf_z)

        Xw, Yw, Zw = _window_sums(fq, _padd, cX, cY, cZ, w_count)
        return _pack_result(jnp, Xw, Yw, Zw, hazards)

    return jax.jit(kernel)


def _pack_result(jnp, Xw, Yw, Zw, hazards):
    """(L, 3W+1) single-array result: window sums side by side, hazard
    count in the last lane of plane 0.  One packed array = ONE device
    fetch in finish() — each separate fetch over the axon tunnel costs a
    ~30 ms round trip (round-4 finding: 4 fetches were ~15% of the whole
    2^16 MSM)."""
    hzp = jnp.zeros((_L, 1), jnp.int32).at[0, 0].set(hazards)
    return jnp.concatenate([Xw, Yw, Zw, hzp], axis=1)


def _make_insert_seg(seg: int):
    """Build the VMEM-resident Pallas insertion kernel for segments of
    ``seg`` scheduled steps (cached per (seg, interpret-mode)).  Returns
    ``(insert_seg, p_b, p2_b, one_b)`` where the trailing arrays are the
    (L, 128) broadcast field constants the kernel expects (Pallas forbids
    captured device arrays).

    Shared by the MSM engine and ``tools/exp_pallas_insert.py``'s
    microbench so the measured kernel is exactly the shipped one."""
    interpret = bool(os.environ.get("TNSH_PALLAS_INTERPRET"))
    return _make_insert_seg_cached(seg, interpret)


@lru_cache(maxsize=8)
def _make_insert_seg_cached(seg: int, interpret: bool):
    jax, jnp, lax = _get_jax()
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..field.fr_jax import make_field_ops
    from ..field.limbs import int_to_limbs

    lanes = TOTAL_LANES
    one_np = np.asarray(FQ_SPEC.one_mont_limbs(), dtype=np.int32)[:, None]
    p_b = np.ascontiguousarray(np.broadcast_to(
        np.asarray(FQ_SPEC.modulus_limbs(), np.int32)[:, None], (_L, 128)))
    p2_b = np.ascontiguousarray(np.broadcast_to(
        np.asarray(int_to_limbs(2 * FQ_SPEC.modulus), np.int32)[:, None],
        (_L, 128)))
    one_b = np.ascontiguousarray(np.broadcast_to(one_np, (_L, 128)))

    def seg_kernel(sched_ref, gx_ref, gy_ref, p_ref, p2_ref, one_ref,
                   inx_ref, iny_ref, inz_ref, inh_ref,
                   ox_ref, oy_ref, oz_ref, oh_ref):
        s = pl.program_id(0)

        @pl.when(s == 0)
        def _seed():
            ox_ref[:] = inx_ref[:]
            oy_ref[:] = iny_ref[:]
            oz_ref[:] = inz_ref[:]
            oh_ref[0, 0] = inh_ref[0, 0]

        fqk = make_field_ops(
            FQ_SPEC,
            consts=(p_ref[:, :1], p2_ref[:, :1], one_ref[:, :1]),
        )
        row = sched_ref[0, 0, :]
        take = row != 0
        gx = gx_ref[0]
        gy = gy_ref[0]
        gy = fqk.select(row < 0, fqk.neg(gy), gy)
        X, Y, Z, same = _padd_mixed_flag(
            fqk, ox_ref[:], oy_ref[:], oz_ref[:], gx, gy, take
        )
        ox_ref[:] = X
        oy_ref[:] = Y
        oz_ref[:] = Z
        oh_ref[0, 0] = oh_ref[0, 0] + jnp.sum(same.astype(jnp.int32))

    acc_spec = pl.BlockSpec((_L, lanes), lambda s: (0, 0),
                            memory_space=pltpu.VMEM)
    const_spec = pl.BlockSpec((_L, 128), lambda s: (0, 0),
                              memory_space=pltpu.VMEM)
    hz_spec = pl.BlockSpec((1, 1), lambda s: (0, 0),
                           memory_space=pltpu.SMEM)
    insert_seg = pl.pallas_call(
        seg_kernel,
        grid=(seg,),
        in_specs=[
            pl.BlockSpec((1, 1, lanes), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _L, lanes), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _L, lanes), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            const_spec, const_spec, const_spec,
            acc_spec, acc_spec, acc_spec, hz_spec,
        ],
        out_specs=[acc_spec, acc_spec, acc_spec, hz_spec],
        out_shape=[
            jax.ShapeDtypeStruct((_L, lanes), jnp.int32),
            jax.ShapeDtypeStruct((_L, lanes), jnp.int32),
            jax.ShapeDtypeStruct((_L, lanes), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        # The CIOS chains' live intermediates need ~19 MB of scoped VMEM
        # at 4096 lanes — above Mosaic's 16 MB default but well under the
        # v5e's 128 MB physical VMEM.  Measured OOM: 18.45M requested.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )
    return insert_seg, p_b, p2_b, one_b


def _compiled_msm_kernel_pallas(chunks: int, m: int, w_count: int, r_c: int,
                                interpret: bool = False):
    """Cache-normalizing wrapper: lru_cache keys do NOT normalize default
    arguments, so a 4-arg call and an explicit ``interpret=False`` 5-arg
    call would build (and compile!) the same kernel twice."""
    return _compiled_msm_kernel_pallas_cached(
        chunks, m, w_count, r_c, bool(interpret)
    )


@lru_cache(maxsize=64)
def _compiled_msm_kernel_pallas_cached(chunks: int, m: int, w_count: int,
                                       r_c: int, interpret: bool):
    """Pallas variant of :func:`_compiled_msm_kernel` — same signature and
    bit-identical outputs, with the insertion steps' field arithmetic
    running VMEM-resident.

    Why: the XLA engine's CIOS bodies (~650 primitives per field mul)
    exceed the fusion budget, so accumulator/intermediate traffic
    round-trips HBM and sustains 54M muls/s vs the ~230M a VMEM-resident
    Pallas chain measures (PERF_NOTES round-3 finding 9).

    Split of labor per segment of ``_SEG`` insertion steps:
      * XLA gathers the scheduled points into a dense (SEG, 22, lanes)
        stream — chunk-local ``jnp.take`` is measured fast, and Mosaic's
        in-kernel gather only reaches one 128-lane vreg, so gathering
        on-device is off the table;
      * one pallas_call with grid=(SEG,) consumes the stream: per grid
        step a (1, 22, lanes) block DMAs in (automatically double-
        buffered, ~1 us vs ~200 us of compute) while the bucket
        accumulators persist in VMEM as revisited output blocks —
        intermediates of the ~11 CIOS muls per step never touch HBM.
    Schedule building and the window fold/canonicalize tail stay in XLA
    (cheap int32 / rare group ops)."""
    jax, jnp, lax = _get_jax()
    from .msm_jax import _padd, fq

    lanes = TOTAL_LANES
    seg = min(_SEG, r_c)
    ids_np = np.arange(1, m + 1, dtype=np.int32)
    one_np = np.asarray(FQ_SPEC.one_mont_limbs(), dtype=np.int32)[:, None]
    insert_seg, p_b, p2_b, one_b = _make_insert_seg_cached(seg, interpret)

    def kernel(xs, ys, digits, base_map, logk_map, fold_masks,
               canon_src, canon_mask, rc_per_chunk):
        # -- stage A (XLA): all chunk schedules -----------------------------
        def build_body(g, sched_all):
            dch = lax.dynamic_slice(digits, (0, g * m), (w_count, m))
            dch = dch.astype(jnp.int32)

            def win_body(w, flat_sched):
                dw = lax.dynamic_index_in_dim(dch, w, 0, keepdims=False)
                bmap = lax.dynamic_index_in_dim(
                    base_map, w, 0, keepdims=False)
                kmap = lax.dynamic_index_in_dim(
                    logk_map, w, 0, keepdims=False)
                mag = jnp.abs(dw)
                bucket = jnp.where(mag > 0, mag - 1, -1)
                oh = jax.nn.one_hot(bucket, 128, dtype=jnp.float32)
                cs = jnp.cumsum(oh, axis=0)
                rank = jnp.take_along_axis(
                    cs, jnp.clip(bucket, 0, 127)[:, None], axis=1
                )[:, 0].astype(jnp.int32) - 1
                lk = jnp.take(kmap, mag)
                step_idx = rank >> lk
                lane = jnp.take(bmap, mag) + (rank & ((1 << lk) - 1))
                flat = jnp.where(
                    mag > 0, step_idx * lanes + lane, r_c * lanes
                )
                vals = jnp.where(dw < 0, -ids_np, ids_np)
                return flat_sched.at[flat].set(
                    vals, mode="drop", unique_indices=True
                )

            flat_sched = lax.fori_loop(
                0, w_count, win_body, jnp.zeros((r_c * lanes,), jnp.int32)
            )
            return lax.dynamic_update_slice(
                sched_all, flat_sched.reshape(r_c, lanes), (g * r_c, 0)
            )

        sched_all = lax.fori_loop(
            0, chunks, build_body,
            jnp.zeros((chunks * r_c, lanes), jnp.int32),
        )

        # -- stage B: XLA gathers stream segments into the Pallas kernel ----
        def chunk_body(g, carry):
            accX, accY, accZ, hz = carry
            px = lax.dynamic_slice(xs, (0, g * m), (_L, m))
            py = lax.dynamic_slice(ys, (0, g * m), (_L, m))
            rc_g = jnp.minimum(rc_per_chunk[g], r_c)
            n_seg = (rc_g + seg - 1) // seg

            def seg_body(t, c2):
                aX, aY, aZ, h = c2
                rows = lax.dynamic_slice(
                    sched_all, (g * r_c + t * seg, 0), (seg, lanes)
                )
                idx = jnp.clip(jnp.abs(rows) - 1, 0, m - 1)
                gxs = jnp.take(px, idx, axis=1).transpose(1, 0, 2)
                gys = jnp.take(py, idx, axis=1).transpose(1, 0, 2)
                return insert_seg(rows[:, None, :], gxs, gys,
                                  p_b, p2_b, one_b, aX, aY, aZ, h)

            return lax.fori_loop(0, n_seg, seg_body,
                                 (accX, accY, accZ, hz))

        acc0 = (
            jnp.zeros((_L, lanes), jnp.int32),
            jnp.zeros((_L, lanes), jnp.int32) + one_np,
            jnp.zeros((_L, lanes), jnp.int32),
            jnp.zeros((1, 1), jnp.int32),
        )
        accX, accY, accZ, hz = lax.fori_loop(0, chunks, chunk_body, acc0)
        hazards = hz[0, 0]

        # -- stage C (XLA): group fold + canonicalize + window sums ---------
        def fold_body(t, st):
            X, Y, Z = st
            sh = 1 << t
            Xs = jnp.roll(X, -sh, axis=1)
            Ys = jnp.roll(Y, -sh, axis=1)
            Zs = jnp.roll(Z, -sh, axis=1)
            mask = lax.dynamic_index_in_dim(fold_masks, t, 0, keepdims=False)
            Xn, Yn, Zn = _padd(X, Y, Z, Xs, Ys, Zs)
            return (
                fq.select(mask, Xn, X),
                fq.select(mask, Yn, Y),
                fq.select(mask, Zn, Z),
            )

        accX, accY, accZ = lax.fori_loop(
            0, 12, fold_body, (accX, accY, accZ)
        )
        out_lanes = w_count * 128
        inf_x = jnp.zeros((_L, out_lanes), jnp.int32)
        inf_y = jnp.zeros((_L, out_lanes), jnp.int32) + one_np
        inf_z = jnp.zeros((_L, out_lanes), jnp.int32)
        cX = fq.select(canon_mask, jnp.take(accX, canon_src, axis=1), inf_x)
        cY = fq.select(canon_mask, jnp.take(accY, canon_src, axis=1), inf_y)
        cZ = fq.select(canon_mask, jnp.take(accZ, canon_src, axis=1), inf_z)
        Xw, Yw, Zw = _window_sums(fq, _padd, cX, cY, cZ, w_count)
        return _pack_result(jnp, Xw, Yw, Zw, hazards)

    return jax.jit(kernel)


def _pallas_msm_enabled() -> bool:
    """Pallas insertion engine: on for real TPU backends (and for CPU
    tests that opt into Mosaic interpret mode); XLA engine otherwise."""
    flag = os.environ.get("TNSH_PALLAS_MSM", "")
    if flag == "0":
        return False
    if os.environ.get("TNSH_PALLAS_INTERPRET"):
        return True
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:
        return False


@lru_cache(maxsize=8)
def _compiled_to_mont(n_pad: int):
    jax, jnp, _ = _get_jax()
    from ..field.fr_jax import fq_ops

    return jax.jit(lambda a: fq_ops.to_mont(a))


# ---------------------------------------------------------------------------
# Host-facing context
# ---------------------------------------------------------------------------

def _choose_chunk(n: int) -> int:
    """Chunk size cap 32768.  m=65536 was A/B-tested in round 4 (single
    chunk at 2^16: fewer per-chunk step maxima) and measured equal within
    variance (100.8k vs 107.7k pts/s) with a 2.4x slower cold compile —
    reverted."""
    m = 512
    while m < n and m < 32768:
        m *= 2
    return m


class ScheduledMsmContext:
    """Device-resident base points for repeated scheduled-Pippenger MSMs.

    Build from explicit points (``ScheduledMsmContext(points)``) or from a
    native SRS handle (:meth:`from_native_srs`) — the latter exports affine
    coordinates in one native call and never materializes Python points.
    """

    def __init__(self, points: Optional[Sequence[G1]] = None, *,
                 affine_bytes: Optional[bytes] = None,
                 fallback=None):
        _, jnp, _ = _get_jax()
        if affine_bytes is not None:
            raw = np.frombuffer(affine_bytes, dtype=np.uint8).reshape(-1, 64)
            n = raw.shape[0]
            xb, yb = raw[:, :32], raw[:, 32:]
            valid = (raw != 0).any(axis=1)
        else:
            n = len(points)
            xb = np.zeros((n, 32), dtype=np.uint8)
            yb = np.zeros((n, 32), dtype=np.uint8)
            valid = np.zeros((n,), dtype=bool)
            for i, p in enumerate(points):
                if p.is_zero():
                    continue
                ax, ay = p.to_affine()
                xb[i] = np.frombuffer(ax.to_bytes(32, "little"), np.uint8)
                yb[i] = np.frombuffer(ay.to_bytes(32, "little"), np.uint8)
                valid[i] = True
        self.num_points = n
        m = _choose_chunk(n)
        n_pad = (n + m - 1) // m * m
        self.m = m
        xs = np.zeros((_L, n_pad), dtype=np.int32)
        ys = np.zeros((_L, n_pad), dtype=np.int32)
        xs[:, :n] = bytes_to_limb_planes(xb)
        ys[:, :n] = bytes_to_limb_planes(yb)
        conv = _compiled_to_mont(n_pad)
        self.xs = conv(jnp.asarray(xs))
        self.ys = conv(jnp.asarray(ys))
        self.valid_np = valid  # host-side; invalid points get zero digits
        self.fallback = fallback
        self.hazard_count = 0

    @classmethod
    def from_native_srs(cls, srs_id: int, n: Optional[int] = None
                        ) -> "ScheduledMsmContext":
        from .. import _native

        if n is None:
            n = _native.srs_size(srs_id)
        data = _native.srs_export_affine(srs_id, 0, n)
        return cls(
            affine_bytes=data,
            fallback=lambda scalars: _native.srs_msm(srs_id, scalars),
        )

    def msm(self, scalars) -> G1:
        """Σ scalars[i] · base[i] over the first len(scalars) base points."""
        return self.msm_async(scalars)()

    def measure_engines(self, scalars, budget_s: float = None) -> dict:
        """Compile the device engines for this scalar shape, time each
        end-to-end (dispatch -> group element), record the winner in
        ``_ENGINE_CHOICE`` and return {engine: pts/s}.

        Engine choice is thereby by measurement, not platform (VERDICT r3
        task 7).  Blocking (cold compiles) — call from prewarm paths only,
        never inline in a prove.

        Engines are tried cheapest-compile-first (Pallas kernels compile
        in seconds over the axon tunnel; the XLA engine's giant fused
        module has been observed to take 40+ minutes), and once
        ``budget_s`` (default TNSH_MSM_MEASURE_BUDGET or 600 s) of wall
        clock is spent, no FURTHER engine is started — the winner among
        the engines actually measured is recorded, so a prewarm can never
        wedge a setup path indefinitely.
        """
        import time

        if budget_s is None:
            budget_s = float(os.environ.get(
                "TNSH_MSM_MEASURE_BUDGET", "600"))
        n = (len(scalars) // 32 if isinstance(scalars, (bytes, bytearray))
             else len(scalars))
        engines = ["xla"]
        if _pallas_msm_enabled():
            engines.insert(0, "pallas")
        rates = {}
        base_key = None
        t_start = time.perf_counter()
        for eng in engines:
            if rates and time.perf_counter() - t_start > budget_s:
                break
            try:
                info: dict = {}
                fin = self.msm_async(scalars, engine=eng, out_info=info)
                if fin is None:
                    continue
                fin()  # compile + first run
                hz0 = self.hazard_count
                t0 = time.perf_counter()
                fin = self.msm_async(scalars, engine=eng, out_info=info)
                fin()
                if self.hazard_count > hz0:
                    # the finisher fell back to the HOST MSM mid-run: the
                    # measured rate is not this engine's (ADVICE r4 item 2)
                    continue
                rates[eng] = n / max(time.perf_counter() - t0, 1e-9)
                base_key = info.get("base_key")
            except Exception:
                continue  # broken engine loses by forfeit
        if rates and base_key is not None:
            _ENGINE_CHOICE[base_key] = max(rates, key=rates.get)
        return rates

    def msm_async(self, scalars, only_if_compiled: bool = False,
                  engine: Optional[str] = None,
                  out_info: Optional[dict] = None):
        """Dispatch the MSM and return a zero-arg finisher.

        The device crunches between dispatch and the finisher call, so a
        caller can overlap host work (the hybrid host+TPU split in
        kzg.msm runs the native MSM on the complementary points while
        this executes).

        ``only_if_compiled=True``: return None instead of paying a cold
        jit for a new kernel shape — tracing+lowering the scheduled
        kernel costs ~60 s client-side per shape and a tunnel compile on
        top, which must never land inline in a prove (kzg's adaptive
        hybrid checks this before routing points here)."""
        _, jnp, _ = _get_jax()
        if isinstance(scalars, (bytes, bytearray)):
            n = len(scalars) // 32
        else:
            n = len(scalars)
        if n == 0:
            return G1.zero
        if n > self.num_points:
            raise ValueError("more scalars than base points")
        sb = scalars_to_byte_matrix(scalars, n)
        d = signed_digits(sb)
        if not self.valid_np[:n].all():
            d[:, np.nonzero(~self.valid_np[:n])[0]] = 0
        w_count = d.shape[0]
        m = self.m
        chunks = (n + m - 1) // m
        n_ck = chunks * m
        if d.shape[1] < n_ck:
            d = np.pad(d, ((0, 0), (0, n_ck - d.shape[1])))
        plan = MsmPlan(d, m)
        if plan.r_exact == 0:
            return G1.zero
        # next-pow2 capacity: extra schedule rows are zeros the per-chunk
        # dynamic bound skips, so quantizing collapses the data-dependent
        # r_exact into ONE compile shape per size bucket
        r_c = max(1 << (plan.r_exact - 1).bit_length(), 16)
        base_key = (chunks, m, w_count, r_c)
        self._last_base_key = base_key
        if out_info is not None:
            # race-free shape key for this call (the instance attribute
            # can be overwritten by concurrent msm_async callers)
            out_info["base_key"] = base_key
        if engine is None:
            # measured winner for this shape if known, platform default
            # (Pallas on TPU) otherwise
            engine = _ENGINE_CHOICE.get(
                base_key, "pallas" if _pallas_msm_enabled() else "xla"
            )
        use_pallas = engine == "pallas"
        key = base_key + (use_pallas,)
        if only_if_compiled and key not in _COMPILED_SHAPES:
            return None
        if use_pallas:
            kern = _compiled_msm_kernel_pallas(
                chunks, m, w_count, r_c,
                bool(os.environ.get("TNSH_PALLAS_INTERPRET")),
            )
        else:
            kern = _compiled_msm_kernel(chunks, m, w_count, r_c)
        _COMPILED_SHAPES.add(key)
        out = kern(
            self.xs, self.ys, jnp.asarray(d),
            jnp.asarray(plan.base_map), jnp.asarray(plan.logk_map),
            jnp.asarray(plan.fold_masks), jnp.asarray(plan.canon_src),
            jnp.asarray(plan.canon_mask), jnp.asarray(plan.rc_per_chunk),
        )

        # Fetch from a background thread STARTING NOW: the axon runtime
        # defers device execution until a fetch arrives (round-4 finding
        # 19 — "overlapped" host+TPU work otherwise serializes), and the
        # fetch releases the GIL, so host work between dispatch and
        # finish() genuinely overlaps device execution + transport.
        import threading

        holder: dict = {}

        def _prefetch():
            try:
                holder["arr"] = np.asarray(out)
            except Exception as exc:  # surfaced at finish()
                holder["err"] = exc

        th = threading.Thread(target=_prefetch, daemon=True)
        th.start()

        def finish() -> G1:
            th.join()
            if "err" in holder:
                raise holder["err"]
            arr = holder["arr"]  # ONE tunnel fetch for the whole result
            w = (arr.shape[1] - 1) // 3
            hz_v = int(arr[0, -1])
            if hz_v:
                # accumulator==input hazard: result may be wrong — host path
                self.hazard_count += hz_v
                return self._host_fallback(scalars, n)
            return _combine_windows(
                arr[:, :w], arr[:, w:2 * w], arr[:, 2 * w:3 * w]
            )

        return finish

    def _host_fallback(self, scalars, n: int) -> G1:
        if self.fallback is not None:
            return self.fallback(scalars)
        from .kzg import msm as host_msm
        from ..field.limbs import unpack_ints

        xs = unpack_ints(np.asarray(self.xs[:, :n]), FQ_SPEC)
        ys = unpack_ints(np.asarray(self.ys[:, :n]), FQ_SPEC)
        valid = self.valid_np[:n]
        pts = [
            G1(x, y, 1) if v else G1.zero()
            for x, y, v in zip(xs, ys, valid)
        ]
        if isinstance(scalars, (bytes, bytearray)):
            scalars = [
                Fr(int.from_bytes(scalars[32 * i:32 * i + 32], "little"))
                for i in range(n)
            ]
        return host_msm(pts, list(scalars)[:n])


def _combine_windows(Xw: np.ndarray, Yw: np.ndarray, Zw: np.ndarray) -> G1:
    """Host Horner combine of per-window sums: Σ_w 256^w · P_w."""
    from ..field.limbs import unpack_ints

    w_count = Xw.shape[1]
    xs = unpack_ints(Xw, FQ_SPEC)
    ys = unpack_ints(Yw, FQ_SPEC)
    zs = unpack_ints(Zw, FQ_SPEC)
    acc = G1.zero()
    for w in range(w_count - 1, -1, -1):
        for _ in range(8):
            if not acc.is_zero():
                acc = acc.double()
        if zs[w] != 0:
            acc = acc.add(G1(xs[w], ys[w], zs[w]))
    return acc


def msm_scheduled(points: Sequence[G1], scalars: Sequence[Fr]) -> G1:
    """One-shot scheduled-Pippenger MSM (packs points per call; prefer
    ScheduledMsmContext for repeated use of the same bases)."""
    n = min(len(points), len(scalars))
    if n == 0:
        return G1.zero()
    return ScheduledMsmContext(points[:n]).msm(list(scalars)[:n])
