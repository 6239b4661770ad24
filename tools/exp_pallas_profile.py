"""Stage-split timings for the Pallas MSM engine at 2^16 on TPU.

Times, each as one jitted dispatch + device fetch:
  A) schedule build (one_hot/cumsum ranking) alone
  B) stream gathers alone (all segments of all chunks)
  C) gathers + Pallas insertion (stage B of the engine)
to locate the non-arithmetic time in the 0.788s end-to-end (the CIOS
work itself is ~0.14s at the measured 230M muls/s Pallas rate).
"""
import random
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from tnsh import _native
from tnsh.field.fr import MODULUS
from tnsh.field.g1 import G1
from tnsh.commit import msm_sched as ms

jax.config.update("jax_compilation_cache_dir", "/tmp/tnsh_jax_cache")

print("backend:", jax.default_backend(), flush=True)
random.seed(7)
N = 1 << 16
scal_b = b"".join(
    random.randrange(MODULUS).to_bytes(32, "little") for _ in range(256)
) * (N // 256)
srs_id = _native.srs_create_fixed_base(G1.generator(), scal_b[:32 * N])
ctx = ms.ScheduledMsmContext.from_native_srs(srs_id)

full = b"".join(
    random.randrange(MODULUS).to_bytes(32, "little") for _ in range(N)
)
sb = ms.scalars_to_byte_matrix(full, N)
d = ms.signed_digits(sb)
m = ctx.m
chunks = N // m
plan = ms.MsmPlan(d, m)
r_c = max(1 << (plan.r_exact - 1).bit_length(), 16)
w_count = d.shape[0]
lanes = ms.TOTAL_LANES
L = ms._L
seg = min(ms._SEG, r_c)
print(f"config: chunks={chunks} m={m} W={w_count} r_exact={plan.r_exact} "
      f"r_c={r_c} seg={seg}", flush=True)

ids_np = np.arange(1, m + 1, dtype=np.int32)


def stage_a(digits, base_map, logk_map):
    def build_body(g, sched_all):
        dch = lax.dynamic_slice(digits, (0, g * m), (w_count, m))
        dch = dch.astype(jnp.int32)

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
            lk = jnp.take(kmap, mag)
            step_idx = rank >> lk
            lane = jnp.take(bmap, mag) + (rank & ((1 << lk) - 1))
            flat = jnp.where(mag > 0, step_idx * lanes + lane, r_c * lanes)
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

    return lax.fori_loop(
        0, chunks, build_body, jnp.zeros((chunks * r_c, lanes), jnp.int32)
    )


def gathers(sched_all, xs, ys, rc_per_chunk):
    def chunk_body(g, acc):
        px = lax.dynamic_slice(xs, (0, g * m), (L, m))
        py = lax.dynamic_slice(ys, (0, g * m), (L, m))
        rc_g = jnp.minimum(rc_per_chunk[g], r_c)
        n_seg = (rc_g + seg - 1) // seg

        def seg_body(t, a):
            rows = lax.dynamic_slice(
                sched_all, (g * r_c + t * seg, 0), (seg, lanes)
            )
            idx = jnp.clip(jnp.abs(rows) - 1, 0, m - 1)
            gxs = jnp.take(px, idx, axis=1).transpose(1, 0, 2)
            gys = jnp.take(py, idx, axis=1).transpose(1, 0, 2)
            return a + gxs[0, 0, 0] + gys[0, 0, 0]

        return lax.fori_loop(0, n_seg, seg_body, acc)

    return lax.fori_loop(0, chunks, chunk_body, jnp.int32(0))


args = (
    jnp.asarray(d), jnp.asarray(plan.base_map), jnp.asarray(plan.logk_map),
)
ja = jax.jit(stage_a)
t0 = time.perf_counter()
sched = ja(*args)
sv = np.asarray(sched[:2, :2])
print(f"stage A compile+run {time.perf_counter()-t0:.1f}s", flush=True)
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    sched = ja(*args)
    sv = np.asarray(sched[:2, :2])
    best = min(best, time.perf_counter() - t0)
print(f"stage A (schedule build): {best:.3f}s", flush=True)

rcpc = jnp.asarray(plan.rc_per_chunk)
jg = jax.jit(gathers)
t0 = time.perf_counter()
r = jg(sched, ctx.xs, ctx.ys, rcpc)
_ = int(r)
print(f"gathers compile+run {time.perf_counter()-t0:.1f}s", flush=True)
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    r = jg(sched, ctx.xs, ctx.ys, rcpc)
    _ = int(r)
    best = min(best, time.perf_counter() - t0)
print(f"stage B gathers only: {best:.3f}s", flush=True)

# full kernel reference (hits the persistent compile cache)
t0 = time.perf_counter()
g = ctx.msm(full)
print(f"full kernel compile+run {time.perf_counter()-t0:.1f}s", flush=True)
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    g = ctx.msm(full)
    best = min(best, time.perf_counter() - t0)
print(f"full kernel: {best:.3f}s ({N/best/1e3:.0f}k pts/s)", flush=True)
_native.srs_free(srs_id)
