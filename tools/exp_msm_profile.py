"""Phase profile of the scheduled-Pippenger MSM at 2^18 on TPU."""
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

print("backend:", jax.default_backend(), flush=True)
random.seed(7)
N = 1 << 18
scal_b = b"".join(
    random.randrange(MODULUS).to_bytes(32, "little") for _ in range(256)
) * (N // 256)
srs_id = _native.srs_create_fixed_base(G1.generator(), scal_b[:32 * N])
t0 = time.perf_counter()
ctx = ms.ScheduledMsmContext.from_native_srs(srs_id)
print(f"context: {time.perf_counter()-t0:.2f}s", flush=True)

full = b"".join(
    random.randrange(MODULUS).to_bytes(32, "little") for _ in range(N)
)

# host phases
t0 = time.perf_counter()
sb = ms.scalars_to_byte_matrix(full, N)
t1 = time.perf_counter()
d = ms.signed_digits(sb)
t2 = time.perf_counter()
plan = ms.MsmPlan(d, ctx.m)
t3 = time.perf_counter()
print(f"host: bytes {t1-t0:.3f}s digits {t2-t1:.3f}s plan {t3-t2:.3f}s "
      f"r_exact={plan.r_exact}", flush=True)

m = ctx.m
chunks = N // m
w_count = d.shape[0]
r_c = (plan.r_exact + 63) // 64 * 64
L = w_count * 128
print(f"config: chunks={chunks} m={m} W={w_count} R_c={r_c}", flush=True)

t0 = time.perf_counter()
dd = jax.device_put(jnp.asarray(d)); dd.block_until_ready()
t1 = time.perf_counter()
print(f"digit upload ({d.nbytes/1e6:.0f}MB): {t1-t0:.3f}s", flush=True)

plan_args = [jnp.asarray(plan.log_k), jnp.asarray(plan.slot_map),
             jnp.asarray(plan.fold_masks), jnp.asarray(plan.canon_src),
             jnp.asarray(plan.canon_mask)]

# --- schedule-build-only kernel ---------------------------------------------
from tnsh.commit.msm_sched import _L
ids_np = np.arange(m, dtype=np.float32)

def sched_only(digits, log_k, slot_map):
    def chunk_body(g, acc):
        dch = lax.dynamic_slice(digits, (0, g * m), (w_count, m)).astype(jnp.int32)
        def win_body(w, sched):
            dw = lax.dynamic_index_in_dim(dch, w, 0, keepdims=False)
            lk = lax.dynamic_index_in_dim(log_k, w, 0, keepdims=False)
            smap = lax.dynamic_index_in_dim(slot_map, w, 0, keepdims=False)
            mag = jnp.abs(dw)
            bucket = jnp.where(mag > 0, mag - 1, -1)
            oh = jax.nn.one_hot(bucket, 128, dtype=jnp.float32)
            cs = jnp.cumsum(oh, axis=0)
            rank = jnp.take_along_axis(
                cs, jnp.clip(bucket, 0, 127)[:, None], axis=1
            )[:, 0].astype(jnp.int32) - 1
            step_idx = jnp.where(mag > 0, rank >> lk, -1)
            sub = rank & ((1 << lk) - 1)
            lane_in = jnp.where(mag > 0, (jnp.take(smap, mag) << lk) + sub, -1)
            m1 = jax.nn.one_hot(step_idx, r_c, dtype=jnp.float32)
            oh_lane = jax.nn.one_hot(lane_in, 128, dtype=jnp.float32)
            ids_signed = jnp.where(dw < 0, -(ids_np + 1.0), ids_np + 1.0)
            svals = jnp.dot(m1.T, oh_lane * ids_signed[:, None],
                            preferred_element_type=jnp.float32,
                            precision=lax.Precision.HIGHEST)
            return lax.dynamic_update_slice(sched, svals.astype(jnp.int32), (0, w * 128))
        sched = lax.fori_loop(0, w_count, win_body,
                              jnp.zeros((r_c, L), jnp.int32))
        return acc + jnp.sum(sched)
    return lax.fori_loop(0, chunks, chunk_body, jnp.zeros((), jnp.int32))

f = jax.jit(sched_only)
t0 = time.perf_counter()
out = f(dd, plan_args[0], plan_args[1]); _ = np.asarray(out)
t1 = time.perf_counter()
out = f(dd, plan_args[0], plan_args[1]); _ = np.asarray(out)
t2 = time.perf_counter()
print(f"schedule-only: cold {t1-t0:.1f}s warm {t2-t1:.3f}s", flush=True)

# --- insert-only kernel (fixed random schedule) ------------------------------
from tnsh.commit.msm_jax import fq
from tnsh.commit.msm_sched import _padd_mixed_flag

rng = np.random.default_rng(0)
fake_sched = rng.integers(-m, m + 1, (r_c, L), dtype=np.int32)

def insert_only(xs, ys, valid, sched):
    one_np = np.asarray(ms.FQ_SPEC.one_mont_limbs(), dtype=np.int32)[:, None]
    accX = jnp.zeros((_L, L), jnp.int32)
    accY = jnp.zeros((_L, L), jnp.int32) + one_np
    accZ = jnp.zeros((_L, L), jnp.int32)
    def chunk_body(g, st):
        accX, accY, accZ, hz = st
        px = lax.dynamic_slice(xs, (0, g * m), (_L, m))
        py = lax.dynamic_slice(ys, (0, g * m), (_L, m))
        vch = lax.dynamic_slice(valid, (g * m,), (m,))
        def step(s, st2):
            accX, accY, accZ, hz = st2
            row = lax.dynamic_index_in_dim(sched, s, 0, keepdims=False)
            idx = jnp.clip(jnp.abs(row) - 1, 0, m - 1)
            take = (row != 0) & jnp.take(vch, idx)
            gx = jnp.take(px, idx, axis=1)
            gy = jnp.take(py, idx, axis=1)
            gy = fq.select(row < 0, fq.neg(gy), gy)
            accX, accY, accZ, same = _padd_mixed_flag(fq, accX, accY, accZ, gx, gy, take)
            return accX, accY, accZ, hz + jnp.sum(same.astype(jnp.int32))
        return lax.fori_loop(0, r_c, step, (accX, accY, accZ, hz))
    accX, accY, accZ, hz = lax.fori_loop(
        0, chunks, chunk_body, (accX, accY, accZ, jnp.zeros((), jnp.int32)))
    return accX[0, 0] + hz

g_ins = jax.jit(insert_only)
fs = jnp.asarray(fake_sched)
t0 = time.perf_counter()
out = g_ins(ctx.xs, ctx.ys, ctx.valid, fs); _ = np.asarray(out)
t1 = time.perf_counter()
out = g_ins(ctx.xs, ctx.ys, ctx.valid, fs); _ = np.asarray(out)
t2 = time.perf_counter()
steps = chunks * r_c
print(f"insert-only: cold {t1-t0:.1f}s warm {t2-t1:.3f}s "
      f"({steps} steps, {(t2-t1)/steps*1e6:.0f} us/step)", flush=True)

# --- full ---------------------------------------------------------------------
t0 = time.perf_counter()
res = ctx.msm(full)
t1 = time.perf_counter()
print(f"full msm warm: {t1-t0:.3f}s", flush=True)
_native.srs_free(srs_id)
