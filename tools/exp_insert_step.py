"""Measure MSM insert-step cost vs lane count and fq op form on TPU.

The insert loop is sequential in steps; per-step work scales with lanes.
If latency-bound, bigger windows (more lanes, fewer steps) win.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from tnsh.field.fr_jax import fq_ops, fq_ops_rows
from tnsh.field.limbs import FQ_SPEC
from tnsh.commit.msm_sched import _padd_mixed_flag, _L

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)
M = 32768

xs = jnp.asarray(rng.integers(0, 1 << 12, (_L, M), dtype=np.int32))
ys = jnp.asarray(rng.integers(0, 1 << 12, (_L, M), dtype=np.int32))
one_np = np.asarray(FQ_SPEC.one_mont_limbs(), dtype=np.int32)[:, None]

for lanes in (4096, 13312, 24576):
    for form, fq in (("rows", fq_ops_rows), ("array", fq_ops)):
        steps = max(1, 3072 * 4096 // lanes // 8)  # keep work bounded
        sched = jnp.asarray(
            rng.integers(-M, M + 1, (steps, lanes), dtype=np.int32))

        def insert(xs, ys, sched):
            accX = jnp.zeros((_L, lanes), jnp.int32)
            accY = jnp.zeros((_L, lanes), jnp.int32) + one_np
            accZ = jnp.zeros((_L, lanes), jnp.int32)

            def step(s, st):
                accX, accY, accZ, hz = st
                row = lax.dynamic_index_in_dim(sched, s, 0, keepdims=False)
                idx = jnp.clip(jnp.abs(row) - 1, 0, M - 1)
                take = row != 0
                gx = jnp.take(xs, idx, axis=1)
                gy = jnp.take(ys, idx, axis=1)
                gy = fq.select(row < 0, fq.neg(gy), gy)
                accX, accY, accZ, same = _padd_mixed_flag(
                    fq, accX, accY, accZ, gx, gy, take)
                return accX, accY, accZ, hz + jnp.sum(same.astype(jnp.int32))

            accX, accY, accZ, hz = lax.fori_loop(
                0, steps, step,
                (accX, accY, accZ, jnp.zeros((), jnp.int32)))
            return accX[0, 0] + hz

        try:
            f = jax.jit(insert)
            t0 = time.perf_counter()
            out = f(xs, ys, sched); _ = np.asarray(out)
            t1 = time.perf_counter()
            out = f(xs, ys, sched); _ = np.asarray(out)
            t2 = time.perf_counter()
            us = (t2 - t1) / steps * 1e6
            rate = steps * lanes / (t2 - t1) / 1e6
            print(f"lanes={lanes:6d} {form:5s}: compile {t1-t0:5.0f}s "
                  f"warm {t2-t1:6.3f}s for {steps} steps "
                  f"({us:7.1f} us/step, {rate:5.1f} M lane-adds/s)", flush=True)
        except Exception as e:
            print(f"lanes={lanes} {form}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)
