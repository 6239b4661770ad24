"""Schedule-build variants timing: HIGHEST-dot vs bf16-split vs scatter."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)
M, W, R, B = 32768, 32, 384, 128
CH = 8
digits = jnp.asarray(rng.integers(-128, 128, (W, CH * M), dtype=np.int8))
ids_np = np.arange(M, dtype=np.float32)


def build(dotfn):
    def go(digits):
        def chunk_body(g, acc):
            dch = lax.dynamic_slice(digits, (0, g * M), (W, M)).astype(jnp.int32)
            def win_body(w, sched):
                dw = lax.dynamic_index_in_dim(dch, w, 0, keepdims=False)
                mag = jnp.abs(dw)
                bucket = jnp.where(mag > 0, mag - 1, -1)
                oh = jax.nn.one_hot(bucket, B, dtype=jnp.float32)
                cs = jnp.cumsum(oh, axis=0)
                rank = jnp.take_along_axis(
                    cs, jnp.clip(bucket, 0, B - 1)[:, None], axis=1
                )[:, 0].astype(jnp.int32) - 1
                step_idx = jnp.where(mag > 0, rank, -1)
                svals = dotfn(step_idx, bucket, dw)
                return lax.dynamic_update_slice(sched, svals, (0, w * B))
            sched = lax.fori_loop(0, W, win_body,
                                  jnp.zeros((R, W * B), jnp.int32))
            return acc + sched[0, 0]
        return lax.fori_loop(0, CH, chunk_body, jnp.zeros((), jnp.int32))
    return jax.jit(go)


def dot_highest(step_idx, bucket, dw):
    m1 = jax.nn.one_hot(step_idx, R, dtype=jnp.float32)
    oh = jax.nn.one_hot(bucket, B, dtype=jnp.float32)
    ids = jnp.where(dw < 0, -(ids_np + 1.0), ids_np + 1.0)
    return jnp.dot(m1.T, oh * ids[:, None],
                   preferred_element_type=jnp.float32,
                   precision=lax.Precision.HIGHEST).astype(jnp.int32)


def dot_bf16split(step_idx, bucket, dw):
    m1 = jax.nn.one_hot(step_idx, R, dtype=jnp.bfloat16)
    oh = jax.nn.one_hot(bucket, B, dtype=jnp.bfloat16)
    ids = ids_np + 1.0
    hi = jnp.asarray(np.floor(ids / 256.0), jnp.bfloat16)
    lo = jnp.asarray(ids - np.floor(ids / 256.0) * 256.0, jnp.bfloat16)
    shi = jnp.dot(m1.T, oh * hi[:, None], preferred_element_type=jnp.float32)
    slo = jnp.dot(m1.T, oh * lo[:, None], preferred_element_type=jnp.float32)
    v = (shi.astype(jnp.int32) << 8) + slo.astype(jnp.int32)
    return jnp.where(
        jnp.dot(m1.T, oh * jnp.where(dw < 0, 1.0, 0.0).astype(jnp.bfloat16)[:, None],
                preferred_element_type=jnp.float32) > 0.5,
        -v, v)


def dot_scatter(step_idx, bucket, dw):
    ids = jnp.where(dw < 0, -jnp.arange(1, M + 1), jnp.arange(1, M + 1))
    flat = jnp.where(step_idx >= 0,
                     step_idx * B + jnp.clip(bucket, 0, B - 1), R * B)
    out = jnp.zeros((R * B + 1,), jnp.int32).at[flat].set(
        ids.astype(jnp.int32), mode="drop")
    return out[:R * B].reshape(R, B)


for name, fn in (("highest", dot_highest), ("bf16split", dot_bf16split),
                 ("scatter", dot_scatter)):
    try:
        f = build(fn)
        t0 = time.perf_counter()
        out = f(digits); _ = np.asarray(out)
        t1 = time.perf_counter()
        out = f(digits); _ = np.asarray(out)
        t2 = time.perf_counter()
        print(f"{name:9s}: compile {t1-t0:5.0f}s warm {t2-t1:.3f}s "
              f"({CH*W} window-chunks)", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
