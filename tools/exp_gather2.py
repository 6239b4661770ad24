"""Round-2 experiments part 2: wider gathers, cumsum, one-hot matmul, Pallas sanity."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

print("backend:", jax.default_backend())
rng = np.random.default_rng(0)


def timeit(name, fn, *args, reps=3, work=None):
    try:
        out = fn(*args)
        jax.block_until_ready(out)
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        extra = f", {work/best/1e9:.1f} G/s" if work else ""
        print(f"{name}: {best*1e3:.2f} ms{extra}")
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")


STEPS = 50
P = 48
for M in (8192, 16384):
    planes = jnp.asarray(rng.integers(0, 4096, (P, M), dtype=np.int32))
    idx = jnp.asarray(rng.integers(0, M, (STEPS, 4096), dtype=np.int32))

    @jax.jit
    def lane_gather(planes, idx):
        def body(i, acc):
            return acc + jnp.take(planes, idx[i], axis=1)
        return lax.fori_loop(0, STEPS, body, jnp.zeros((P, 4096), jnp.int32))

    timeit(f"lane gather width {M} -> 4096 x{STEPS}", lane_gather, planes, idx,
           work=STEPS * 4096 * P)

# cumsum of one-hot ranks: (m, B) f32 cumsum along axis 0
for M, B in ((16384, 128), (16384, 512)):
    d = jnp.asarray(rng.integers(0, B, (M,), dtype=np.int32))

    @jax.jit
    def ranks(d):
        oh = jax.nn.one_hot(d, B, dtype=jnp.float32)          # (M, B)
        cs = jnp.cumsum(oh, axis=0)                            # (M, B)
        r = jnp.take_along_axis(cs, d[:, None], axis=1)[:, 0]  # (M,)
        return r - 1.0
    timeit(f"rank cumsum one-hot ({M},{B})", ranks, d, work=M * B)

# schedule build: sched[s,b] = M1^T @ (M2 * (i+1)) - 1
M, B, R = 16384, 128, 200
d = jnp.asarray(rng.integers(0, B, (M,), dtype=np.int32))

@jax.jit
def schedule(d):
    oh = jax.nn.one_hot(d, B, dtype=jnp.float32)
    cs = jnp.cumsum(oh, axis=0)
    r = (jnp.take_along_axis(cs, d[:, None], axis=1)[:, 0] - 1.0)
    m1 = jax.nn.one_hot(r.astype(jnp.int32), R, dtype=jnp.float32)  # (M, R)
    ids = (jnp.arange(M, dtype=jnp.float32) + 1.0)[:, None]
    sched = jnp.dot(m1.T, oh * ids, preferred_element_type=jnp.float32)
    return sched.astype(jnp.int32) - 1                                # (R, B)
timeit(f"schedule build m={M} B={B} R={R} (x32 windows)",
       jax.jit(lambda d: jax.vmap(schedule)(jnp.broadcast_to(d, (32, M)))), d)

# Pallas sanity: trivial kernel on TPU
try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2

    f = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    out = jax.jit(f)(jnp.ones((8, 128), jnp.int32))
    jax.block_until_ready(out)
    print("Pallas trivial kernel: OK", int(out[0, 0]))
except Exception as e:
    print(f"Pallas trivial kernel: FAILED {type(e).__name__}: {str(e)[:300]}")
