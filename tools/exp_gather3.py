"""Honest re-timing with varying inputs (defeat any tunnel-side memoization)."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

print("backend:", jax.default_backend())
rng = np.random.default_rng(0)

STEPS = 50
P = 48
M = 16384

planes = jnp.asarray(rng.integers(0, 4096, (P, M), dtype=np.int32))
idxs = [jnp.asarray(rng.integers(0, M, (STEPS, 4096), dtype=np.int32))
        for _ in range(8)]

@jax.jit
def lane_gather(planes, idx):
    def body(i, acc):
        return acc + jnp.take(planes, idx[i], axis=1)
    return lax.fori_loop(0, STEPS, body, jnp.zeros((P, 4096), jnp.int32))

out = lane_gather(planes, idxs[0]); jax.block_until_ready(out)
t0 = time.perf_counter()
for k in range(8):
    out = lane_gather(planes, idxs[k])
jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / 8
print(f"lane gather w={M}->4096 x{STEPS}: {dt*1e3:.3f} ms/call "
      f"({STEPS*4096*P/dt/1e9:.1f} G elems/s, {dt/STEPS*1e6:.2f} us/step)")

# schedule build over 32 windows, varying digits
B, R = 128, 200
ds = [jnp.asarray(rng.integers(0, B, (32, M), dtype=np.int32)) for _ in range(8)]

@jax.jit
def schedule32(d32):
    def one(d):
        oh = jax.nn.one_hot(d, B, dtype=jnp.float32)
        cs = jnp.cumsum(oh, axis=0)
        r = (jnp.take_along_axis(cs, d[:, None], axis=1)[:, 0] - 1.0)
        m1 = jax.nn.one_hot(r.astype(jnp.int32), R, dtype=jnp.float32)
        ids = (jnp.arange(M, dtype=jnp.float32) + 1.0)[:, None]
        sched = jnp.dot(m1.T, oh * ids, preferred_element_type=jnp.float32)
        return sched.astype(jnp.int32) - 1
    return jax.vmap(one)(d32)

out = schedule32(ds[0]); jax.block_until_ready(out)
t0 = time.perf_counter()
for k in range(8):
    out = schedule32(ds[k])
jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / 8
mac = 32 * (R * M * B + M * B)
print(f"schedule build 32w m={M}: {dt*1e3:.3f} ms/call ({mac*2/dt/1e12:.1f} TFLOP/s)")

# int32 elementwise mul throughput at plane shapes (CIOS core op sanity)
xs = [jnp.asarray(rng.integers(0, 4096, (22, 65536), dtype=np.int32))
      for _ in range(8)]

@jax.jit
def mulchain(a):
    def body(i, acc):
        return (acc * a[0] + a) & 0xfff
    return lax.fori_loop(0, 100, body, a)

out = mulchain(xs[0]); jax.block_until_ready(out)
t0 = time.perf_counter()
for k in range(8):
    out = mulchain(xs[k])
jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / 8
ops = 100 * 22 * 65536 * 2
print(f"int32 mul+and chain: {dt*1e3:.3f} ms ({ops/dt/1e12:.2f} Tops int32)")
