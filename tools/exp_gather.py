"""Round-2 hardware experiments: gather primitive throughput on the TPU.

Measures the candidate building blocks for the cell-scheduled Pippenger
kernel (PERF_NOTES backlog 1):
  E1  host->device transfer bandwidth over the axon tunnel
  E2  XLA jnp.take along lanes / sublanes at kernel-relevant shapes
  E3  Pallas take_along_axis axis=0 (sublane dynamic_gather), rows form
  E4  Pallas take_along_axis axis=1 (lane dynamic_gather), planes form
  E5  Pallas fori-loop row-copy gather (fallback)
Run: timeout 900 python tools/exp_gather.py
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.default_backend(), jax.devices())

M = 4096      # chunk rows / lanes
K = 64        # row width (point limbs padded)
P = 48        # planes (limbs padded to sublane tile)
STEPS = 50

rng = np.random.default_rng(0)
rows_np = rng.integers(0, 1 << 12, (M, K), dtype=np.int32)
planes_np = rng.integers(0, 1 << 12, (P, M), dtype=np.int32)
idx_np = rng.integers(0, M, (STEPS, M), dtype=np.int32)


def timeit(name, fn, *args, reps=3):
    try:
        out = fn(*args)
        jax.block_until_ready(out)
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        per_row = best / (STEPS * M) * 1e9
        print(f"{name}: {best*1e3:.2f} ms for {STEPS}x{M} rows "
              f"({per_row:.1f} ns/row, {STEPS*M/best/1e6:.1f} Mrows/s)")
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")


# --- E1: transfer bandwidth -------------------------------------------------
buf = np.zeros((50 * 1024 * 1024 // 4,), dtype=np.int32)
t0 = time.perf_counter()
d = jax.device_put(buf); d.block_until_ready()
t1 = time.perf_counter()
d = jax.device_put(buf + 1); d.block_until_ready()
t2 = time.perf_counter()
print(f"E1 device_put 50MB: cold {t1-t0:.3f}s warm {t2-t1:.3f}s "
      f"({50/(t2-t1):.0f} MB/s)")

# --- E2: XLA gathers --------------------------------------------------------
@jax.jit
def xla_row_gather(rows, idx):
    def body(i, acc):
        g = jnp.take(rows, idx[i], axis=0)          # (M, K)
        return acc + g
    return lax.fori_loop(0, STEPS, body, jnp.zeros((M, K), jnp.int32))

@jax.jit
def xla_lane_gather(planes, idx):
    def body(i, acc):
        g = jnp.take(planes, idx[i], axis=1)        # (P, M)
        return acc + g
    return lax.fori_loop(0, STEPS, body, jnp.zeros((P, M), jnp.int32))

rows_d = jnp.asarray(rows_np)
planes_d = jnp.asarray(planes_np)
idx_d = jnp.asarray(idx_np)
timeit("E2a XLA row gather (take axis=0, (4096,64))", xla_row_gather, rows_d, idx_d)
timeit("E2b XLA lane gather (take axis=1, (48,4096))", xla_lane_gather, planes_d, idx_d)

# --- E3: Pallas sublane dynamic_gather (rows) -------------------------------
def k_rows(rows_ref, idx_ref, out_ref):
    def body(i, acc):
        ind = jnp.broadcast_to(idx_ref[i][:, None], (M, K))
        g = jnp.take_along_axis(rows_ref[:], ind, axis=0)
        return acc + g
    out_ref[:] = lax.fori_loop(0, STEPS, body, jnp.zeros((M, K), jnp.int32))

pallas_rows = pl.pallas_call(
    k_rows,
    out_shape=jax.ShapeDtypeStruct((M, K), jnp.int32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)
timeit("E3  Pallas sublane gather (take_along_axis ax0 (4096,64))",
       jax.jit(pallas_rows), rows_d, idx_d)

# --- E4: Pallas lane dynamic_gather (planes) --------------------------------
def k_planes(planes_ref, idx_ref, out_ref):
    def body(i, acc):
        ind = jnp.broadcast_to(idx_ref[i][None, :], (P, M))
        g = jnp.take_along_axis(planes_ref[:], ind, axis=1)
        return acc + g
    out_ref[:] = lax.fori_loop(0, STEPS, body, jnp.zeros((P, M), jnp.int32))

pallas_planes = pl.pallas_call(
    k_planes,
    out_shape=jax.ShapeDtypeStruct((P, M), jnp.int32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)
timeit("E4  Pallas lane gather (take_along_axis ax1 (48,4096))",
       jax.jit(pallas_planes), planes_d, idx_d)

# --- E5: Pallas row-copy loop gather ----------------------------------------
def k_loop(rows_ref, idx_ref, out_ref):
    def outer(i, _):
        def inner(j, _):
            out_ref[j, :] = rows_ref[idx_ref[i, j], :]
            return 0
        return lax.fori_loop(0, M, inner, 0)
    lax.fori_loop(0, 4, outer, 0)   # 4 steps only (slow path)

pallas_loop = pl.pallas_call(
    k_loop,
    out_shape=jax.ShapeDtypeStruct((M, K), jnp.int32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)
def run_loop(rows, idx):
    return pallas_loop(rows, idx)
try:
    out = jax.jit(run_loop)(rows_d, idx_d); jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = jax.jit(run_loop)(rows_d, idx_d); jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"E5  Pallas row-copy loop: {dt*1e3:.2f} ms for 4x{M} rows "
          f"({dt/(4*M)*1e9:.0f} ns/row)")
except Exception as e:
    print(f"E5  FAILED {type(e).__name__}: {str(e)[:300]}")
