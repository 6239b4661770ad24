"""Honest cost of the Pallas-engine stage-B stream gathers at 2^16 shapes.

Replicates the engine's gather exactly (chunk-local take + transpose into
(seg, 22, 4096) streams), but consumes each stream with a full sum so XLA
cannot dead-code-eliminate any part of it.  Also times a no-transpose
variant to split gather cost from layout cost.
"""
import time
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/tnsh_jax_cache")
print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)

L, M, LANES, SEG = 22, 32768, 4096, 32
CHUNKS, NSEG = 2, 11

xs = jnp.asarray(rng.integers(0, 4096, (L, CHUNKS * M), dtype=np.int32))
ys = jnp.asarray(rng.integers(0, 4096, (L, CHUNKS * M), dtype=np.int32))
sched = jnp.asarray(
    rng.integers(-M, M, (CHUNKS * NSEG * SEG, LANES), dtype=np.int32))


def run(transpose):
    def f(xs, ys, sched):
        def chunk_body(g, acc):
            px = lax.dynamic_slice(xs, (0, g * M), (L, M))
            py = lax.dynamic_slice(ys, (0, g * M), (L, M))

            def seg_body(t, a):
                rows = lax.dynamic_slice(
                    sched, ((g * NSEG + t) * SEG, 0), (SEG, LANES))
                idx = jnp.clip(jnp.abs(rows) - 1, 0, M - 1)
                gxs = jnp.take(px, idx, axis=1)
                gys = jnp.take(py, idx, axis=1)
                if transpose:
                    gxs = gxs.transpose(1, 0, 2)
                    gys = gys.transpose(1, 0, 2)
                return a + jnp.sum(gxs) + jnp.sum(gys)

            return lax.fori_loop(0, NSEG, seg_body, acc)

        return lax.fori_loop(0, CHUNKS, chunk_body, jnp.int32(0))

    jf = jax.jit(f)
    t0 = time.perf_counter()
    r = jf(xs, ys, sched)
    _ = int(r)
    print(f"transpose={transpose}: compile+run {time.perf_counter()-t0:.1f}s",
          flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = jf(xs, ys, sched)
        _ = int(r)
        best = min(best, time.perf_counter() - t0)
    n_g = CHUNKS * NSEG * 2
    print(f"transpose={transpose}: {best:.3f}s ({n_g} stream gathers of "
          f"(L={L}, {SEG}x{LANES})) -> {best/n_g*1e3:.1f} ms each",
          flush=True)


run(True)
run(False)
