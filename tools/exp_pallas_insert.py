"""Microbench: the Pallas insert_seg kernel alone, on fixed streams.

Reports s per segment-call (seg=32 steps x 4096 lanes x ~12 Fq muls) and
implied Fq-mul rate, isolating the insertion arithmetic from schedule
build and gathers.  Also tries seg=128 to amortize per-call overhead.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from tnsh.commit import msm_sched as ms

jax.config.update("jax_compilation_cache_dir", "/tmp/tnsh_jax_cache")
print("backend:", jax.default_backend(), flush=True)

lanes = ms.TOTAL_LANES
L = ms._L
rng = np.random.default_rng(0)


def bench_seg(seg, iters):
    # fabricate plausible inputs: random sub-limb-bound planes
    def rand_plane(shape):
        return jnp.asarray(
            rng.integers(0, 1 << 11, size=shape, dtype=np.int64).astype(
                np.int32))

    rows = jnp.asarray(
        rng.integers(1, 100, size=(seg, 1, lanes), dtype=np.int64).astype(
            np.int32))
    gx = rand_plane((seg, L, lanes))
    gy = rand_plane((seg, L, lanes))
    ax = rand_plane((L, lanes))
    ay = rand_plane((L, lanes))
    az = rand_plane((L, lanes))
    h = jnp.zeros((1, 1), jnp.int32)

    insert, p_b, p2_b, one_b = ms._make_insert_seg(seg)
    pb, p2b, ob = jnp.asarray(p_b), jnp.asarray(p2_b), jnp.asarray(one_b)

    def chain(n, rows, gx, gy, ax, ay, az, h):
        def body(i, c):
            x, y, z, hh = c
            return insert(rows, gx, gy, pb, p2b, ob, x, y, z, hh)
        return lax.fori_loop(0, n, body, (ax, ay, az, h))

    jc = jax.jit(chain, static_argnums=0)
    t0 = time.perf_counter()
    X, Y, Z, H = jc(iters, rows, gx, gy, ax, ay, az, h)
    _ = np.asarray(X[:2, :2])
    print(f"seg={seg}: compile+run {time.perf_counter()-t0:.1f}s",
          flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        X, Y, Z, H = jc(iters, rows, gx, gy, ax, ay, az, h)
        _ = np.asarray(X[:2, :2])
        best = min(best, time.perf_counter() - t0)
    steps = iters * seg
    muls = steps * lanes * 12
    print(f"seg={seg}: {best:.3f}s for {iters} calls ({steps} steps) -> "
          f"{best/iters*1e3:.2f} ms/call, {muls/best/1e6:.0f} M Fq-muls/s",
          flush=True)


bench_seg(32, 22)
bench_seg(128, 6)
