"""Round-5 TPU measurement session (VERDICT r4 tasks 4 + 6).

ONE long-lived process over the axon tunnel (per-process compile caches
never persist — PERF_NOTES 17), two experiments:

A. MSM A/B at 2^16 / 2^18 / 2^20: Pallas engine vs host, interleaved in
   this process (the host baseline swings 144-222k pts/s with co-located
   load, so cross-process A/B is meaningless), warm, fetch-timed, plus
   burst-4 dispatch.  Tests PERF_NOTES 17's prediction that the ~0.35 s
   per-call latency amortizes to a host win by 2^20.

B. fr_mont_mul ceiling split: the shipped Pallas chain vs (i) an
   add-only chain (isolates VPU int-mul vs int-add issue cost), and
   (ii) iters-scaling (fixed dispatch overhead vs marginal per-iter
   cost).  Decides whether the remaining gap to the ~1.35 G muls/s
   speed-of-light model is mul-issue-rate, bandwidth, or model error.

Run:  python tools/exp_r5_tpu.py [--sizes 16,18,20] [--skip-msm|--skip-mul]
"""

from __future__ import annotations

import argparse
import os
import random
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fetch(x):
    return np.asarray(x)


def exp_mul(jax):
    import jax.numpy as jnp

    from tnsh.field import fr_pallas
    from tnsh.field.fr_jax import fr_ops
    from tnsh.field.limbs import FR_SPEC, pack_ints

    rng = np.random.default_rng(0)
    n = 1 << 19
    vals = [int(v) for v in rng.integers(0, 1 << 62, n)]
    a = jnp.asarray(pack_ints(vals, FR_SPEC))
    print("== B. fr_mont_mul ceiling split ==", flush=True)
    for iters in (16, 64, 256):
        chain = lambda x, y: fr_pallas.mont_mul_chain(x, y, iters)
        r = chain(a, a); fetch(r[:4, :4])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r = chain(r, a)
            fetch(r[:4, :4])
            best = min(best, time.perf_counter() - t0)
        rate = n * iters / best
        print(f"  mul chain iters={iters}: {best*1e3:.1f} ms "
              f"-> {rate/1e6:.0f} M muls/s", flush=True)
    # add-only chain at matched iteration count (measures non-mul floor)
    try:
        from functools import partial

        import jax as _jax

        iters = 64

        @_jax.jit
        def add_chain(x, y):
            return _jax.lax.fori_loop(0, iters,
                                      lambda i, r: fr_ops.add(r, y), x)

        r = add_chain(a, a); fetch(r[:4, :4])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r = add_chain(r, a)
            fetch(r[:4, :4])
            best = min(best, time.perf_counter() - t0)
        print(f"  XLA add chain iters={iters}: {best*1e3:.1f} ms "
              f"-> {n*iters/best/1e6:.0f} M adds/s", flush=True)
    except Exception as exc:
        print(f"  add chain failed: {exc}", flush=True)


def exp_msm(jax, sizes):
    from tnsh import _native
    from tnsh.field.fr import MODULUS
    from tnsh.field.g1 import G1
    from tnsh.commit.msm_sched import ScheduledMsmContext

    print("== A. MSM host vs Pallas engine, interleaved ==", flush=True)
    random.seed(7)
    n_max = 1 << max(sizes)
    blk = b"".join(random.randrange(MODULUS).to_bytes(32, "little")
                   for _ in range(1024))
    srs_scalars = (blk * (n_max // 1024))[:32 * n_max]
    t0 = time.perf_counter()
    sid = _native.srs_create_fixed_base(G1.generator(), srs_scalars)
    print(f"  srs 2^{max(sizes)} built in {time.perf_counter()-t0:.1f} s",
          flush=True)
    ctx = ScheduledMsmContext.from_native_srs(sid)
    for lg in sizes:
        n = 1 << lg
        sc = (blk * (n // 1024))[:32 * n]
        # warm the device kernel for this shape
        try:
            fin = ctx.msm_async(sc, engine="pallas")
            want = fin()
        except Exception as exc:
            print(f"  2^{lg}: pallas compile/run failed: {exc}", flush=True)
            continue
        rows = []
        for rep in range(3):
            t0 = time.perf_counter()
            host = _native.srs_msm(sid, sc)
            t_h = time.perf_counter() - t0
            t0 = time.perf_counter()
            fin = ctx.msm_async(sc, engine="pallas")
            got = fin()
            t_d = time.perf_counter() - t0
            assert got == host, f"mismatch at 2^{lg}"
            rows.append((t_h, t_d))
        t0 = time.perf_counter()
        fins = [ctx.msm_async(sc, engine="pallas") for _ in range(4)]
        res = [f() for f in fins]
        t_burst = (time.perf_counter() - t0) / 4
        assert all(r == res[0] for r in res)
        hs = ", ".join(f"{n/h/1e3:.0f}" for h, _ in rows)
        ds = ", ".join(f"{n/d/1e3:.0f}" for _, d in rows)
        print(f"  2^{lg}: host [{hs}] k pts/s | pallas [{ds}] k pts/s | "
              f"burst-4 {n/t_burst/1e3:.0f} k pts/s", flush=True)
    _native.srs_free(sid)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="16,18,20")
    ap.add_argument("--skip-msm", action="store_true")
    ap.add_argument("--skip-mul", action="store_true")
    args = ap.parse_args()
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/tnsh_jax_cache")
    except Exception:
        pass
    print(f"backend: {jax.devices()[0].platform}", flush=True)
    if not args.skip_mul:
        exp_mul(jax)
    if not args.skip_msm:
        exp_msm(jax, [int(s) for s in args.sizes.split(",")])


if __name__ == "__main__":
    main()
