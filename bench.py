"""Benchmark entry point for the driver.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload: the reference's own headline Twist benchmark at memory size 16 —
write if i % 3 == 0 (value 42*i) else read, 8 operations (the size-tiered
count for size 16; reference benchmarks.rs:57-99).  The baseline number is
the reference's published illustrative throughput for that row: 251 prove
ops/s (BENCHMARK_RESULTS.md:122, BASELINE.md).  vs_baseline > 1 means
faster than the reference's published figure.

Supplementary metrics (TPU Fr-mul throughput, larger-size prover runs) are
printed to stderr so stdout stays a single JSON line.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    from tnsh.bench.harness import ProtocolBenchmarks

    # Warm-up run (populates interpolation caches the way a server would);
    # best-of-5 damps co-located load noise on the 2-core host.
    ProtocolBenchmarks.benchmark_twist_single(4, 8)
    best = None
    for _ in range(5):
        res = ProtocolBenchmarks.benchmark_twist_single(4, 8)
        if best is None or res.prove_time < best.prove_time:
            best = res
    value = best.prove_ops_per_second()
    baseline = 251.0  # reference BENCHMARK_RESULTS.md:122 (illustrative)
    print(
        f"[bench] twist size=16 ops=8: prove {best.prove_time * 1e3:.2f} ms, "
        f"verify {best.verify_time * 1e3:.2f} ms, setup {best.setup_time * 1e3:.2f} ms",
        file=sys.stderr,
    )

    # Supplementary: the verifier-enforced batched sound prover (protocol
    # v2) at K=2^10 T=2^14 — the capability the reference lacks entirely.
    try:
        import random

        from tnsh.protocols.sound import TwistSound, prewarm_sound
        from tnsh.protocols.twist import MemoryTrace
        from tnsh.core.params import setup_params as _sp
        from tnsh.field.fr import Fr as _F

        s_pp, s_vp = _sp(12)
        prewarm_sound(10, 14)
        random.seed(1)
        tr = MemoryTrace(1 << 10)
        for i in range(1 << 14):
            if i % 3 == 0:
                tr.write(random.randrange(1 << 10), _F(42 * i))
            else:
                tr.read(random.randrange(1 << 10))
        t0 = time.perf_counter()
        sproof = TwistSound.prove(tr, s_pp)
        t1 = time.perf_counter()
        ok = TwistSound.verify(sproof, s_vp)
        t2 = time.perf_counter()
        print(
            f"[bench] twist_sound K=2^10 T=2^14: prove {t1 - t0:.2f} s "
            f"({(1 << 14) / (t1 - t0):.0f} ops/s), verify "
            f"{(t2 - t1) * 1e3:.0f} ms, valid={ok}",
            file=sys.stderr,
        )
    except Exception as exc:  # pragma: no cover - diagnostics only
        print(f"[bench] twist_sound skipped: {exc}", file=sys.stderr)

    # Supplementary: the trapdoor-free bit-column prover (wire v3) at
    # K=2^6 T=2^12 — structured O(T logK) oracle, native k/j phases.
    # Regression line for the adversarial-scale capability (VERDICT r4
    # task 7); round-4 pure-Python baseline for this shape was 3.38 s.
    try:
        import random

        from tnsh.protocols.twist_bits import TwistBits
        from tnsh.protocols.twist import MemoryTrace
        from tnsh.core.params import setup_params as _sp
        from tnsh.field.fr import Fr as _F

        b_pp, b_vp = _sp(12)
        random.seed(5)
        tr = MemoryTrace(1 << 6)
        for i in range(1 << 12):
            if i % 3 == 0:
                tr.write(random.randrange(1 << 6), _F(42 * i))
            else:
                tr.read(random.randrange(1 << 6))
        TwistBits.prove(tr, b_pp)  # warm (SRS + caches)
        t0 = time.perf_counter()
        bproof = TwistBits.prove(tr, b_pp)
        t1 = time.perf_counter()
        ok = TwistBits.verify(bproof, b_vp)
        t2 = time.perf_counter()
        print(
            f"[bench] twist_bits K=2^6 T=2^12: prove {t1 - t0:.3f} s "
            f"({(1 << 12) / (t1 - t0):.0f} ops/s), verify "
            f"{(t2 - t1) * 1e3:.0f} ms, valid={ok}",
            file=sys.stderr,
        )
    except Exception as exc:  # pragma: no cover - diagnostics only
        print(f"[bench] twist_bits skipped: {exc}", file=sys.stderr)

    # Supplementary: vectorized Fr Montgomery-mul throughput on the default
    # JAX backend (the real TPU chip when run under the driver).  Runs in a
    # subprocess with a hard timeout so a wedged TPU tunnel can never hang
    # the metric emission.
    try:
        import subprocess

        # One jitted fori_loop = ONE dispatch + ONE fetch for 2^27
        # lane-muls: the old 100-dispatch chain measured per-dispatch
        # tunnel latency, not the chip (BENCH_r01 1485 vs BENCH_r02 107
        # M muls/s on identical code).  iters=256 amortizes the measured
        # ~27 ms fixed dispatch+grid overhead (round-5 iters sweep: 221 /
        # 436 / 594 M muls/s at iters 16/64/256; marginal 672 M).  The
        # naive speed-of-light model — 0.33e12 VPU int-ops/s over ~244
        # CIOS ops/mul = 1.35 G — overestimates: the round-5 block+iters
        # sweeps bound the true cost at ~490 effective VPU slots per mul
        # (int32 multiplies issue at about half rate), a ~0.67 G ceiling
        # the marginal rate saturates (PERF_NOTES r5).
        probe = (
            "import time, jax, jax.numpy as jnp, numpy as np\n"
            "try: jax.config.update('jax_compilation_cache_dir', "
            "'/tmp/tnsh_jax_cache')\n"
            "except Exception: pass\n"
            "from tnsh.field.fr_jax import fr_mont_mul\n"
            "from tnsh.field import fr_pallas\n"
            "from tnsh.field.limbs import FR_SPEC, pack_ints\n"
            "rng = np.random.default_rng(0)\n"
            "n, iters = 1 << 19, 256\n"
            "vals = [int(v) for v in rng.integers(0, 1 << 62, n)]\n"
            "a = jnp.asarray(pack_ints(vals, FR_SPEC))\n"
            "# shipped production kernel: the VMEM-resident Pallas chain\n"
            "# (tnsh.field.fr_pallas, the engine behind mle_jax's routed\n"
            "# fold / round-eval entry points); XLA chain for reference\n"
            "if fr_pallas.enabled():\n"
            "    chain = lambda x, y: fr_pallas.mont_mul_chain(x, y, iters)\n"
            "    kind = 'pallas'\n"
            "else:\n"
            "    chain = jax.jit(lambda x, y: jax.lax.fori_loop(\n"
            "        0, iters, lambda i, r: fr_mont_mul(r, y), x))\n"
            "    kind = 'xla'\n"
            "r = chain(a, a); _ = np.asarray(r[:4, :4])  # compile + fetch\n"
            "best = float('inf')\n"
            "for _i in range(3):\n"
            "    t0 = time.perf_counter()\n"
            "    r = chain(r, a)\n"
            "    _ = np.asarray(r[:4, :4])  # fetch: block_until_ready does\n"
            "    # not wait over the axon tunnel (PERF_NOTES round-2)\n"
            "    best = min(best, time.perf_counter() - t0)\n"
            "rate = n * iters / best\n"
            "sol = 0.33e12 / 490.0\n"
            "print(f'{jax.devices()[0].platform} {kind} {rate / 1e6:.0f} M "
            "muls/s ({100 * rate / sol:.0f}% of ~{sol / 1e6:.0f}M "
            "speed-of-light; {iters}x chained muls over 2^19 lanes, "
            "1 dispatch)')\n"
        )
        out = subprocess.run(
            [sys.executable, "-c", probe],
            capture_output=True,
            # the chain kernel compiles in ~3 s, but the axon tunnel has
            # been observed to stall trivial roundtrips for minutes while
            # draining a server-side compile backlog — ride it out
            timeout=900,
            text=True,
        )
        line = (out.stdout or "").strip().splitlines()
        if out.returncode == 0 and line:
            print(f"[bench] fr_mont_mul[{line[-1]}]", file=sys.stderr)
        else:
            print(
                f"[bench] fr_mont_mul probe failed (rc={out.returncode})",
                file=sys.stderr,
            )
    except Exception as exc:  # pragma: no cover - diagnostics only
        print(f"[bench] fr_mont_mul skipped: {exc}", file=sys.stderr)

    # Supplementary: scheduled-Pippenger TPU MSM at 2^16 (the round-2
    # flagship kernel), timed with a real device fetch, vs the native host
    # MSM on the same SRS.  Subprocess + timeout so a wedged tunnel or a
    # cold compile cache cannot hang metric emission.
    try:
        import subprocess

        probe = (
            "import random, time, numpy as np, jax\n"
            "try: jax.config.update('jax_compilation_cache_dir', "
            "'/tmp/tnsh_jax_cache')\n"
            "except Exception: pass\n"
            "from tnsh import _native\n"
            "from tnsh.field.fr import MODULUS\n"
            "from tnsh.field.g1 import G1\n"
            "from tnsh.commit.msm_sched import ScheduledMsmContext\n"
            "random.seed(7)\n"
            "n = 1 << 16\n"
            "sb = b''.join(random.randrange(MODULUS).to_bytes(32, 'little')"
            " for _ in range(256)) * (n // 256)\n"
            "sid = _native.srs_create_fixed_base(G1.generator(), sb[:32*n])\n"
            "ctx = ScheduledMsmContext.from_native_srs(sid)\n"
            "full = b''.join(random.randrange(MODULUS).to_bytes(32, 'little')"
            " for _ in range(n))\n"
            "got = ctx.msm(full)\n"
            "t0 = time.perf_counter(); got = ctx.msm(full)\n"
            "tpu = time.perf_counter() - t0\n"
            "# burst-4: how proves use it (dispatch openings together);\n"
            "# amortizes the ~0.35 s/call tunnel latency (PERF_NOTES 17)\n"
            "t0 = time.perf_counter()\n"
            "fins = [ctx.msm_async(full) for _ in range(4)]\n"
            "res = [f() for f in fins]\n"
            "burst = (time.perf_counter() - t0) / 4\n"
            "t0 = time.perf_counter(); want = _native.srs_msm(sid, full)\n"
            "host = time.perf_counter() - t0\n"
            "assert got == want, 'TPU MSM mismatch'\n"
            "assert all(r == want for r in res), 'burst MSM mismatch'\n"
            "print(f'{jax.devices()[0].platform} {n/tpu/1e3:.0f}k pts/s "
            "single, {n/burst/1e3:.0f}k pts/s burst-4 "
            "(host {n/host/1e3:.0f}k pts/s, match)')\n"
        )
        out = subprocess.run(
            [sys.executable, "-c", probe],
            capture_output=True,
            timeout=1500,
            text=True,
        )
        line = (out.stdout or "").strip().splitlines()
        if out.returncode == 0 and line:
            print(f"[bench] msm_sched 2^16 full[{line[-1]}]", file=sys.stderr)
        else:
            print(
                f"[bench] msm_sched probe failed (rc={out.returncode})",
                file=sys.stderr,
            )
    except Exception as exc:  # pragma: no cover - diagnostics only
        print(f"[bench] msm_sched skipped: {exc}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "twist_prove_ops_per_s_size16",
                "value": round(value, 2),
                "unit": "ops/s",
                "vs_baseline": round(value / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
