"""End-to-end 2^20-op Twist prove with TPU commits (VERDICT item 2).

Replicates the driver workload (benchmark_twist_single's i%3 write/read
pattern, values 42i) at --log-ops, with phase timers around the prover's
commit / sum-check / open stages.  Compares TNSH_TPU_MSM=1 vs host native.

Usage: python benches/twist_tpu_bench.py [--log-ops 20] [--host-only|--tpu-only]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_trace(log_ops: int):
    from tnsh.field.fr import Fr
    from tnsh.protocols.twist import MemoryTrace

    size = 1 << log_ops
    trace = MemoryTrace(size)
    n_ops = size
    t0 = time.perf_counter()
    for i in range(n_ops):
        if i % 3 == 0:
            trace.write(i % size, Fr(42 * i))
        else:
            trace.read((i // 2) % size)
    print(f"trace build ({n_ops} ops): {time.perf_counter()-t0:.1f}s",
          flush=True)
    return trace


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-ops", type=int, default=20)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import jax
    from tnsh import setup_params
    from tnsh.protocols.twist import Twist
    from tnsh.commit.kzg import KZGCommitment

    # phase timers around the commitment layer (prints per call)
    for name in ("commit_evals", "open_evals"):
        orig = KZGCommitment.__dict__[name]
        if isinstance(orig, staticmethod):
            orig = orig.__func__

        def wrap(orig=orig, name=name):
            def inner(*a, **kw):
                t0 = time.perf_counter()
                out = orig(*a, **kw)
                print(f"  {name}: {time.perf_counter()-t0:.2f}s", flush=True)
                return out
            return staticmethod(inner)

        setattr(KZGCommitment, name, wrap())

    print("backend:", jax.default_backend(), flush=True)
    t0 = time.perf_counter()
    pp, vp = setup_params(args.log_ops - 2)
    print(f"setup_params({args.log_ops-2}): {time.perf_counter()-t0:.1f}s",
          flush=True)
    trace = build_trace(args.log_ops)
    twist = Twist(pp)

    best = 1e9
    for r in range(args.reps):
        t0 = time.perf_counter()
        proof = twist.prove(trace)
        dt = time.perf_counter() - t0
        best = min(best, dt)
        n = 1 << args.log_ops
        print(f"prove[{r}]: {dt:.2f}s ({n/dt/1e3:.1f}k ops/s)", flush=True)

    t0 = time.perf_counter()
    ok = twist.verify(proof, vp, fast=True)
    print(f"verify(fast): {time.perf_counter()-t0:.2f}s valid={ok}", flush=True)
    assert ok
    print(f"BEST prove: {best:.2f}s "
          f"({(1 << args.log_ops)/best/1e3:.1f}k ops/s)", flush=True)


if __name__ == "__main__":
    main()
