"""TPU scheduled-Pippenger MSM benchmark vs the native host MSM.

Usage: python benches/msm_tpu_bench.py [--log-sizes 16,18,20] [--skip-host]
Prints per-size wall times for full-width and small scalars on both paths.
"""
import argparse
import random
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tnsh import _native
from tnsh.field.fr import Fr, MODULUS
from tnsh.field.g1 import G1
from tnsh.commit.msm_sched import ScheduledMsmContext


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-sizes", default="16,18")
    ap.add_argument("--skip-host", action="store_true")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import jax
    print("backend:", jax.default_backend())
    random.seed(7)

    for ls in [int(x) for x in args.log_sizes.split(",")]:
        n = 1 << ls
        t0 = time.perf_counter()
        scal_bytes = b"".join(
            random.randrange(MODULUS).to_bytes(32, "little")
            for _ in range(min(n, 256))
        ) * max(1, n // 256)
        srs_id = _native.srs_create_fixed_base(G1.generator(), scal_bytes[:32 * n])
        print(f"2^{ls}: srs build {time.perf_counter()-t0:.1f}s")

        t0 = time.perf_counter()
        ctx = ScheduledMsmContext.from_native_srs(srs_id)
        print(f"2^{ls}: device context (export+upload+to_mont) "
              f"{time.perf_counter()-t0:.1f}s")

        full = b"".join(
            random.randrange(MODULUS).to_bytes(32, "little") for _ in range(n)
        )
        small = b"".join(
            random.randrange(1 << 26).to_bytes(32, "little") for _ in range(n)
        )
        for name, scal in (("full", full), ("small", small)):
            t0 = time.perf_counter()
            got = ctx.msm(scal)
            cold = time.perf_counter() - t0
            best = 1e9
            for _ in range(args.reps):
                t0 = time.perf_counter()
                got = ctx.msm(scal)
                best = min(best, time.perf_counter() - t0)
            line = (f"2^{ls} {name}: TPU cold {cold:.2f}s warm {best:.3f}s "
                    f"({n/best/1e3:.0f}k pts/s)")
            if not args.skip_host:
                t0 = time.perf_counter()
                want = _native.srs_msm(srs_id, scal)
                host = time.perf_counter() - t0
                line += (f" | host {host:.3f}s ({n/host/1e3:.0f}k pts/s)"
                         f" | {'MATCH' if got == want else 'MISMATCH!!'}"
                         f" | speedup {host/best:.1f}x")
            print(line, flush=True)
        _native.srs_free(srs_id)


if __name__ == "__main__":
    main()
