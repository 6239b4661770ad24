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
            host = None
            if not args.skip_host:
                t0 = time.perf_counter()
                want = _native.srs_msm(srs_id, scal)
                host = time.perf_counter() - t0
                line += (f" | host {host:.3f}s ({n/host/1e3:.0f}k pts/s)"
                         f" | {'MATCH' if got == want else 'MISMATCH!!'}"
                         f" | speedup {host/best:.1f}x")
            print(line, flush=True)

            if name == "full" and host is not None:
                # adaptive hybrid (VERDICT round-2 task 4 done-bar): seed
                # the measured rates, compile the split shape, measure
                from tnsh.commit import kzg

                st = kzg._tpu_msm_stats.setdefault(
                    kzg._msm_bucket(srs_id, n),
                    {"host": None, "tpu": None, "calls": 0,
                     "warming": False},
                )
                st["host"] = n / host
                st["tpu"] = n / best
                frac = st["tpu"] / (st["tpu"] + st["host"])
                split = int(n * frac)
                ctx.msm(scal[:32 * split])  # compile the split shape
                best_h = 1e9
                for _ in range(args.reps):
                    t0 = time.perf_counter()
                    got_h = kzg._hybrid_srs_msm(srs_id, scal, n)
                    best_h = min(best_h, time.perf_counter() - t0)
                ref = min(host, best)
                print(f"2^{ls} hybrid (frac {frac:.2f}): {best_h:.3f}s "
                      f"({n/best_h/1e3:.0f}k pts/s) | "
                      f"{'MATCH' if got_h == want else 'MISMATCH!!'} | "
                      f"{ref/best_h:.2f}x best single engine", flush=True)
        _native.srs_free(srs_id)


if __name__ == "__main__":
    main()
