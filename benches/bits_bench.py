"""TwistBits/ShoutBits prover benchmark at adversarial scale.

Measures the structured native prover (wire v3) at configurable shapes —
the round-5 regression line for the trapdoor-free tier.  Run:

    python benches/bits_bench.py --shapes 10:16,10:20 [--shout]
"""

from __future__ import annotations

import argparse
import os
import random
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="10:16",
                    help="comma list of logK:logT")
    ap.add_argument("--shout", action="store_true")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from tnsh.core.params import setup_params
    from tnsh.field.fr import Fr
    from tnsh.protocols.twist import MemoryTrace
    from tnsh.protocols.twist_bits import ShoutBits, TwistBits

    for shape in args.shapes.split(","):
        lk, lt = (int(x) for x in shape.split(":"))
        K, T = 1 << lk, 1 << lt
        pp, vp = setup_params(max(lt, 4))
        rnd = random.Random(11)
        t0 = time.perf_counter()
        tr = MemoryTrace(K)
        for i in range(T):
            if rnd.random() < 0.5:
                tr.write(rnd.randrange(K), Fr(rnd.randrange(1 << 30)))
            else:
                tr.read(rnd.randrange(K))
        print(f"[shape 2^{lk} x 2^{lt}] trace built in "
              f"{time.perf_counter()-t0:.1f} s", flush=True)
        best_p, best_v = float("inf"), float("inf")
        for rep in range(args.reps):
            t0 = time.perf_counter()
            proof = TwistBits.prove(tr, pp)
            t1 = time.perf_counter()
            ok = TwistBits.verify(proof, vp)
            t2 = time.perf_counter()
            assert ok
            print(f"  twist_bits rep{rep}: prove {t1-t0:.2f} s "
                  f"verify {t2-t1:.3f} s rss "
                  f"{resource.getrusage(resource.RUSAGE_SELF).ru_maxrss/1e6:.1f} GB",
                  flush=True)
            best_p, best_v = min(best_p, t1 - t0), min(best_v, t2 - t1)
        print(f"  twist_bits BEST: prove {best_p:.2f} s verify "
              f"{best_v:.3f} s ({T/best_p:.0f} ops/s)", flush=True)
        if args.shout:
            from tnsh.protocols.shout import LookupTable

            tbl = LookupTable([Fr(3 * i + 1) for i in range(K)])
            for _ in range(T - 1):
                tbl.lookup(rnd.randrange(K))
            t0 = time.perf_counter()
            sp = ShoutBits.prove(tbl, pp)
            t1 = time.perf_counter()
            ok = ShoutBits.verify(sp, tbl.entries, vp)
            t2 = time.perf_counter()
            assert ok
            print(f"  shout_bits: prove {t1-t0:.2f} s verify {t2-t1:.3f} s",
                  flush=True)


if __name__ == "__main__":
    main()
