"""Sparse sound-mode prover benchmark (VERDICT round-1 item 5 done-bar:
TwistSound at K=2^10, T=2^16 in seconds, memory O(T log K) not O(K*T)).

Usage: python benches/sound_sparse_bench.py [--log-k 10] [--log-t 16]
"""
import argparse
import random
import resource
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-k", type=int, default=10)
    ap.add_argument("--log-t", type=int, default=16)
    ap.add_argument("--shout", action="store_true",
                    help="benchmark ShoutSound instead of TwistSound")
    ap.add_argument("--runs", type=int, default=1,
                    help="total prove runs (warm repeats after the first)")
    args = ap.parse_args()
    if args.shout:
        return shout_main(args)

    from tnsh.core.params import setup_params
    from tnsh.field.fr import Fr
    from tnsh.protocols.sound import TwistSound
    from tnsh.protocols.twist import MemoryTrace

    K, T = 1 << args.log_k, 1 << args.log_t
    t0 = time.perf_counter()
    pp, vp = setup_params(args.log_t - 2)
    from tnsh.protocols.sound import prewarm_sound

    prewarm_sound(args.log_k, args.log_t)
    print(f"setup (incl. SRS prewarm): {time.perf_counter()-t0:.1f}s",
          flush=True)

    random.seed(1)
    trace = MemoryTrace(K)
    t0 = time.perf_counter()
    for i in range(T):
        if i % 3 == 0:
            trace.write(random.randrange(K), Fr(42 * i))
        else:
            trace.read(random.randrange(K))
    print(f"trace ({T} ops over {K} cells): {time.perf_counter()-t0:.1f}s",
          flush=True)

    t0 = time.perf_counter()
    proof = TwistSound.prove(trace, pp)
    prove_s = time.perf_counter() - t0
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(f"TwistSound sparse prove K=2^{args.log_k} T=2^{args.log_t}: "
          f"{prove_s:.1f}s (peak RSS {rss:.2f} GB; dense would need a "
          f"{K*T:,}-entry table and a {K*T:,}-point SRS)", flush=True)
    for i in range(args.runs - 1):
        t0 = time.perf_counter()
        proof = TwistSound.prove(trace, pp)
        print(f"  warm prove #{i + 2}: {time.perf_counter()-t0:.1f}s",
              flush=True)

    t0 = time.perf_counter()
    ok = TwistSound.verify(proof, vp)
    print(f"verify: {time.perf_counter()-t0:.1f}s valid={ok}", flush=True)
    assert ok


def shout_main(args):
    from tnsh.core.params import setup_params
    from tnsh.field.fr import Fr
    from tnsh.protocols.shout import LookupTable
    from tnsh.protocols.sound import ShoutSound, prewarm_sound

    K, T = 1 << args.log_k, 1 << args.log_t
    t0 = time.perf_counter()
    pp, vp = setup_params(max(args.log_t - 2, 2))
    prewarm_sound(args.log_k, args.log_t)
    print(f"setup (incl. SRS prewarm): {time.perf_counter()-t0:.1f}s",
          flush=True)

    random.seed(1)
    table = LookupTable([Fr(i * i + 1) for i in range(K)])
    for _ in range(T):
        table.lookup(random.randrange(K))

    t0 = time.perf_counter()
    proof = ShoutSound.prove(table, pp)
    prove_s = time.perf_counter() - t0
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(f"ShoutSound sparse prove K=2^{args.log_k} T=2^{args.log_t}: "
          f"{prove_s:.1f}s (peak RSS {rss:.2f} GB)", flush=True)

    t0 = time.perf_counter()
    ok = ShoutSound.verify(proof, table.entries, vp)
    print(f"verify: {time.perf_counter()-t0:.1f}s valid={ok}", flush=True)
    assert ok


if __name__ == "__main__":
    main()
