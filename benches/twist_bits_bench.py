"""Measured cost: TwistBits (trapdoor-free) vs the sparse TwistSound
prover at the same trace shape (VERDICT r3 task 6 'measured cost').

Run: python benches/twist_bits_bench.py [--log-k 6] [--log-t 8]
"""

import argparse
import random
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tnsh.core.params import setup_params
from tnsh.field.fr import Fr
from tnsh.protocols.sound import TwistSound, prewarm_sound
from tnsh.protocols.twist import MemoryTrace
from tnsh.protocols.twist_bits import TwistBits


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-k", type=int, default=6)
    ap.add_argument("--log-t", type=int, default=8)
    args = ap.parse_args()
    log_k, log_t = args.log_k, args.log_t
    k = 1 << log_k

    random.seed(42)
    tr = MemoryTrace(k)
    for i in range(1 << log_t):
        if i % 3 == 0:
            tr.write(random.randrange(k), Fr(random.randrange(1 << 61)))
        else:
            tr.read(random.randrange(k))

    pp, vp = setup_params(max(log_k + 2, 4))
    prewarm_sound(log_k, log_t)

    t0 = time.perf_counter()
    p_bits = TwistBits.prove(tr, pp)
    t1 = time.perf_counter()
    ok_b = TwistBits.verify(p_bits, vp)
    t2 = time.perf_counter()
    print(f"TwistBits  K=2^{log_k} T=2^{log_t}: prove {t1-t0:7.2f} s, "
          f"verify {t2-t1:6.3f} s, valid={ok_b}")

    t0 = time.perf_counter()
    p_sparse = TwistSound.prove(tr, pp, sparse=True)
    t1 = time.perf_counter()
    ok_s = TwistSound.verify(p_sparse, vp)
    t2 = time.perf_counter()
    print(f"TwistSound K=2^{log_k} T=2^{log_t} (sparse): prove "
          f"{t1-t0:7.2f} s, verify {t2-t1:6.3f} s, valid={ok_s}")


if __name__ == "__main__":
    main()
