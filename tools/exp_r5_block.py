"""fr_mont_mul chain block-size sweep (round-5 task 6 follow-up).

The iters-sweep split the chain into ~27 ms fixed overhead + ~0.78 ms/iter
marginal (672 M muls/s marginal at BLOCK=2048, 2^19 lanes = 256 blocks x
iters grid steps).  If per-grid-step overhead is a real share, larger
blocks (fewer steps) raise the marginal rate.  VMEM bound: CIOS live
intermediates ~10 MB at 2048 lanes -> 8192 is the biggest safe block
under the 64 MB request.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from tnsh.field import fr_pallas
    from tnsh.field.limbs import FR_SPEC, pack_ints

    print(f"backend: {jax.devices()[0].platform}", flush=True)
    rng = np.random.default_rng(0)
    n = 1 << 19
    vals = [int(v) for v in rng.integers(0, 1 << 62, n)]
    a = jnp.asarray(pack_ints(vals, FR_SPEC))
    want = None
    for block in (2048, 4096, 8192):
        try:
            iters = 256
            chain = lambda x, y: fr_pallas.mont_mul_chain(x, y, iters,
                                                          block=block)
            r = chain(a, a)
            got = np.asarray(r[:, :8])
            if want is None:
                want = got
            else:
                assert (got == want).all(), f"block={block} mismatch"
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                r = chain(r, a)
                np.asarray(r[:4, :4])
                best = min(best, time.perf_counter() - t0)
            print(f"  block={block}: {best*1e3:.1f} ms -> "
                  f"{n*iters/best/1e6:.0f} M muls/s", flush=True)
        except Exception as exc:
            print(f"  block={block}: FAILED {type(exc).__name__}: {exc}",
                  flush=True)


if __name__ == "__main__":
    main()
