"""Mesh-scaling benchmark for the sharded sum-check prover.

Reports round-throughput of the sharded product-MLE sum-check at mesh sizes
1/2/4/8 and the derived scaling efficiency (BASELINE north-star metric
shape: ops/s at 1 chip / 1 host / N hosts).

On this environment only virtual CPU devices are available, so the numbers
demonstrate the sharded execution path and collective correctness rather
than real ICI scaling: virtual devices share the same host cores.  Run on a
real pod slice (with tnsh.parallel.mesh.init_distributed) for true
efficiency numbers.

Usage: python benches/scaling_bench.py [--log-size 14] [--devices 1,2,4,8]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-size", type=int, default=14)
    ap.add_argument("--devices", default="1,2,4,8")
    args = ap.parse_args()

    import os

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass

    import random

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tnsh.field.fr import MODULUS, Fr
    from tnsh.parallel.mesh import make_mesh, sharded_evals_step
    from tnsh.poly import mle_jax

    n = 1 << args.log_size
    random.seed(5)
    evals = [
        [Fr(random.randrange(MODULUS)) for _ in range(n)] for _ in range(3)
    ]
    packed = [mle_jax.pack_mle(e) for e in evals]

    base_throughput = None
    print(f"sharded sum-check round evals over 3 x 2^{args.log_size} tables")
    print(f"{'devices':>8} {'round ms':>10} {'rounds/s':>10} {'efficiency':>11}")
    for d in (int(x) for x in args.devices.split(",")):
        devs = jax.devices()[:d]
        if len(devs) < d:
            print(f"{d:>8}  (unavailable)")
            continue
        mesh = make_mesh(devs)
        step = sharded_evals_step(mesh, num_factors=3)
        shard = NamedSharding(mesh, P(None, "data"))
        tables = tuple(jax.device_put(jnp.asarray(p), shard) for p in packed)
        out = step(tables)
        jax.block_until_ready(out)
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(tables)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        throughput = 1.0 / dt
        if base_throughput is None:
            base_throughput = throughput
            eff = 1.0
        else:
            eff = throughput / (base_throughput * d)
        print(f"{d:>8} {dt * 1e3:>10.2f} {throughput:>10.2f} {eff:>10.0%}")


if __name__ == "__main__":
    main()
