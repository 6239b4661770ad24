"""Two-process jax.distributed smoke test for the multi-host mesh path.

Exercises tnsh.parallel.mesh.init_distributed + make_mesh_2d (VERDICT
round-1 item 7): two localhost processes, each contributing 2 virtual CPU
devices, form a (dcn=2, ici=2) mesh; an exact Fr psum over both mesh axes
must reproduce the host-golden lane sums on every process.

Run directly (spawns its own workers):  python tools/multihost_smoke.py
Run as a worker (internal):             ... --worker <pid> --port <port>
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

NUM_PROCS = 2
LOCAL_DEVICES = 2


def worker(process_id: int, port: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass

    from tnsh.parallel.mesh import init_distributed, make_mesh_2d

    init_distributed(
        coordinator=f"localhost:{port}",
        num_processes=NUM_PROCS,
        process_id=process_id,
    )
    assert jax.process_count() == NUM_PROCS, jax.process_count()
    n_dev = NUM_PROCS * LOCAL_DEVICES
    assert len(jax.devices()) == n_dev, jax.devices()

    import numpy as np
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tnsh.field.fr import MODULUS, Fr
    from tnsh.parallel.mesh import psum_field
    from tnsh.poly import mle_jax

    mesh = make_mesh_2d(ici=LOCAL_DEVICES, dcn=NUM_PROCS)

    n_lanes = 16
    per_dev = n_lanes // n_dev
    vals = [Fr((7 * i + 3) % MODULUS) for i in range(n_lanes)]
    packed = np.asarray(mle_jax.pack_mle(vals))
    shard = NamedSharding(mesh, P(None, ("dcn", "ici")))
    garr = jax.make_array_from_callback(
        packed.shape, shard, lambda idx: packed[idx]
    )

    f = shard_map(
        lambda x: psum_field(psum_field(x, "ici"), "dcn"),
        mesh=mesh,
        in_specs=P(None, ("dcn", "ici")),
        out_specs=P(None, ("dcn", "ici")),
    )
    out = jax.jit(f)(garr)
    jax.block_until_ready(out)

    # every device's local lane j must hold sum_dev vals[dev*per_dev + j]
    for s in out.addressable_shards:
        local = mle_jax.unpack_fr(jnp.asarray(s.data))
        for j in range(per_dev):
            want = sum(
                int(vals[dev * per_dev + j]) for dev in range(n_dev)
            ) % MODULUS
            assert int(local[j]) == want, (
                f"proc {process_id}: lane {j} got {int(local[j])}, "
                f"want {want}"
            )
    print(f"[proc {process_id}] (dcn={NUM_PROCS}, ici={LOCAL_DEVICES}) "
          f"distributed field psum OK", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--port", type=int, default=18765)
    args = ap.parse_args()
    if args.worker is not None:
        worker(args.worker, args.port)
        return

    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "--worker", str(pid),
             "--port", str(args.port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(NUM_PROCS)
    ]
    code = 0
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out = "(timeout)"
        outs.append(out)
        code |= p.returncode if p.returncode is not None else 1
    for out in outs:
        sys.stdout.write(out[-2000:])
    if code:
        sys.exit(code)
    print("multihost smoke: OK")


if __name__ == "__main__":
    main()
