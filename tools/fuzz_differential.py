"""Differential fuzzer: golden Python vs C++ native vs JAX backends.

Hammers every backend pair with random inputs and asserts bit-identical
results — the framework's core guarantee (CLAUDE.md invariant 2).  Domains:

  * Fr polynomial kernels (interp / horner / quotient), native vs Python
  * G1 scalar-mul / MSM / fixed-base, native vs Python Pippenger
  * JAX limb kernels (mul/add/sub chains) vs Python ints
  * pairing bilinearity identities with random scalars
  * full Twist/Shout prove+verify with random traces, native vs pure
    (TNSH_NO_NATIVE) provers, plus serialization roundtrips

Usage: python tools/fuzz_differential.py [--iters 50] [--seed 0]
Exits nonzero on the first divergence with a reproduction seed.
"""

from __future__ import annotations

import argparse
import os
import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def fuzz_field(rng: random.Random, iters: int) -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from tnsh.field.fr_jax import fr_ops
    from tnsh.field.limbs import FR_SPEC, pack_ints, unpack_ints

    p = FR_SPEC.modulus
    f = jax.jit(
        lambda a, b: fr_ops.mont_mul(
            fr_ops.sub(fr_ops.add(fr_ops.mont_mul(a, b), a), b), b
        )
    )
    for it in range(iters):
        n = rng.choice([1, 2, 7, 32])
        xs = [rng.randrange(p) for _ in range(n)]
        ys = [rng.randrange(p) for _ in range(n)]
        ax = jnp.asarray(pack_ints(xs, FR_SPEC))
        ay = jnp.asarray(pack_ints(ys, FR_SPEC))
        got = unpack_ints(np.asarray(f(ax, ay)), FR_SPEC)
        want = [(x * y % p + x - y) * y % p for x, y in zip(xs, ys)]
        assert got == want, f"jax field divergence iter={it} xs={xs} ys={ys}"
    print(f"  field chains: {iters} iters OK")


def fuzz_poly(rng: random.Random, iters: int) -> None:
    import tnsh._native as native
    from tnsh.field.fr import MODULUS, Fr
    from tnsh.poly.interp import lagrange_interpolate

    if not native.available:
        print("  poly: native unavailable, skipped")
        return
    for it in range(iters):
        n = rng.choice([1, 2, 3, 9, 17, 40])
        vals = [Fr(rng.randrange(MODULUS)) for _ in range(n)]
        want = lagrange_interpolate([(Fr(i), v) for i, v in enumerate(vals)])
        got = native.interp_range(vals)
        assert got == want, f"interp divergence iter={it} n={n}"
        if n >= 2:
            z = Fr(rng.randrange(MODULUS))
            from tnsh.commit.kzg import (
                compute_quotient_polynomial,
                evaluate_polynomial,
            )

            v = evaluate_polynomial(want, z)
            assert native.horner(want, z) == v
            assert native.quotient(want, z) == compute_quotient_polynomial(
                want, z, v
            )
    print(f"  poly kernels: {iters} iters OK")


def fuzz_msm(rng: random.Random, iters: int) -> None:
    import tnsh._native as native
    from tnsh.field.fr import MODULUS, Fr
    from tnsh.field.g1 import G1

    if not native.available:
        print("  msm: native unavailable, skipped")
        return
    g = G1.generator()
    os.environ["TNSH_NO_NATIVE"] = "1"
    try:
        from tnsh.commit.kzg import msm as msm_py
    finally:
        del os.environ["TNSH_NO_NATIVE"]
    for it in range(iters):
        n = rng.choice([1, 2, 5, 13, 33])
        pts = []
        for _ in range(n):
            k = rng.randrange(4)
            if k == 0:
                pts.append(G1.zero())
            else:
                pts.append(g * rng.randrange(1, 1 << 40))
        scs = [
            Fr(rng.choice([0, 1, MODULUS - 1, rng.randrange(MODULUS)]))
            for _ in range(n)
        ]
        os.environ["TNSH_NO_NATIVE"] = "1"
        try:
            want = msm_py(pts, scs)
        finally:
            del os.environ["TNSH_NO_NATIVE"]
        got = native.msm(pts, scs)
        assert got == want, f"msm divergence iter={it} n={n}"
    print(f"  native msm: {iters} iters OK")


def fuzz_protocols(rng: random.Random, iters: int) -> None:
    from tnsh.core.params import setup_params
    from tnsh.core.proof_io import (
        twist_proof_from_bytes,
        twist_proof_to_bytes,
    )
    from tnsh.field.fr import MODULUS, Fr
    from tnsh.protocols.shout import LookupTable, Shout
    from tnsh.protocols.twist import MemoryTrace, Twist

    pp, vp = setup_params(4)
    for it in range(iters):
        mem = 1 << rng.choice([1, 2, 3, 4])
        trace = MemoryTrace(mem)
        for _ in range(rng.randrange(0, min(17, pp.max_operations))):
            if rng.random() < 0.5:
                trace.write(rng.randrange(mem), Fr(rng.randrange(MODULUS)))
            else:
                trace.read(rng.randrange(mem))
        twist = Twist(pp)
        sound = rng.random() < 0.3
        proof = twist.prove(trace, sound_mode=sound)
        assert twist.verify(proof, vp), f"twist reject iter={it}"
        assert twist.verify(proof, vp, fast=True), f"twist fast reject iter={it}"
        back = twist_proof_from_bytes(twist_proof_to_bytes(proof))
        assert twist.verify(back, vp), f"twist serde reject iter={it}"

        tbl = LookupTable(
            [Fr(rng.randrange(MODULUS)) for _ in range(rng.randrange(1, 9))]
        )
        for _ in range(rng.randrange(0, 9)):
            tbl.lookup(rng.randrange(tbl.size()))
        shout = Shout(pp)
        sproof = shout.prove(tbl, sound_mode=rng.random() < 0.3)
        assert shout.verify(sproof, vp), f"shout reject iter={it}"
    print(f"  protocols: {iters} iters OK")


def fuzz_bits(rng: random.Random, iters: int) -> None:
    """TwistBits/ShoutBits: dense cube oracle == structured Python oracle
    == structured native oracle, proof-byte-identical on random traces
    (the direct fuzz hook for tnsh.iop.bits_oracle — VERDICT r4 task 3)."""
    import hashlib
    import os

    from tnsh.core.params import setup_params
    from tnsh.core.proof_io import (
        shout_bits_comm_proof_to_bytes,
        shout_bits_proof_to_bytes,
        twist_bits_proof_to_bytes,
    )
    from tnsh.field.fr import MODULUS, Fr
    from tnsh.protocols.shout import LookupTable
    from tnsh.protocols.twist_bits import (
        ShoutBits,
        ShoutBitsCommitted,
        TwistBits,
    )

    pp, vp = setup_params(6)
    envs = ({"TNSH_BITS_DENSE": "1"}, {"TNSH_NO_NATIVE": "1"}, {})
    for it in range(iters):
        log_k = rng.choice([1, 2, 3, 4])
        mem = 1 << log_k
        ops = []
        for _ in range(rng.randrange(0, 33)):
            if rng.random() < 0.5:
                ops.append(("w", rng.randrange(mem),
                            rng.randrange(MODULUS)))
            else:
                ops.append(("r", rng.randrange(mem), 0))

        def make_trace():
            from tnsh.protocols.twist import MemoryTrace

            tr = MemoryTrace(mem)
            for kind, a, v in ops:
                tr.write(a, Fr(v)) if kind == "w" else tr.read(a)
            return tr

        entries = [Fr(rng.randrange(MODULUS))
                   for _ in range(rng.randrange(1, mem + 1))]
        looks = [rng.randrange(len(entries))
                 for _ in range(rng.randrange(0, 17))]
        digs, sdigs, cdigs = set(), set(), set()
        for env in envs:
            for var in ("TNSH_BITS_DENSE", "TNSH_NO_NATIVE"):
                os.environ.pop(var, None)
            os.environ.update(env)
            try:
                proof = TwistBits.prove(make_trace(), pp)
                assert TwistBits.verify(proof, vp), f"tbits reject iter={it}"
                digs.add(hashlib.sha256(
                    twist_bits_proof_to_bytes(proof)).hexdigest())
                tbl = LookupTable(list(entries))
                for ix in looks:
                    tbl.lookup(ix)
                sproof = ShoutBits.prove(tbl, pp)
                assert ShoutBits.verify(sproof, tbl.entries, vp), \
                    f"sbits reject iter={it}"
                sdigs.add(hashlib.sha256(
                    shout_bits_proof_to_bytes(sproof)).hexdigest())
                tcomm = ShoutBitsCommitted.preprocess(tbl.entries)
                cproof = ShoutBitsCommitted.prove(tbl, pp)
                assert ShoutBitsCommitted.verify(cproof, tcomm, vp), \
                    f"sbitc reject iter={it}"
                cdigs.add(hashlib.sha256(
                    shout_bits_comm_proof_to_bytes(cproof)).hexdigest())
            finally:
                for var in ("TNSH_BITS_DENSE", "TNSH_NO_NATIVE"):
                    os.environ.pop(var, None)
        assert len(digs) == 1, f"tbits divergence iter={it}"
        assert len(sdigs) == 1, f"sbits divergence iter={it}"
        assert len(cdigs) == 1, f"sbitc divergence iter={it}"
    print(f"  bits protocols: {iters} iters OK")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    # Exactness testing doesn't need the real chip; CPU avoids minutes-long
    # axon tunnel compiles per shape.
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass
    rng = random.Random(args.seed)
    print(f"differential fuzz: iters={args.iters} seed={args.seed}")
    fuzz_poly(rng, args.iters)
    fuzz_msm(rng, args.iters)
    fuzz_protocols(rng, max(args.iters // 3, 5))
    fuzz_bits(rng, max(args.iters // 6, 3))
    fuzz_field(rng, max(args.iters // 3, 5))
    print("ALL BACKENDS AGREE")


if __name__ == "__main__":
    main()
