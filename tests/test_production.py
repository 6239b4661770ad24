"""Production-level tests — mirrors ``tests/production_tests.rs`` (5 tests),
including the non-malleability check.  The reference documents that its
simplified verifier may accept a tampered final_evaluation
(production_tests.rs:146-169); our verifier behavior is asserted explicitly
for both the stub path (accepts — sum-check of zero ignores the opening
evaluations) and the opening path (rejects a tampered KZG evaluation)."""

import dataclasses

from tnsh.field.fr import Fr
from tnsh.protocols.shout import LookupTable, Shout
from tnsh.protocols.twist import MemoryTrace, Twist


def test_production_twist_with_opening_proofs(params4):
    prover_params, verifier_params = params4
    trace = MemoryTrace(16)
    trace.write(0, Fr(42))
    trace.write(1, Fr(73))
    trace.write(2, Fr(100))
    assert trace.read(0) == Fr(42)
    assert trace.read(1) == Fr(73)
    trace.write(0, Fr(999))
    trace.write(1, Fr(888))
    assert trace.read(0) == Fr(999)
    assert trace.read(1) == Fr(888)
    twist = Twist(prover_params)
    proof = twist.prove(trace)
    assert twist.verify(proof, verifier_params)
    assert len(proof.consistency_proof.round_polynomials) > 0
    # Opening proofs present and structurally complete.
    assert len(proof.opening_proofs) == 2
    assert len(proof.final_evaluations) == 2


def test_production_shout_with_opening_proofs(params4):
    prover_params, verifier_params = params4
    table = LookupTable([Fr(10), Fr(20), Fr(30), Fr(40), Fr(50)])
    for i in (0, 2, 4, 1, 3):
        table.lookup(i)
    shout = Shout(prover_params)
    proof = shout.prove(table)
    assert shout.verify(proof, verifier_params)
    assert len(proof.lookup_proof.round_polynomials) > 0
    assert len(proof.opening_proofs) == 2


def test_production_twist_with_multilinear_extensions(params3):
    prover_params, verifier_params = params3
    trace = MemoryTrace(8)
    for i in range(8):
        trace.write(i, Fr(i * i + 1))
    for i in reversed(range(8)):
        trace.read(i)
    twist = Twist(prover_params)
    proof = twist.prove(trace)
    assert twist.verify(proof, verifier_params)
    # 16 padded ops -> 4 sum-check rounds.
    assert len(proof.consistency_proof.round_polynomials) == 4


def test_production_shout_edge_cases():
    from tnsh.core.params import setup_params

    prover_params, verifier_params = setup_params(2)
    shout = Shout(prover_params)

    small_table = LookupTable([Fr(123)])
    small_table.lookup(0)
    assert shout.verify(shout.prove(small_table), verifier_params)

    repeat_table = LookupTable([Fr(456), Fr(789)])
    repeat_table.lookup(0)
    repeat_table.lookup(0)
    repeat_table.lookup(1)
    repeat_table.lookup(0)
    assert shout.verify(shout.prove(repeat_table), verifier_params)


def test_proof_non_malleability(params3):
    prover_params, verifier_params = params3
    trace = MemoryTrace(8)
    trace.write(0, Fr(42))
    trace.write(1, Fr(73))
    twist = Twist(prover_params)
    proof = twist.prove(trace)
    assert twist.verify(proof, verifier_params)

    # Tampering with a KZG opening evaluation is caught by the pairing check.
    malicious = dataclasses.replace(
        proof, final_evaluations=[Fr(999), proof.final_evaluations[1]]
    )
    assert not twist.verify(malicious, verifier_params)

    # Tampering with the sum-check final evaluation is caught by the
    # sum-check chain.
    bad_sumcheck = dataclasses.replace(proof)
    bad_sumcheck.consistency_proof = dataclasses.replace(
        proof.consistency_proof, final_evaluation=Fr(1)
    )
    assert not twist.verify(bad_sumcheck, verifier_params)


def test_strict_verify_requires_openings(params3):
    """strict=True rejects the empty-openings proof the lenient reference
    path accepts (SURVEY caveat 4)."""
    import dataclasses

    pp, vp = params3
    trace = MemoryTrace(8)
    trace.write(0, Fr(42))
    trace.read(0)  # 2 ops -> log_ops >= 1 so openings are expected
    twist = Twist(pp)
    proof = twist.prove(trace)
    stripped = dataclasses.replace(proof, opening_proofs=[], final_evaluations=[])
    assert twist.verify(stripped, vp)            # reference-lenient
    assert not twist.verify(stripped, vp, strict=True)
    assert twist.verify(proof, vp, strict=True)  # complete proof passes


def test_strict_verify_shout(params3):
    import dataclasses

    from tnsh.protocols.shout import LookupTable, Shout

    pp, vp = params3
    table = LookupTable([Fr(7), Fr(8)])
    table.lookup(0)
    table.lookup(1)
    shout = Shout(pp)
    proof = shout.prove(table)
    stripped = dataclasses.replace(proof, opening_proofs=[], final_evaluations=[])
    assert shout.verify(stripped, vp)
    assert not shout.verify(stripped, vp, strict=True)
    assert shout.verify(proof, vp, strict=True)


def test_fast_verify_batched_openings(params3):
    """fast=True: one pairing-product check for both openings; accepts valid
    proofs, rejects tampered evaluations and swapped opening proofs."""
    import dataclasses

    pp, vp = params3
    trace = MemoryTrace(8)
    trace.write(0, Fr(42))
    trace.write(1, Fr(73))
    trace.read(0)
    twist = Twist(pp)
    proof = twist.prove(trace)
    assert twist.verify(proof, vp, fast=True)
    bad = dataclasses.replace(
        proof, final_evaluations=[Fr(999), proof.final_evaluations[1]]
    )
    assert not twist.verify(bad, vp, fast=True)
    swapped = dataclasses.replace(
        proof, opening_proofs=[proof.opening_proofs[1], proof.opening_proofs[0]]
    )
    assert not twist.verify(swapped, vp, fast=True)

    from tnsh.protocols.shout import LookupTable, Shout

    table = LookupTable([Fr(i + 1) for i in range(8)])
    table.lookup(2)
    table.lookup(5)
    shout = Shout(pp)
    sproof = shout.prove(table)
    assert shout.verify(sproof, vp, fast=True)
    sbad = dataclasses.replace(
        sproof,
        final_evaluations=[sproof.final_evaluations[0] + Fr(1),
                           sproof.final_evaluations[1]],
    )
    assert not shout.verify(sbad, vp, fast=True)
