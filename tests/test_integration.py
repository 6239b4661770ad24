"""Integration tests — mirrors ``tests/integration_tests.rs`` (8 tests),
including the tiny-VM combined Twist+Shout scenario (42 + 58 = 100)."""

import pytest

from tnsh import (
    Fr,
    KZGCommitment,
    LookupTable,
    MemoryTrace,
    MultilinearExtension,
    Shout,
    SumCheck,
    Transcript,
    Twist,
    setup_params,
)
from tnsh.errors import InvalidParametersError
from tnsh.poly.interp import lagrange_interpolate


def test_full_memory_consistency_workflow(params3):
    prover_params, verifier_params = params3
    trace = MemoryTrace(8)
    trace.write(0, Fr(42))
    trace.write(1, Fr(100))
    trace.write(2, Fr(200))
    assert trace.read(0) == Fr(42)
    assert trace.read(1) == Fr(100)
    trace.write(0, Fr(43))
    trace.write(3, Fr(300))
    assert trace.read(0) == Fr(43)
    assert trace.read(3) == Fr(300)
    twist = Twist(prover_params)
    assert twist.verify(twist.prove(trace), verifier_params)


def test_full_lookup_workflow(params3):
    prover_params, verifier_params = params3
    table = LookupTable([Fr(i * i) for i in range(8)])
    assert table.lookup(3) == Fr(9)
    assert table.lookup(5) == Fr(25)
    assert table.lookup(0) == Fr(0)
    assert table.lookup(7) == Fr(49)
    shout = Shout(prover_params)
    assert shout.verify(shout.prove(table), verifier_params)


def test_commitment_scheme_integration(params3):
    prover_params, verifier_params = params3
    polynomial = [Fr(1), Fr(2), Fr(3)]
    commitment = KZGCommitment.commit(
        prover_params.commitment_params, polynomial
    )
    for point in (Fr(0), Fr(1), Fr(2), Fr(5)):
        value, proof = KZGCommitment.open(
            prover_params.commitment_params, polynomial, point
        )
        assert KZGCommitment.verify(
            verifier_params.commitment_vk, commitment, point, value, proof
        )
        expected = polynomial[0] + polynomial[1] * point + polynomial[2] * point * point
        assert value == expected


def test_combined_twist_and_shout(params3):
    """Tiny VM: opcode lookups + memory program computing 42 + 58 = 100
    (reference integration_tests.rs:122-177)."""
    prover_params, verifier_params = params3
    opcode_table = LookupTable([Fr(i) for i in range(8)])
    memory = MemoryTrace(8)

    opcode_table.lookup(1)  # LOAD
    memory.write(0, Fr(42))
    opcode_table.lookup(1)  # LOAD
    memory.write(1, Fr(58))
    opcode_table.lookup(3)  # ADD
    a = memory.read(0)
    b = memory.read(1)
    memory.write(2, a + b)
    assert memory.read(2) == Fr(100)
    opcode_table.lookup(7)  # HALT

    twist = Twist(prover_params)
    shout = Shout(prover_params)
    memory_proof = twist.prove(memory)
    opcode_proof = shout.prove(opcode_table)
    assert twist.verify(memory_proof, verifier_params)
    assert shout.verify(opcode_proof, verifier_params)


def test_polynomial_commitment_consistency(params4):
    prover_params, verifier_params = params4
    evaluations = [Fr(10 * (i + 1)) for i in range(8)]
    mle = MultilinearExtension.from_evaluations(evaluations)
    partial = mle.partial_evaluate([Fr(2), Fr(3)])
    points = [(Fr(i), v) for i, v in enumerate(partial.evaluations)]
    coeffs = lagrange_interpolate(points)
    commitment = KZGCommitment.commit(prover_params.commitment_params, coeffs)
    test_point = Fr(10)
    opened_value, proof = KZGCommitment.open(
        prover_params.commitment_params, coeffs, test_point
    )
    assert KZGCommitment.verify(
        verifier_params.commitment_vk, commitment, test_point, opened_value, proof
    )
    _ = mle.evaluate([Fr(2), Fr(3), test_point])


def test_parameter_compatibility(params4):
    prover_params, verifier_params = params4
    assert prover_params.log_size == verifier_params.log_size
    assert prover_params.max_operations == verifier_params.max_operations
    assert prover_params.fiat_shamir_seed == verifier_params.fiat_shamir_seed
    poly = [Fr(1), Fr(2)]
    commitment = KZGCommitment.commit(prover_params.commitment_params, poly)
    value, proof = KZGCommitment.open(
        prover_params.commitment_params, poly, Fr(5)
    )
    assert KZGCommitment.verify(
        verifier_params.commitment_vk, commitment, Fr(5), value, proof
    )


def test_sumcheck_protocol_basic():
    def polynomial(vars_):
        assert len(vars_) == 2
        return vars_[0] * vars_[1]

    sumcheck = SumCheck(2, Fr(1))
    proof = sumcheck.prove(polynomial, Transcript(bytes([42]) * 32))
    is_valid, _ = sumcheck.verify(proof, Transcript(bytes([42]) * 32))
    assert is_valid


def test_error_handling():
    prover_params, _ = setup_params(2)
    large_trace = MemoryTrace(4)
    for i in range(100):
        large_trace.write(i % 4, Fr(i))
    twist = Twist(prover_params)
    with pytest.raises(InvalidParametersError):
        twist.prove(large_trace)

    large_table = LookupTable([Fr(1)] * 4)
    for _ in range(100):
        large_table.lookup(0)
    shout = Shout(prover_params)
    with pytest.raises(InvalidParametersError):
        shout.prove(large_table)

    trace = MemoryTrace(4)
    with pytest.raises(InvalidParametersError):
        trace.write(4, Fr(1))
    with pytest.raises(InvalidParametersError):
        trace.read(10)
    table = LookupTable([Fr(1), Fr(1)])
    with pytest.raises(InvalidParametersError):
        table.lookup(2)


def test_cli_sound_and_bits_modes(capsys):
    """The tnsh-extension CLI modes prove+verify and exit 0; bad modes
    still exit 1 (reference validation rules untouched)."""
    from tnsh.bench.cli import main

    rc = main(["sound", "--min-log-size", "3", "--max-log-size", "3",
               "--operations", "8"])
    out = capsys.readouterr().out
    assert rc == 0 and out.count("True") >= 2 and "False" not in out
    rc = main(["bits", "--min-log-size", "3", "--max-log-size", "3",
               "--operations", "8"])
    out = capsys.readouterr().out
    assert rc == 0 and out.count("True") >= 2 and "False" not in out
    assert main(["no-such-mode"]) == 1
