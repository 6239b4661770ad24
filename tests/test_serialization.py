"""Serialization roundtrip tests: proofs, params, sum-check (tnsh.core.proof_io)."""

from tnsh.core.params import setup_params
from tnsh.core.proof_io import (
    shout_proof_from_bytes,
    shout_proof_to_bytes,
    sumcheck_proof_from_bytes,
    sumcheck_proof_to_bytes,
    twist_proof_from_bytes,
    twist_proof_to_bytes,
    verifier_params_from_bytes,
    verifier_params_to_bytes,
)
from tnsh.field.fr import Fr
from tnsh.iop.sumcheck import SumCheckProof
from tnsh.protocols.shout import LookupTable, Shout
from tnsh.protocols.twist import MemoryTrace, Twist


def test_sumcheck_proof_roundtrip():
    proof = SumCheckProof(
        [[Fr(1), Fr(2), Fr(3), Fr(4)], [Fr(0), Fr(9), Fr(0), Fr(7)]],
        Fr(1234567890),
    )
    data = sumcheck_proof_to_bytes(proof)
    back, offset = sumcheck_proof_from_bytes(data)
    assert offset == len(data)
    assert back.round_polynomials == proof.round_polynomials
    assert back.final_evaluation == proof.final_evaluation


def test_twist_proof_roundtrip(params4):
    pp, vp = params4
    trace = MemoryTrace(16)
    trace.write(0, Fr(42))
    trace.write(1, Fr(73))
    trace.read(0)
    twist = Twist(pp)
    proof = twist.prove(trace)
    data = twist_proof_to_bytes(proof)
    back = twist_proof_from_bytes(data)
    assert back.address_commitment == proof.address_commitment
    assert back.value_commitment == proof.value_commitment
    assert (
        back.consistency_proof.round_polynomials
        == proof.consistency_proof.round_polynomials
    )
    assert back.final_evaluations == proof.final_evaluations
    # the deserialized proof must still verify
    assert twist.verify(back, vp)


def test_shout_proof_roundtrip(params4):
    pp, vp = params4
    table = LookupTable([Fr(i * i) for i in range(8)])
    table.lookup(3)
    table.lookup(5)
    shout = Shout(pp)
    proof = shout.prove(table)
    data = shout_proof_to_bytes(proof)
    back = shout_proof_from_bytes(data)
    assert back.table_commitment == proof.table_commitment
    assert shout.verify(back, vp)


def test_verifier_params_roundtrip(params4):
    _, vp = params4
    data = verifier_params_to_bytes(vp)
    back = verifier_params_from_bytes(data)
    assert back.log_size == vp.log_size
    assert back.max_operations == vp.max_operations
    assert back.fiat_shamir_seed == vp.fiat_shamir_seed
    assert back.commitment_vk.g1_generator == vp.commitment_vk.g1_generator
    assert back.commitment_vk.g2_generator == vp.commitment_vk.g2_generator
    assert back.commitment_vk.g2_tau == vp.commitment_vk.g2_tau
    # a proof verifies against the deserialized params
    pp, _ = params4
    trace = MemoryTrace(16)
    trace.write(2, Fr(5))
    proof = Twist(pp).prove(trace)
    assert Twist(pp).verify(proof, back)


def test_tampered_proof_bytes_rejected(params4):
    import pytest

    from tnsh.errors import InvalidParametersError

    pp, vp = params4
    trace = MemoryTrace(16)
    trace.write(0, Fr(1))
    proof = Twist(pp).prove(trace)
    data = bytearray(twist_proof_to_bytes(proof))
    data[0] = ord("X")  # corrupt magic
    with pytest.raises(InvalidParametersError):
        twist_proof_from_bytes(bytes(data))


def test_twist_sound_proof_roundtrip(params4):
    from tnsh.core.proof_io import (
        twist_sound_proof_from_bytes,
        twist_sound_proof_to_bytes,
    )
    from tnsh.protocols.sound import TwistSound

    pp, vp = params4
    trace = MemoryTrace(8)
    trace.write(1, Fr(42))
    trace.write(1, Fr(100))
    trace.read(1)
    proof = TwistSound.prove(trace, pp)
    blob = twist_sound_proof_to_bytes(proof)
    back = twist_sound_proof_from_bytes(blob)
    assert TwistSound.verify(back, vp)
    # tamper one byte in an opening region -> must not verify
    bad = bytearray(blob)
    bad[-1] ^= 1
    try:
        mutated = twist_sound_proof_from_bytes(bytes(bad))
    except Exception:
        return  # invalid point encoding also counts as rejection
    assert not TwistSound.verify(mutated, vp)


def test_shout_sound_proof_roundtrip(params4):
    from tnsh.core.proof_io import (
        shout_sound_proof_from_bytes,
        shout_sound_proof_to_bytes,
    )
    from tnsh.protocols.sound import ShoutSound

    pp, vp = params4
    table = LookupTable([Fr(i * i) for i in range(8)])
    for i in (3, 1, 7):
        table.lookup(i)
    proof = ShoutSound.prove(table, pp)
    blob = shout_sound_proof_to_bytes(proof)
    back = shout_sound_proof_from_bytes(blob)
    assert ShoutSound.verify(back, table.entries, vp)


def test_twist_bits_proof_roundtrip(params4):
    from tnsh.core.proof_io import (
        twist_bits_proof_from_bytes,
        twist_bits_proof_to_bytes,
    )
    from tnsh.protocols.twist_bits import TwistBits

    pp, vp = params4
    trace = MemoryTrace(8)
    trace.write(3, Fr(11))
    trace.read(3)
    trace.write(1, Fr(22))
    trace.read(1)
    proof = TwistBits.prove(trace, pp)
    blob = twist_bits_proof_to_bytes(proof)
    back = twist_bits_proof_from_bytes(blob)
    assert TwistBits.verify(back, vp)
    bad = bytearray(blob)
    bad[-1] ^= 1
    try:
        mutated = twist_bits_proof_from_bytes(bytes(bad))
    except Exception:
        return  # invalid point encoding also counts as rejection
    assert not TwistBits.verify(mutated, vp)


def test_shout_bits_proof_roundtrip(params4):
    from tnsh.core.proof_io import (
        shout_bits_proof_from_bytes,
        shout_bits_proof_to_bytes,
    )
    from tnsh.protocols.twist_bits import ShoutBits

    pp, vp = params4
    table = LookupTable([Fr(i * i) for i in range(8)])
    for i in (3, 1, 7):
        table.lookup(i)
    proof = ShoutBits.prove(table, pp)
    blob = shout_bits_proof_to_bytes(proof)
    back = shout_bits_proof_from_bytes(blob)
    assert ShoutBits.verify(back, table.entries, vp)
    bad = bytearray(blob)
    bad[40] ^= 1  # inside the first commitment
    try:
        mutated = shout_bits_proof_from_bytes(bytes(bad))
    except Exception:
        return
    assert not ShoutBits.verify(mutated, table.entries, vp)
