"""Golden-vector regression tests for the determinism layer.

These lock down the bit-exactness-critical stack (SURVEY §7.3 item 1):
ChaCha20 -> Fr::rand -> SipHash-1-3 transcript -> setup -> commitment
hashes.  The vectors were captured from this implementation's replicas of
the reference's dependency semantics (rand_chacha 0.3.1, Rust DefaultHasher,
ark-ff 0.4.2 — each primitive independently validated against published
test vectors in tests/test_rng.py).  Any change that shifts one of these
values would break transcript compatibility with the Rust reference — this
file makes such a change a loud test failure instead of a silent fork.
"""

from tnsh.core.params import setup_params
from tnsh.core.rng import ChaCha20Rng, default_hasher_hash_bytes, fr_rand
from tnsh.core.transcript import Transcript
from tnsh.field.fr import Fr
from tnsh.protocols.twist import MemoryTrace, Twist


def test_setup4_fiat_shamir_seed():
    # Derived from ChaCha20([42u8;32]) after one Fr::rand draw (tau) and a
    # 32-byte fill (reference utils.rs:81-102).
    pp, vp = setup_params(4)
    assert pp.fiat_shamir_seed.hex() == (
        "7bfcfd7544b1078dda397cef45df2e6de498746805081ebc8fb90ad04eba9d02"
    )
    assert vp.fiat_shamir_seed == pp.fiat_shamir_seed


def test_setup_tau():
    pp, _ = setup_params(4)
    assert int(pp.commitment_params.tau) == (
        8122400061003384056342786174786292760507720762713395576999582764556933302441
    )


def test_setup_g1_power():
    pp, _ = setup_params(4)
    assert pp.commitment_params.g1_powers[1].to_affine()[0] == (
        19389749827208395996045053201978882362664547052801504605812285941523869083384
    )


def test_transcript_challenge_vector():
    # Transcript([42u8;32]); append "test" || ser(Fr(123));
    # challenge("challenge")  (reference utils.rs:286-296 shape).
    t = Transcript(bytes([42]) * 32)
    t.append_field_element(b"test", Fr(123))
    c = t.challenge_field_element(b"challenge")
    assert int(c) == (
        13648926573440158680322210633940909009220968087751212041477676025471912345605
    )


def test_default_hasher_vector():
    # DefaultHasher (SipHash-1-3, zero keys) over the length-prefixed byte
    # string b"x".
    assert default_hasher_hash_bytes(b"x") == 5936343850223842476


def test_fr_rand_zero_seed():
    rng = ChaCha20Rng(bytes(32))
    assert int(fr_rand(rng)) == (
        21509278299504349099462204191118037118107610078220221266349290695035863440714
    )


def test_twist_proof_commitment_hashes():
    # The canonical reference trace (twist.rs:342-355): writes 42@0, 73@1,
    # read @0, under setup(4).
    pp, vp = setup_params(4)
    trace = MemoryTrace(16)
    trace.write(0, Fr(42))
    trace.write(1, Fr(73))
    trace.read(0)
    proof = Twist(pp).prove(trace)
    assert int(proof.address_commitment.hash()) == (
        7556249982415203933265786494151972270637133533405593634862882687950747860685
    )
    assert int(proof.value_commitment.hash()) == (
        18011904506810477272824411513856860600387245174580002861072519343486438631660
    )
    assert [int(v) for v in proof.final_evaluations] == [
        8160687653889211934711051770564468156572667645592934025008647291343849784056,
        5050655406805114311956064401970297360049502225235632590017507676474433913569,
    ]
    assert Twist(pp).verify(proof, vp)


# ---------------------------------------------------------------------------
# Whole-proof byte vectors + per-stage transcript digests (round-2 freeze).
# Captured from this implementation (primitives independently validated in
# tests/test_rng.py); any serialization, pipeline-order, or challenge change
# breaks these loudly.
# ---------------------------------------------------------------------------

_PROOF_VECTORS = {
    # memory/table size -> (twist bytes len, sha256), (shout len, sha256)
    4: (
        (528, "c5716ad1c6ddd41fa89494cd8fd49cc481a673ed3007e3da44d37ffbdc8d3ee0"),
        (528, "b3ac5d90d5356c8910fdb231ba3d3ea7e358e20c9e0426bd687d9685648c84e9"),
    ),
    8: (
        (664, "f005ef68d9e9840e1b190c0d1a3911d025e07b43f0d9134a74324a20c6f193f5"),
        (664, "95685f9ab9b298f31ee2e71cee018d3f8752f4914815ed7838bfbab974cd271f"),
    ),
    16: (
        (800, "f871ea9056e5f50103dd0da89a0df33411a8eea99b6a079575633b7265b2708e"),
        (800, "7ad98c9cee79c36bbde02c112ecced6406eb309905101d2b588370778eac141e"),
    ),
}


def _golden_trace(size):
    t = MemoryTrace(size)
    for i in range(size // 2):
        t.write(i % size, Fr(42 * (i + 1)))
        t.read(i % size)
    return t


def test_whole_proof_bytes_frozen():
    import hashlib

    from tnsh.core.proof_io import shout_proof_to_bytes, twist_proof_to_bytes
    from tnsh.protocols.shout import LookupTable, Shout

    for log in (2, 3, 4):
        size = 1 << log
        pp, vp = setup_params(log)
        proof = Twist(pp).prove(_golden_trace(size))
        assert Twist(pp).verify(proof, vp)
        b = twist_proof_to_bytes(proof)
        want_len, want_sha = _PROOF_VECTORS[size][0]
        assert (len(b), hashlib.sha256(b).hexdigest()) == (want_len, want_sha)

        table = LookupTable([Fr(i * i) for i in range(size)])
        for i in range(size):
            table.lookup((i * 3) % size)
        sproof = Shout(pp).prove(table)
        assert Shout(pp).verify(sproof, vp)
        sb = shout_proof_to_bytes(sproof)
        want_len, want_sha = _PROOF_VECTORS[size][1]
        assert (len(sb), hashlib.sha256(sb).hexdigest()) == (want_len, want_sha)


_SOUND_PROOF_VECTORS = {
    # memory/table size -> (twist-sound len, sha256), (shout-sound len, sha256)
    # Locks the sound wire format incl. the j-first cube opening order
    # (tnsh/commit/mkzg_sparse.py) — any change to the constraint pipeline,
    # challenge labels, or quotient decomposition breaks these loudly.
    #
    # FORMAT BUMP (round 3, v2): the batched protocol folds all eight
    # Twist constraints into ONE claim-0 sum-check and pins every
    # polynomial evaluation with TWO gamma-RLC PST openings (was eight
    # sum-checks + 16 openings); proofs shrank ~6x and v1 vectors were
    # retired with the v1 reader (tnsh/core/proof_io.py _SOUND_VERSION).
    4: (
        (1280, "fe15a0d7c7eea336b6bf36d12903ba038c5186b5da570883d4aae2a200abd34f"),
        (944, "44a59504317d1ee44029c01056ccbb2a64d7c8f6e6e07156d1c50cd6430c91a1"),
    ),
    8: (
        (1648, "cde2f0f9c146d92d2ad7d6d1f8ea03074ff5ca2387ab0ff6dbbef486da87e91f"),
        (1312, "7bab951a9092bae5bb218ae69bd67be91dd89f114c3fcd2c62db97f5f1d1c04c"),
    ),
    16: (
        (2016, "9139c9a87ad807fd3de1e67d52c15612ac6a96d313af4fafe22861b787eef58d"),
        (1680, "2984f618d43d2266dc57a30618ff4043501b6972c0e2a9d6d2dd81bd05960794"),
    ),
}


def test_sound_proof_bytes_frozen():
    import hashlib

    from tnsh.core.proof_io import (
        shout_sound_proof_to_bytes,
        twist_sound_proof_to_bytes,
    )
    from tnsh.protocols.shout import LookupTable
    from tnsh.protocols.sound import ShoutSound, TwistSound

    for log in (2, 3, 4):
        size = 1 << log
        pp, vp = setup_params(log)
        proof = TwistSound.prove(_golden_trace(size), pp)
        assert TwistSound.verify(proof, vp)
        b = twist_sound_proof_to_bytes(proof)
        want_len, want_sha = _SOUND_PROOF_VECTORS[size][0]
        assert (len(b), hashlib.sha256(b).hexdigest()) == (want_len, want_sha)

        table = LookupTable([Fr(i * i) for i in range(size)])
        for i in range(size):
            table.lookup((i * 3) % size)
        sproof = ShoutSound.prove(table, pp)
        assert ShoutSound.verify(sproof, table.entries, vp)
        sb = shout_sound_proof_to_bytes(sproof)
        want_len, want_sha = _SOUND_PROOF_VECTORS[size][1]
        assert (len(sb), hashlib.sha256(sb).hexdigest()) == (want_len, want_sha)


def test_transcript_stage_digests_frozen():
    """SHA-256 of the verifier transcript state after each pipeline stage of
    the canonical twist.rs:342-355 trace — pins the exact byte layout every
    stage appends, not just the final challenges."""
    import hashlib

    from tnsh.iop.sumcheck import SumCheck

    pp, vp = setup_params(4)
    trace = MemoryTrace(16)
    trace.write(0, Fr(42))
    trace.write(1, Fr(73))
    trace.read(0)
    proof = Twist(pp).prove(trace)

    t = Transcript(pp.fiat_shamir_seed)
    assert hashlib.sha256(t.state_bytes).hexdigest() == (
        "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"
    )
    t.append_field_element(b"address_commitment", proof.address_commitment.hash())
    t.append_field_element(b"value_commitment", proof.value_commitment.hash())
    assert hashlib.sha256(t.state_bytes).hexdigest() == (
        "8b77a5c952f52fefd25944799d72508f008371d48d179b36bdde332b21157ab7"
    )
    ok, _ = SumCheck(
        len(proof.consistency_proof.round_polynomials), Fr(0)
    ).verify(proof.consistency_proof, t)
    assert ok
    assert hashlib.sha256(t.state_bytes).hexdigest() == (
        "1a73fbfee06408013003ae3629b7880785bffaa6bbe06177969459ddaddaaa01"
    )
    t.challenge_field_elements(b"opening_challenges", 2)
    assert hashlib.sha256(t.state_bytes).hexdigest() == (
        "20ad0c5950cff927720660390dc8efcbe13c16975b677863f439b3f004e8c54e"
    )
