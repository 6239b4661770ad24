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
