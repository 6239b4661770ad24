"""Determinism-layer tests: ChaCha20, SipHash, Fr::rand, setup, transcript.

Mirrors reference inline tests utils.rs:271-330 plus golden vectors for the
dependency-replica primitives (SURVEY §7.3 item 1).
"""

import struct

from tnsh.core.rng import (
    ChaCha20Rng,
    _chacha20_block,
    default_hasher_hash_bytes,
    fr_rand,
    siphash,
)
from tnsh.core.params import SETUP_SEED, setup_params
from tnsh.core.transcript import Transcript
from tnsh.field.fr import MODULUS, Fr, R256


class TestChaCha20:
    def test_keystream_known_vector(self):
        # Standard ChaCha20 zero-key/zero-nonce keystream (djb variant).
        block = _chacha20_block([0] * 8, 0)
        assert block[:32].hex() == (
            "76b8e0ada0f13d90405d6ae55386bd28"
            "bdd219b8a08ded1aa836efcc8b770dc7"
        )
        assert block[32:].hex() == (
            "da41597c5157488d7724e03fb8d84a37"
            "6a43b8f41518a11cc387b669b2ee6586"
        )

    def test_stream_continuity(self):
        rng1 = ChaCha20Rng(bytes(32))
        rng2 = ChaCha20Rng(bytes(32))
        a = rng1.next_bytes(100)
        b = rng2.next_bytes(64) + rng2.next_bytes(36)
        assert a == b

    def test_next_u64_little_endian(self):
        rng = ChaCha20Rng(bytes(32))
        raw = _chacha20_block([0] * 8, 0)
        expected = struct.unpack_from("<Q", raw, 0)[0]
        assert rng.next_u64() == expected

    def test_seed_dependence(self):
        a = ChaCha20Rng(bytes(32)).next_u64()
        b = ChaCha20Rng(bytes([1]) + bytes(31)).next_u64()
        assert a != b


class TestSipHash:
    def test_siphash24_reference_vectors(self):
        # Official SipHash-2-4 test vectors (key = 00..0f, msg = 00 01 ..).
        key = bytes(range(16))
        k0, k1 = struct.unpack("<QQ", key)
        expected = {
            0: 0x726FDB47DD0E0E31,
            1: 0x74F839C593DC67FD,
            2: 0x0D6C8009D9A94F5A,
            3: 0x85676696D7FB7E2D,
            8: 0x93F5F5799A932462,
        }
        for n, want in expected.items():
            assert siphash(bytes(range(n)), k0, k1, 2, 4) == want

    def test_default_hasher_is_length_prefixed(self):
        # Same bytes, different framing must hash differently.
        assert default_hasher_hash_bytes(b"ab") != siphash(b"ab")

    def test_determinism(self):
        assert default_hasher_hash_bytes(b"hello") == default_hasher_hash_bytes(
            b"hello"
        )
        assert default_hasher_hash_bytes(b"hello") != default_hasher_hash_bytes(
            b"hellp"
        )


class TestFrRand:
    def test_montgomery_representation_semantics(self):
        # The sampled integer is the Montgomery form: value * R == sampled (mod r).
        rng = ChaCha20Rng(SETUP_SEED)
        l = [rng.next_u64() for _ in range(4)]
        l[3] &= (1 << 62) - 1
        u = l[0] | (l[1] << 64) | (l[2] << 128) | (l[3] << 192)
        rng2 = ChaCha20Rng(SETUP_SEED)
        x = fr_rand(rng2)
        if u < MODULUS:  # no rejection on first draw
            assert int(x) * R256 % MODULUS == u

    def test_range_and_determinism(self):
        rng = ChaCha20Rng(bytes(32))
        xs = [fr_rand(rng) for _ in range(50)]
        assert all(0 <= int(x) < MODULUS for x in xs)
        rng2 = ChaCha20Rng(bytes(32))
        assert xs == [fr_rand(rng2) for _ in range(50)]


class TestSetupParams:
    def test_setup_params(self):
        # Mirrors reference utils.rs:276-284.
        prover_params, verifier_params = setup_params(4)
        assert prover_params.log_size == 4
        assert verifier_params.log_size == 4
        assert prover_params.max_operations == 64  # 2^(4+2)
        assert len(prover_params.commitment_params.g1_powers) > 0
        # max_degree = next_pow2(64) = 64 -> 65 powers
        assert len(prover_params.commitment_params.g1_powers) == 65

    def test_setup_deterministic(self):
        setup_params.cache_clear()
        p1, v1 = setup_params(3)
        setup_params.cache_clear()
        p2, v2 = setup_params(3)
        assert p1.fiat_shamir_seed == p2.fiat_shamir_seed
        assert p1.commitment_params.tau == p2.commitment_params.tau
        assert all(
            a == b
            for a, b in zip(
                p1.commitment_params.g1_powers, p2.commitment_params.g1_powers
            )
        )

    def test_powers_consistency(self):
        # g1_powers[i] == tau^i * G and g2_tau == tau * G2gen.
        prover_params, verifier_params = setup_params(2)
        tau = prover_params.commitment_params.tau
        from tnsh.field.g1 import G1

        g = G1.generator()
        assert prover_params.commitment_params.g1_powers[0] == g
        assert prover_params.commitment_params.g1_powers[1] == g.scalar_mul(tau)
        assert prover_params.commitment_params.g1_powers[2] == g.scalar_mul(
            tau * tau
        )
        g2 = verifier_params.commitment_vk.g2_generator
        assert verifier_params.commitment_vk.g2_tau == g2.scalar_mul(tau)


class TestTranscript:
    def test_transcript(self):
        # Mirrors reference utils.rs:286-296.
        transcript = Transcript(bytes([42]) * 32)
        transcript.append_field_element(b"test", Fr(123))
        challenge = transcript.challenge_field_element(b"challenge")
        assert challenge != Fr(0)

    def test_challenge_depends_on_state(self):
        t1 = Transcript(bytes(32))
        t2 = Transcript(bytes(32))
        t1.append_field_element(b"a", Fr(1))
        t2.append_field_element(b"a", Fr(2))
        assert t1.challenge_field_element(b"c") != t2.challenge_field_element(b"c")

    def test_challenge_depends_on_label_only_too(self):
        # SURVEY caveat 3a: different labels alone give different challenges.
        t1 = Transcript(bytes(32))
        t2 = Transcript(bytes(32))
        assert t1.challenge_field_element(b"x") != t2.challenge_field_element(b"y")

    def test_seed_not_used_directly(self):
        # Challenges derive only from accumulated state (utils.rs:190):
        # two transcripts with different seeds but equal state agree.
        t1 = Transcript(bytes(32))
        t2 = Transcript(bytes([7]) * 32)
        t1.append_field_element(b"a", Fr(5))
        t2.append_field_element(b"a", Fr(5))
        assert t1.challenge_field_element(b"c") == t2.challenge_field_element(b"c")

    def test_multi_challenge_labels(self):
        t1 = Transcript(bytes(32))
        cs = t1.challenge_field_elements(b"opening_challenges", 3)
        t2 = Transcript(bytes(32))
        expected = [
            t2.challenge_field_element(b"opening_challenges_0"),
            t2.challenge_field_element(b"opening_challenges_1"),
            t2.challenge_field_element(b"opening_challenges_2"),
        ]
        assert cs == expected


class TestNativeChallenge:
    """The native fs_challenge kernel is a bit-exact twin of the Python path."""

    def test_native_matches_python_pipeline(self):
        import random

        from tnsh import _native as nat

        if not nat.available:  # pragma: no cover - toolchain-less fallback
            import pytest

            pytest.skip("native library unavailable")
        rng = random.Random(0xF5)
        for _ in range(50):
            state = bytes(
                rng.getrandbits(8) for _ in range(rng.randrange(0, 160))
            )
            digest = default_hasher_hash_bytes(state)
            seed = struct.pack("<Q", digest) * 4
            want = fr_rand(ChaCha20Rng.from_seed(seed))
            assert Fr(nat.fs_challenge(state)) == want
