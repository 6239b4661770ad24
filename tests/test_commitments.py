"""Commitment layer tests.

Mirrors reference inline tests commitments.rs:485-588 (KZG commit-open-verify
with wrong-value rejection, vector commitment, polynomial division) plus
batch verification and quotient consistency.
"""

import pytest

from tnsh.commit.kzg import (
    KZGCommitment,
    KZGVectorCommitment,
    compute_quotient_polynomial,
    evaluate_polynomial,
    msm,
    polynomial_division,
)
from tnsh.errors import CommitmentError, PolynomialError
from tnsh.field.fr import Fr
from tnsh.field.g1 import G1


class TestMSM:
    def test_against_naive(self):
        g = G1.generator()
        points = [g * k for k in (3, 5, 11, 200, 1)]
        scalars = [Fr(7), Fr(0), Fr(13), Fr(2), Fr(10**30)]
        naive = G1.zero()
        for p, s in zip(points, scalars):
            naive = naive + p.scalar_mul(s)
        assert msm(points, scalars) == naive

    def test_empty_and_zero(self):
        assert msm([], []).is_zero()
        assert msm([G1.generator()], [Fr(0)]).is_zero()

    def test_large_random(self):
        from tnsh.core.rng import ChaCha20Rng, fr_rand

        rng = ChaCha20Rng(bytes([1]) * 32)
        g = G1.generator()
        points = [g * (i + 1) for i in range(40)]
        scalars = [fr_rand(rng) for _ in range(40)]
        naive = G1.zero()
        for p, s in zip(points, scalars):
            naive = naive + p.scalar_mul(s)
        assert msm(points, scalars) == naive


class TestKZG:
    def test_commit_open_verify(self, params4):
        # Mirrors commitments.rs:490-533.
        prover_params, verifier_params = params4
        poly = [Fr(1), Fr(2), Fr(3)]  # 3x^2 + 2x + 1
        commitment = KZGCommitment.commit(prover_params.commitment_params, poly)
        point = Fr(5)
        value, proof = KZGCommitment.open(
            prover_params.commitment_params, poly, point
        )
        assert value == Fr(86)
        assert KZGCommitment.verify(
            verifier_params.commitment_vk, commitment, point, value, proof
        )
        # Wrong value must be rejected.
        assert not KZGCommitment.verify(
            verifier_params.commitment_vk, commitment, point, Fr(87), proof
        )

    def test_degree_limit(self, params3):
        prover_params, _ = params3
        too_big = [Fr(1)] * (len(prover_params.commitment_params.g1_powers) + 1)
        with pytest.raises(CommitmentError):
            KZGCommitment.commit(prover_params.commitment_params, too_big)

    def test_commitment_hash_zero_point(self):
        from tnsh.commit.kzg import KZGCommitmentValue

        assert KZGCommitmentValue(G1.zero()).hash() == Fr(0)

    def test_batch_verify(self, params4):
        prover_params, verifier_params = params4
        cp = prover_params.commitment_params
        polys = [[Fr(1), Fr(2), Fr(3)], [Fr(5), Fr(0), Fr(7), Fr(1)]]
        points = [Fr(5), Fr(9)]
        commitments, values, proofs = [], [], []
        for poly, pt in zip(polys, points):
            commitments.append(KZGCommitment.commit(cp, poly))
            v, pi = KZGCommitment.open(cp, poly, pt)
            values.append(v)
            proofs.append(pi)
        # Reference-parity quirk: the reference's RLC equation is unbalanced
        # (linear vs quadratic in gamma), so it rejects honest batches.
        assert not KZGCommitment.batch_verify(
            verifier_params.commitment_vk, commitments, points, values, proofs
        )
        with pytest.raises(CommitmentError):
            KZGCommitment.batch_verify(
                verifier_params.commitment_vk, commitments, points[:1], values, proofs
            )
        assert KZGCommitment.batch_verify(
            verifier_params.commitment_vk, [], [], [], []
        )

    def test_batch_verify_sound(self, params4):
        prover_params, verifier_params = params4
        cp = prover_params.commitment_params
        polys = [[Fr(1), Fr(2), Fr(3)], [Fr(5), Fr(0), Fr(7), Fr(1)]]
        points = [Fr(5), Fr(9)]
        commitments, values, proofs = [], [], []
        for poly, pt in zip(polys, points):
            commitments.append(KZGCommitment.commit(cp, poly))
            v, pi = KZGCommitment.open(cp, poly, pt)
            values.append(v)
            proofs.append(pi)
        assert KZGCommitment.batch_verify_sound(
            verifier_params.commitment_vk, commitments, points, values, proofs
        )
        bad_values = [values[0] + Fr(1), values[1]]
        assert not KZGCommitment.batch_verify_sound(
            verifier_params.commitment_vk, commitments, points, bad_values, proofs
        )
        assert KZGCommitment.batch_verify_sound(
            verifier_params.commitment_vk, [], [], [], []
        )


class TestVectorCommitment:
    def test_commit_open_verify(self, params4):
        # Mirrors commitments.rs:535-565.
        prover_params, verifier_params = params4
        vector = [Fr(10), Fr(20), Fr(30), Fr(40)]
        commitment = KZGVectorCommitment.commit(
            prover_params.commitment_params, vector
        )
        value, proof = KZGVectorCommitment.open(
            prover_params.commitment_params, vector, 2
        )
        assert value == Fr(30)
        assert KZGVectorCommitment.verify(
            verifier_params.commitment_vk, commitment, 2, value, proof
        )

    def test_out_of_bounds(self, params4):
        prover_params, _ = params4
        with pytest.raises(CommitmentError):
            KZGVectorCommitment.open(
                prover_params.commitment_params, [Fr(1), Fr(2)], 2
            )


class TestPolynomialHelpers:
    def test_polynomial_division(self):
        # Mirrors commitments.rs:567-587: (x^2 - 1) / (x - 1) = x + 1.
        dividend = [-Fr(1), Fr(0), Fr(1)]
        divisor = [-Fr(1), Fr(1)]
        assert polynomial_division(dividend, divisor) == [Fr(1), Fr(1)]

    def test_division_by_zero_poly(self):
        with pytest.raises(PolynomialError):
            polynomial_division([Fr(1)], [Fr(0), Fr(0)])

    def test_quotient_matches_long_division(self):
        poly = [Fr(3), Fr(1), Fr(4), Fr(1), Fr(5)]
        z = Fr(9)
        v = evaluate_polynomial(poly, z)
        synthetic = compute_quotient_polynomial(poly, z, v)
        shifted = [poly[0] - v] + list(poly[1:])
        long = polynomial_division(shifted, [-z, Fr(1)])
        assert synthetic == long

    def test_quotient_identity(self):
        # Q(x) * (x - z) + v == P(x) at a few points.
        poly = [Fr(7), Fr(0), Fr(2), Fr(9)]
        z = Fr(4)
        v = evaluate_polynomial(poly, z)
        q = compute_quotient_polynomial(poly, z, v)
        for x in (Fr(0), Fr(1), Fr(11), Fr(123456)):
            lhs = evaluate_polynomial(q, x) * (x - z) + v
            assert lhs == evaluate_polynomial(poly, x)

    def test_constant_poly_quotient_empty(self):
        assert compute_quotient_polynomial([Fr(5)], Fr(2), Fr(5)) == []
