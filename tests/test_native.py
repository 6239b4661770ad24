"""C++ native layer tests: exactness vs the pure-Python golden path.

The native library (tnsh/_native/tnsh_native.cpp) must produce bit-identical
results for every wrapped kernel; protocol-level tests additionally assert
that proofs built with native dispatch verify identically to pure-Python
proofs (same transcripts — commitment hashes are equal group elements).
"""

import os
import random

import pytest

import tnsh._native as native
from tnsh.field.fr import MODULUS, Fr
from tnsh.field.g1 import G1
from tnsh.field.g2 import G2

pytestmark = pytest.mark.skipif(
    not native.available, reason="native library unavailable"
)


class TestFrKernels:
    def test_interp_range(self):
        from tnsh.poly.interp import lagrange_interpolate

        random.seed(61)
        vals = [Fr(random.randrange(MODULUS)) for _ in range(33)]
        want = lagrange_interpolate([(Fr(i), v) for i, v in enumerate(vals)])
        assert native.interp_range(vals) == want

    def test_horner_and_quotient(self):
        from tnsh.commit.kzg import (
            compute_quotient_polynomial,
            evaluate_polynomial,
        )

        random.seed(62)
        coeffs = [Fr(random.randrange(MODULUS)) for _ in range(21)]
        z = Fr(random.randrange(MODULUS))
        v = evaluate_polynomial(coeffs, z)
        assert native.horner(coeffs, z) == v
        assert native.quotient(coeffs, z) == compute_quotient_polynomial(
            coeffs, z, v
        )


class TestCurveKernels:
    def test_g1_scalar_mul(self):
        random.seed(63)
        g = G1.generator()
        for _ in range(3):
            k = Fr(random.randrange(MODULUS))
            assert native.g1_scalar_mul(g, k) == g.scalar_mul(k)
        assert native.g1_scalar_mul(g, Fr(0)).is_zero()
        assert native.g1_scalar_mul(G1.zero(), Fr(5)).is_zero()

    def test_msm_matches_python(self):
        from tnsh.commit.kzg import msm as msm_dispatch

        random.seed(64)
        g = G1.generator()
        points = [g * random.randrange(1, 10**9) for _ in range(30)]
        scalars = [Fr(random.randrange(MODULUS)) for _ in range(30)]
        got = native.msm(points, scalars)
        os.environ["TNSH_NO_NATIVE"] = "1"
        try:
            want = msm_dispatch(points, scalars)
        finally:
            del os.environ["TNSH_NO_NATIVE"]
        assert got == want

    def test_fixed_base_batch(self):
        random.seed(65)
        g = G1.generator() * 7
        scalars = [Fr(random.randrange(MODULUS)) for _ in range(5)] + [Fr(0)]
        out = native.fixed_base_batch(g, scalars)
        for s, p in zip(scalars, out):
            assert p == g.scalar_mul(s)

    def test_g2_scalar_mul(self):
        random.seed(66)
        g2 = G2.generator()
        k = Fr(random.randrange(MODULUS))
        assert native.g2_scalar_mul(g2, k) == g2.scalar_mul(k)


class TestPairing:
    def test_pairing_equal(self):
        g, g2 = G1.generator(), G2.generator()
        a = Fr(123456789)
        assert native.pairing_equal(g.scalar_mul(a), g2, g, g2.scalar_mul(a))
        assert not native.pairing_equal(
            g.scalar_mul(a), g2, g, g2.scalar_mul(a + Fr(1))
        )

    def test_pairing_with_identity(self):
        g, g2 = G1.generator(), G2.generator()
        # e(0, Q) == e(0, Q') == 1
        assert native.pairing_equal(G1.zero(), g2, G1.zero(), g2.scalar_mul(5))

    def test_pairing_product(self):
        g, g2 = G1.generator(), G2.generator()
        a = Fr(424242)
        assert native.pairing_product_is_one(
            [(g.scalar_mul(a), g2), (g.neg(), g2.scalar_mul(a))]
        )
        assert not native.pairing_product_is_one([(g, g2)])
        assert native.pairing_product_is_one([])


class TestProtocolEquivalence:
    def test_proofs_identical_with_and_without_native(self):
        """Native and pure-Python provers must emit identical proofs."""
        from tnsh.core.params import setup_params
        from tnsh.protocols.twist import MemoryTrace, Twist

        setup_params.cache_clear()
        pp, vp = setup_params(3)
        trace = MemoryTrace(8)
        trace.write(0, Fr(42))
        trace.write(1, Fr(73))
        trace.read(0)
        twist = Twist(pp)
        proof_native = twist.prove(trace)

        os.environ["TNSH_NO_NATIVE"] = "1"
        try:
            setup_params.cache_clear()
            pp2, vp2 = setup_params(3)
            trace2 = MemoryTrace(8)
            trace2.write(0, Fr(42))
            trace2.write(1, Fr(73))
            trace2.read(0)
            proof_py = Twist(pp2).prove(trace2)
        finally:
            del os.environ["TNSH_NO_NATIVE"]
            setup_params.cache_clear()

        assert proof_native.address_commitment == proof_py.address_commitment
        assert proof_native.value_commitment == proof_py.value_commitment
        assert (
            proof_native.consistency_proof.round_polynomials
            == proof_py.consistency_proof.round_polynomials
        )
        assert proof_native.final_evaluations == proof_py.final_evaluations
        assert all(
            a.proof == b.proof
            for a, b in zip(proof_native.opening_proofs, proof_py.opening_proofs)
        )
        assert twist.verify(proof_native, vp)
