"""Sum-check engine tests.

Mirrors reference sumcheck.rs:215-245 (f = x1*x2 with sum 1) and adds oracle
equivalence checks: the fold-based ``ProductMLEOracle`` must emit the exact
round polynomials of the reference-exact ``CallableOracle``.
"""

import pytest

from tnsh.core.transcript import Transcript
from tnsh.errors import SumCheckError
from tnsh.field.fr import Fr
from tnsh.iop.sumcheck import (
    CallableOracle,
    ProductMLEOracle,
    SumCheck,
    ZeroOracle,
)
from tnsh.poly.mle import MultilinearExtension


def _seed():
    return bytes([42]) * 32


class TestSumCheckBasic:
    def test_simple_product(self):
        # Mirrors sumcheck.rs:220-245: f(x1,x2) = x1*x2, sum = 1.
        def polynomial(vars_):
            assert len(vars_) == 2
            return vars_[0] * vars_[1]

        sumcheck = SumCheck(2, Fr(1))
        proof = sumcheck.prove(polynomial, Transcript(_seed()))
        is_valid, challenges = sumcheck.verify(proof, Transcript(_seed()))
        assert is_valid
        assert len(challenges) == 2
        assert len(proof.round_polynomials) == 2
        assert all(len(rp) == 4 for rp in proof.round_polynomials)

    def test_wrong_claimed_sum_fails_prover(self):
        def polynomial(vars_):
            return vars_[0] * vars_[1]

        sumcheck = SumCheck(2, Fr(2))  # wrong sum
        with pytest.raises(SumCheckError):
            sumcheck.prove(polynomial, Transcript(_seed()))

    def test_tampered_proof_rejected(self):
        def polynomial(vars_):
            return vars_[0] * vars_[1]

        sumcheck = SumCheck(2, Fr(1))
        proof = sumcheck.prove(polynomial, Transcript(_seed()))
        proof.round_polynomials[0][0] = proof.round_polynomials[0][0] + Fr(1)
        is_valid, _ = sumcheck.verify(proof, Transcript(_seed()))
        assert not is_valid

    def test_tampered_final_evaluation_rejected(self):
        def polynomial(vars_):
            return vars_[0] * vars_[1]

        sumcheck = SumCheck(2, Fr(1))
        proof = sumcheck.prove(polynomial, Transcript(_seed()))
        proof.final_evaluation = proof.final_evaluation + Fr(1)
        is_valid, _ = sumcheck.verify(proof, Transcript(_seed()))
        assert not is_valid

    def test_wrong_round_count(self):
        def polynomial(vars_):
            return vars_[0] * vars_[1]

        sumcheck = SumCheck(2, Fr(1))
        proof = sumcheck.prove(polynomial, Transcript(_seed()))
        with pytest.raises(SumCheckError):
            SumCheck(3, Fr(1)).verify(proof, Transcript(_seed()))

    def test_zero_vars(self):
        sumcheck = SumCheck(0, Fr(0))
        proof = sumcheck.prove(ZeroOracle(0), Transcript(_seed()))
        assert proof.round_polynomials == []
        assert proof.final_evaluation == Fr(0)
        is_valid, challenges = sumcheck.verify(proof, Transcript(_seed()))
        assert is_valid and challenges == []


class TestOracleEquivalence:
    def test_product_oracle_matches_callable(self):
        evals_a = [Fr(3), Fr(1), Fr(4), Fr(1), Fr(5), Fr(9), Fr(2), Fr(6)]
        evals_b = [Fr(2), Fr(7), Fr(1), Fr(8), Fr(2), Fr(8), Fr(1), Fr(8)]
        mle_a = MultilinearExtension.from_evaluations(evals_a)
        mle_b = MultilinearExtension.from_evaluations(evals_b)
        total = Fr(sum(int(a) * int(b) for a, b in zip(evals_a, evals_b)))

        def closure(vars_):
            return mle_a.evaluate(vars_) * mle_b.evaluate(vars_)

        sc = SumCheck(3, total)
        proof_callable = sc.prove(
            CallableOracle(closure, 3), Transcript(_seed())
        )
        proof_product = sc.prove(
            ProductMLEOracle([mle_a, mle_b]), Transcript(_seed())
        )
        assert proof_callable.round_polynomials == proof_product.round_polynomials
        assert proof_callable.final_evaluation == proof_product.final_evaluation
        ok, _ = sc.verify(proof_product, Transcript(_seed()))
        assert ok

    def test_zero_oracle_matches_stub_closure(self):
        # The reference Twist/Shout closures always return zero; ZeroOracle
        # must generate identical proofs to the callable form.
        def stub(vars_):
            return Fr(0)

        sc = SumCheck(3, Fr(0))
        p1 = sc.prove(stub, Transcript(_seed()))
        p2 = sc.prove(ZeroOracle(3), Transcript(_seed()))
        assert p1.round_polynomials == p2.round_polynomials
        assert p1.final_evaluation == p2.final_evaluation
        # All-zero coefficient vectors of length 4 (lagrange through 4 zeros).
        assert p1.round_polynomials == [[Fr(0)] * 4] * 3

    def test_single_mle_sum(self):
        evals = [Fr(i * i + 1) for i in range(16)]
        mle = MultilinearExtension.from_evaluations(evals)
        total = mle.sum_evaluations()
        sc = SumCheck(4, total)
        proof = sc.prove(ProductMLEOracle([mle]), Transcript(_seed()))
        ok, challenges = sc.verify(proof, Transcript(_seed()))
        assert ok
        # Final evaluation equals the MLE at the challenge point.
        assert proof.final_evaluation == mle.evaluate(challenges)
