"""Polynomial layer tests.

Mirrors ``tests/polynomial_tests.rs`` (322 LoC, 14 tests) plus the inline
tests in polynomials.rs:373-477.
"""

import pytest

from tnsh.field.fr import Fr
from tnsh.core.rng import ChaCha20Rng, fr_rand
from tnsh.poly.interp import (
    derivative,
    evaluate_polynomial,
    interpolate_on_range,
    lagrange_interpolate,
)
from tnsh.poly.lt import LessThanPolynomial
from tnsh.poly.mle import MultilinearExtension


def _rand_fr(rng):
    return fr_rand(rng)


class TestMLEConstruction:
    def test_from_evaluations_power_of_two_check(self):
        # Mirrors polynomial_tests.rs:23-35 (panic via catch_unwind).
        with pytest.raises(AssertionError):
            MultilinearExtension.from_evaluations([Fr(1), Fr(2), Fr(3)])

    def test_from_evaluations_vec_pads_and_truncates(self):
        mle = MultilinearExtension.from_evaluations_vec(2, [Fr(1), Fr(2)])
        assert mle.evaluations == [Fr(1), Fr(2), Fr(0), Fr(0)]
        mle2 = MultilinearExtension.from_evaluations_vec(1, [Fr(1), Fr(2), Fr(3)])
        assert mle2.evaluations == [Fr(1), Fr(2)]

    def test_from_sparse(self):
        mle = MultilinearExtension.from_sparse(3, [(1, Fr(5)), (6, Fr(7))])
        assert mle.evaluations[1] == Fr(5)
        assert mle.evaluations[6] == Fr(7)
        assert sum(int(v) for v in mle.evaluations) == 12
        with pytest.raises(AssertionError):
            MultilinearExtension.from_sparse(2, [(4, Fr(1))])

    def test_one_hot(self):
        # Mirrors polynomials.rs:416-428.
        mle = MultilinearExtension.one_hot(3, 5)
        for i in range(8):
            bits = [Fr((i >> j) & 1) for j in range(3)]
            expected = Fr(1) if i == 5 else Fr(0)
            assert mle.evaluate(bits) == expected
        with pytest.raises(AssertionError):
            MultilinearExtension.one_hot(2, 4)


class TestMLEEvaluation:
    def test_boolean_points(self):
        # Mirrors polynomials.rs:380-399.
        mle = MultilinearExtension.from_evaluations([Fr(1), Fr(2), Fr(3), Fr(4)])
        assert mle.evaluate([Fr(0), Fr(0)]) == Fr(1)
        assert mle.evaluate([Fr(1), Fr(0)]) == Fr(2)
        assert mle.evaluate([Fr(0), Fr(1)]) == Fr(3)
        assert mle.evaluate([Fr(1), Fr(1)]) == Fr(4)

    def test_random_point_matches_basis_formula(self):
        mle = MultilinearExtension.from_evaluations([Fr(1), Fr(2), Fr(3), Fr(4)])
        rng = ChaCha20Rng(bytes(32))
        r1, r2 = _rand_fr(rng), _rand_fr(rng)
        one = Fr(1)
        expected = (
            Fr(1) * (one - r1) * (one - r2)
            + Fr(2) * r1 * (one - r2)
            + Fr(3) * (one - r1) * r2
            + Fr(4) * r1 * r2
        )
        assert mle.evaluate([r1, r2]) == expected

    def test_half_half_is_average(self):
        # Mirrors polynomial_tests.rs:93-112: f(1/2, 1/2) = avg of table.
        mle = MultilinearExtension.from_evaluations([Fr(1), Fr(2), Fr(3), Fr(4)])
        half = Fr(2).inverse()
        avg = Fr(10) * Fr(4).inverse()
        assert mle.evaluate([half, half]) == avg

    def test_dimension_mismatch(self):
        mle = MultilinearExtension.from_evaluations([Fr(1), Fr(2)])
        with pytest.raises(AssertionError):
            mle.evaluate([Fr(1), Fr(2)])

    def test_partial_evaluation(self):
        # Mirrors polynomials.rs:446-460: fix first var to 1 -> [2, 4].
        mle = MultilinearExtension.from_evaluations([Fr(1), Fr(2), Fr(3), Fr(4)])
        partial = mle.partial_evaluate([Fr(1)])
        assert partial.num_vars == 1
        assert partial.evaluate([Fr(0)]) == Fr(2)
        assert partial.evaluate([Fr(1)]) == Fr(4)

    def test_partial_evaluation_at_random_point(self):
        mle = MultilinearExtension.from_evaluations(
            [Fr(i * 3 + 1) for i in range(8)]
        )
        rng = ChaCha20Rng(bytes([9]) * 32)
        r = [_rand_fr(rng) for _ in range(3)]
        partial = mle.partial_evaluate(r[:2])
        assert partial.evaluate([r[2]]) == mle.evaluate(r)

    def test_fix_last_variable(self):
        mle = MultilinearExtension.from_evaluations(
            [Fr(i + 1) for i in range(8)]
        )
        rng = ChaCha20Rng(bytes([3]) * 32)
        r = [_rand_fr(rng) for _ in range(3)]
        folded = mle.fix_last_variable(r[2])
        assert folded.evaluate(r[:2]) == mle.evaluate(r)


class TestMLEArithmetic:
    def test_add_and_scalar_mul(self):
        # Mirrors polynomials.rs:463-477.
        mle1 = MultilinearExtension.from_evaluations([Fr(1), Fr(2)])
        mle2 = MultilinearExtension.from_evaluations([Fr(3), Fr(4)])
        assert mle1.add(mle2).evaluations == [Fr(4), Fr(6)]
        assert mle1.scalar_mul(Fr(3)).evaluations == [Fr(3), Fr(6)]

    def test_linearity_at_random_point(self):
        # Mirrors polynomial_tests.rs:294-323.
        mle1 = MultilinearExtension.from_evaluations([Fr(i) for i in range(4)])
        mle2 = MultilinearExtension.from_evaluations([Fr(i * i) for i in range(4)])
        rng = ChaCha20Rng(bytes([5]) * 32)
        r = [_rand_fr(rng) for _ in range(2)]
        s = Fr(77)
        assert mle1.add(mle2).evaluate(r) == mle1.evaluate(r) + mle2.evaluate(r)
        assert mle1.scalar_mul(s).evaluate(r) == s * mle1.evaluate(r)

    def test_sum_evaluations(self):
        mle = MultilinearExtension.from_evaluations([Fr(1), Fr(2), Fr(3), Fr(4)])
        assert mle.sum_evaluations() == Fr(10)


class TestLessThan:
    def test_lt_bits(self):
        # Mirrors polynomials.rs:431-443 — bit 0 is MOST significant.
        lt = LessThanPolynomial(3)
        assert lt.evaluate_at_bits([False] * 3, [True, False, False]) == Fr(1)
        assert lt.evaluate_at_bits([True, False, False], [False] * 3) == Fr(0)
        assert lt.evaluate_at_bits([True, False, False], [True, False, False]) == Fr(0)
        # "2 < 1" is true under the little-endian-lexicographic quirk:
        assert lt.evaluate_at_bits([False, True, False], [True, False, False]) == Fr(1)

    def test_lt_field_elements(self):
        lt = LessThanPolynomial(4)
        assert lt.evaluate_at_field_elements(Fr(3), Fr(3)) == Fr(0)

    def test_lt_mle_matches_pointwise(self):
        # Mirrors polynomial_tests.rs:155-188.
        n = 2
        lt = LessThanPolynomial(n)
        mle = lt.to_multilinear_extension()
        assert mle.num_vars == 2 * n
        for a in range(1 << n):
            for b in range(1 << n):
                index = a | (b << n)
                point = [Fr((index >> j) & 1) for j in range(2 * n)]
                a_bits = [bool((a >> j) & 1) for j in range(n)]
                b_bits = [bool((b >> j) & 1) for j in range(n)]
                assert mle.evaluate(point) == lt.evaluate_at_bits(a_bits, b_bits)


class TestInterpolation:
    def test_recovers_x_squared(self):
        # Mirrors polynomial_tests.rs:191-208.
        points = [(Fr(i), Fr(i * i)) for i in range(4)]
        coeffs = lagrange_interpolate(points)
        assert len(coeffs) == 4
        assert coeffs[0] == Fr(0)
        assert coeffs[1] == Fr(0)
        assert coeffs[2] == Fr(1)
        assert coeffs[3] == Fr(0)

    def test_interpolate_on_range_matches_general(self):
        values = [Fr(7), Fr(1), Fr(88), Fr(3), Fr(0), Fr(41), Fr(5), Fr(6)]
        general = lagrange_interpolate([(Fr(i), v) for i, v in enumerate(values)])
        fast = interpolate_on_range(values)
        assert general == fast

    def test_interpolation_evaluates_back(self):
        values = [Fr(3), Fr(14), Fr(15), Fr(92)]
        coeffs = interpolate_on_range(values)
        for i, v in enumerate(values):
            assert evaluate_polynomial(coeffs, Fr(i)) == v

    def test_empty(self):
        assert lagrange_interpolate([]) == []
        assert interpolate_on_range([]) == []

    def test_horner(self):
        assert evaluate_polynomial([Fr(1), Fr(2), Fr(3)], Fr(5)) == Fr(86)
        assert evaluate_polynomial([], Fr(5)) == Fr(0)

    def test_derivative(self):
        # d/dx (1 + 2x + 3x^2) = 2 + 6x
        assert derivative([Fr(1), Fr(2), Fr(3)]) == [Fr(2), Fr(6)]
        assert derivative([Fr(5)]) == [Fr(0)]
        assert derivative([]) == [Fr(0)]
