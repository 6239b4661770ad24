"""Field layer tests: Fr arithmetic, field_utils, curves, pairing, serde.

Mirrors reference utils.rs:298-329 (test_field_utils) and adds curve/pairing
coverage for the arkworks-replacement layer (SURVEY §2 D1/D2).
"""

import pytest

from tnsh.errors import PolynomialError
from tnsh.field.fr import (
    MODULUS,
    Fr,
    batch_inverse,
    horner_eval,
    inner_product,
    powers,
    vanishing_poly_eval,
)
from tnsh.field.g1 import G1
from tnsh.field.g2 import G2
from tnsh.field.pairing import FQ12_ONE, fq12_pow, pairing
from tnsh.core.serialize import (
    fr_from_bytes,
    fr_to_bytes,
    g1_from_bytes,
    g1_to_bytes,
    g2_from_bytes,
    g2_to_bytes,
)


class TestFr:
    def test_ring_ops(self):
        a, b = Fr(7), Fr(5)
        assert a + b == Fr(12)
        assert a - b == Fr(2)
        assert b - a == Fr(MODULUS - 2)
        assert a * b == Fr(35)
        assert -a == Fr(MODULUS - 7)
        assert a**3 == Fr(343)

    def test_inverse(self):
        a = Fr(123456789)
        assert a * a.inverse() == Fr(1)
        with pytest.raises(PolynomialError):
            Fr(0).inverse()

    def test_division(self):
        assert Fr(10) / Fr(2) == Fr(5)

    def test_serialization_roundtrip(self):
        x = Fr(2**200 + 12345)
        assert fr_from_bytes(fr_to_bytes(x)) == x
        assert len(fr_to_bytes(x)) == 32

    def test_from_le_bytes_mod_order(self):
        big = (MODULUS + 5).to_bytes(32, "little")
        assert Fr.from_le_bytes_mod_order(big) == Fr(5)


class TestFieldUtils:
    def test_inner_product(self):
        # Mirrors reference utils.rs:302-306.
        a = [Fr(1), Fr(2)]
        b = [Fr(3), Fr(4)]
        assert inner_product(a, b) == Fr(11)

    def test_powers(self):
        # Mirrors reference utils.rs:308-316.
        assert powers(Fr(2), 4) == [Fr(1), Fr(2), Fr(4), Fr(8)]

    def test_horner(self):
        # 1 + 2x + 3x^2 at x = 5 -> 86
        assert horner_eval([Fr(1), Fr(2), Fr(3)], Fr(5)) == Fr(86)

    def test_vanishing_poly(self):
        s = [Fr(1), Fr(2), Fr(3)]
        assert vanishing_poly_eval(s, Fr(4)) == Fr(6)
        assert vanishing_poly_eval(s, Fr(2)) == Fr(0)

    def test_batch_inverse(self):
        # Mirrors reference utils.rs:318-328.
        elements = [Fr(2), Fr(3), Fr(5)]
        inverses = batch_inverse(elements)
        for e, i in zip(elements, inverses):
            assert e * i == Fr(1)

    def test_batch_inverse_empty(self):
        assert batch_inverse([]) == []


class TestG1:
    def test_group_law(self):
        g = G1.generator()
        assert g.is_on_curve()
        assert (g * 5 + g * 7) == g * 12
        assert (g * 5 - g * 5).is_zero()
        assert g.double() == g + g
        assert (g * MODULUS).is_zero()  # group order is r

    def test_identity(self):
        z = G1.zero()
        g = G1.generator()
        assert z + g == g
        assert g + z == g
        assert z.to_affine() == (0, 0)

    def test_serialization_roundtrip(self):
        g = G1.generator() * 123456789
        data = g1_to_bytes(g, compress=True)
        assert len(data) == 32
        assert g1_from_bytes(data) == g
        data_u = g1_to_bytes(g, compress=False)
        assert len(data_u) == 64
        assert g1_from_bytes(data_u, compressed=False) == g
        # identity
        z = g1_to_bytes(G1.zero())
        assert g1_from_bytes(z).is_zero()


class TestG2:
    def test_group_law(self):
        g = G2.generator()
        assert g.is_on_curve()
        assert (g * 3 + g * 4) == g * 7
        assert (g * MODULUS).is_zero()

    def test_serialization_roundtrip(self):
        g = G2.generator() * 987654321
        data = g2_to_bytes(g, compress=True)
        assert len(data) == 64
        assert g2_from_bytes(data) == g
        data_u = g2_to_bytes(g, compress=False)
        assert g2_from_bytes(data_u, compressed=False) == g


class TestPairing:
    def test_bilinearity(self):
        g1, g2 = G1.generator(), G2.generator()
        e = pairing(g1, g2)
        assert e != FQ12_ONE
        assert pairing(g1 * 2, g2 * 3) == fq12_pow(e, 6)

    def test_identity_maps_to_one(self):
        assert pairing(G1.zero(), G2.generator()) == FQ12_ONE
        assert pairing(G1.generator(), G2.zero()) == FQ12_ONE

    def test_gt_has_order_r(self):
        e = pairing(G1.generator(), G2.generator())
        assert fq12_pow(e, MODULUS) == FQ12_ONE
