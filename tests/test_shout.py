"""Shout protocol tests — mirrors ``tests/shout_tests.rs`` (14 tests) and the
inline tests shout.rs:288-336."""

import pytest

from tnsh.errors import InvalidParametersError
from tnsh.field.fr import Fr
from tnsh.protocols.shout import LookupOp, LookupTable, Shout


class TestLookupTable:
    def test_basic_semantics(self):
        # Mirrors shout.rs:293-311.
        table = LookupTable([Fr(10), Fr(20), Fr(30), Fr(40)])
        assert table.lookup(0) == Fr(10)
        assert table.lookup(2) == Fr(30)
        assert len(table.lookups) == 2
        assert table.size() == 4

    def test_empty_table(self):
        table = LookupTable([])
        assert table.size() == 0
        with pytest.raises(InvalidParametersError):
            table.lookup(0)

    def test_single_entry_table(self):
        table = LookupTable([Fr(99)])
        assert table.lookup(0) == Fr(99)

    def test_bounds(self):
        table = LookupTable([Fr(1), Fr(2)])
        with pytest.raises(InvalidParametersError):
            table.lookup(2)

    def test_lookup_op_copy_semantics(self):
        op = LookupOp(3, Fr(42))
        assert op.index == 3
        assert op.value == Fr(42)
        assert op == LookupOp(3, Fr(42))


class TestShoutProveVerify:
    def _roundtrip(self, params, table):
        prover_params, verifier_params = params
        shout = Shout(prover_params)
        proof = shout.prove(table)
        assert shout.verify(proof, verifier_params)
        return proof

    def test_basic(self, params4):
        # Mirrors shout.rs:313-336.
        table = LookupTable([Fr(100), Fr(200), Fr(300), Fr(400)])
        table.lookup(0)
        table.lookup(2)
        table.lookup(1)
        self._roundtrip(params4, table)

    def test_zero_lookups(self, params4):
        table = LookupTable([Fr(1), Fr(2), Fr(3), Fr(4)])
        proof = self._roundtrip(params4, table)
        assert proof.lookup_proof.round_polynomials == []
        assert proof.opening_proofs == []

    def test_single_lookup(self, params4):
        table = LookupTable([Fr(5), Fr(6)])
        table.lookup(1)
        self._roundtrip(params4, table)

    def test_repeated_lookups(self, params4):
        table = LookupTable([Fr(7), Fr(8)])
        for _ in range(5):
            table.lookup(0)
        self._roundtrip(params4, table)

    def test_all_indices(self, params4):
        table = LookupTable([Fr(i * 3) for i in range(8)])
        for i in range(8):
            table.lookup(i)
        self._roundtrip(params4, table)

    def test_reverse_order(self, params4):
        table = LookupTable([Fr(i + 1) for i in range(8)])
        for i in reversed(range(8)):
            table.lookup(i)
        self._roundtrip(params4, table)

    def test_sixteen_entry_scattered(self, params4):
        # Mirrors shout_tests.rs:219-240.
        table = LookupTable([Fr(i * i + 7) for i in range(16)])
        for i in (3, 11, 0, 15, 8, 5):
            table.lookup(i)
        self._roundtrip(params4, table)

    def test_over_limit(self):
        from tnsh.core.params import setup_params

        prover_params, _ = setup_params(2)
        table = LookupTable([Fr(1)] * 4)
        for _ in range(prover_params.max_operations + 1):
            table.lookup(0)
        shout = Shout(prover_params)
        with pytest.raises(InvalidParametersError):
            shout.prove(table)

    def test_zero_values(self, params4):
        table = LookupTable([Fr(0), Fr(0), Fr(0), Fr(0)])
        table.lookup(1)
        table.lookup(3)
        self._roundtrip(params4, table)

    def test_duplicate_values(self, params4):
        table = LookupTable([Fr(5), Fr(5), Fr(5), Fr(9)])
        table.lookup(0)
        table.lookup(1)
        table.lookup(2)
        self._roundtrip(params4, table)

    def test_non_power_of_two_table(self, params4):
        # Table of 5 entries pads to 8.
        table = LookupTable([Fr(i + 1) for i in range(5)])
        table.lookup(4)
        table.lookup(0)
        self._roundtrip(params4, table)

    def test_sound_mode_roundtrip(self, params4):
        table = LookupTable([Fr(i * i) for i in range(8)])
        table.lookup(3)
        table.lookup(6)
        prover_params, verifier_params = params4
        shout = Shout(prover_params)
        proof = shout.prove(table, sound_mode=True)
        assert shout.verify(proof, verifier_params)
