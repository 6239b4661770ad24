"""Twist protocol tests — mirrors ``tests/twist_tests.rs`` (10 tests) and the
inline tests twist.rs:318-355."""

import pytest

from tnsh.errors import InvalidParametersError
from tnsh.field.fr import Fr
from tnsh.protocols.twist import MemoryOp, MemoryOpKind, MemoryTrace, Twist


class TestMemoryTrace:
    def test_trace_semantics(self):
        # Mirrors twist.rs:323-339.
        trace = MemoryTrace(8)
        trace.write(0, Fr(42))
        trace.write(1, Fr(73))
        assert trace.read(0) == Fr(42)
        assert trace.read(1) == Fr(73)
        assert len(trace.operations) == 4

    def test_unwritten_reads_are_zero(self):
        trace = MemoryTrace(8)
        assert trace.read(5) == Fr(0)

    def test_operation_recording(self):
        trace = MemoryTrace(4)
        trace.write(1, Fr(9))
        trace.read(1)
        ops = trace.operations
        assert ops[0].is_write and ops[0].address == 1 and ops[0].value == Fr(9)
        assert ops[1].is_read and ops[1].value == Fr(9)

    def test_bounds(self):
        trace = MemoryTrace(4)
        with pytest.raises(InvalidParametersError):
            trace.write(4, Fr(1))
        with pytest.raises(InvalidParametersError):
            trace.read(10)

    def test_size_must_be_power_of_two(self):
        with pytest.raises(AssertionError):
            MemoryTrace(6)

    def test_memory_op_equality(self):
        a = MemoryOp.write(3, Fr(7))
        b = MemoryOp.write(3, Fr(7))
        c = MemoryOp.read(3, Fr(7))
        assert a == b
        assert a != c
        assert a.kind is MemoryOpKind.WRITE
        assert c.kind is MemoryOpKind.READ


class TestTwistProveVerify:
    def test_small_mixed_trace(self, params4):
        # Mirrors twist.rs:341-355.
        prover_params, verifier_params = params4
        trace = MemoryTrace(16)
        trace.write(0, Fr(42))
        trace.write(1, Fr(73))
        trace.read(0)
        twist = Twist(prover_params)
        proof = twist.prove(trace)
        assert twist.verify(proof, verifier_params)

    def test_empty_trace(self, params4):
        # Mirrors twist_tests.rs:88-99.
        prover_params, verifier_params = params4
        trace = MemoryTrace(16)
        twist = Twist(prover_params)
        proof = twist.prove(trace)
        assert proof.consistency_proof.round_polynomials == []
        assert proof.opening_proofs == []
        assert twist.verify(proof, verifier_params)

    def test_read_only_trace(self, params4):
        prover_params, verifier_params = params4
        trace = MemoryTrace(16)
        for i in range(4):
            assert trace.read(i) == Fr(0)
        twist = Twist(prover_params)
        assert twist.verify(twist.prove(trace), verifier_params)

    def test_write_only_trace(self, params4):
        prover_params, verifier_params = params4
        trace = MemoryTrace(16)
        for i in range(6):
            trace.write(i % 16, Fr(i * 11))
        twist = Twist(prover_params)
        assert twist.verify(twist.prove(trace), verifier_params)

    def test_overwrite_sequence(self, params4):
        prover_params, verifier_params = params4
        trace = MemoryTrace(16)
        trace.write(0, Fr(1))
        trace.write(0, Fr(2))
        assert trace.read(0) == Fr(2)
        trace.write(0, Fr(3))
        assert trace.read(0) == Fr(3)
        twist = Twist(prover_params)
        assert twist.verify(twist.prove(trace), verifier_params)

    def test_at_operation_limit(self, params2=None):
        # Mirrors twist_tests.rs:161-177: 15 ops under the 16-op limit.
        from tnsh.core.params import setup_params

        prover_params, verifier_params = setup_params(2)  # max_operations 16
        trace = MemoryTrace(4)
        for i in range(15):
            if i % 2 == 0:
                trace.write(i % 4, Fr(i))
            else:
                trace.read(i % 4)
        twist = Twist(prover_params)
        assert twist.verify(twist.prove(trace), verifier_params)

    def test_over_operation_limit(self):
        # Mirrors twist_tests.rs:180-196.
        from tnsh.core.params import setup_params

        prover_params, _ = setup_params(2)
        trace = MemoryTrace(4)
        for i in range(prover_params.max_operations + 1):
            trace.write(i % 4, Fr(i))
        twist = Twist(prover_params)
        with pytest.raises(InvalidParametersError):
            twist.prove(trace)

    def test_sound_mode_roundtrip(self, params4):
        # tnsh extension: honest constraint oracle still yields zero-sum
        # proofs for consistent traces.
        prover_params, verifier_params = params4
        trace = MemoryTrace(16)
        trace.write(2, Fr(5))
        trace.read(2)
        trace.write(2, Fr(9))
        trace.read(2)
        twist = Twist(prover_params)
        proof = twist.prove(trace, sound_mode=True)
        assert twist.verify(proof, verifier_params)


class TestSoundModePadding:
    def test_sound_mode_padding_rows_not_scored(self, params4):
        """Regression (found by tools/fuzz_differential.py seed 42): padding
        rows look like 'read address 0, value 0'; once a real write hits
        address 0 the sound oracle must NOT score them as failing reads."""
        prover_params, verifier_params = params4
        trace = MemoryTrace(8)
        # 3 ops -> pads to 4; the write to address 0 poisons mem[0] for any
        # naively-scored padding "read".
        trace.read(3)
        trace.write(0, Fr(345))
        trace.read(5)
        twist = Twist(prover_params)
        proof = twist.prove(trace, sound_mode=True)
        assert twist.verify(proof, verifier_params)

    def test_sound_mode_many_padded_sizes(self, params4):
        prover_params, verifier_params = params4
        for n_ops in (3, 5, 9, 11):
            trace = MemoryTrace(8)
            for i in range(n_ops):
                if i % 2 == 0:
                    trace.write(i % 8, Fr(i * 7 + 1))
                else:
                    trace.read((i * 3) % 8)
            twist = Twist(prover_params)
            proof = twist.prove(trace, sound_mode=True)
            assert twist.verify(proof, verifier_params)
