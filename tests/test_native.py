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


def test_eq_lt_table_kernels_match_python():
    """Native fr_eq_table / fr_lt_table == the pure-Python builders."""
    import random

    from tnsh import _native
    from tnsh.field.fr import MODULUS, Fr, FrTable

    if not _native.available:
        import pytest

        pytest.skip("native layer unavailable")
    random.seed(31)
    n = 12
    pts = [random.randrange(MODULUS) for _ in range(n)]
    # Python construction (force by calling the small-n code path shape)
    table = [1]
    for t in pts:
        nt = (1 - t) % MODULUS
        table = [v * nt % MODULUS for v in table] + [
            v * t % MODULUS for v in table
        ]
    nat = FrTable(_native.fr_eq_table(pts))
    assert list(nat) == table
    # lt via the closed form on boolean points
    from tnsh.poly.eq import lt_eval

    lt_nat = FrTable(_native.fr_lt_table(pts[:4]))
    for j in range(16):
        jb = [Fr((j >> i) & 1) for i in range(4)]
        assert lt_nat[j] == int(lt_eval(jb, [Fr(p) for p in pts[:4]]))


def test_witness_table_kernels_match_python():
    """wt_col_scalars / wt_residue / wt_mle == the Python fallbacks on
    random sparse + incremental tables with RLC coefficients."""
    import random

    from tnsh import _native
    from tnsh.commit.mkzg_sparse import (
        IncrementalCubeTable,
        SparseCubeTable,
    )
    from tnsh.field.fr import MODULUS

    if not _native.available:
        import pytest

        pytest.skip("native layer unavailable")
    random.seed(37)
    log_k, log_t = 4, 6
    k_size, t_size = 1 << log_k, 1 << log_t
    sp = SparseCubeTable(log_k, log_t)
    inc = IncrementalCubeTable(log_k, log_t)
    for j in range(t_size):
        for _ in range(random.randrange(3)):
            sp.set(j, random.randrange(k_size), random.randrange(MODULUS))
        if j % 2:
            inc.add_update(j, random.randrange(k_size),
                           random.randrange(MODULUS))
    eqk = [random.randrange(MODULUS) for _ in range(k_size)]
    eqw = [random.randrange(MODULUS) for _ in range(t_size)]
    c1, c2 = 7, 1234567

    # scalars: c1 * sparse + c2 * incremental prefix
    want_s = [0] * t_size
    for j, col in enumerate(sp.cols):
        want_s[j] = c1 * sum(v * eqk[k] for k, v in col) % MODULUS
    cur = 0
    for j, ups in enumerate(inc.updates):
        want_s[j] = (want_s[j] + c2 * cur) % MODULUS
        for k, d in ups:
            cur = (cur + d * eqk[k]) % MODULUS
    acc = _native.WtAccumulator(t_size)
    acc.add_col_scalars(sp.csr(), eqk, k_size, False, c1)
    acc.add_col_scalars(inc.csr(), eqk, k_size, True, c2)
    got = acc.export()
    got_s = [int.from_bytes(got[32 * i:32 * i + 32], "little")
             for i in range(t_size)]
    assert got_s == want_s

    # residues: c1 * sparse(eqw) + c2 * incremental(suffix eqw)
    want_g = [0] * k_size
    for j, col in enumerate(sp.cols):
        for k, v in col:
            want_g[k] = (want_g[k] + c1 * eqw[j] * v) % MODULUS
    suffix = [0] * (t_size + 1)
    for j in range(t_size - 1, -1, -1):
        suffix[j] = (suffix[j + 1] + eqw[j]) % MODULUS
    for j, ups in enumerate(inc.updates):
        for k, d in ups:
            want_g[k] = (want_g[k] + c2 * suffix[j + 1] * d) % MODULUS
    ga = _native.WtAccumulator(k_size)
    ga.add_residue(sp.csr(), t_size, eqw, False, c1)
    ga.add_residue(inc.csr(), t_size, eqw, True, c2)
    got = ga.export()
    got_g = [int.from_bytes(got[32 * i:32 * i + 32], "little")
             for i in range(k_size)]
    assert got_g == want_g

    # mle: against to_dense folding
    from tnsh.protocols.sound import _mle_eval
    from tnsh.field.fr import Fr

    point = [Fr(100 + 3 * i) for i in range(log_k + log_t)]
    eqk_p = [int(v) for v in __import__(
        "tnsh.commit.mkzg_sparse", fromlist=["eq_table_ints"]
    ).eq_table_ints([int(p) for p in point[:log_k]])]
    eqj_p = [int(v) for v in __import__(
        "tnsh.commit.mkzg_sparse", fromlist=["eq_table_ints"]
    ).eq_table_ints([int(p) for p in point[log_k:]])]
    got = _native.wt_mle(sp.csr(), t_size, eqk_p, k_size, eqj_p, False)
    assert int(got) == int(_mle_eval(sp.to_dense(), point))
    got = _native.wt_mle(inc.csr(), t_size, eqk_p, k_size, eqj_p, True)
    assert int(got) == int(_mle_eval(inc.to_dense(), point))
