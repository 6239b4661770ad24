"""TwistBits: trapdoor-free sound Twist via bit-column commitments.

The capability test (VERDICT r3 task 6): a sound Twist prove/verify that
works under an external ceremony SRS (taus discarded) sized only for the
T-point columns — NO cube SRS, NO trapdoor anywhere in the prover.
"""

import copy
import random

import pytest

from tnsh.core.params import setup_params
from tnsh.field.fr import MODULUS, Fr
from tnsh.protocols.twist import MemoryTrace
from tnsh.protocols.twist_bits import TwistBits, TwistBitsProof


LOG_K, LOG_T = 3, 6


@pytest.fixture(scope="module")
def params():
    return setup_params(8)


@pytest.fixture(scope="module")
def trace():
    random.seed(1234)
    k = 1 << LOG_K
    tr = MemoryTrace(k)
    for i in range(1 << LOG_T):
        if i % 3 == 0 or i == 0:
            tr.write(random.randrange(k), Fr(random.randrange(1 << 61)))
        else:
            tr.read(random.randrange(k))
    return tr


@pytest.fixture(scope="module")
def proof(trace, params):
    pp, _ = params
    return TwistBits.prove(trace, pp)


def test_prove_verify_roundtrip(proof, params):
    _, vp = params
    assert TwistBits.verify(proof, vp)


def test_trapdoor_free_under_ceremony_srs(trace, params):
    """The headline property: prove + verify with an external ceremony
    SRS installed for the column arity (log T vars) ONLY — the prover
    never touches a cube SRS or the factorized (tau-aware) paths, so the
    deterministic trapdoor is out of the picture entirely."""
    from tnsh.commit.mkzg import (
        clear_external_multilinear_srs,
        generate_multilinear_srs,
        install_external_multilinear_srs,
    )

    pp, vp = params
    p_ext, vk_ext = generate_multilinear_srs(
        LOG_T, [Fr(31337 + 13 * i) for i in range(LOG_T)],
        keep_taus=False,
    )
    assert p_ext.taus is None
    install_external_multilinear_srs(p_ext, vk_ext)
    try:
        proof = TwistBits.prove(trace, pp)
        assert TwistBits.verify(proof, vp)
        # forged claimed value is rejected under the ceremony SRS
        bad = copy.deepcopy(proof)
        bad.values_rj[2 * LOG_K + 1] = Fr(
            int(bad.values_rj[2 * LOG_K + 1]) + 1
        )
        assert not TwistBits.verify(bad, vp)
    finally:
        clear_external_multilinear_srs()


def test_tampered_v_val_rejected(proof, params):
    _, vp = params
    bad = copy.deepcopy(proof)
    bad.v_val = Fr(int(bad.v_val) + 1)
    assert not TwistBits.verify(bad, vp)


def test_tampered_final_evaluation_rejected(proof, params):
    _, vp = params
    bad = copy.deepcopy(proof)
    bad.check_a.final_evaluation = Fr(
        int(bad.check_a.final_evaluation) + 1
    )
    assert not TwistBits.verify(bad, vp)
    bad = copy.deepcopy(proof)
    bad.check_b.final_evaluation = Fr(
        int(bad.check_b.final_evaluation) + 1
    )
    assert not TwistBits.verify(bad, vp)


def test_tampered_column_value_rejected(proof, params):
    _, vp = params
    for idx in (0, LOG_K, 2 * LOG_K, 2 * LOG_K + 3):
        bad = copy.deepcopy(proof)
        bad.values_rj[idx] = Fr(int(bad.values_rj[idx]) + 1)
        assert not TwistBits.verify(bad, vp)
    bad = copy.deepcopy(proof)
    bad.values_s[0] = Fr(int(bad.values_s[0]) + 1)
    assert not TwistBits.verify(bad, vp)


def test_tampered_round_polynomial_rejected(proof, params):
    _, vp = params
    bad = copy.deepcopy(proof)
    poly = list(bad.check_a.round_polynomials[0])
    poly[0] = Fr(int(poly[0]) + 1)
    bad.check_a.round_polynomials[0] = poly
    assert not TwistBits.verify(bad, vp)


def test_writes_only_and_reads_only_traces(params):
    pp, vp = params
    k = 1 << LOG_K
    tr = MemoryTrace(k)
    for i in range(8):
        tr.write(i % k, Fr(100 + i))
    assert TwistBits.verify(TwistBits.prove(tr, pp), vp)
    tr = MemoryTrace(k)
    for i in range(8):
        tr.read(i % k)  # all reads of never-written memory (zeros)
    assert TwistBits.verify(TwistBits.prove(tr, pp), vp)


class TestShoutBits:
    @pytest.fixture(scope="class")
    def table(self):
        from tnsh.protocols.shout import LookupTable

        random.seed(99)
        t = LookupTable([Fr(i * i + 3) for i in range(1 << LOG_K)])
        for _ in range(1 << LOG_T):
            t.lookup(random.randrange(1 << LOG_K))
        return t

    @pytest.fixture(scope="class")
    def sproof(self, table, params):
        from tnsh.protocols.twist_bits import ShoutBits

        pp, _ = params
        return ShoutBits.prove(table, pp)

    def test_roundtrip(self, sproof, table, params):
        from tnsh.protocols.twist_bits import ShoutBits

        _, vp = params
        assert ShoutBits.verify(sproof, table.entries, vp)

    def test_trapdoor_free(self, table, params):
        from tnsh.commit.mkzg import (
            clear_external_multilinear_srs,
            generate_multilinear_srs,
            install_external_multilinear_srs,
        )
        from tnsh.protocols.twist_bits import ShoutBits

        pp, vp = params
        p_ext, vk_ext = generate_multilinear_srs(
            LOG_T, [Fr(424242 + i) for i in range(LOG_T)], keep_taus=False
        )
        install_external_multilinear_srs(p_ext, vk_ext)
        try:
            proof = ShoutBits.prove(table, pp)
            assert ShoutBits.verify(proof, table.entries, vp)
        finally:
            clear_external_multilinear_srs()

    def test_tampered_value_rejected(self, sproof, table, params):
        from tnsh.protocols.twist_bits import ShoutBits

        _, vp = params
        bad = copy.deepcopy(sproof)
        bad.values_rj[LOG_K] = Fr(int(bad.values_rj[LOG_K]) + 1)
        assert not ShoutBits.verify(bad, table.entries, vp)
        bad = copy.deepcopy(sproof)
        bad.check.final_evaluation = Fr(
            int(bad.check.final_evaluation) + 1
        )
        assert not ShoutBits.verify(bad, table.entries, vp)

    def test_wrong_table_rejected(self, sproof, table, params):
        from tnsh.protocols.twist_bits import ShoutBits

        _, vp = params
        wrong = [Fr(int(e) + 1) for e in table.entries]
        assert not ShoutBits.verify(sproof, wrong, vp)


def test_wire_v3_golden_digests(proof, params):
    """Freeze the v3 wire bytes: any change to the transcript labels,
    challenge schedule, term order, or serialization layout shows up
    here.  Deliberate protocol changes must re-freeze (and bump the wire
    version)."""
    import hashlib

    from tnsh.core.proof_io import (
        shout_bits_proof_to_bytes,
        twist_bits_proof_to_bytes,
    )
    from tnsh.protocols.shout import LookupTable
    from tnsh.protocols.twist_bits import ShoutBits

    b = twist_bits_proof_to_bytes(proof)
    assert (len(b), hashlib.sha256(b).hexdigest()) == (
        4856,
        "948e0609dd4a33266972f0cce3e6dc2d8ae8a10b38d448f70ab2cbc1322cffed",
    )
    pp, _ = params
    random.seed(99)
    t = LookupTable([Fr(i * i + 3) for i in range(1 << LOG_K)])
    for _ in range(1 << LOG_T):
        t.lookup(random.randrange(1 << LOG_K))
    b2 = shout_bits_proof_to_bytes(ShoutBits.prove(t, pp))
    assert (len(b2), hashlib.sha256(b2).hexdigest()) == (
        2344,
        "689c1c848809eb688a42f4301a0b269b48d77dbfa0900123cf1679017b1a9dca",
    )


def test_jax_oracle_identical_proofs():
    """JaxSopOracleD (device generic-degree rounds) must produce
    bit-identical proofs to the pure-Python DenseSopOracleD."""
    from tnsh.core.transcript import Transcript
    from tnsh.iop.sumcheck_d import (
        DenseSopOracleD,
        JaxSopOracleD,
        SumCheckD,
    )

    random.seed(55)
    n = 7
    size = 1 << n
    t1 = [random.randrange(MODULUS) for _ in range(size)]
    t2 = [random.randrange(2) for _ in range(size)]
    t3 = [random.randrange(MODULUS) for _ in range(size)]
    terms = [(3, [t1, t2, t3, t1, t2]), (MODULUS - 5, [t2, t3]),
             (7, [t1])]
    claim = DenseSopOracleD(n, terms).hypercube_sum()
    seed = bytes([13]) * 32
    degree = 5
    p_host, _ = SumCheckD(n, claim, degree).prove_with_challenges(
        DenseSopOracleD(n, terms, degree=degree), Transcript(seed)
    )
    p_jax, _ = SumCheckD(n, claim, degree).prove_with_challenges(
        JaxSopOracleD(n, terms, degree=degree), Transcript(seed)
    )
    assert [[int(c) for c in rp] for rp in p_host.round_polynomials] == [
        [int(c) for c in rp] for rp in p_jax.round_polynomials
    ]
    assert int(p_host.final_evaluation) == int(p_jax.final_evaluation)
    ok, _ = SumCheckD(n, claim, degree).verify(p_jax, Transcript(seed))
    assert ok


def test_jax_oracle_twist_shaped_rounds_match():
    """Device vs Python generic-degree oracle on a TwistBits-SHAPED term
    structure (many shared tables, a degree-6 product, boolean columns):
    round evaluations and post-bind evaluations must agree exactly.

    Two rounds only — each round shape costs a fresh XLA compile of the
    wide kernel (a full forced-device prove was measured at 443 s of
    compiles for zero extra coverage; exact arithmetic makes per-round
    equality sufficient)."""
    from tnsh.iop.sumcheck_d import DenseSopOracleD, JaxSopOracleD

    random.seed(321)
    n = 6
    size = 1 << n
    rnd = lambda: [random.randrange(MODULUS) for _ in range(size)]
    bit = lambda: [random.randrange(2) for _ in range(size)]
    eq1, eqs, eqb, v, rv = rnd(), rnd(), rnd(), rnd(), rnd()
    b1, b2, b3, ot = bit(), bit(), bit(), bit()
    terms = [
        (1, [eq1, ot, b1, b2, b3, v]),          # degree-6 read-like term
        (MODULUS - 7, [eq1, rv]),
        (11, [eqs, ot, b1, b2, b3, rv]),
        (13, [eqb, b1, b1]), (MODULUS - 13, [eqb, b1]),
        (17, [eqb, ot, ot]), (MODULUS - 17, [eqb, ot]),
    ]
    degree = 7
    o_py = DenseSopOracleD(n, terms, degree=degree)
    o_jx = JaxSopOracleD(n, terms, degree=degree)
    for rd in range(2):
        e_py = o_py.round_evaluations(rd)
        e_jx = o_jx.round_evaluations(rd)
        assert [int(x) for x in e_py] == [int(x) for x in e_jx]
        c = Fr(0xABCDEF0 + rd)
        o_py.bind(c)
        o_jx.bind(c)
    assert int(o_py.final_evaluation([])) == int(o_jx.final_evaluation([]))


def test_shout_bits_sparse_oracle_identical_proofs():
    """The structured O(T logK) oracle (no cube ever built) must produce
    bit-identical sum-check proofs to the dense generic-degree oracle on
    the exact ShoutBits phase-A term system."""
    from tnsh.core.transcript import Transcript
    from tnsh.iop.bits_oracle import ShoutBitsSparseOracle
    from tnsh.iop.sumcheck_d import DenseSopOracleD, SumCheckD
    from tnsh.poly.eq import eq_table
    from tnsh.protocols.sound import _kinv, _lift_j
    from tnsh.protocols.twist_bits import _chi_cube

    random.seed(777)
    log_k, log_t = 4, 6
    k_size, t_size = 1 << log_k, 1 << log_t
    n = log_k + log_t
    entries = [random.randrange(MODULUS) for _ in range(k_size)]
    rb = [[random.randrange(2) for _ in range(t_size)]
          for _ in range(log_k)]
    rv = [random.randrange(MODULUS) for _ in range(t_size)]
    rho1 = [Fr(random.randrange(MODULUS)) for _ in range(log_t)]
    rhob = [Fr(random.randrange(MODULUS)) for _ in range(log_t)]
    a = random.randrange(MODULUS)
    kinv = _kinv(log_k)
    eq1 = eq_table(rho1)
    eqb = eq_table(rhob)
    degree = log_k + 2

    # dense cube construction (the TNSH_BITS_DENSE cross-check path;
    # the DEFAULT prover uses the structured oracles)
    eq1_l = _lift_j(eq1, k_size)
    eqb_l = _lift_j(eqb, k_size)
    rv_l = _lift_j(rv, k_size)
    tab_l = list(entries) * t_size
    chi_r = [_chi_cube(rb[i], k_size, i) for i in range(log_k)]
    rb_l = [_lift_j(c, k_size) for c in rb]
    dense_terms = [
        (1, [eq1_l] + chi_r + [tab_l]),
        (MODULUS - kinv, [eq1_l, rv_l]),
    ]
    sparse_terms = [
        (1, [eq1], rb, entries),
        (MODULUS - kinv, [eq1, rv], None, None),
    ]
    w = a
    for i in range(log_k):
        dense_terms.append((w * kinv % MODULUS, [eqb_l, rb_l[i], rb_l[i]]))
        dense_terms.append(
            ((MODULUS - w) * kinv % MODULUS, [eqb_l, rb_l[i]])
        )
        sparse_terms.append(
            (w * kinv % MODULUS, [eqb, rb[i], rb[i]], None, None)
        )
        sparse_terms.append(
            ((MODULUS - w) * kinv % MODULUS, [eqb, rb[i]], None, None)
        )
        w = w * a % MODULUS

    claim = DenseSopOracleD(n, dense_terms, degree=degree).hypercube_sum()
    seed = bytes([21]) * 32
    p_dense, r1 = SumCheckD(n, claim, degree).prove_with_challenges(
        DenseSopOracleD(n, dense_terms, degree=degree), Transcript(seed)
    )
    p_sparse, r2 = SumCheckD(n, claim, degree).prove_with_challenges(
        ShoutBitsSparseOracle(log_k, log_t, sparse_terms, degree),
        Transcript(seed),
    )
    assert [[int(c) for c in rp] for rp in p_dense.round_polynomials] == [
        [int(c) for c in rp] for rp in p_sparse.round_polynomials
    ]
    assert int(p_dense.final_evaluation) == int(p_sparse.final_evaluation)
    assert [int(x) for x in r1] == [int(x) for x in r2]
    ok, _ = SumCheckD(n, claim, degree).verify(p_sparse, Transcript(seed))
    assert ok


def test_generic_degree_sumcheck_engine():
    """SumCheckD round-trips an explicit high-degree sum of products."""
    from tnsh.core.transcript import Transcript
    from tnsh.iop.sumcheck_d import DenseSopOracleD, SumCheckD

    random.seed(77)
    n = 5
    size = 1 << n
    t1 = [random.randrange(MODULUS) for _ in range(size)]
    t2 = [random.randrange(2) for _ in range(size)]
    t3 = [random.randrange(MODULUS) for _ in range(size)]
    terms = [(3, [t1, t2, t3, t1, t2]), (MODULUS - 5, [t2, t3])]
    oracle = DenseSopOracleD(n, terms)
    claim = oracle.hypercube_sum()
    oracle = DenseSopOracleD(n, terms)  # fresh (bind mutates)
    seed = bytes([9]) * 32
    proof, r = SumCheckD(n, claim, oracle.degree).prove_with_challenges(
        oracle, Transcript(seed)
    )
    ok, r_v = SumCheckD(n, claim, proof.degree).verify(
        proof, Transcript(seed)
    )
    assert ok and [int(x) for x in r] == [int(x) for x in r_v]
    # wrong claim fails
    ok, _ = SumCheckD(n, claim + Fr(1), proof.degree).verify(
        proof, Transcript(seed)
    )
    assert not ok


def _trace_from_ops(k, ops):
    tr = MemoryTrace(k)
    for kind, addr, val in ops:
        if kind == "w":
            tr.write(addr, Fr(val))
        else:
            tr.read(addr)
    return tr


def _adversarial_traces():
    """Shape matrix for the structured-oracle identity + edge tests:
    write-only, read-only, overwrite-heavy, K=2, T=1 (log_t=0), empty
    trace, duplicate-heavy addresses, at-power-of-two op counts."""
    random.seed(4242)
    shapes = []
    k = 1 << LOG_K
    shapes.append(("write_only", k, [("w", i % k, 7 + i) for i in range(16)]))
    shapes.append(("read_only", k, [("r", i % k, 0) for i in range(16)]))
    shapes.append((
        "overwrite_heavy", k,
        [("w", 3, 100 + i) for i in range(12)] + [("r", 3, 0)] * 4,
    ))
    shapes.append(("k2_mixed", 2, [
        ("w", 0, 5), ("r", 0, 0), ("w", 1, 9), ("r", 1, 0),
        ("w", 0, 11), ("r", 0, 0), ("r", 1, 0), ("w", 1, 13),
    ]))
    shapes.append(("single_write", k, [("w", 2, 77)]))
    shapes.append(("single_read", k, [("r", 0, 0)]))
    shapes.append(("empty", k, []))
    shapes.append((
        "dup_heavy", k,
        [("w" if i % 2 else "r", (i * i) % 2, 50 + i) for i in range(32)],
    ))
    mixed = []
    for i in range(64):
        if random.random() < 0.4:
            mixed.append(("w", random.randrange(k),
                          random.randrange(1 << 40)))
        else:
            mixed.append(("r", random.randrange(k), 0))
    shapes.append(("mixed_64", k, mixed))
    return shapes


@pytest.mark.parametrize(
    "name,k,ops", _adversarial_traces(), ids=[s[0] for s in _adversarial_traces()]
)
def test_twist_bits_structured_equals_dense(name, k, ops, params,
                                            monkeypatch):
    """Direct dense == structured-Python == structured-native bit-identity
    for the TwistBits prover (VERDICT r4 task 3 + the edge-shape matrix of
    task 8): the structured O(T logK) oracle (tnsh.iop.bits_oracle.
    TwistBitsSparseOracle) and its native twin (tnsh_native.cpp tbk_*)
    must reproduce the dense cube oracle's proof BYTES on every shape —
    including T=1 (log_t = 0) and K=2."""
    import hashlib

    from tnsh.core.proof_io import twist_bits_proof_to_bytes

    pp, vp = params
    tr = _trace_from_ops(k, ops)
    digests = {}
    for label, env in (
        ("dense", {"TNSH_BITS_DENSE": "1"}),
        ("structured_py", {"TNSH_NO_NATIVE": "1"}),
        ("structured_native", {}),
    ):
        for var in ("TNSH_BITS_DENSE", "TNSH_NO_NATIVE"):
            monkeypatch.delenv(var, raising=False)
        for var, val in env.items():
            monkeypatch.setenv(var, val)
        proof = TwistBits.prove(_trace_from_ops(k, ops), pp)
        assert TwistBits.verify(proof, vp), (name, label)
        digests[label] = hashlib.sha256(
            twist_bits_proof_to_bytes(proof)
        ).hexdigest()
    assert digests["dense"] == digests["structured_py"], name
    assert digests["dense"] == digests["structured_native"], name


@pytest.mark.parametrize("nk,nt", [(1, 0), (1, 3), (3, 0), (4, 2)])
def test_shout_bits_edge_shapes(nk, nt, params, monkeypatch):
    """ShoutBits on edge shapes (K=2, single/empty lookup logs): dense ==
    structured-Python == structured-native proof bytes, verifying."""
    import hashlib

    from tnsh.core.proof_io import shout_bits_proof_to_bytes
    from tnsh.protocols.shout import LookupTable
    from tnsh.protocols.twist_bits import ShoutBits

    pp, vp = params
    random.seed(9000 + nk * 10 + nt)
    k = 1 << nk
    looks = [random.randrange(k) for _ in range(max((1 << nt) - 1, 0))]

    def make_table():
        t = LookupTable([Fr(3 * i + 1) for i in range(k)])
        for ix in looks:
            t.lookup(ix)
        return t

    digests = {}
    for label, env in (
        ("dense", {"TNSH_BITS_DENSE": "1"}),
        ("structured_py", {"TNSH_NO_NATIVE": "1"}),
        ("structured_native", {}),
    ):
        for var in ("TNSH_BITS_DENSE", "TNSH_NO_NATIVE"):
            monkeypatch.delenv(var, raising=False)
        for var, val in env.items():
            monkeypatch.setenv(var, val)
        table = make_table()
        proof = ShoutBits.prove(table, pp)
        assert ShoutBits.verify(proof, table.entries, vp), label
        digests[label] = hashlib.sha256(
            shout_bits_proof_to_bytes(proof)
        ).hexdigest()
    assert len(set(digests.values())) == 1, digests


def test_native_sopd_oracle_identical_proofs():
    """NativeSopOracleD (C++ generic-degree rounds) must produce
    bit-identical proofs to the pure-Python DenseSopOracleD."""
    import tnsh._native as _native

    if not _native.available:
        pytest.skip("native library unavailable")
    from tnsh.core.transcript import Transcript
    from tnsh.iop.sumcheck_d import (
        DenseSopOracleD,
        NativeSopOracleD,
        SumCheckD,
    )

    random.seed(58)
    n = 7
    size = 1 << n
    t1 = [random.randrange(MODULUS) for _ in range(size)]
    t2 = [random.randrange(2) for _ in range(size)]
    t3 = [random.randrange(MODULUS) for _ in range(size)]
    terms = [(3, [t1, t2, t3, t1, t2]), (MODULUS - 5, [t2, t3]),
             (7, [t1])]
    claim = DenseSopOracleD(n, terms).hypercube_sum()
    seed = bytes([14]) * 32
    degree = 5
    p_host, _ = SumCheckD(n, claim, degree).prove_with_challenges(
        DenseSopOracleD(n, terms, degree=degree), Transcript(seed)
    )
    p_nat, _ = SumCheckD(n, claim, degree).prove_with_challenges(
        NativeSopOracleD(n, terms, degree=degree), Transcript(seed)
    )
    assert [[int(c) for c in rp] for rp in p_host.round_polynomials] == [
        [int(c) for c in rp] for rp in p_nat.round_polynomials
    ]
    assert int(p_host.final_evaluation) == int(p_nat.final_evaluation)
    ok, _ = SumCheckD(n, claim, degree).verify(p_nat, Transcript(seed))
    assert ok


def test_batched_column_helpers_match_python():
    """fr_rlc / fr_mle_eval_many (native batched column helpers) equal the
    pure-Python _rlc_tables / _mle_eval on random columns."""
    import tnsh._native as _native

    if not _native.available:
        pytest.skip("native library unavailable")
    from tnsh.protocols.sound import _mle_eval

    random.seed(31)
    n = 11  # >= native threshold of 1024 entries
    size = 1 << n
    cols = [[random.randrange(MODULUS) for _ in range(size)]
            for _ in range(5)]
    gamma = random.randrange(MODULUS)
    rlc_native = _native.fr_rlc(cols, gamma)
    w, expect = 1, [0] * size
    for tab in cols:
        for i, v in enumerate(tab):
            expect[i] = (expect[i] + w * v) % MODULUS
        w = w * gamma % MODULUS
    got = [
        int.from_bytes(rlc_native[32 * i:32 * i + 32], "little")
        for i in range(size)
    ]
    assert got == expect
    point = [Fr(random.randrange(MODULUS)) for _ in range(n)]
    evals = _native.fr_mle_eval_many(cols, point)
    for col, e in zip(cols, evals):
        assert int(e) == int(_mle_eval(col, point))


class TestShoutBitsCommitted:
    """Committed-table Shout (tnsh extension): O(logK + logT) verifier —
    the table enters verification as a PST commitment, not entries
    (closes VERDICT r4 weak #6)."""

    @pytest.fixture(scope="class")
    def setup(self, params):
        from tnsh.protocols.shout import LookupTable
        from tnsh.protocols.twist_bits import ShoutBitsCommitted

        pp, vp = params
        random.seed(99)
        t = LookupTable([Fr(i * i + 3) for i in range(1 << LOG_K)])
        for _ in range(1 << LOG_T):
            t.lookup(random.randrange(1 << LOG_K))
        comm = ShoutBitsCommitted.preprocess(t.entries)
        proof = ShoutBitsCommitted.prove(t, pp)
        return t, comm, proof

    def test_roundtrip(self, setup, params):
        from tnsh.protocols.twist_bits import ShoutBitsCommitted

        _, vp = params
        _, comm, proof = setup
        assert ShoutBitsCommitted.verify(proof, comm, vp)

    def test_serde_roundtrip(self, setup, params):
        from tnsh.core.proof_io import (
            shout_bits_comm_proof_from_bytes,
            shout_bits_comm_proof_to_bytes,
        )
        from tnsh.protocols.twist_bits import ShoutBitsCommitted

        _, vp = params
        _, comm, proof = setup
        data = shout_bits_comm_proof_to_bytes(proof)
        back = shout_bits_comm_proof_from_bytes(data)
        assert shout_bits_comm_proof_to_bytes(back) == data
        assert ShoutBitsCommitted.verify(back, comm, vp)

    def test_forged_table_value_rejected(self, setup, params):
        from tnsh.protocols.twist_bits import ShoutBitsCommitted

        _, vp = params
        _, comm, proof = setup
        bad = copy.deepcopy(proof)
        bad.t_value = Fr(int(bad.t_value) + 1)
        assert not ShoutBitsCommitted.verify(bad, comm, vp)

    def test_wrong_table_commitment_rejected(self, setup, params):
        from tnsh.protocols.twist_bits import ShoutBitsCommitted

        _, vp = params
        t, _, proof = setup
        wrong = ShoutBitsCommitted.preprocess(
            [Fr(int(e) + 1) for e in t.entries]
        )
        assert not ShoutBitsCommitted.verify(proof, wrong, vp)

    def test_forged_column_value_rejected(self, setup, params):
        from tnsh.protocols.twist_bits import ShoutBitsCommitted

        _, vp = params
        _, comm, proof = setup
        bad = copy.deepcopy(proof)
        bad.values_rj[LOG_K] = Fr(int(bad.values_rj[LOG_K]) + 1)
        assert not ShoutBitsCommitted.verify(bad, comm, vp)

    def test_not_replayable_as_plain_shout(self, setup, params):
        """Distinct Fiat-Shamir label domains: a committed-table proof's
        fields cannot satisfy the plain ShoutBits verifier."""
        from tnsh.protocols.twist_bits import ShoutBits, ShoutBitsProof

        _, vp = params
        t, _, proof = setup
        cast = ShoutBitsProof(
            log_table=proof.log_table,
            log_lookups=proof.log_lookups,
            column_commitments=proof.column_commitments,
            check=proof.check,
            values_rj=proof.values_rj,
            proof_rj=proof.proof_rj,
        )
        assert not ShoutBits.verify(cast, t.entries, vp)
