"""Verifier-enforced Twist/Shout — the paper-grade constraint systems.

The reference's consistency sum-checks prove "zero sums to zero"
(twist.rs:186-214, shout.rs:160-184; SURVEY caveat 1), and its univariate
KZG openings are never tied to the sum-check claim (twist.rs:219-243).
``Twist.prove(sound_mode=True)`` upgraded that to an honest-prover
self-check, but the verifier still could not reject a lying prover.

This module closes the gap: every claim a sum-check reduces to is checked
by the verifier against PST multilinear-KZG openings
(tnsh.commit.mkzg), so a forged trace/lookup log is rejected
cryptographically.  The encodings follow the Twist/Shout papers' shape —
one-hot read/write address matrices bound by booleanity + row-sum checks,
value evolution via increment bookkeeping, and a less-than ordering kernel
for the prefix sums:

Shout (read-only lookups; table is public):
  witness:  ra(k,j)  one-hot lookup-address matrix   (logK+logT vars)
            rv(j)    claimed lookup outputs           (logT vars)
  checks:   READ     rv~(rho) = sum_{k,j} eq(rho,j) ra(k,j) T~(k)
            BOOL     0 = sum eq(rho',(k,j)) ra (ra - 1)
            ONE-HOT  1 = sum eq(rho'',j) ra   (every cycle looks up once)

Twist (read-write memory):
  witness:  ra, wa   one-hot read/write address matrices
            ot       op-type column (1 = write)
            wv, rv   write-value / read-value columns
            Inc(k,j) value increment applied by cycle j to cell k
            Val(k,j) value of cell k entering cycle j
  checks:   READ     rv~(rho1)  = sum eq(rho1,j) ra Val
            VAL      Val~(tau)  = sum_{k,j'} eq(tau_k,k) lt~(j',tau_j) Inc
                     (memory starts at zero: the empty prefix sum IS 0)
            INC      0 = sum eq(sigma,(k,j)) (Inc - wa wv + wa Val)
            BOOL     ra, wa, ot boolean
            ROW-SUM  sum_k ra(k,j) = 1 - ot(j);  sum_k wa(k,j) = ot(j)

  (rv/wv gating at wrong-typed rows is implied: a write row has a zero ra
  row so READ forces rv(j) = 0, and wv only enters through wa * wv.)

Each check is one degree-<=3 sum-check (SumOfProductsOracle); the final
evaluation is recomputed by the verifier from eq/lt closed forms (O(log)
field work) and PST openings (pairing products).  All challenges come from
the same Fiat-Shamir transcript stack as the parity protocols, so proofs
are deterministic and replayable.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

from ..commit.kzg import KZGCommitmentValue
from ..commit.mkzg import (
    MLOpeningProof,
    MultilinearKZG,
    has_external_multilinear_srs,
    multilinear_verification_key,
    setup_multilinear_params,
)
from ..commit.mkzg_sparse import (
    IncrementalCubeTable,
    SparseCubeTable,
    commit_incremental,
    commit_sparse,
    cube_params,
    eq_table_ints,
    open_dense_cube,
    open_incremental,
    open_sparse,
)
from ..iop.sparse_oracle import SparseCubeOracle
from ..core.params import ProverParams, VerifierParams
from ..core.transcript import Transcript
from ..errors import InvalidParametersError
from ..field.fr import MODULUS, Fr
from ..iop.sumcheck import SumCheck, SumCheckProof, SumOfProductsOracle
from ..poly.eq import eq_eval, eq_table, lt_eval, lt_partial_table
from .shout import LookupTable
from .twist import MemoryTrace

_P = MODULUS

#: Cube sizes with at least this many variables route to the sparse prover
#: (factorized PST commits + SparseCubeOracle): identical proofs, O((K+T)
#: polylog) prover instead of O(K*T) — the dense path would also have to
#: materialize a 2^n-point SRS.
_SPARSE_MIN_VARS = 14


def _incremental_mle_eval(table: IncrementalCubeTable, point: Sequence[Fr],
                          log_k: int) -> Fr:
    """~table(point) for a column-incremental cube table, O(T log K)."""
    eqk = eq_table_ints([int(p) for p in point[:log_k]])
    eqj = eq_table_ints([int(p) for p in point[log_k:]])
    cur = 0
    acc = 0
    for j, ups in enumerate(table.updates):
        acc = (acc + eqj[j] * cur) % _P
        for k, d in ups:
            cur = (cur + d * eqk[k]) % _P
    return Fr(acc)


@dataclass
class MLOpening:
    """A claimed PST evaluation with its proof; the opening point is
    recomputed by the verifier from the transcript."""

    value: Fr
    proof: MLOpeningProof


def _next_power_of_two(n: int) -> int:
    if n <= 1:
        return 1
    return 1 << (n - 1).bit_length()


def _mle_eval(table: Sequence, point: Sequence[Fr]) -> Fr:
    """~table(point) by O(2^n) folding (little-endian variable order)."""
    import os

    if len(table) >= 1024 and point and not os.environ.get("TNSH_NO_NATIVE"):
        from .. import _native

        if _native.available:
            value, _ = _native.fr_ml_open(list(table), point)
            return value
    vals = [int(v) % _P for v in table]
    for r in point:
        ri = int(r)
        vals = [
            (vals[2 * i] + ri * (vals[2 * i + 1] - vals[2 * i])) % _P
            for i in range(len(vals) // 2)
        ]
    return Fr(vals[0])


def _lift_j(col: Sequence[int], k_size: int) -> List[int]:
    """Lift a column over j to the (k,j) cube (k fastest)."""
    out: List[int] = []
    for v in col:
        out.extend([v] * k_size)
    return out


def _lift_k(col: Sequence[int], t_size: int) -> List[int]:
    """Lift a column over k to the (k,j) cube (k fastest)."""
    return list(col) * t_size


def _open_cube_dense(params_n, log_k: int, log_t: int, table, point):
    """Open a dense (k, j) cube table: j-first factorized order under the
    deterministic SRS (~(T+K) point-ops, byte-identical to the sparse
    prover), falling back to suffix-order MultilinearKZG.open under an
    external ceremony SRS (where tau_k is unknown)."""
    if has_external_multilinear_srs(log_k + log_t):
        return MultilinearKZG.open(params_n, table, point)
    return open_dense_cube(cube_params(log_k, log_t), table, point)


# ===========================================================================
# Shout
# ===========================================================================

@dataclass
class ShoutSoundProof:
    log_table: int
    log_lookups: int
    ra_commitment: KZGCommitmentValue
    rv_commitment: KZGCommitmentValue
    read_check: SumCheckProof
    bool_check: SumCheckProof
    onehot_check: SumCheckProof
    rv_at_rho: MLOpening
    ra_at_read: MLOpening
    ra_at_bool: MLOpening
    ra_at_onehot: MLOpening


class ShoutSound:
    """Verifier-enforced Shout: binding lookup argument against a public
    table (contrast reference shout.rs:160-184, whose closure is zero)."""

    @staticmethod
    def prove(table: LookupTable, prover_params: ProverParams,
              sparse: Optional[bool] = None) -> ShoutSoundProof:
        entries = [int(e) for e in table.entries]
        if not entries:
            raise InvalidParametersError("Sound Shout needs a non-empty table")
        k_size = _next_power_of_two(len(entries))
        entries = entries + [0] * (k_size - len(entries))
        ops = list(table.lookups)
        t_size = _next_power_of_two(max(len(ops), 1))
        log_k = k_size.bit_length() - 1
        log_t = t_size.bit_length() - 1
        n = log_k + log_t
        if sparse is None:
            sparse = (n >= _SPARSE_MIN_VARS
                      and not has_external_multilinear_srs(n))
        if sparse:
            return ShoutSound._prove_sparse(
                entries, ops, log_k, log_t, prover_params
            )

        ra = [0] * (k_size * t_size)
        rv = [0] * t_size
        for j in range(t_size):
            if j < len(ops):
                idx, val = ops[j].index, int(ops[j].value)
            else:
                idx, val = 0, entries[0]  # padding: look up slot 0
            ra[j * k_size + idx] = 1
            rv[j] = val

        params_n, _ = setup_multilinear_params(n)
        params_t, _ = setup_multilinear_params(log_t)
        c_ra = MultilinearKZG.commit(params_n, ra)
        c_rv = MultilinearKZG.commit(params_t, rv)

        transcript = Transcript(prover_params.fiat_shamir_seed)
        _shout_bind_statement(transcript, log_k, log_t, entries, c_ra, c_rv)

        # READ: rv~(rho) = sum_{k,j} eq(rho,j) ra(k,j) table~(k)
        rho_read = transcript.challenge_field_elements(b"ssound_rho_read", log_t)
        claimed_read = _mle_eval(rv, rho_read)
        eq_j = _lift_j(eq_table(rho_read), k_size)
        tab_k = _lift_k(entries, t_size)
        oracle = SumOfProductsOracle(n, [(1, [eq_j, ra, tab_k])])
        read_proof, r1 = SumCheck(n, claimed_read).prove_with_challenges(
            oracle, transcript
        )

        # BOOL: 0 = sum eq(rho',(k,j)) ra (ra - 1)
        rho_bool = transcript.challenge_field_elements(b"ssound_rho_bool", n)
        eq_b = eq_table(rho_bool)
        oracle = SumOfProductsOracle(
            n, [(1, [eq_b, ra, ra]), (_P - 1, [eq_b, ra])]
        )
        bool_proof, r2 = SumCheck(n, Fr(0)).prove_with_challenges(
            oracle, transcript
        )

        # ONE-HOT: 1 = sum eq(rho'',j) ra
        rho_one = transcript.challenge_field_elements(b"ssound_rho_onehot", log_t)
        eq_o = _lift_j(eq_table(rho_one), k_size)
        oracle = SumOfProductsOracle(n, [(1, [eq_o, ra])])
        onehot_proof, r3 = SumCheck(n, Fr(1)).prove_with_challenges(
            oracle, transcript
        )

        rv_val, rv_open = MultilinearKZG.open(params_t, rv, rho_read)
        ra1_val, ra1_open = _open_cube_dense(params_n, log_k, log_t, ra, r1)
        ra2_val, ra2_open = _open_cube_dense(params_n, log_k, log_t, ra, r2)
        ra3_val, ra3_open = _open_cube_dense(params_n, log_k, log_t, ra, r3)

        return ShoutSoundProof(
            log_table=log_k,
            log_lookups=log_t,
            ra_commitment=c_ra,
            rv_commitment=c_rv,
            read_check=read_proof,
            bool_check=bool_proof,
            onehot_check=onehot_proof,
            rv_at_rho=MLOpening(rv_val, rv_open),
            ra_at_read=MLOpening(ra1_val, ra1_open),
            ra_at_bool=MLOpening(ra2_val, ra2_open),
            ra_at_onehot=MLOpening(ra3_val, ra3_open),
        )

    @staticmethod
    def _prove_sparse(entries, ops, log_k: int, log_t: int,
                      prover_params: ProverParams) -> ShoutSoundProof:
        """Sparse prover: identical proof bytes to the dense path, but
        O(T + K) memory and O((K + T) polylog) work — commits are T-point
        MSMs over the factorized cube SRS (tnsh.commit.mkzg_sparse) and
        the sum-checks run on SparseCubeOracle."""
        if has_external_multilinear_srs(log_k + log_t):
            raise InvalidParametersError(
                "sparse sound proving needs the deterministic factorized "
                "SRS (tau_k); an external ceremony SRS is installed for "
                "this variable count — use the dense prover (sparse=False)"
            )
        k_size, t_size = 1 << log_k, 1 << log_t
        n = log_k + log_t
        ra = SparseCubeTable(log_k, log_t)
        rv = [0] * t_size
        for j in range(t_size):
            if j < len(ops):
                idx, val = ops[j].index, int(ops[j].value)
            else:
                idx, val = 0, entries[0]
            ra.set(j, idx, 1)
            rv[j] = val

        cp = cube_params(log_k, log_t)
        params_t, _ = setup_multilinear_params(log_t)
        c_ra = commit_sparse(cp, ra)
        c_rv = MultilinearKZG.commit(params_t, rv)

        transcript = Transcript(prover_params.fiat_shamir_seed)
        _shout_bind_statement(transcript, log_k, log_t, entries, c_ra, c_rv)

        rho_read = transcript.challenge_field_elements(b"ssound_rho_read", log_t)
        claimed_read = _mle_eval(rv, rho_read)
        oracle = SparseCubeOracle(log_k, log_t, [
            (1, [("eqj", eq_table(rho_read)), ("colsparse", ra),
                 ("eqk", entries)]),
        ])
        read_proof, r1 = SumCheck(n, claimed_read).prove_with_challenges(
            oracle, transcript
        )

        rho_bool = transcript.challenge_field_elements(b"ssound_rho_bool", n)
        ek = eq_table(rho_bool[:log_k])
        ej = eq_table(rho_bool[log_k:])
        oracle = SparseCubeOracle(log_k, log_t, [
            (1, [("eqk", ek), ("eqj", ej), ("colsparse", ra),
                 ("colsparse", ra)]),
            (_P - 1, [("eqk", ek), ("eqj", ej), ("colsparse", ra)]),
        ])
        bool_proof, r2 = SumCheck(n, Fr(0)).prove_with_challenges(
            oracle, transcript
        )

        rho_one = transcript.challenge_field_elements(b"ssound_rho_onehot", log_t)
        oracle = SparseCubeOracle(log_k, log_t, [
            (1, [("eqj", eq_table(rho_one)), ("colsparse", ra)]),
        ])
        onehot_proof, r3 = SumCheck(n, Fr(1)).prove_with_challenges(
            oracle, transcript
        )

        rv_val, rv_open = MultilinearKZG.open(params_t, rv, rho_read)
        ra1_val, ra1_open = open_sparse(cp, ra, r1)
        ra2_val, ra2_open = open_sparse(cp, ra, r2)
        ra3_val, ra3_open = open_sparse(cp, ra, r3)

        return ShoutSoundProof(
            log_table=log_k,
            log_lookups=log_t,
            ra_commitment=c_ra,
            rv_commitment=c_rv,
            read_check=read_proof,
            bool_check=bool_proof,
            onehot_check=onehot_proof,
            rv_at_rho=MLOpening(rv_val, rv_open),
            ra_at_read=MLOpening(ra1_val, ra1_open),
            ra_at_bool=MLOpening(ra2_val, ra2_open),
            ra_at_onehot=MLOpening(ra3_val, ra3_open),
        )

    @staticmethod
    def verify(
        proof: ShoutSoundProof,
        table_entries: Sequence[Fr],
        verifier_params: VerifierParams,
    ) -> bool:
        log_k, log_t = proof.log_table, proof.log_lookups
        n = log_k + log_t
        entries = [int(e) for e in table_entries]
        k_size = 1 << log_k
        if not entries or _next_power_of_two(len(entries)) != k_size:
            return False
        entries = entries + [0] * (k_size - len(entries))

        transcript = Transcript(verifier_params.fiat_shamir_seed)
        _shout_bind_statement(
            transcript, log_k, log_t, entries,
            proof.ra_commitment, proof.rv_commitment,
        )

        rho_read = transcript.challenge_field_elements(b"ssound_rho_read", log_t)
        claimed_read = proof.rv_at_rho.value
        ok, r1 = SumCheck(n, claimed_read).verify(proof.read_check, transcript)
        if not ok:
            return False

        rho_bool = transcript.challenge_field_elements(b"ssound_rho_bool", n)
        ok, r2 = SumCheck(n, Fr(0)).verify(proof.bool_check, transcript)
        if not ok:
            return False

        rho_one = transcript.challenge_field_elements(b"ssound_rho_onehot", log_t)
        ok, r3 = SumCheck(n, Fr(1)).verify(proof.onehot_check, transcript)
        if not ok:
            return False

        # Final-evaluation equations (the binding the reference lacks).
        ra1, ra2, ra3 = (
            proof.ra_at_read.value,
            proof.ra_at_bool.value,
            proof.ra_at_onehot.value,
        )
        want_read = (
            int(eq_eval(rho_read, r1[log_k:]))
            * int(ra1) % _P
            * int(_mle_eval(entries, r1[:log_k])) % _P
        )
        if int(proof.read_check.final_evaluation) != want_read:
            return False
        want_bool = (
            int(eq_eval(rho_bool, r2)) * int(ra2) % _P * ((int(ra2) - 1) % _P) % _P
        )
        if int(proof.bool_check.final_evaluation) != want_bool:
            return False
        want_one = int(eq_eval(rho_one, r3[log_k:])) * int(ra3) % _P
        if int(proof.onehot_check.final_evaluation) != want_one:
            return False

        from ..commit.mkzg import batch_verify_openings

        vk_n = multilinear_verification_key(n)
        vk_t = multilinear_verification_key(log_t)
        return batch_verify_openings([
            (vk_t, proof.rv_commitment, rho_read,
             proof.rv_at_rho.value, proof.rv_at_rho.proof),
            (vk_n, proof.ra_commitment, r1,
             proof.ra_at_read.value, proof.ra_at_read.proof),
            (vk_n, proof.ra_commitment, r2,
             proof.ra_at_bool.value, proof.ra_at_bool.proof),
            (vk_n, proof.ra_commitment, r3,
             proof.ra_at_onehot.value, proof.ra_at_onehot.proof),
        ])


def _shout_bind_statement(
    transcript: Transcript,
    log_k: int,
    log_t: int,
    entries: Sequence[int],
    c_ra: KZGCommitmentValue,
    c_rv: KZGCommitmentValue,
) -> None:
    transcript.append_field_element(b"ssound_log_table", Fr(log_k))
    transcript.append_field_element(b"ssound_log_lookups", Fr(log_t))
    transcript.append_field_elements(
        b"ssound_table", [Fr(e) for e in entries]
    )
    transcript.append_field_element(b"ssound_ra_commitment", c_ra.hash())
    transcript.append_field_element(b"ssound_rv_commitment", c_rv.hash())


# ===========================================================================
# Twist
# ===========================================================================

@dataclass
class TwistSoundProof:
    log_memory: int
    log_ops: int
    ra_commitment: KZGCommitmentValue
    wa_commitment: KZGCommitmentValue
    inc_commitment: KZGCommitmentValue
    val_commitment: KZGCommitmentValue
    ot_commitment: KZGCommitmentValue
    rv_commitment: KZGCommitmentValue
    wv_commitment: KZGCommitmentValue
    read_check: SumCheckProof
    val_check: SumCheckProof
    inc_check: SumCheckProof
    bool_ra_check: SumCheckProof
    bool_wa_check: SumCheckProof
    bool_ot_check: SumCheckProof
    rowsum_ra_check: SumCheckProof
    rowsum_wa_check: SumCheckProof
    #: openings, in verification order (see _twist_openings_spec)
    openings: List[MLOpening]


class TwistSound:
    """Verifier-enforced Twist: binding read-write memory checking
    (contrast reference twist.rs:186-214, whose closure is zero)."""

    @staticmethod
    def prove(trace: MemoryTrace, prover_params: ProverParams,
              sparse: Optional[bool] = None) -> TwistSoundProof:
        k_size = trace.memory_size
        log_k = k_size.bit_length() - 1
        ops = list(trace.operations)
        t_size = _next_power_of_two(max(len(ops), 1))
        log_t = t_size.bit_length() - 1
        n = log_k + log_t
        if sparse is None:
            sparse = (n >= _SPARSE_MIN_VARS
                      and not has_external_multilinear_srs(n))
        if sparse:
            return TwistSound._prove_sparse(
                trace, ops, log_k, log_t, prover_params
            )

        # --- build witness tables by honest simulation -------------------
        ra = [0] * (k_size * t_size)
        wa = [0] * (k_size * t_size)
        inc = [0] * (k_size * t_size)
        val = [0] * (k_size * t_size)
        ot = [0] * t_size
        rv = [0] * t_size
        wv = [0] * t_size
        mem = [0] * k_size
        for j in range(t_size):
            for k in range(k_size):
                val[j * k_size + k] = mem[k]
            if j < len(ops):
                op = ops[j]
                a = op.address
                if op.is_write:
                    v = int(op.value) % _P
                    ot[j] = 1
                    wa[j * k_size + a] = 1
                    wv[j] = v
                    inc[j * k_size + a] = (v - mem[a]) % _P
                    mem[a] = v
                else:
                    ra[j * k_size + a] = 1
                    rv[j] = mem[a]
            else:
                # padding rows read cell 0 (ot = 0, no state change)
                ra[j * k_size] = 1
                rv[j] = mem[0]

        params_n, _ = setup_multilinear_params(n)
        params_t, _ = setup_multilinear_params(log_t)
        c_ra = MultilinearKZG.commit(params_n, ra)
        c_wa = MultilinearKZG.commit(params_n, wa)
        c_inc = MultilinearKZG.commit(params_n, inc)
        c_val = MultilinearKZG.commit(params_n, val)
        c_ot = MultilinearKZG.commit(params_t, ot)
        c_rv = MultilinearKZG.commit(params_t, rv)
        c_wv = MultilinearKZG.commit(params_t, wv)

        transcript = Transcript(prover_params.fiat_shamir_seed)
        _twist_bind_statement(
            transcript, log_k, log_t,
            c_ra, c_wa, c_inc, c_val, c_ot, c_rv, c_wv,
        )

        proofs = {}
        points = {}

        # READ: rv~(rho1) = sum eq(rho1,j) ra Val
        rho1 = transcript.challenge_field_elements(b"tsound_rho_read", log_t)
        eq1 = _lift_j(eq_table(rho1), k_size)
        oracle = SumOfProductsOracle(n, [(1, [eq1, ra, val])])
        proofs["read"], points["read"] = SumCheck(
            n, _mle_eval(rv, rho1)
        ).prove_with_challenges(oracle, transcript)

        # VAL: Val~(tau) = sum_{k,j'} eq(tau_k,k) lt~(j',tau_j) Inc(k,j')
        tau = transcript.challenge_field_elements(b"tsound_tau", n)
        tau_k, tau_j = tau[:log_k], tau[log_k:]
        eq_tk = _lift_k(eq_table(tau_k), t_size)
        lt_tj = _lift_j(lt_partial_table(log_t, tau_j), k_size)
        oracle = SumOfProductsOracle(n, [(1, [eq_tk, lt_tj, inc])])
        proofs["val"], points["val"] = SumCheck(
            n, _mle_eval(val, tau)
        ).prove_with_challenges(oracle, transcript)

        # INC: 0 = sum eq(sigma,(k,j)) (Inc - wa wv + wa Val)
        sigma = transcript.challenge_field_elements(b"tsound_sigma", n)
        eq_s = eq_table(sigma)
        wv_l = _lift_j(wv, k_size)
        oracle = SumOfProductsOracle(
            n,
            [
                (1, [eq_s, inc]),
                (_P - 1, [eq_s, wa, wv_l]),
                (1, [eq_s, wa, val]),
            ],
        )
        proofs["inc"], points["inc"] = SumCheck(
            n, Fr(0)
        ).prove_with_challenges(oracle, transcript)

        # BOOL ra / wa / ot
        for name, tab, vars_, lbl in (
            ("bool_ra", ra, n, b"tsound_rho_bool_ra"),
            ("bool_wa", wa, n, b"tsound_rho_bool_wa"),
            ("bool_ot", ot, log_t, b"tsound_rho_bool_ot"),
        ):
            rho = transcript.challenge_field_elements(lbl, vars_)
            eq_r = eq_table(rho)
            oracle = SumOfProductsOracle(
                vars_, [(1, [eq_r, tab, tab]), (_P - 1, [eq_r, tab])]
            )
            proofs[name], points[name] = SumCheck(
                vars_, Fr(0)
            ).prove_with_challenges(oracle, transcript)

        # ROW-SUM: sum_k ra(k,j) = 1 - ot(j);  sum_k wa(k,j) = ot(j)
        rho7 = transcript.challenge_field_elements(b"tsound_rho_rowsum_ra", log_t)
        eq7 = _lift_j(eq_table(rho7), k_size)
        oracle = SumOfProductsOracle(n, [(1, [eq7, ra])])
        claimed = Fr((1 - int(_mle_eval(ot, rho7))) % _P)
        proofs["rowsum_ra"], points["rowsum_ra"] = SumCheck(
            n, claimed
        ).prove_with_challenges(oracle, transcript)

        rho8 = transcript.challenge_field_elements(b"tsound_rho_rowsum_wa", log_t)
        eq8 = _lift_j(eq_table(rho8), k_size)
        oracle = SumOfProductsOracle(n, [(1, [eq8, wa])])
        proofs["rowsum_wa"], points["rowsum_wa"] = SumCheck(
            n, _mle_eval(ot, rho8)
        ).prove_with_challenges(oracle, transcript)

        # --- openings -----------------------------------------------------
        spec = _twist_openings_spec(
            points, rho1, tau, rho7, rho8, log_k
        )
        cube_tables = {"ra": ra, "wa": wa, "inc": inc, "val": val}
        t_tables = {"ot": ot, "rv": rv, "wv": wv}
        openings = []
        for name, point in spec:
            if name in cube_tables:
                v, pi = _open_cube_dense(
                    params_n, log_k, log_t, cube_tables[name], point
                )
            else:
                v, pi = MultilinearKZG.open(params_t, t_tables[name], point)
            openings.append(MLOpening(v, pi))

        return TwistSoundProof(
            log_memory=log_k,
            log_ops=log_t,
            ra_commitment=c_ra,
            wa_commitment=c_wa,
            inc_commitment=c_inc,
            val_commitment=c_val,
            ot_commitment=c_ot,
            rv_commitment=c_rv,
            wv_commitment=c_wv,
            read_check=proofs["read"],
            val_check=proofs["val"],
            inc_check=proofs["inc"],
            bool_ra_check=proofs["bool_ra"],
            bool_wa_check=proofs["bool_wa"],
            bool_ot_check=proofs["bool_ot"],
            rowsum_ra_check=proofs["rowsum_ra"],
            rowsum_wa_check=proofs["rowsum_wa"],
            openings=openings,
        )

    @staticmethod
    def _prove_sparse(trace: MemoryTrace, ops, log_k: int, log_t: int,
                      prover_params: ProverParams) -> TwistSoundProof:
        """Sparse prover: identical proof bytes to the dense path with
        O(T + K) memory — ra/wa/inc are column-sparse one-hots, Val is
        column-incremental (one write per cycle), commits/opens ride the
        factorized cube SRS, and every cube sum-check runs on
        SparseCubeOracle (VERDICT round-1 item 5)."""
        if has_external_multilinear_srs(log_k + log_t):
            raise InvalidParametersError(
                "sparse sound proving needs the deterministic factorized "
                "SRS (tau_k); an external ceremony SRS is installed for "
                "this variable count — use the dense prover (sparse=False)"
            )
        k_size, t_size = 1 << log_k, 1 << log_t
        n = log_k + log_t
        ra = SparseCubeTable(log_k, log_t)
        wa = SparseCubeTable(log_k, log_t)
        inc = SparseCubeTable(log_k, log_t)
        val = IncrementalCubeTable(log_k, log_t)
        ot = [0] * t_size
        rv = [0] * t_size
        wv = [0] * t_size
        mem = [0] * k_size
        for j in range(t_size):
            if j < len(ops):
                op = ops[j]
                a = op.address
                if op.is_write:
                    v = int(op.value) % _P
                    ot[j] = 1
                    wa.set(j, a, 1)
                    wv[j] = v
                    delta = (v - mem[a]) % _P
                    inc.set(j, a, delta)
                    val.add_update(j, a, delta)
                    mem[a] = v
                else:
                    ra.set(j, a, 1)
                    rv[j] = mem[a]
            else:
                ra.set(j, 0, 1)
                rv[j] = mem[0]

        cp = cube_params(log_k, log_t)
        params_t, _ = setup_multilinear_params(log_t)
        c_ra = commit_sparse(cp, ra)
        c_wa = commit_sparse(cp, wa)
        c_inc = commit_sparse(cp, inc)
        c_val = commit_incremental(cp, val)
        c_ot = MultilinearKZG.commit(params_t, ot)
        c_rv = MultilinearKZG.commit(params_t, rv)
        c_wv = MultilinearKZG.commit(params_t, wv)

        transcript = Transcript(prover_params.fiat_shamir_seed)
        _twist_bind_statement(
            transcript, log_k, log_t,
            c_ra, c_wa, c_inc, c_val, c_ot, c_rv, c_wv,
        )

        proofs = {}
        points = {}

        # READ: rv~(rho1) = sum eq(rho1,j) ra Val
        rho1 = transcript.challenge_field_elements(b"tsound_rho_read", log_t)
        oracle = SparseCubeOracle(log_k, log_t, [
            (1, [("eqj", eq_table(rho1)), ("colsparse", ra),
                 ("colinc", val)]),
        ])
        proofs["read"], points["read"] = SumCheck(
            n, _mle_eval(rv, rho1)
        ).prove_with_challenges(oracle, transcript)

        # VAL: Val~(tau) = sum eq(tau_k,k) lt~(j',tau_j) Inc(k,j')
        tau = transcript.challenge_field_elements(b"tsound_tau", n)
        tau_k, tau_j = tau[:log_k], tau[log_k:]
        oracle = SparseCubeOracle(log_k, log_t, [
            (1, [("eqk", eq_table(tau_k)),
                 ("eqj", lt_partial_table(log_t, tau_j)),
                 ("colsparse", inc)]),
        ])
        proofs["val"], points["val"] = SumCheck(
            n, _incremental_mle_eval(val, tau, log_k)
        ).prove_with_challenges(oracle, transcript)

        # INC: 0 = sum eq(sigma,(k,j)) (Inc - wa wv + wa Val)
        sigma = transcript.challenge_field_elements(b"tsound_sigma", n)
        ek_s = eq_table(sigma[:log_k])
        ej_s = eq_table(sigma[log_k:])
        oracle = SparseCubeOracle(log_k, log_t, [
            (1, [("eqk", ek_s), ("eqj", ej_s), ("colsparse", inc)]),
            (_P - 1, [("eqk", ek_s), ("eqj", ej_s), ("eqj", wv),
                      ("colsparse", wa)]),
            (1, [("eqk", ek_s), ("eqj", ej_s), ("colsparse", wa),
                 ("colinc", val)]),
        ])
        proofs["inc"], points["inc"] = SumCheck(
            n, Fr(0)
        ).prove_with_challenges(oracle, transcript)

        # BOOL ra / wa (cube) and ot (time column)
        for name, tab, lbl in (
            ("bool_ra", ra, b"tsound_rho_bool_ra"),
            ("bool_wa", wa, b"tsound_rho_bool_wa"),
        ):
            rho = transcript.challenge_field_elements(lbl, n)
            ek = eq_table(rho[:log_k])
            ej = eq_table(rho[log_k:])
            oracle = SparseCubeOracle(log_k, log_t, [
                (1, [("eqk", ek), ("eqj", ej), ("colsparse", tab),
                     ("colsparse", tab)]),
                (_P - 1, [("eqk", ek), ("eqj", ej), ("colsparse", tab)]),
            ])
            proofs[name], points[name] = SumCheck(
                n, Fr(0)
            ).prove_with_challenges(oracle, transcript)
        rho6 = transcript.challenge_field_elements(b"tsound_rho_bool_ot", log_t)
        eq6 = eq_table(rho6)
        oracle = SumOfProductsOracle(
            log_t, [(1, [eq6, ot, ot]), (_P - 1, [eq6, ot])]
        )
        proofs["bool_ot"], points["bool_ot"] = SumCheck(
            log_t, Fr(0)
        ).prove_with_challenges(oracle, transcript)

        # ROW-SUM: sum_k ra(k,j) = 1 - ot(j);  sum_k wa(k,j) = ot(j)
        rho7 = transcript.challenge_field_elements(b"tsound_rho_rowsum_ra", log_t)
        oracle = SparseCubeOracle(log_k, log_t, [
            (1, [("eqj", eq_table(rho7)), ("colsparse", ra)]),
        ])
        claimed = Fr((1 - int(_mle_eval(ot, rho7))) % _P)
        proofs["rowsum_ra"], points["rowsum_ra"] = SumCheck(
            n, claimed
        ).prove_with_challenges(oracle, transcript)

        rho8 = transcript.challenge_field_elements(b"tsound_rho_rowsum_wa", log_t)
        oracle = SparseCubeOracle(log_k, log_t, [
            (1, [("eqj", eq_table(rho8)), ("colsparse", wa)]),
        ])
        proofs["rowsum_wa"], points["rowsum_wa"] = SumCheck(
            n, _mle_eval(ot, rho8)
        ).prove_with_challenges(oracle, transcript)

        # --- openings -------------------------------------------------
        spec = _twist_openings_spec(points, rho1, tau, rho7, rho8, log_k)
        cube_openers = {
            "ra": lambda pt: open_sparse(cp, ra, pt),
            "wa": lambda pt: open_sparse(cp, wa, pt),
            "inc": lambda pt: open_sparse(cp, inc, pt),
            "val": lambda pt: open_incremental(cp, val, pt),
        }
        t_tables = {"ot": ot, "rv": rv, "wv": wv}
        openings = []
        for name, point in spec:
            if name in cube_openers:
                v, pi = cube_openers[name](point)
            else:
                v, pi = MultilinearKZG.open(params_t, t_tables[name], point)
            openings.append(MLOpening(v, pi))

        return TwistSoundProof(
            log_memory=log_k,
            log_ops=log_t,
            ra_commitment=c_ra,
            wa_commitment=c_wa,
            inc_commitment=c_inc,
            val_commitment=c_val,
            ot_commitment=c_ot,
            rv_commitment=c_rv,
            wv_commitment=c_wv,
            read_check=proofs["read"],
            val_check=proofs["val"],
            inc_check=proofs["inc"],
            bool_ra_check=proofs["bool_ra"],
            bool_wa_check=proofs["bool_wa"],
            bool_ot_check=proofs["bool_ot"],
            rowsum_ra_check=proofs["rowsum_ra"],
            rowsum_wa_check=proofs["rowsum_wa"],
            openings=openings,
        )

    @staticmethod
    def verify(proof: TwistSoundProof, verifier_params: VerifierParams) -> bool:
        log_k, log_t = proof.log_memory, proof.log_ops
        n = log_k + log_t
        if len(proof.openings) != 16:
            return False
        # Claimed sums consumed during transcript replay; the opening
        # proofs backing these values are pairing-checked afterwards.
        o_rv_rho1 = proof.openings[0]
        o_val_tau = proof.openings[3]
        o_ot_rho7 = proof.openings[12]
        o_ot_rho8 = proof.openings[13]

        transcript = Transcript(verifier_params.fiat_shamir_seed)
        _twist_bind_statement(
            transcript, log_k, log_t,
            proof.ra_commitment, proof.wa_commitment, proof.inc_commitment,
            proof.val_commitment, proof.ot_commitment, proof.rv_commitment,
            proof.wv_commitment,
        )

        rho1 = transcript.challenge_field_elements(b"tsound_rho_read", log_t)
        ok, r1 = SumCheck(n, o_rv_rho1.value).verify(proof.read_check, transcript)
        if not ok:
            return False

        tau = transcript.challenge_field_elements(b"tsound_tau", n)
        ok, r2 = SumCheck(n, o_val_tau.value).verify(proof.val_check, transcript)
        if not ok:
            return False

        sigma = transcript.challenge_field_elements(b"tsound_sigma", n)
        ok, r3 = SumCheck(n, Fr(0)).verify(proof.inc_check, transcript)
        if not ok:
            return False

        rho4 = transcript.challenge_field_elements(b"tsound_rho_bool_ra", n)
        ok, r4 = SumCheck(n, Fr(0)).verify(proof.bool_ra_check, transcript)
        if not ok:
            return False
        rho5 = transcript.challenge_field_elements(b"tsound_rho_bool_wa", n)
        ok, r5 = SumCheck(n, Fr(0)).verify(proof.bool_wa_check, transcript)
        if not ok:
            return False
        rho6 = transcript.challenge_field_elements(b"tsound_rho_bool_ot", log_t)
        ok, r6 = SumCheck(log_t, Fr(0)).verify(proof.bool_ot_check, transcript)
        if not ok:
            return False

        rho7 = transcript.challenge_field_elements(b"tsound_rho_rowsum_ra", log_t)
        claimed7 = Fr((1 - int(o_ot_rho7.value)) % _P)
        ok, r7 = SumCheck(n, claimed7).verify(proof.rowsum_ra_check, transcript)
        if not ok:
            return False
        rho8 = transcript.challenge_field_elements(b"tsound_rho_rowsum_wa", log_t)
        ok, r8 = SumCheck(n, o_ot_rho8.value).verify(proof.rowsum_wa_check, transcript)
        if not ok:
            return False

        return _twist_check_finals_and_openings(
            proof, log_k, log_t,
            rho1, tau, sigma, rho4, rho5, rho6, rho7, rho8,
            r1, r2, r3, r4, r5, r6, r7, r8,
        )


def _twist_openings_spec(points, rho1, tau, rho7, rho8, log_k):
    """(table_name, point) list — ORDER IS THE WIRE FORMAT."""
    return [
        ("rv", rho1),
        ("ra", points["read"]),
        ("val", points["read"]),
        ("val", tau),
        ("inc", points["val"]),
        ("inc", points["inc"]),
        ("wa", points["inc"]),
        ("wv", points["inc"][log_k:]),
        ("val", points["inc"]),
        ("ra", points["bool_ra"]),
        ("wa", points["bool_wa"]),
        ("ot", points["bool_ot"]),
        ("ot", rho7),
        ("ot", rho8),
        ("ra", points["rowsum_ra"]),
        ("wa", points["rowsum_wa"]),
    ]


def _twist_bind_statement(
    transcript: Transcript, log_k: int, log_t: int, *commitments
) -> None:
    transcript.append_field_element(b"tsound_log_memory", Fr(log_k))
    transcript.append_field_element(b"tsound_log_ops", Fr(log_t))
    labels = (
        b"tsound_ra_commitment", b"tsound_wa_commitment",
        b"tsound_inc_commitment", b"tsound_val_commitment",
        b"tsound_ot_commitment", b"tsound_rv_commitment",
        b"tsound_wv_commitment",
    )
    for label, c in zip(labels, commitments):
        transcript.append_field_element(label, c.hash())


def _twist_check_finals_and_openings(
    proof: TwistSoundProof,
    log_k: int,
    log_t: int,
    rho1, tau, sigma, rho4, rho5, rho6, rho7, rho8,
    r1, r2, r3, r4, r5, r6, r7, r8,
) -> bool:
    n = log_k + log_t
    ops = proof.openings
    (
        o_rv_rho1, o_ra_r1, o_val_r1, o_val_tau, o_inc_r2,
        o_inc_r3, o_wa_r3, o_wv_r3j, o_val_r3,
        o_ra_r4, o_wa_r5, o_ot_r6, o_ot_rho7, o_ot_rho8,
        o_ra_r7, o_wa_r8,
    ) = ops

    def fr(x):
        return int(x) % _P

    # READ final
    want = (
        fr(eq_eval(rho1, r1[log_k:])) * fr(o_ra_r1.value) % _P
        * fr(o_val_r1.value) % _P
    )
    if fr(proof.read_check.final_evaluation) != want:
        return False
    # VAL final
    tau_k, tau_j = tau[:log_k], tau[log_k:]
    want = (
        fr(eq_eval(tau_k, r2[:log_k]))
        * fr(lt_eval(r2[log_k:], tau_j)) % _P
        * fr(o_inc_r2.value) % _P
    )
    if fr(proof.val_check.final_evaluation) != want:
        return False
    # INC final
    inner = (
        fr(o_inc_r3.value)
        - fr(o_wa_r3.value) * fr(o_wv_r3j.value)
        + fr(o_wa_r3.value) * fr(o_val_r3.value)
    ) % _P
    want = fr(eq_eval(sigma, r3)) * inner % _P
    if fr(proof.inc_check.final_evaluation) != want:
        return False
    # BOOL finals
    for rho, r, opening, sc in (
        (rho4, r4, o_ra_r4, proof.bool_ra_check),
        (rho5, r5, o_wa_r5, proof.bool_wa_check),
        (rho6, r6, o_ot_r6, proof.bool_ot_check),
    ):
        v = fr(opening.value)
        want = fr(eq_eval(rho, r)) * v % _P * ((v - 1) % _P) % _P
        if fr(sc.final_evaluation) != want:
            return False
    # ROW-SUM finals
    want = fr(eq_eval(rho7, r7[log_k:])) * fr(o_ra_r7.value) % _P
    if fr(proof.rowsum_ra_check.final_evaluation) != want:
        return False
    want = fr(eq_eval(rho8, r8[log_k:])) * fr(o_wa_r8.value) % _P
    if fr(proof.rowsum_wa_check.final_evaluation) != want:
        return False

    # PST openings — one pairing product for all 16 (same-point openings
    # share G2 terms; see mkzg.batch_verify_openings).
    from ..commit.mkzg import batch_verify_openings

    vk_n = multilinear_verification_key(n)
    vk_t = multilinear_verification_key(log_t)
    checks = [
        (vk_t, proof.rv_commitment, rho1, o_rv_rho1),
        (vk_n, proof.ra_commitment, r1, o_ra_r1),
        (vk_n, proof.val_commitment, r1, o_val_r1),
        (vk_n, proof.val_commitment, tau, o_val_tau),
        (vk_n, proof.inc_commitment, r2, o_inc_r2),
        (vk_n, proof.inc_commitment, r3, o_inc_r3),
        (vk_n, proof.wa_commitment, r3, o_wa_r3),
        (vk_t, proof.wv_commitment, r3[log_k:], o_wv_r3j),
        (vk_n, proof.val_commitment, r3, o_val_r3),
        (vk_n, proof.ra_commitment, r4, o_ra_r4),
        (vk_n, proof.wa_commitment, r5, o_wa_r5),
        (vk_t, proof.ot_commitment, r6, o_ot_r6),
        (vk_t, proof.ot_commitment, rho7, o_ot_rho7),
        (vk_t, proof.ot_commitment, rho8, o_ot_rho8),
        (vk_n, proof.ra_commitment, r7, o_ra_r7),
        (vk_n, proof.wa_commitment, r8, o_wa_r8),
    ]
    return batch_verify_openings(
        (vk, comm, point, o.value, o.proof)
        for vk, comm, point, o in checks
    )
