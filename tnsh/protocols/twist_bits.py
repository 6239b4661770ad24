"""TwistBits / ShoutBits — trapdoor-free sound protocols via bit-column
commitments.

The capability gap this closes (SOUNDNESS.md "The identified fix"): the
sparse sound prover needs the SRS trapdoor tau_k to factorize cube
commitments, so under an external ceremony SRS only the dense prover ran
— and a dense (k, j)-cube commitment needs a 2^(logK+logT)-point SRS,
infeasible at north-star scale.  TwistBits commits NO cube polynomial at
all: every committed polynomial is a T-point column over the cycle index
j, which any log T-variable ceremony SRS covers.

Committed columns (2 logK + 4 of them):
  rb_i(j)  i < logK   read-address bit columns
  wb_i(j)  i < logK   write-address bit columns
  ot(j)               write flag (1 = write)
  rv(j), wv(j)        read / write values
  ic(j)               the increment written at cycle j (one write/cycle)

The one-hot address matrices expand algebraically (Twist/Shout papers'
one-hot expansion; no reference analogue — twist.rs:74-316 commits
nothing binding):

  ra(k, j) = (1 - ot(j)) · Π_i chi(k_i, rb_i(j))
  wa(k, j) =      ot(j)  · Π_i chi(k_i, wb_i(j))      chi(a,b) = (1-a)(1-b) + ab
  inc(k, j) = wa(k, j) · ic(j)
  Val(k, j) = Σ_{j' < j} inc(k, j')                    (VIRTUAL — never committed)

Σ_k Π_i chi(k_i, b_i) = Π_i ((1-b_i) + b_i) = 1 identically, so the row-sum
constraints of the v2 protocol hold by construction and vanish.  What
remains, batched by alpha into ONE claim-0 sum-check over the (k, j) cube
(phase A, round degree logK+3):

  0 = Σ_{k,j}  eq(rho1,j) ra(k,j) V(k,j) - (1/K) eq(rho1,j) rv(j)    READ
     + alpha   eq(sigma,(k,j)) wa(k,j) [ic(j) - wv(j) + V(k,j)]      INC
     + alpha^{2+i} (1/K) eq(rhob,j) c_i(j) (c_i(j)-1)                BOOL
       for c_i over rb_0..rb_{logK-1}, wb_0.., ot   (2 logK + 1 checks)

V is the prover-materialized virtual Val; the verifier never trusts it:
phase A leaves the claim v_V = V~(r), and phase B (the Val-evaluation
sum-check over j', round degree logK+3) proves

  v_V = Σ_{j'} lt(j', r_j) · ot(j') ic(j') Π_i chi(r_k_i, wb_i(j')).

Both final evaluations reduce to committed-column values at r_j (phase A)
and s (phase B), which two gamma-RLC PST openings back — claimed values
are bound into the transcript BEFORE gamma is drawn.  Challenges derive
from the same Fiat-Shamir stack as the other protocols (labels
"tbits_*", wire version 3).

Prover cost: the DEFAULT prover runs phase A's k rounds on the
structured O(T·logK) oracles (tnsh.iop.bits_oracle — each cycle touches
one address, so V restricts to suffix-bucket prefix sums and no (k, j)
cube is ever built), with a native C++ k-phase + j-phase when available
(tnsh_native.cpp tbk_*/sbk_*/sopd_*).  TNSH_BITS_DENSE=1 selects the
dense cube cross-check path (O(K·T) memory/time; bit-identical proofs —
tests pin the equality).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence

from ..commit.kzg import KZGCommitmentValue
from ..commit.mkzg import (
    MLOpeningProof,
    MultilinearKZG,
    batch_verify_openings,
    multilinear_verification_key,
    setup_multilinear_params,
)
from ..core.params import ProverParams, VerifierParams
from ..core.transcript import Transcript
from ..errors import InvalidParametersError
from ..field.fr import MODULUS, Fr
from ..iop.sumcheck_d import DenseSopOracleD, SumCheckD, SumCheckDProof
from ..poly.eq import eq_eval, eq_table, lt_eval, lt_partial_table
from .sound import (
    _kinv,
    _lift_j,
    _mle_eval,
    _mle_eval_many,
    _next_power_of_two,
    _rlc_commitments,
    _rlc_tables,
    _rlc_values,
)
from .twist import MemoryTrace

_P = MODULUS


@dataclass
class TwistBitsProof:
    """Wire version 3: bit-column sound Twist."""

    log_memory: int
    log_ops: int
    #: rb_0..rb_{logK-1}, wb_0..wb_{logK-1}, ot, rv, wv, ic
    column_commitments: List[KZGCommitmentValue]
    #: phase A: the batched claim-0 constraint sum-check over (k, j)
    check_a: SumCheckDProof
    #: v_V = V~(r) claimed between the phases
    v_val: Fr
    #: phase B: the Val-evaluation sum-check over j'
    check_b: SumCheckDProof
    #: committed-column values at r_j: rb_i, wb_i, ot, rv, wv, ic
    values_rj: List[Fr]
    #: committed-column values at s: wb_i, ot, ic
    values_s: List[Fr]
    #: gamma-RLC PST opening of all columns at r_j
    proof_rj: MLOpeningProof
    #: gamma-RLC PST opening of (wb_*, ot, ic) at s
    proof_s: MLOpeningProof


def _chi_cube(bit_col: Sequence[int], k_size: int, which_bit: int
              ) -> List[int]:
    """Dense (k, j) cube of chi(k_i, b(j)) for bit index ``which_bit``
    (k fastest)."""
    out: List[int] = []
    for b in bit_col:
        row = []
        for k in range(k_size):
            ki = (k >> which_bit) & 1
            row.append(b % _P if ki else (1 - b) % _P)
        out.extend(row)
    return out


def _chi_col(bit_col: Sequence[int], r_ki: int) -> List[int]:
    """chi(r_ki, b(j)) as a column over j (affine in the bit column)."""
    one_minus = (1 - r_ki) % _P
    return [
        (one_minus * ((1 - b) % _P) + r_ki * (b % _P)) % _P
        for b in bit_col
    ]


def _chi_scalar(r_ki: int, b: int) -> int:
    return ((1 - r_ki) * ((1 - b) % _P) + r_ki * (b % _P)) % _P


def _stage_profiler(label: str):
    """Env-gated (TNSH_PROFILE=1) stage timer: returns ``prof(name)`` which
    prints the wall-clock since the previous call to stderr.  Zero-cost
    no-op by default; used to attribute prove time at scale (PERF_NOTES
    round-5 cost splits)."""
    import os

    if not os.environ.get("TNSH_PROFILE"):
        return lambda _name: None
    import sys
    import time

    state = {"t": time.perf_counter()}

    def prof(name: str) -> None:
        now = time.perf_counter()
        print(f"[profile] {label}/{name}: {now - state['t']:.3f} s",
              file=sys.stderr)
        state["t"] = now

    return prof


def _gc_paused(fn):
    """Pause the cyclic GC for the duration of a prove (opt out with
    TNSH_GC_PAUSE=0).  At T=2^20 the collector repeatedly rescans the
    ~25M-object trace/column heap from inside the provers' allocation
    bursts — measured at ~35 s of a 106 s prove (PERF_NOTES 31).  The
    provers release their native state deterministically, so nothing
    depends on finalizers while the collector is paused."""
    import functools

    @functools.wraps(fn)
    def wrap(*args, **kwargs):
        import gc
        import os

        pause = (os.environ.get("TNSH_GC_PAUSE", "1") != "0"
                 and gc.isenabled())
        if pause:
            gc.disable()
        try:
            return fn(*args, **kwargs)
        finally:
            if pause:
                gc.enable()

    return wrap


def _release_oracles(*oracles) -> None:
    """Deterministically free native oracle state (no-op for pure-Python
    oracles; idempotent)."""
    for o in oracles:
        if o is not None and hasattr(o, "release"):
            o.release()


def _marshal_columns(columns):
    """Marshal the committed prover columns ONCE into bytes-backed
    FrTables on the native path.  ``commit_many``, the batched MLE evals
    (``_mle_eval_many``) and the gamma-RLC tables (``_rlc_tables``) all
    route through ``_native._fr_vec_bytes``, which passes ``FrTable.raw``
    straight down — without this every consumer re-serializes the same
    Python int lists (~1 s per pass at T=2^18, three passes per prove).
    Values are canonical ints either way, so proof bytes are unchanged."""
    import os

    if os.environ.get("TNSH_NO_NATIVE") or len(columns[0]) < 1024:
        return columns
    from .. import _native

    if not _native.available:
        return columns
    from ..field.fr import FrTable

    return [FrTable(_native._fr_vec_bytes(c)) for c in columns]


def _make_oracle(num_vars: int, terms, degree: int):
    """Generic-degree sop oracle routing: native C++ by default, the
    JAX/Pallas device oracle via TNSH_BITS_FORCE_JAX=1 (or automatically
    above TNSH_BITS_JAX_MIN vars when native is unavailable), pure Python
    under TNSH_NO_NATIVE.  See tnsh.iop.sumcheck_d.make_sopd_oracle."""
    from ..iop.sumcheck_d import make_sopd_oracle

    return make_sopd_oracle(num_vars, terms, degree)


class TwistBits:
    """Trapdoor-free verifier-enforced Twist (bit-column commitments)."""

    @staticmethod
    @_gc_paused
    def prove(trace: MemoryTrace, prover_params: ProverParams
              ) -> TwistBitsProof:
        import os

        k_size = trace.memory_size
        log_k = k_size.bit_length() - 1
        if (1 << log_k) != k_size or log_k < 1:
            raise InvalidParametersError("memory size must be a power of 2")
        ops = list(trace.operations)
        t_size = _next_power_of_two(max(len(ops), 1))
        log_t = t_size.bit_length() - 1
        dense = bool(os.environ.get("TNSH_BITS_DENSE"))
        prof = _stage_profiler("TwistBits.prove")

        # --- committed columns by honest simulation ----------------------
        rb = [[0] * t_size for _ in range(log_k)]
        wb = [[0] * t_size for _ in range(log_k)]
        ot = [0] * t_size
        rv = [0] * t_size
        wv = [0] * t_size
        ic = [0] * t_size
        mem = [0] * k_size
        # the virtual Val cube is only materialized on the dense
        # cross-check path; the structured oracle never builds it
        V = [0] * (k_size * t_size) if dense else None
        cur = [0] * k_size
        for j in range(t_size):
            if dense:
                for k in range(k_size):
                    V[j * k_size + k] = cur[k]
            if j < len(ops):
                op = ops[j]
                a = op.address
                if op.is_write:
                    v = int(op.value) % _P
                    ot[j] = 1
                    for i in range(log_k):
                        wb[i][j] = (a >> i) & 1
                    wv[j] = v
                    ic[j] = (v - mem[a]) % _P
                    cur[a] = (cur[a] + ic[j]) % _P
                    mem[a] = v
                else:
                    for i in range(log_k):
                        rb[i][j] = (a >> i) & 1
                    rv[j] = mem[a]
            else:
                rv[j] = mem[0]  # padding: read cell 0 (bits already 0)
        prof("simulate")

        params_t, _ = setup_multilinear_params(log_t)
        prof("srs")
        columns = _marshal_columns(rb + wb + [ot, rv, wv, ic])
        # one burst: all 2logK+4 column MSMs dispatched together
        comms = MultilinearKZG.commit_many(params_t, columns)
        prof("commit")

        transcript = Transcript(prover_params.fiat_shamir_seed)
        _bind_statement(transcript, log_k, log_t, comms)
        rho1, sigma, rhob, alpha = _challenges(transcript, log_k, log_t)

        # --- phase A: batched constraint sum-check over the cube ---------
        a_pow = _alpha_powers(alpha, 2 + 2 * log_k + 1)
        kinv = _kinv(log_k)
        n = log_k + log_t
        eq1 = eq_table(rho1)
        eqb = eq_table(rhob)
        degree = log_k + 3
        if dense:
            # dense cube construction (cross-check / reference path)
            eq1_l = _lift_j(eq1, k_size)
            eqs = eq_table(sigma)
            eqb_l = _lift_j(eqb, k_size)
            rt_l = _lift_j([(1 - o) % _P for o in ot], k_size)
            ot_l = _lift_j(ot, k_size)
            rv_l = _lift_j(rv, k_size)
            wv_l = _lift_j(wv, k_size)
            ic_l = _lift_j(ic, k_size)
            chi_r = [_chi_cube(rb[i], k_size, i) for i in range(log_k)]
            chi_w = [_chi_cube(wb[i], k_size, i) for i in range(log_k)]
            bool_l = [_lift_j(c, k_size) for c in rb + wb] + [ot_l]
            terms = [
                (1, [eq1_l, rt_l] + chi_r + [V]),
                (_P - kinv, [eq1_l, rv_l]),
                (a_pow[1], [eqs, ot_l] + chi_w + [ic_l]),
                (_P - a_pow[1], [eqs, ot_l] + chi_w + [wv_l]),
                (a_pow[1], [eqs, ot_l] + chi_w + [V]),
            ]
            for i, col in enumerate(bool_l):
                w = a_pow[2 + i] * kinv % _P
                terms.append((w, [eqb_l, col, col]))
                terms.append((_P - w, [eqb_l, col]))
            oracle_a = _make_oracle(n, terms, degree)
        else:
            # structured O(T + K)-per-k-round oracle: no cube is ever
            # built (bit-identical proofs; tests + wire-v3 digests pin it)
            from ..iop.bits_oracle import TwistBitsSparseOracle

            # value columns handed over as the already-marshalled
            # FrTables: tbk_create consumes their raw bytes zero-copy
            oracle_a = TwistBitsSparseOracle(
                log_k, log_t, rb=rb, wb=wb, ot=columns[2 * log_k],
                rv=columns[2 * log_k + 1], wv=columns[2 * log_k + 2],
                ic=columns[2 * log_k + 3],
                eq1=eq1, eqs_k=eq_table(sigma[:log_k]),
                eqs_j=eq_table(sigma[log_k:]), eqb=eqb,
                alpha_powers=a_pow, kinv=kinv, degree=degree,
            )
        prof("oracle_a_build")
        check_a, r = SumCheckD(n, Fr(0), degree).prove_with_challenges(
            oracle_a, transcript
        )
        prof("phase_a")
        r_k, r_j = r[:log_k], r[log_k:]

        # --- phase B: Val-evaluation sum-check over j' -------------------
        lt_col = lt_partial_table(log_t, r_j)
        native_b = (None if dense
                    else getattr(oracle_a, "phase_b", lambda _: None)(lt_col))
        if native_b is not None:
            # v_val and the Val delegate built natively from the oracle's
            # folded k-phase state (no T-sized Python round-trip)
            v_val, oracle_b = native_b
        else:
            chi_w_cols = [
                _chi_col(wb[i], int(r_k[i])) for i in range(log_k)
            ]
            if dense:
                v_val = _mle_eval(V, r)
            else:
                # V~(r) = Σ_j lt~(j, r_j) · ot ic Π chi(r_k, wb(j)) — the
                # multilinear identity phase B proves, evaluated directly
                # (exact; no Val cube needed)
                acc = 0
                for j in range(t_size):
                    if not ot[j]:
                        continue
                    term = int(lt_col[j]) * ic[j] % _P
                    for i in range(log_k):
                        term = term * chi_w_cols[i][j] % _P
                    acc += term
                v_val = Fr(acc % _P)
            oracle_b = _make_oracle(
                log_t, [(1, [lt_col, ot, ic] + chi_w_cols)], degree
            )
        transcript.append_field_element(b"tbits_v_val", v_val)
        check_b, s = SumCheckD(
            log_t, v_val, degree
        ).prove_with_challenges(oracle_b, transcript)
        prof("phase_b")

        # --- batched openings --------------------------------------------
        values_rj = _mle_eval_many(columns, r_j)
        cols_s = (columns[log_k: 2 * log_k]
                  + [columns[2 * log_k], columns[2 * log_k + 3]])
        values_s = _mle_eval_many(cols_s, s)
        prof("open/evals")
        transcript.append_field_elements(b"tbits_values_rj", values_rj)
        transcript.append_field_elements(b"tbits_values_s", values_s)
        gamma = transcript.challenge_field_element(b"tbits_gamma")
        g = int(gamma)
        rlc_rj = _rlc_tables(columns, g)
        rlc_s = _rlc_tables(cols_s, g)
        prof("open/rlc")
        val_rj, proof_rj = MultilinearKZG.open(params_t, rlc_rj, r_j)
        val_s, proof_s = MultilinearKZG.open(params_t, rlc_s, s)
        assert int(val_rj) == _rlc_values(values_rj, g)
        assert int(val_s) == _rlc_values(values_s, g)
        prof("openings")
        _release_oracles(oracle_a, oracle_b)

        return TwistBitsProof(
            log_memory=log_k,
            log_ops=log_t,
            column_commitments=comms,
            check_a=check_a,
            v_val=Fr(v_val),
            check_b=check_b,
            values_rj=values_rj,
            values_s=values_s,
            proof_rj=proof_rj,
            proof_s=proof_s,
        )

    @staticmethod
    def verify(proof: TwistBitsProof, verifier_params: VerifierParams
               ) -> bool:
        from ..core.proof_io import MAX_LOG_SIZE

        log_k, log_t = proof.log_memory, proof.log_ops
        # Bound untrusted size fields BEFORE any allocation or challenge
        # draw (malicious bytes could otherwise drive 2^63-scale work).
        if not (1 <= log_k <= MAX_LOG_SIZE and 0 <= log_t <= MAX_LOG_SIZE):
            return False
        n = log_k + log_t
        n_cols = 2 * log_k + 4
        if len(proof.column_commitments) != n_cols:
            return False
        if len(proof.values_rj) != n_cols:
            return False
        if len(proof.values_s) != log_k + 2:
            return False

        transcript = Transcript(verifier_params.fiat_shamir_seed)
        _bind_statement(transcript, log_k, log_t, proof.column_commitments)
        rho1, sigma, rhob, alpha = _challenges(transcript, log_k, log_t)

        degree = log_k + 3
        ok, r = SumCheckD(n, Fr(0), degree).verify(
            proof.check_a, transcript
        )
        if not ok:
            return False
        r_k, r_j = r[:log_k], r[log_k:]

        transcript.append_field_element(b"tbits_v_val", proof.v_val)
        ok, s = SumCheckD(log_t, proof.v_val, degree).verify(
            proof.check_b, transcript
        )
        if not ok:
            return False

        # --- final-evaluation binding, phase A ---------------------------
        vals = [int(v) % _P for v in proof.values_rj]
        v_rb = vals[:log_k]
        v_wb = vals[log_k: 2 * log_k]
        v_ot, v_rv, v_wv, v_ic = vals[2 * log_k:]
        v_V = int(proof.v_val)
        a_pow = _alpha_powers(alpha, 2 + 2 * log_k + 1)
        kinv = _kinv(log_k)
        e1 = int(eq_eval(rho1, r_j))
        es = int(eq_eval(sigma, r))
        eb = int(eq_eval(rhob, r_j))
        ra_r = (1 - v_ot) % _P
        wa_r = v_ot
        for i in range(log_k):
            ra_r = ra_r * _chi_scalar(int(r_k[i]), v_rb[i]) % _P
            wa_r = wa_r * _chi_scalar(int(r_k[i]), v_wb[i]) % _P
        want = (
            e1 * ra_r % _P * v_V
            - kinv * e1 % _P * v_rv
            + a_pow[1] * es % _P * wa_r % _P
            * ((v_ic - v_wv + v_V) % _P)
        ) % _P
        for i, b in enumerate(v_rb + v_wb + [v_ot]):
            want = (
                want
                + a_pow[2 + i] * kinv % _P * eb % _P * b % _P
                * ((b - 1) % _P)
            ) % _P
        if int(proof.check_a.final_evaluation) != want:
            return False

        # --- final-evaluation binding, phase B ---------------------------
        sv = [int(v) % _P for v in proof.values_s]
        s_wb = sv[:log_k]
        s_ot, s_ic = sv[log_k], sv[log_k + 1]
        want_b = int(lt_eval(s, r_j)) * s_ot % _P * s_ic % _P
        for i in range(log_k):
            want_b = want_b * _chi_scalar(int(r_k[i]), s_wb[i]) % _P
        if int(proof.check_b.final_evaluation) != want_b:
            return False

        # --- two batched PST openings back every claimed value -----------
        transcript.append_field_elements(b"tbits_values_rj",
                                         list(proof.values_rj))
        transcript.append_field_elements(b"tbits_values_s",
                                         list(proof.values_s))
        gamma = transcript.challenge_field_element(b"tbits_gamma")
        g = int(gamma)
        vk_t = multilinear_verification_key(log_t)
        comms = proof.column_commitments
        comm_rj = _rlc_commitments(comms, g)
        comms_s = comms[log_k: 2 * log_k] + [comms[2 * log_k],
                                             comms[2 * log_k + 3]]
        comm_s = _rlc_commitments(comms_s, g)
        return batch_verify_openings([
            (vk_t, comm_rj, r_j,
             Fr(_rlc_values(proof.values_rj, g)), proof.proof_rj),
            (vk_t, comm_s, s,
             Fr(_rlc_values(proof.values_s, g)), proof.proof_s),
        ])


@dataclass
class ShoutBitsProof:
    """Wire version 3: bit-column sound Shout."""

    log_table: int
    log_lookups: int
    #: rb_0..rb_{logK-1}, rv
    column_commitments: List[KZGCommitmentValue]
    #: the batched claim-0 constraint sum-check over (k, j)
    check: SumCheckDProof
    #: committed-column values at r_j: rb_i, rv
    values_rj: List[Fr]
    #: gamma-RLC PST opening of all columns at r_j
    proof_rj: MLOpeningProof


class ShoutBits:
    """Trapdoor-free verifier-enforced Shout (bit-column commitments).

    Simpler than TwistBits: lookups are read-only against a PUBLIC table,
    so there is no virtual Val and no second sum-check — the one-hot
    expansion ra(k,j) = Π_i chi(k_i, rb_i(j)) is always-active (padding
    cycles look up slot 0, whose bits are zero), Σ_k ra = 1 holds
    identically, and the whole statement is ONE claim-0 sum-check at
    round degree logK+2:

      0 = Σ_{k,j}  eq(rho1,j) ra(k,j) T~(k) - (1/K) eq(rho1,j) rv(j)
         + alpha^{1+i} (1/K) eq(rhob,j) rb_i(j) (rb_i(j)-1)   i < logK
    """

    @staticmethod
    @_gc_paused
    def prove(table, prover_params: ProverParams) -> ShoutBitsProof:
        (entries, log_k, k_size, log_t, t_size, rb, rv
         ) = _shout_comm_columns(table)

        params_t, _ = setup_multilinear_params(log_t)
        columns = _marshal_columns(rb + [rv])
        comms = MultilinearKZG.commit_many(params_t, columns)

        transcript = Transcript(prover_params.fiat_shamir_seed)
        _shout_bind_statement(transcript, log_k, log_t, entries, comms)
        rho1, rhob, alpha = _shout_challenges(transcript, log_k, log_t)

        a_pow = _alpha_powers(alpha, 1 + log_k)
        kinv = _kinv(log_k)
        n = log_k + log_t
        eq1 = eq_table(rho1)
        eqb = eq_table(rhob)
        degree = log_k + 2
        # structured O(T logK) oracle by default, dense cube under
        # TNSH_BITS_DENSE — bit-identical proofs (tests pin it)
        oracle = _shout_build_oracle(
            log_k, log_t, k_size, entries, rb, rv, eq1, eqb, a_pow, kinv,
            degree,
        )
        check, r = SumCheckD(n, Fr(0), degree).prove_with_challenges(
            oracle, transcript
        )
        r_j = r[log_k:]

        values_rj = _mle_eval_many(columns, r_j)
        transcript.append_field_elements(b"sbits_values_rj", values_rj)
        gamma = transcript.challenge_field_element(b"sbits_gamma")
        g = int(gamma)
        rlc = _rlc_tables(columns, g)
        val_rj, proof_rj = MultilinearKZG.open(params_t, rlc, r_j)
        assert int(val_rj) == _rlc_values(values_rj, g)
        _release_oracles(oracle)

        return ShoutBitsProof(
            log_table=log_k,
            log_lookups=log_t,
            column_commitments=comms,
            check=check,
            values_rj=values_rj,
            proof_rj=proof_rj,
        )

    @staticmethod
    def verify(proof: ShoutBitsProof, table_entries: Sequence[Fr],
               verifier_params: VerifierParams) -> bool:
        from ..core.proof_io import MAX_LOG_SIZE

        log_k, log_t = proof.log_table, proof.log_lookups
        # The honest log_table is a pure function of the verifier's own
        # table; recomputing it rejects malicious size fields before the
        # 2^log_table padding allocation (ADVICE r4 item 1).
        if not table_entries or log_t > MAX_LOG_SIZE:
            return False
        expected_k = _next_power_of_two(len(table_entries))
        if log_k != max(expected_k.bit_length() - 1, 1):
            return False
        n = log_k + log_t
        entries = [int(e) % _P for e in table_entries]
        k_size = 1 << log_k
        if len(entries) > k_size:
            return False
        entries = entries + [0] * (k_size - len(entries))
        if len(proof.column_commitments) != log_k + 1:
            return False
        if len(proof.values_rj) != log_k + 1:
            return False

        transcript = Transcript(verifier_params.fiat_shamir_seed)
        _shout_bind_statement(
            transcript, log_k, log_t, entries, proof.column_commitments
        )
        rho1, rhob, alpha = _shout_challenges(transcript, log_k, log_t)

        degree = log_k + 2
        ok, r = SumCheckD(n, Fr(0), degree).verify(proof.check, transcript)
        if not ok:
            return False
        r_k, r_j = r[:log_k], r[log_k:]

        vals = [int(v) % _P for v in proof.values_rj]
        v_rb, v_rv = vals[:log_k], vals[log_k]
        a_pow = _alpha_powers(alpha, 1 + log_k)
        kinv = _kinv(log_k)
        e1 = int(eq_eval(rho1, r_j))
        eb = int(eq_eval(rhob, r_j))
        ra_r = 1
        for i in range(log_k):
            ra_r = ra_r * _chi_scalar(int(r_k[i]), v_rb[i]) % _P
        want = (
            e1 * ra_r % _P * int(_mle_eval(entries, r_k))
            - kinv * e1 % _P * v_rv
        ) % _P
        for i, b in enumerate(v_rb):
            want = (
                want
                + a_pow[1 + i] * kinv % _P * eb % _P * b % _P
                * ((b - 1) % _P)
            ) % _P
        if int(proof.check.final_evaluation) != want:
            return False

        transcript.append_field_elements(b"sbits_values_rj",
                                         list(proof.values_rj))
        gamma = transcript.challenge_field_element(b"sbits_gamma")
        g = int(gamma)
        vk_t = multilinear_verification_key(log_t)
        comm = _rlc_commitments(proof.column_commitments, g)
        return batch_verify_openings([
            (vk_t, comm, r_j,
             Fr(_rlc_values(proof.values_rj, g)), proof.proof_rj),
        ])


@dataclass
class ShoutBitsCommProof:
    """Wire version 3 (magic SHBC): committed-table sound Shout.

    The verifier's table input is a PST COMMITMENT, not the entries —
    verification is O(logK + logT) group/field work (the plain
    :class:`ShoutBitsProof` verifier pads and binds the full table and
    evaluates T~(r_k) densely, O(K)).  The table commitment itself is
    public preprocessing: anyone can recompute it once from the public
    table with :meth:`ShoutBits.preprocess` and cache it."""

    log_table: int
    log_lookups: int
    #: rb_0..rb_{logK-1}, rv
    column_commitments: List[KZGCommitmentValue]
    #: the batched claim-0 constraint sum-check over (k, j)
    check: SumCheckDProof
    #: committed-column values at r_j: rb_i, rv
    values_rj: List[Fr]
    #: T~(r_k), opened against the table commitment
    t_value: Fr
    #: gamma-RLC PST opening of all columns at r_j
    proof_rj: MLOpeningProof
    #: PST opening of the table commitment at r_k
    proof_t: MLOpeningProof


def _shout_comm_columns(table):
    """(entries, log_k, k_size, log_t, t_size, rb, rv) — the committed
    column material shared by prove and prove_committed."""
    entries = [int(e) % _P for e in table.entries]
    if not entries:
        raise InvalidParametersError("ShoutBits needs a non-empty table")
    k_size = _next_power_of_two(len(entries))
    entries = entries + [0] * (k_size - len(entries))
    log_k = max(k_size.bit_length() - 1, 1)
    k_size = 1 << log_k
    entries = entries + [0] * (k_size - len(entries))
    ops = list(table.lookups)
    t_size = _next_power_of_two(max(len(ops), 1))
    log_t = t_size.bit_length() - 1
    rb = [[0] * t_size for _ in range(log_k)]
    rv = [0] * t_size
    for j in range(t_size):
        idx = ops[j].index if j < len(ops) else 0
        val = int(ops[j].value) % _P if j < len(ops) else entries[0]
        for i in range(log_k):
            rb[i][j] = (idx >> i) & 1
        rv[j] = val
    return entries, log_k, k_size, log_t, t_size, rb, rv


def _shout_build_oracle(log_k, log_t, k_size, entries, rb, rv,
                        eq1, eqb, a_pow, kinv, degree):
    """The phase-A oracle for the Shout statement (structured by default,
    dense cube under TNSH_BITS_DENSE) — shared verbatim by prove and
    prove_committed so their sum-checks are the same polynomial system."""
    import os

    n = log_k + log_t
    if os.environ.get("TNSH_BITS_DENSE"):
        eq1_l = _lift_j(eq1, k_size)
        eqb_l = _lift_j(eqb, k_size)
        rv_l = _lift_j(rv, k_size)
        tab_l = list(entries) * (1 << log_t)
        chi_r = [_chi_cube(rb[i], k_size, i) for i in range(log_k)]
        rb_l = [_lift_j(c, k_size) for c in rb]
        terms = [
            (1, [eq1_l] + chi_r + [tab_l]),
            (_P - kinv, [eq1_l, rv_l]),
        ]
        for i, col in enumerate(rb_l):
            w = a_pow[1 + i] * kinv % _P
            terms.append((w, [eqb_l, col, col]))
            terms.append((_P - w, [eqb_l, col]))
        return _make_oracle(n, terms, degree)
    from ..iop.bits_oracle import ShoutBitsSparseOracle

    sparse_terms = [
        (1, [eq1], rb, entries),
        (_P - kinv, [eq1, rv], None, None),
    ]
    for i in range(log_k):
        w = a_pow[1 + i] * kinv % _P
        sparse_terms.append((w, [eqb, rb[i], rb[i]], None, None))
        sparse_terms.append((_P - w, [eqb, rb[i]], None, None))
    return ShoutBitsSparseOracle(log_k, log_t, sparse_terms, degree)


class ShoutBitsCommitted:
    """Committed-table Shout: O(logK + logT) verifier (tnsh extension).

    ``preprocess`` commits the public table once (deterministic given the
    SRS); ``prove``/``verify`` then exchange only the commitment.  The
    lookup statement, challenges, and sum-check mirror :class:`ShoutBits`
    with distinct Fiat-Shamir labels ("sbitc_*"), so the two proof
    families can never be replayed against each other."""

    @staticmethod
    def preprocess(table_entries: Sequence[Fr]) -> KZGCommitmentValue:
        entries = [int(e) % _P for e in table_entries]
        if not entries:
            raise InvalidParametersError("empty table")
        k_size = _next_power_of_two(len(entries))
        log_k = max(k_size.bit_length() - 1, 1)
        k_size = 1 << log_k
        entries = entries + [0] * (k_size - len(entries))
        params_k, _ = setup_multilinear_params(log_k)
        return MultilinearKZG.commit(params_k, entries)

    @staticmethod
    @_gc_paused
    def prove(table, prover_params: ProverParams) -> ShoutBitsCommProof:
        (entries, log_k, k_size, log_t, t_size, rb, rv
         ) = _shout_comm_columns(table)
        params_t, _ = setup_multilinear_params(log_t)
        params_k, _ = setup_multilinear_params(log_k)
        columns = _marshal_columns(rb + [rv])
        comms = MultilinearKZG.commit_many(params_t, columns)
        t_comm = MultilinearKZG.commit(params_k, entries)

        transcript = Transcript(prover_params.fiat_shamir_seed)
        _shoutc_bind_statement(transcript, log_k, log_t, t_comm, comms)
        rho1, rhob, alpha = _shoutc_challenges(transcript, log_k, log_t)

        a_pow = _alpha_powers(alpha, 1 + log_k)
        kinv = _kinv(log_k)
        n = log_k + log_t
        eq1 = eq_table(rho1)
        eqb = eq_table(rhob)
        degree = log_k + 2
        oracle = _shout_build_oracle(
            log_k, log_t, k_size, entries, rb, rv, eq1, eqb, a_pow, kinv,
            degree,
        )
        check, r = SumCheckD(n, Fr(0), degree).prove_with_challenges(
            oracle, transcript
        )
        r_k, r_j = r[:log_k], r[log_k:]

        values_rj = _mle_eval_many(columns, r_j)
        t_value = Fr(_mle_eval(entries, r_k))
        transcript.append_field_elements(b"sbitc_values_rj", values_rj)
        transcript.append_field_element(b"sbitc_t_value", t_value)
        gamma = transcript.challenge_field_element(b"sbitc_gamma")
        g = int(gamma)
        rlc = _rlc_tables(columns, g)
        val_rj, proof_rj = MultilinearKZG.open(params_t, rlc, r_j)
        tv, proof_t = MultilinearKZG.open(params_k, entries, r_k)
        assert int(val_rj) == _rlc_values(values_rj, g)
        assert int(tv) == int(t_value)
        _release_oracles(oracle)

        return ShoutBitsCommProof(
            log_table=log_k,
            log_lookups=log_t,
            column_commitments=comms,
            check=check,
            values_rj=values_rj,
            t_value=t_value,
            proof_rj=proof_rj,
            proof_t=proof_t,
        )

    @staticmethod
    def verify(proof: ShoutBitsCommProof,
               table_commitment: KZGCommitmentValue,
               verifier_params: VerifierParams) -> bool:
        from ..core.proof_io import MAX_LOG_SIZE

        log_k, log_t = proof.log_table, proof.log_lookups
        if not (1 <= log_k <= MAX_LOG_SIZE and 0 <= log_t <= MAX_LOG_SIZE):
            return False
        n = log_k + log_t
        if len(proof.column_commitments) != log_k + 1:
            return False
        if len(proof.values_rj) != log_k + 1:
            return False

        transcript = Transcript(verifier_params.fiat_shamir_seed)
        _shoutc_bind_statement(
            transcript, log_k, log_t, table_commitment,
            proof.column_commitments,
        )
        rho1, rhob, alpha = _shoutc_challenges(transcript, log_k, log_t)

        degree = log_k + 2
        ok, r = SumCheckD(n, Fr(0), degree).verify(proof.check, transcript)
        if not ok:
            return False
        r_k, r_j = r[:log_k], r[log_k:]

        vals = [int(v) % _P for v in proof.values_rj]
        v_rb, v_rv = vals[:log_k], vals[log_k]
        a_pow = _alpha_powers(alpha, 1 + log_k)
        kinv = _kinv(log_k)
        e1 = int(eq_eval(rho1, r_j))
        eb = int(eq_eval(rhob, r_j))
        ra_r = 1
        for i in range(log_k):
            ra_r = ra_r * _chi_scalar(int(r_k[i]), v_rb[i]) % _P
        want = (
            e1 * ra_r % _P * int(proof.t_value)
            - kinv * e1 % _P * v_rv
        ) % _P
        for i, b in enumerate(v_rb):
            want = (
                want
                + a_pow[1 + i] * kinv % _P * eb % _P * b % _P
                * ((b - 1) % _P)
            ) % _P
        if int(proof.check.final_evaluation) != want:
            return False

        transcript.append_field_elements(b"sbitc_values_rj",
                                         list(proof.values_rj))
        transcript.append_field_element(b"sbitc_t_value", proof.t_value)
        gamma = transcript.challenge_field_element(b"sbitc_gamma")
        g = int(gamma)
        vk_t = multilinear_verification_key(log_t)
        vk_k = multilinear_verification_key(log_k)
        comm = _rlc_commitments(proof.column_commitments, g)
        return batch_verify_openings([
            (vk_t, comm, r_j,
             Fr(_rlc_values(proof.values_rj, g)), proof.proof_rj),
            (vk_k, table_commitment, r_k, proof.t_value, proof.proof_t),
        ])


def _shoutc_bind_statement(transcript: Transcript, log_k: int, log_t: int,
                           t_comm: KZGCommitmentValue,
                           comms: Sequence[KZGCommitmentValue]) -> None:
    transcript.append_field_element(b"sbitc_version", Fr(3))
    transcript.append_field_element(b"sbitc_log_table", Fr(log_k))
    transcript.append_field_element(b"sbitc_log_lookups", Fr(log_t))
    transcript.append_field_element(b"sbitc_table_commitment",
                                    t_comm.hash())
    for idx, c in enumerate(comms):
        transcript.append_field_element(
            b"sbitc_col_commitment_%d" % idx, c.hash()
        )


def _shoutc_challenges(transcript: Transcript, log_k: int, log_t: int):
    rho1 = transcript.challenge_field_elements(b"sbitc_rho_read", log_t)
    rhob = transcript.challenge_field_elements(b"sbitc_rho_bool", log_t)
    alpha = transcript.challenge_field_element(b"sbitc_alpha")
    return rho1, rhob, alpha


def _shout_bind_statement(transcript: Transcript, log_k: int, log_t: int,
                          entries: Sequence[int],
                          comms: Sequence[KZGCommitmentValue]) -> None:
    transcript.append_field_element(b"sbits_version", Fr(3))
    transcript.append_field_element(b"sbits_log_table", Fr(log_k))
    transcript.append_field_element(b"sbits_log_lookups", Fr(log_t))
    transcript.append_field_elements(
        b"sbits_table", [Fr(e) for e in entries]
    )
    for idx, c in enumerate(comms):
        transcript.append_field_element(
            b"sbits_col_commitment_%d" % idx, c.hash()
        )


def _shout_challenges(transcript: Transcript, log_k: int, log_t: int):
    rho1 = transcript.challenge_field_elements(b"sbits_rho_read", log_t)
    rhob = transcript.challenge_field_elements(b"sbits_rho_bool", log_t)
    alpha = transcript.challenge_field_element(b"sbits_alpha")
    return rho1, rhob, alpha


def _bind_statement(transcript: Transcript, log_k: int, log_t: int,
                    comms: Sequence[KZGCommitmentValue]) -> None:
    transcript.append_field_element(b"tbits_version", Fr(3))
    transcript.append_field_element(b"tbits_log_memory", Fr(log_k))
    transcript.append_field_element(b"tbits_log_ops", Fr(log_t))
    for idx, c in enumerate(comms):
        transcript.append_field_element(
            b"tbits_col_commitment_%d" % idx, c.hash()
        )


def _challenges(transcript: Transcript, log_k: int, log_t: int):
    n = log_k + log_t
    rho1 = transcript.challenge_field_elements(b"tbits_rho_read", log_t)
    sigma = transcript.challenge_field_elements(b"tbits_sigma", n)
    rhob = transcript.challenge_field_elements(b"tbits_rho_bool", log_t)
    alpha = transcript.challenge_field_element(b"tbits_alpha")
    return rho1, sigma, rhob, alpha


def _alpha_powers(alpha: Fr, count: int) -> List[int]:
    a = int(alpha)
    out = [1]
    for _ in range(count):
        out.append(out[-1] * a % _P)
    return out
