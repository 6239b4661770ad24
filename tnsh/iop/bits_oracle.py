"""Structured O(T·logK) sum-check oracles for the bit-column protocols.

The dense generic-degree oracle (tnsh.iop.sumcheck_d.DenseSopOracleD)
materializes every chi cube — O(K·T·logK) per round, impossible at
north-star scale.  These oracles exploit the structure SOUNDNESS.md's
"O(T) prover plan" identifies: every cube factor of the bits protocols
is (a weighted sum of) one-hots eq(k, bits(j)), and binding one k bit at
a time restricts each one-hot to a per-cycle scalar times a shorter
one-hot, so k-round evaluations are O(T) table walks with suffix
lookups, no cube ever built.

``ShoutBitsSparseOracle`` covers the single-one-hot term shapes of
ShoutBits' phase A:

  * (coeff, j_tables, bits, k_table):
      Σ_{k,j} coeff · Π_m j_tables[m](j) · eq(k, bits(j)) · k_table(k)
  * (coeff, j_tables, None, None):  j-lifted column terms (constant
      along k, scaled by 2^{free k vars} during the k rounds).

During the logK k rounds, round evaluations at X = 0..degree are

  g(X) = Σ_j w_j · A_j · chi(X, b_i(j)) · (T_i[2 s_j] + X·ΔT_i[s_j])

with A_j the running product of bound-bit chi scalars, T_i the folded
k_table and s_j the cycle's remaining address-suffix — O(T) per round.
After the k binds the restricted polynomial over j is a product of the
logK chi COLUMNS (each multilinear in j), so the j phase delegates to
the device-backed generic-degree sop oracle (JaxSopOracleD) or its
Python twin, at O(T·logK) per round.

Round polynomials are the SAME polynomials the dense oracle computes,
evaluated at the same points with exact arithmetic — bit-identical
proofs (tests/test_twist_bits.py pins this).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from ..errors import SumCheckError
from ..field.fr import MODULUS, Fr

_P = MODULUS


def _chi(x: int, b: int) -> int:
    """(1-x)(1-b) + x b mod p for boolean b and arbitrary x."""
    return (x if b else (1 - x)) % _P


class ShoutBitsSparseOracle:
    """Structured oracle for single-one-hot bit-column term systems.

    ``terms``: sequence of ``(coeff, j_tables, bits, k_table)`` where
    ``j_tables`` is a list of T-point int tables, ``bits`` is either
    None or the list of logK T-point BOOLEAN bit columns of the one-hot
    address, and ``k_table`` is either None or a K-point table attached
    to the one-hot (e.g. the public lookup table).  ``k_table`` without
    ``bits`` is unsupported (no such term shape in the protocols).
    """

    def __init__(self, log_k: int, log_t: int, terms, degree: int):
        self.log_k = log_k
        self.log_t = log_t
        self.num_vars = log_k + log_t
        self.degree = degree
        self._round = 0
        self._delegate = None
        t_size = 1 << log_t
        k_size = 1 << log_k
        self._terms = []
        for coeff, j_tables, bits, k_table in terms:
            jt = [[int(v) % _P for v in tab] for tab in j_tables]
            for tab in jt:
                if len(tab) != t_size:
                    raise SumCheckError("j table size mismatch")
            if bits is None:
                if k_table is not None:
                    raise SumCheckError("k_table needs bits")
                self._terms.append(
                    {"coeff": int(coeff) % _P, "jt": jt, "addr": None,
                     "A": None, "T": None}
                )
                continue
            if len(bits) != log_k:
                raise SumCheckError("need log_k bit columns")
            addr = [0] * t_size
            for i, col in enumerate(bits):
                for j, b in enumerate(col):
                    bv = int(b)
                    if bv not in (0, 1):
                        raise SumCheckError(
                            "bit columns must be boolean for the "
                            "structured prover"
                        )
                    addr[j] |= bv << i
            kt = None
            if k_table is not None:
                kt = [int(v) % _P for v in k_table]
                if len(kt) != k_size:
                    raise SumCheckError("k table size mismatch")
            self._terms.append(
                {"coeff": int(coeff) % _P, "jt": jt, "addr": addr,
                 "A": [1] * t_size, "T": kt, "bits": bits}
            )

    # -- k phase -----------------------------------------------------------

    def _k_round_evals(self) -> List[Fr]:
        i = self._round
        npts = self.degree + 1
        free_after = self.log_k - i - 1
        pow_free = pow(2, free_after, _P)
        acc = [0] * npts
        for tm in self._terms:
            if tm["addr"] is None:
                s = 0
                t_size = len(tm["jt"][0]) if tm["jt"] else 1 << self.log_t
                for j in range(t_size):
                    prod = tm["coeff"]
                    for tab in tm["jt"]:
                        prod = prod * tab[j] % _P
                    s += prod
                v = s % _P * pow_free % _P
                for x in range(npts):
                    acc[x] += v
                continue
            addr = tm["addr"]
            A = tm["A"]
            T = tm["T"]
            coeff = tm["coeff"]
            jt = tm["jt"]
            for j in range(len(addr)):
                a = A[j]
                if a == 0:
                    continue
                w = coeff * a % _P
                for tab in jt:
                    w = w * tab[j] % _P
                if w == 0:
                    continue
                b = addr[j] & 1
                s_j = addr[j] >> 1
                if T is not None:
                    t0 = T[2 * s_j]
                    dt = (T[2 * s_j + 1] - t0) % _P
                else:
                    t0, dt = 1, 0
                # g_j(X) = w * chi(X, b) * (t0 + X*dt): evaluate at 0..D
                for x in range(npts):
                    cx = _chi(x, b)
                    if cx == 0:
                        continue
                    acc[x] += w * cx % _P * ((t0 + x * dt) % _P)
        return [Fr(v % _P) for v in acc]

    def _k_bind(self, challenge: Fr) -> None:
        r = int(challenge)
        one_minus = (1 - r) % _P
        for tm in self._terms:
            if tm["addr"] is None:
                continue
            addr = tm["addr"]
            A = tm["A"]
            for j in range(len(addr)):
                A[j] = A[j] * (r if addr[j] & 1 else one_minus) % _P
                addr[j] >>= 1
            if tm["T"] is not None:
                T = tm["T"]
                half = len(T) // 2
                tm["T"] = [
                    (T[2 * m] + r * (T[2 * m + 1] - T[2 * m])) % _P
                    for m in range(half)
                ]

    # -- j phase (delegate) ------------------------------------------------

    def _build_delegate(self, challenges: Sequence[Fr]) -> None:
        """The restricted polynomial over j is a sum of products of
        MULTILINEAR j-columns: the original j_tables plus, per one-hot
        term, the logK chi columns chi(r_i, b_i(j)) (each affine in a
        committed bit column) and the scalar k_table evaluation."""
        r_k = [int(c) for c in challenges[: self.log_k]]
        terms = []
        for tm in self._terms:
            if tm["addr"] is None:
                terms.append((tm["coeff"], list(tm["jt"])))
                continue
            chi_cols = []
            for i, col in enumerate(tm["bits"]):
                ri = r_k[i]
                om = (1 - ri) % _P
                chi_cols.append([
                    (ri if int(b) else om) for b in col
                ])
            coeff = tm["coeff"]
            if tm["T"] is not None:
                coeff = coeff * tm["T"][0] % _P  # T~(r_k)
            terms.append((coeff, list(tm["jt"]) + chi_cols))
        from .sumcheck_d import DenseSopOracleD

        self._delegate = DenseSopOracleD(
            self.log_t, terms, degree=self.degree
        )

    # -- SumcheckOracle interface -----------------------------------------

    def round_evaluations(self, round_index: int) -> List[Fr]:
        if self._round < self.log_k:
            return self._k_round_evals()
        return self._delegate.round_evaluations(
            round_index - self.log_k
        )

    def bind(self, challenge: Fr) -> None:
        if self._round < self.log_k:
            self._k_bind(challenge)
            self._challenges = getattr(self, "_challenges", [])
            self._challenges.append(challenge)
            if self._round == self.log_k - 1:
                self._build_delegate(self._challenges)
        else:
            self._delegate.bind(challenge)
        self._round += 1

    def final_evaluation(self, challenges: Sequence[Fr]) -> Fr:
        return self._delegate.final_evaluation(challenges[self.log_k:])
