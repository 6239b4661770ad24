"""Factorized sparse PST commitments for (k, j)-cube witnesses.

Sound-mode Twist/Shout witnesses live on the (memory x time) cube with
index x = j*K + k (variable 0 = k_0, the fastest bit).  Committing them
densely needs a 2^(logK+logT)-point SRS and O(K*T) group work — infeasible
at the 2^20-op north star.  But the PST Lagrange basis FACTORIZES over the
variable split:

    [eq(x, taus)]_1 = eq(k, tau_k-part) * [eq(j, tau_j-part)]_1

so a commitment to any cube table collapses to ONE T-point MSM with
scalars s_j = column_j~(tau_k-part):

  * column-sparse tables (ra/wa one-hots, inc): s_j = sum of the column's
    few entries weighted by an eq-table lookup — O(nnz) field work;
  * column-incremental tables (Val, which changes one cell per cycle):
    s_j evolves by one weighted delta per cycle — O(T log K) total.

Openings fold the k variables first; every k-level quotient table inherits
the column structure (sparse columns stay sparse, incremental columns stay
incremental), so each quotient commitment is again one T-point MSM, and
the j levels are plain dense T-sized folds.  The resulting commitments and
opening proofs are IDENTICAL group elements to MultilinearKZG over the
dense table (tests/test_sound_sparse.py locks this), so verifiers and wire
formats are unchanged.

Trust model: the factorized scalars require the prover to know tau_k —
available under the repo's default DETERMINISTIC setup (reference-parity
transparency stance, utils.rs:62).  Under an externally-supplied ceremony
SRS (mkzg.install_external_multilinear_srs) the trapdoor is unknown, so
sound proving at cube scale needs the dense SRS; the sparse path raises in
that case.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import Dict, List, Optional, Sequence, Tuple

from ..core.params import SETUP_SEED
from ..core.rng import ChaCha20Rng, fr_rand
from ..errors import CommitmentError
from ..field.fr import MODULUS, Fr
from ..field.g1 import G1
from ..field.g2 import G2
from .kzg import KZGCommitmentValue, msm
from .mkzg import MLOpeningProof, MLVerificationKey

_P = MODULUS


def eq_table_ints(point: Sequence[int]) -> List[int]:
    """eq(b, point) for all b, little-endian (bit 0 = point[0])."""
    table = [1]
    for t in point:
        ti = int(t) % _P
        nt = (1 - ti) % _P
        table = [v * nt % _P for v in table] + [v * ti % _P for v in table]
    return table


@dataclass
class CubeParams:
    """Factorized SRS for (log_k + log_t)-variable cube commitments."""

    log_k: int
    log_t: int
    taus: List[Fr]                       # all log_k + log_t trapdoors
    j_bases: List[object]                # j-suffix SRS levels (NativeSRS or
    #                                      G1 lists), sizes 2^(log_t - l)
    eqk_tables: List[List[int]]          # eq-tables of tau_k suffixes,
    #                                      eqk_tables[i] = eq(. , taus[i:log_k])
    vk: MLVerificationKey


@lru_cache(maxsize=32)
def cube_params(log_k: int, log_t: int) -> CubeParams:
    """Deterministic factorized setup: SAME taus (ChaCha prefix) as
    ``setup_multilinear_params(log_k + log_t)``, but only O(T + K) points
    are ever materialized."""
    import os

    n = log_k + log_t
    rng = ChaCha20Rng.from_seed(SETUP_SEED)
    taus = [fr_rand(rng) for _ in range(n)]
    tau_j = [int(t) for t in taus[log_k:]]
    g1 = G1.generator()
    g2 = G2.generator()

    from .. import _native

    native = _native.available and not os.environ.get("TNSH_NO_NATIVE")
    j_bases: List[object] = []
    for level in range(log_t + 1):
        scalars = eq_table_ints(tau_j[level:])
        if native:
            from ..core.params import NativeSRS

            seg = b"".join(s.to_bytes(32, "little") for s in scalars)
            j_bases.append(NativeSRS(_native.srs_create_fixed_base(g1, seg)))
        else:
            j_bases.append([g1.scalar_mul(s) for s in scalars])
    eqk_tables = [
        eq_table_ints([int(t) for t in taus[i:log_k]])
        for i in range(log_k + 1)
    ]
    if native:
        g2_taus = [_native.g2_scalar_mul(g2, t) for t in taus]
    else:
        g2_taus = [g2.scalar_mul(int(t)) for t in taus]
    vk = MLVerificationKey(g1_generator=g1, g2_generator=g2, g2_taus=g2_taus)
    return CubeParams(
        log_k=log_k, log_t=log_t, taus=taus,
        j_bases=j_bases, eqk_tables=eqk_tables, vk=vk,
    )


# ---------------------------------------------------------------------------
# Cube table representations
# ---------------------------------------------------------------------------

class SparseCubeTable:
    """Column-sparse (k, j) table: per cycle j a few (position, value)
    entries over the k-cube (ra/wa: one; inc: at most one)."""

    def __init__(self, log_k: int, log_t: int):
        self.log_k = log_k
        self.log_t = log_t
        self.cols: List[List[Tuple[int, int]]] = [
            [] for _ in range(1 << log_t)
        ]

    def set(self, j: int, k: int, value: int) -> None:
        self.cols[j].append((k, int(value) % _P))

    def to_dense(self) -> List[int]:
        k_size = 1 << self.log_k
        out = [0] * (k_size << self.log_t)
        for j, col in enumerate(self.cols):
            for k, v in col:
                out[j * k_size + k] = (out[j * k_size + k] + v) % _P
        return out


class IncrementalCubeTable:
    """Column-incremental (k, j) table: column j+1 = column j + sparse
    updates applied AT cycle j (Twist's Val: one write per cycle).  Column 0
    is all-zero (memory starts zeroed)."""

    def __init__(self, log_k: int, log_t: int):
        self.log_k = log_k
        self.log_t = log_t
        #: updates[j] applied after column j is read
        self.updates: List[List[Tuple[int, int]]] = [
            [] for _ in range(1 << log_t)
        ]

    def add_update(self, j: int, k: int, delta: int) -> None:
        self.updates[j].append((k, int(delta) % _P))

    def to_dense(self) -> List[int]:
        k_size = 1 << self.log_k
        cur = [0] * k_size
        out = [0] * (k_size << self.log_t)
        for j in range(1 << self.log_t):
            out[j * k_size: (j + 1) * k_size] = cur
            for k, d in self.updates[j]:
                cur[k] = (cur[k] + d) % _P
        return out


# ---------------------------------------------------------------------------
# Commit
# ---------------------------------------------------------------------------

def _msm_scalars(params: CubeParams, level: int, scalars: List[int]) -> G1:
    import os

    data = b"".join(s.to_bytes(32, "little") for s in scalars)
    base = params.j_bases[level]
    from ..core.params import NativeSRS

    if isinstance(base, NativeSRS) and not os.environ.get("TNSH_NO_NATIVE"):
        # pin to the native host MSM: a sound prove issues ~300 of these
        # T-point MSMs back to back — per-call TPU round trips (29 ms
        # latency, digit upload, plan) would dominate, and the host MSM is
        # faster at T <= 2^16 anyway (PERF_NOTES round-2 findings)
        from .. import _native

        return _native.srs_msm(base.srs_id, data)
    return msm(base, data)


def commit_sparse(params: CubeParams, table: SparseCubeTable
                  ) -> KZGCommitmentValue:
    eqk = params.eqk_tables[0]
    scalars = [
        sum(v * eqk[k] for k, v in col) % _P for col in table.cols
    ]
    return KZGCommitmentValue(_msm_scalars(params, 0, scalars))


def commit_incremental(params: CubeParams, table: IncrementalCubeTable
                       ) -> KZGCommitmentValue:
    eqk = params.eqk_tables[0]
    scalars: List[int] = []
    cur = 0
    for ups in table.updates:
        scalars.append(cur)
        for k, d in ups:
            cur = (cur + d * eqk[k]) % _P
    return KZGCommitmentValue(_msm_scalars(params, 0, scalars))


# ---------------------------------------------------------------------------
# Open (fold k variables sparsely, then j variables densely)
# ---------------------------------------------------------------------------

def _open_from_columns(params: CubeParams, col_states, point: Sequence[Fr],
                       fold_col, col_scalars, col_values
                       ) -> Tuple[Fr, MLOpeningProof]:
    """Shared k-then-j opening driver.

    ``col_states``: per-column sparse state; ``fold_col(state, r, bit_fn)``
    folds every column entry by one k-variable; ``col_scalars(states, i)``
    returns the level-i quotient MSM scalars; ``col_values(states)`` the
    fully-k-folded dense T column values."""
    log_k, log_t = params.log_k, params.log_t
    quotients: List[G1] = []
    states = col_states
    for i in range(log_k):
        quotients.append(
            _msm_scalars(params, 0, col_scalars(states, i))
        )
        r = int(point[i]) % _P
        states = fold_col(states, r)
    table = col_values(states)
    # dense j-phase (identical math to MultilinearKZG.open's folds)
    for i in range(log_t):
        half = len(table) // 2
        diff = [(table[2 * x + 1] - table[2 * x]) % _P for x in range(half)]
        quotients.append(_msm_scalars(params, i + 1, diff))
        r = int(point[log_k + i]) % _P
        table = [
            (table[2 * x] + r * diff[x]) % _P for x in range(half)
        ]
    return Fr(table[0] % _P), MLOpeningProof(quotients)


def open_sparse(params: CubeParams, table: SparseCubeTable,
                point: Sequence[Fr]) -> Tuple[Fr, MLOpeningProof]:
    log_k = params.log_k
    if len(point) != log_k + params.log_t:
        raise CommitmentError("opening point has wrong arity")
    states = [list(col) for col in table.cols]

    def fold_col(states, r):
        out = []
        nr = (1 - r) % _P
        for col in states:
            if len(col) == 1:  # one-hot column: no merge bookkeeping
                k, v = col[0]
                out.append([(k >> 1, v * (r if (k & 1) else nr) % _P)])
                continue
            if not col:
                out.append(col)
                continue
            acc: Dict[int, int] = {}
            for k, v in col:
                w = v * (r if (k & 1) else nr) % _P
                key = k >> 1
                acc[key] = (acc.get(key, 0) + w) % _P
            out.append(list(acc.items()))
        return out

    def col_scalars(states, i):
        eqk = params.eqk_tables[i + 1]
        out = []
        for col in states:
            if len(col) == 1:
                k, v = col[0]
                out.append((v if (k & 1) else -v) * eqk[k >> 1] % _P)
                continue
            s = 0
            for k, v in col:
                # q_i(k', j) = col(1||k') - col(0||k')
                s += (v if (k & 1) else -v) * eqk[k >> 1]
            out.append(s % _P)
        return out

    def col_values(states):
        return [
            (sum(v for _, v in col) % _P) if col else 0 for col in states
        ]

    return _open_from_columns(
        params, states, point, fold_col, col_scalars, col_values
    )


def open_incremental(params: CubeParams, table: IncrementalCubeTable,
                     point: Sequence[Fr]) -> Tuple[Fr, MLOpeningProof]:
    """Open a column-incremental table: the k-level quotient scalars are
    prefix sums of folded deltas, one O(T) scan per level."""
    log_k = params.log_k
    if len(point) != log_k + params.log_t:
        raise CommitmentError("opening point has wrong arity")
    # states: per column, the UPDATE list (folded in k as we go)
    states = [list(ups) for ups in table.updates]

    def fold_col(states, r):
        out = []
        nr = (1 - r) % _P
        for ups in states:
            if len(ups) == 1:  # one write per cycle: no merge bookkeeping
                k, d = ups[0]
                out.append([(k >> 1, d * (r if (k & 1) else nr) % _P)])
                continue
            if not ups:
                out.append(ups)
                continue
            acc: Dict[int, int] = {}
            for k, d in ups:
                w = d * (r if (k & 1) else nr) % _P
                key = k >> 1
                acc[key] = (acc.get(key, 0) + w) % _P
            out.append(list(acc.items()))
        return out

    def col_scalars(states, i):
        eqk = params.eqk_tables[i + 1]
        out = []
        cur = 0
        for ups in states:
            out.append(cur)
            for k, d in ups:
                cur = (cur + (d if (k & 1) else -d) * eqk[k >> 1]) % _P
        return out

    def col_values(states):
        out = []
        cur = 0
        for ups in states:
            out.append(cur)
            for _, d in ups:
                cur = (cur + d) % _P
        return out

    return _open_from_columns(
        params, states, point, fold_col, col_scalars, col_values
    )
