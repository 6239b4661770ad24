"""Sparse (k, j)-cube sum-check oracle for sound-mode constraints.

The sound Twist/Shout checks are degree-<=3 sums of products over the
(memory x time) cube (variable 0 = k_0, the fastest bit).  Their dense
oracles cost O(K*T) memory and work; this oracle exploits the witnesses'
column structure to run the SAME polynomial in O((K + T) * logK) for the
k rounds and O(T log T) for the j rounds, producing bit-identical round
polynomials (locked by tests/test_sound_sparse.py).

Factor kinds per term:
  ("eqj", table_T)    — j-only multilinear table (constant over k):
                        eq/lt kernels, wv/ot/rv columns.
  ("eqk", table_K)    — k-only multilinear table (constant over j):
                        eq(tau_k, .) kernels, lookup tables.
  ("colsparse", SparseCubeTable) — few entries per cycle column (ra, wa,
                        inc one-hots).  A term may use the SAME colsparse
                        object twice (booleanity ra*ra); distinct colsparse
                        factors in one term are not supported.
  ("colinc", IncrementalCubeTable) — column-incremental (Twist's Val).

Term classes in the k phase (all three are needed by the round-3 BATCHED
sound protocol, which folds every constraint into one sum-check):
  * class S (has a colsparse factor): the colsparse factor pins each
    column's contribution to one residual position; eqk/colinc factors
    are read at that position (the colinc "current column" is maintained
    by an in-order scan, O(K_rem + T) per round).
  * class I (colinc but no colsparse, e.g. eq(tau)*Val): the running sum
    h(X) = sum_rest prod(eqk)(X, rest) * cur(X, rest) is maintained
    INCREMENTALLY across the column scan — each colinc delta updates h
    with O(#eqk) muls — so the round stays O(T + K), never O(T * K).
  * class E (eqk/eqj factors only, e.g. lifted column constraints):
    the k-sum and the j-sum factorize; contribution is
    (sum_rest prod eqk(X, rest)) * (sum_j weight_j), O(K_rem) per round.

After the k variables bind, every factor collapses to a T-sized dense
table and the j phase delegates to SumOfProductsOracle
(native-accelerated).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

from ..errors import SumCheckError
from ..field.fr import MODULUS, Fr
from .sumcheck import SumOfProductsOracle, SumcheckOracle

_P = MODULUS


class SparseCubeOracle(SumcheckOracle):
    def __init__(self, log_k: int, log_t: int, terms,
                 use_native: bool = True):
        """``terms``: sequence of ``(coeff, [(kind, payload), ...])``.

        ``use_native=False`` forces the pure-Python k phase — used by the
        column-sharded mesh oracle (tnsh.parallel.mesh), whose shard
        slices need externally seeded colinc scan state
        (:meth:`set_colinc_start`), which the native kernel does not
        expose."""
        self.log_k = log_k
        self.log_t = log_t
        self.num_vars = log_k + log_t
        t_size = 1 << log_t
        self._round = 0
        self._k_rem = 1 << log_k

        # dedupe mutable factors by identity so shared tables fold once
        # (and shared eqj tables marshal once)
        self._eqj: List[List[int]] = []
        self._eqk: List[List[int]] = []
        self._sparse: List[List[List[Tuple[int, int]]]] = []  # cols
        self._sparse_src: List[object] = []                   # table objects
        self._inc: List[List[List[Tuple[int, int]]]] = []     # updates
        self._inc_src: List[object] = []
        self._inc_cur: List[List[int]] = []
        seen = {}
        self._terms = []
        for coeff, factors in terms:
            eqj_idx: List[int] = []
            eqk_idx: List[int] = []
            sp_idx = None
            sp_power = 0
            inc_idx: List[int] = []
            for kind, payload in factors:
                if kind == "eqj":
                    key = ("eqj", id(payload))
                    if key not in seen:
                        if len(payload) != t_size:
                            raise SumCheckError("eqj table size mismatch")
                        seen[key] = len(self._eqj)
                        # bytes-backed FrTable payloads pass through to the
                        # native marshal untouched (values are canonical)
                        self._eqj.append(
                            payload if hasattr(payload, "raw")
                            else [int(v) % _P for v in payload]
                        )
                    eqj_idx.append(seen[key])
                elif kind == "eqk":
                    key = ("eqk", id(payload))
                    if key not in seen:
                        if len(payload) != (1 << log_k):
                            raise SumCheckError("eqk table size mismatch")
                        seen[key] = len(self._eqk)
                        self._eqk.append([int(v) % _P for v in payload])
                    eqk_idx.append(seen[key])
                elif kind == "colsparse":
                    key = ("sp", id(payload))
                    if key not in seen:
                        seen[key] = len(self._sparse)
                        # reference, not copy: rounds only READ columns and
                        # _k_bind rebinds to freshly built folded lists, so
                        # the caller's table is never mutated (copying cost
                        # ~800 MB RSS at T=2^20)
                        self._sparse.append(payload.cols)
                        self._sparse_src.append(payload)
                    if sp_idx is not None and sp_idx != seen[key]:
                        raise SumCheckError(
                            "one distinct colsparse factor per term"
                        )
                    sp_idx = seen[key]
                    sp_power += 1
                elif kind == "colinc":
                    key = ("inc", id(payload))
                    if key not in seen:
                        seen[key] = len(self._inc)
                        self._inc.append(payload.updates)  # see colsparse
                        self._inc_src.append(payload)
                        self._inc_cur.append([0] * (1 << log_k))
                    inc_idx.append(seen[key])
                else:
                    raise SumCheckError(f"unknown factor kind {kind}")
            if sp_idx is None and len(inc_idx) > 1:
                raise SumCheckError(
                    "a term without a colsparse factor supports at most "
                    "one colinc factor (class I)"
                )
            self._terms.append((None, eqj_idx, eqk_idx, sp_idx, sp_power,
                                inc_idx, int(coeff) % _P))
        self._delegate = None
        #: externally seeded colinc scan state (column-sharded mode): per
        #: inc table, the K_rem-vector of prefix deltas from columns owned
        #: by earlier shards.  None = this oracle owns ALL columns.
        self._inc_start: Optional[List[List[int]]] = None
        # Route the k rounds to the native C++ twin when available: the
        # per-column big-int loops below run ~20-40x faster there with
        # bit-identical output (exact field arithmetic either way), and
        # the per-column term weights are computed native-side.
        self._nat = None
        if log_k > 0 and use_native:
            import os

            if not os.environ.get("TNSH_NO_NATIVE"):
                from .. import _native

                if _native.available:
                    self._nat = _native.sco_create(
                        log_k, log_t, self._eqk, self._eqj, self._sparse,
                        self._inc, [t[6] for t in self._terms],
                        [(-1 if t[3] is None else t[3], t[4], t[1], t[2],
                          t[5]) for t in self._terms],
                        sparse_csrs=[t.csr() for t in self._sparse_src],
                        inc_csrs=[t.csr() for t in self._inc_src],
                    )
        if self._nat is None:
            # Python fallback: materialize the per-column weights
            # coeff * prod of eqj factors (static in k)
            new_terms = []
            for (_, eqj_idx, eqk_idx, sp_idx, sp_power, inc_idx, coeff) \
                    in self._terms:
                w = [coeff] * t_size
                for ji in eqj_idx:
                    tab = self._eqj[ji]
                    w = [a * b % _P for a, b in zip(w, tab)]
                new_terms.append((w, eqj_idx, eqk_idx, sp_idx, sp_power,
                                  inc_idx, coeff))
            self._terms = new_terms

    def __del__(self):
        if getattr(self, "_nat", None) is not None:
            try:
                from .. import _native

                _native.sco_free(self._nat)
            except Exception:
                pass

    # -- k-phase helpers ----------------------------------------------------

    def set_colinc_start(self, states: Optional[List[List[int]]]) -> None:
        """Seed the colinc in-order scan (and class-I running sums) with
        the prefix state contributed by columns OWNED BY EARLIER SHARDS.
        ``states``: per inc table, a K_rem-sized int vector matching the
        CURRENT fold level.  Cleared by :meth:`bind` — the sharded driver
        recomputes it from the folded tables before every round (on a pod
        this is one exclusive-scan collective of K_rem-vectors).  Python
        k-phase only (construct with ``use_native=False``)."""
        if states is not None and self._nat is not None:
            raise SumCheckError(
                "colinc start seeding needs the Python k phase "
                "(use_native=False)"
            )
        self._inc_start = states

    def _k_round_evals(self) -> List[Fr]:
        t_size = 1 << self.log_t
        # reset colinc scan state (seeded in column-sharded mode)
        starts = self._inc_start
        for ii, cur in enumerate(self._inc_cur):
            src = starts[ii] if starts is not None else None
            for i in range(len(cur)):
                cur[i] = src[i] if src is not None else 0
        # inner loop: products of <=4 linear forms evaluated at X = 0..3,
        # accumulated UNREDUCED (products stay ~1300 bits; one mod per
        # round) — dropping the per-factor mods measured ~1.5x
        terms = self._terms
        sparse = self._sparse
        eqk_all = self._eqk
        inc_cur_all = self._inc_cur
        s0 = s1 = s2 = s3 = 0

        # classify colsparse-free terms once per round
        cls_s = []  # terms with a colsparse factor (per-column entries)
        cls_i = []  # colinc, no colsparse: [term, h0, h1, h2, h3]
        half = self._k_rem // 2
        for t in terms:
            (w, _tabs, eqk_idx, sp_idx, _sp_power, inc_idx, _c) = t
            if sp_idx is not None:
                cls_s.append(t)
            elif inc_idx:
                cls_i.append([t, 0, 0, 0, 0])
            else:
                # class E: k-sum and j-sum factorize
                wsum = sum(w) % _P
                if wsum == 0:
                    continue
                e0 = e1 = e2 = e3 = 0
                for rest in range(half):
                    p0 = p1 = p2 = p3 = 1
                    for ei in eqk_idx:
                        arr = eqk_all[ei]
                        a0 = arr[2 * rest]
                        d = arr[2 * rest + 1] - a0
                        p0 = p0 * a0 % _P
                        p1 = p1 * (a0 + d) % _P
                        p2 = p2 * (a0 + 2 * d) % _P
                        p3 = p3 * (a0 + 3 * d) % _P
                    e0 += p0
                    e1 += p1
                    e2 += p2
                    e3 += p3
                s0 += wsum * e0
                s1 += wsum * e1
                s2 += wsum * e2
                s3 += wsum * e3

        # column-sharded mode: seed each class-I running sum h(X) from the
        # earlier shards' prefix state (mirrors the native kernel's OpenMP
        # chunk seeding)
        if starts is not None:
            for rec in cls_i:
                t = rec[0]
                cur0 = inc_cur_all[t[5][0]]
                h0 = h1 = h2 = h3 = 0
                for rest in range(half):
                    b0 = cur0[2 * rest]
                    b1 = cur0[2 * rest + 1]
                    if b0 == 0 and b1 == 0:
                        continue
                    d = b1 - b0
                    v0, v1, v2 = b0, b1, b1 + d
                    v3 = v2 + d
                    for ei in t[2]:
                        arr = eqk_all[ei]
                        a0 = arr[2 * rest]
                        da = arr[2 * rest + 1] - a0
                        v0 *= a0
                        v1 *= a0 + da
                        v2 *= a0 + 2 * da
                        v3 *= a0 + 3 * da
                    h0 += v0
                    h1 += v1
                    h2 += v2
                    h3 += v3
                rec[1] = h0 % _P
                rec[2] = h1 % _P
                rec[3] = h2 % _P
                rec[4] = h3 % _P

        for j in range(t_size):
            for (w, _tabs, eqk_idx, sp_idx, sp_power, inc_idx, _c) in cls_s:
                wj = w[j]
                if wj == 0:
                    continue
                col = sparse[sp_idx][j]
                if sp_power == 2 and len(col) > 1:
                    # merge same-pair entries BEFORE squaring: the column's
                    # restriction to a pair is ONE linear form, so
                    # (a + b)^2, not a^2 + b^2 (ADVICE round-2 item 1)
                    acc = {}
                    for p, c in col:
                        lo, hi = acc.get(p >> 1, (0, 0))
                        if p & 1:
                            hi += c
                        else:
                            lo += c
                        acc[p >> 1] = (lo, hi)
                    forms = [
                        (rest, lo % _P, (hi - lo) % _P)
                        for rest, (lo, hi) in acc.items()
                    ]
                else:
                    forms = None
                    entries = col
                for ent in (forms if forms is not None else entries):
                    if forms is not None:
                        rest, lo, d = ent
                        rest2 = rest * 2
                        v0, v1 = lo, lo + d
                        v2, v3 = lo + 2 * d, lo + 3 * d
                    else:
                        p, c = ent
                        rest2 = (p >> 1) * 2
                        if p & 1:
                            v0, v1, v2, v3 = 0, c, 2 * c, 3 * c
                        else:
                            v0, v1, v2, v3 = c, 0, -c, -2 * c
                    if sp_power == 2:
                        v0 *= v0
                        v1 *= v1
                        v2 *= v2
                        v3 *= v3
                    v0 *= wj
                    v1 *= wj
                    v2 *= wj
                    v3 *= wj
                    for ei in eqk_idx:
                        arr = eqk_all[ei]
                        a0 = arr[rest2]
                        d = arr[rest2 + 1] - a0
                        v0 *= a0
                        v1 *= a0 + d
                        v2 *= a0 + 2 * d
                        v3 *= a0 + 3 * d
                    for ii in inc_idx:
                        cur = inc_cur_all[ii]
                        a0 = cur[rest2]
                        d = cur[rest2 + 1] - a0
                        v0 *= a0
                        v1 *= a0 + d
                        v2 *= a0 + 2 * d
                        v3 *= a0 + 3 * d
                    s0 += v0
                    s1 += v1
                    s2 += v2
                    s3 += v3
            for rec in cls_i:
                wj = rec[0][0][j]
                if wj:
                    s0 += wj * rec[1]
                    s1 += wj * rec[2]
                    s2 += wj * rec[3]
                    s3 += wj * rec[4]
            for ii, cur in enumerate(inc_cur_all):
                for p, d in self._inc[ii][j]:
                    cur[p] = (cur[p] + d) % _P
                    # incremental class-I h update: this delta's linear
                    # form times the term's eqk forms at the same pair
                    rest2 = (p >> 1) * 2
                    for rec in cls_i:
                        t = rec[0]
                        if t[5][0] != ii:
                            continue
                        if p & 1:
                            u0, u1, u2, u3 = 0, d, 2 * d, 3 * d
                        else:
                            u0, u1, u2, u3 = d, 0, -d, -2 * d
                        for ei in t[2]:
                            arr = eqk_all[ei]
                            a0 = arr[rest2]
                            da = arr[rest2 + 1] - a0
                            u0 *= a0
                            u1 *= a0 + da
                            u2 *= a0 + 2 * da
                            u3 *= a0 + 3 * da
                        rec[1] = (rec[1] + u0) % _P
                        rec[2] = (rec[2] + u1) % _P
                        rec[3] = (rec[3] + u2) % _P
                        rec[4] = (rec[4] + u3) % _P
        return [Fr(v % _P) for v in (s0, s1, s2, s3)]

    def _k_bind(self, challenge: Fr) -> None:
        r = int(challenge) % _P
        nr = (1 - r) % _P
        self._eqk = [
            [
                (t[2 * i] + r * (t[2 * i + 1] - t[2 * i])) % _P
                for i in range(len(t) // 2)
            ]
            for t in self._eqk
        ]

        def fold_cols(cols):
            out = []
            for col in cols:
                if len(col) == 1:  # the common one-hot case: no merging
                    p, c = col[0]
                    out.append([(p >> 1, c * (r if (p & 1) else nr) % _P)])
                    continue
                if not col:
                    out.append(col)
                    continue
                acc = {}
                for p, c in col:
                    w = c * (r if (p & 1) else nr) % _P
                    key = p >> 1
                    acc[key] = (acc.get(key, 0) + w) % _P
                out.append(list(acc.items()))
            return out

        self._sparse = [fold_cols(c) for c in self._sparse]
        self._inc = [fold_cols(u) for u in self._inc]
        self._k_rem //= 2
        self._inc_cur = [[0] * self._k_rem for _ in self._inc]
        self._inc_start = None  # stale after a fold; driver re-seeds

    def _delegate_terms(self):
        """The j-phase term list (coeff, [T-sized tables]) after the k
        binds — shared by the local delegate and the column-sharded mesh
        oracle (which concatenates shard slices before building ONE
        mesh-wide SumOfProductsOracle)."""
        sp_tables = [
            # fully folded sparse columns may hold several merged entries
            # at key 0 -> sum them
            [sum(c for _, c in col) % _P for col in cols]
            for cols in self._sparse
        ]
        inc_tables = []
        starts = self._inc_start
        for ii, ups in enumerate(self._inc):
            cur = starts[ii][0] if starts is not None else 0
            tab = []
            for col in ups:
                tab.append(cur)
                for _, d in col:
                    cur = (cur + d) % _P
            inc_tables.append(tab)
        terms = []
        for (w, eqj_idx, eqk_idx, sp_idx, sp_power, inc_idx, coeff) \
                in self._terms:
            c = coeff
            for ei in eqk_idx:
                c = c * self._eqk[ei][0] % _P
            tabs = [self._eqj[ji] for ji in eqj_idx]
            if sp_idx is not None:
                tabs += [sp_tables[sp_idx]] * sp_power
            tabs += [inc_tables[ii] for ii in inc_idx]
            terms.append((c, tabs))
        return terms

    def _build_delegate(self) -> None:
        if self._nat is not None:
            from .. import _native

            sop_id = _native.sco_make_sop(self._nat)
            _native.sco_free(self._nat)
            self._nat = None
            self._delegate = SumOfProductsOracle._from_native_id(
                self.log_t, sop_id
            )
            return
        self._delegate = SumOfProductsOracle(
            self.log_t, self._delegate_terms()
        )

    # -- SumcheckOracle interface -------------------------------------------

    def round_evaluations(self, round_index: int) -> List[Fr]:
        if self._round < self.log_k:
            if self._nat is not None:
                from .. import _native

                return _native.sco_round_evals(self._nat)
            return self._k_round_evals()
        if self._delegate is None:
            self._build_delegate()
        return self._delegate.round_evaluations(round_index - self.log_k)

    def bind(self, challenge: Fr) -> None:
        if self._round < self.log_k:
            if self._nat is not None:
                from .. import _native

                _native.sco_bind(self._nat, challenge)
            else:
                self._k_bind(challenge)
        else:
            if self._delegate is None:
                self._build_delegate()
            self._delegate.bind(challenge)
        self._round += 1

    def final_evaluation(self, challenges: Sequence[Fr]) -> Fr:
        if self._delegate is None:
            self._build_delegate()
        return self._delegate.final_evaluation(challenges)
