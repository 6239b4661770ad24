"""Equality tests for the cell-scheduled TPU Pippenger MSM (msm_sched).

Every case checks bit-identical group elements against the host golden MSM
(tnsh.commit.kzg.msm), per the backend-equality invariant.  Runs on the
virtual CPU mesh (conftest) — the kernel is backend-agnostic XLA.
"""

import random

import numpy as np
import pytest

import jax


@pytest.fixture(scope="module", autouse=True)
def _drop_prior_executables():
    """Free the executables compiled by earlier test modules before the
    scheduled-MSM kernels compile.

    The full-suite crash bisected in round 5 (3x-reproduced SIGSEGV /
    SIGABRT at test_msm_matches_host, inside XLA:CPU's compile/load or
    the persistent-cache deserialize of the scheduled kernel) needs BOTH
    test_fr_pallas and test_jax_backend run first: with hundreds of
    compiled programs resident, loading the suite's largest executable
    dies in jaxlib 0.9.  Clearing the in-memory caches releases that
    code memory; the handful of later re-compiles is noise next to the
    crash.  (Full protection is process isolation — run_tests.sh runs
    each test file in a fresh process; this fixture keeps the solo-file
    headroom large.)"""
    jax.clear_caches()
    yield


from tnsh.field.fr import Fr, MODULUS
from tnsh.field.g1 import G1
from tnsh.commit.kzg import msm as host_msm
from tnsh.commit.msm_sched import (
    MsmPlan,
    ScheduledMsmContext,
    msm_scheduled,
    scalars_to_byte_matrix,
    signed_digits,
)


@pytest.fixture(scope="module")
def points():
    random.seed(101)
    g = G1.generator()
    pts = [g.scalar_mul(Fr(random.randrange(1, MODULUS))) for _ in range(48)]
    pts[5] = G1.zero()  # identity points must contribute nothing
    return pts


def test_signed_digits_reconstruct():
    random.seed(3)
    vals = [0, 1, 127, 128, 255, 256, MODULUS - 1] + [
        random.randrange(MODULUS) for _ in range(20)
    ]
    sb = scalars_to_byte_matrix([Fr(v) for v in vals], len(vals))
    d = signed_digits(sb)
    for j, v in enumerate(vals):
        acc = sum(int(d[w, j]) * (256 ** w) for w in range(d.shape[0]))
        assert acc == v


def test_signed_digits_adaptive_width():
    sb = scalars_to_byte_matrix([Fr(300), Fr(7)], 2)
    d = signed_digits(sb)
    assert d.shape[0] == 4  # 2 bytes used -> W=3 padded to 4


def test_plan_splits_heavy_buckets():
    d = np.zeros((4, 256), dtype=np.int8)
    d[0, :] = 5  # 256 identical digits: one group claims 256 lanes
    plan = MsmPlan(d, 256)
    assert plan.logk_map[0, 5] == 8
    assert plan.r_exact == 1
    d[0, :128] = 3  # two groups of 128 -> 128 lanes each, still 1 step
    plan = MsmPlan(d, 256)
    assert plan.logk_map[0, 3] == 7
    assert plan.logk_map[0, 5] == 7
    assert plan.r_exact == 1


def test_plan_full_width_uniform_keeps_single_lanes():
    rng = np.random.default_rng(0)
    d = rng.integers(-128, 128, (32, 4096), dtype=np.int8)
    plan = MsmPlan(d, 4096)
    # 32 windows x 128 magnitudes exactly fill the 4096-lane budget
    assert plan.r_exact >= 1
    assert int((1 << plan.logk_map[plan.base_map >= 0]).max()) <= 4096


@pytest.mark.parametrize(
    "name,make",
    [
        ("full", lambda n: [Fr(random.randrange(MODULUS)) for _ in range(n)]),
        ("small", lambda n: [Fr(random.randrange(1 << 26)) for _ in range(n)]),
        ("skewed", lambda n: [Fr(424242)] * n),
        ("sparse", lambda n: [Fr(0) if i % 3 else Fr(i) for i in range(n)]),
    ],
)
def test_msm_matches_host(points, name, make):
    random.seed(hash(name) % (1 << 30))
    scalars = make(len(points))
    assert msm_scheduled(points, scalars) == host_msm(points, scalars)


def test_msm_all_zero_scalars(points):
    assert msm_scheduled(points, [Fr(0)] * len(points)) == G1.zero()


def test_context_prefix_msm(points):
    random.seed(17)
    ctx = ScheduledMsmContext(points)
    for n in (len(points), 13, 1):
        scalars = [Fr(random.randrange(MODULUS)) for _ in range(n)]
        assert ctx.msm(scalars) == host_msm(points[:n], scalars)


def test_context_scalar_bytes_input(points):
    random.seed(23)
    ctx = ScheduledMsmContext(points)
    vals = [random.randrange(MODULUS) for _ in range(len(points))]
    raw = b"".join(v.to_bytes(32, "little") for v in vals)
    assert ctx.msm(raw) == host_msm(points, [Fr(v) for v in vals])


def test_native_srs_context_matches():
    _native = pytest.importorskip("tnsh._native")
    if not _native.available:
        pytest.skip("native layer unavailable")
    random.seed(31)
    scal = b"".join(
        random.randrange(MODULUS).to_bytes(32, "little") for _ in range(32)
    )
    srs_id = _native.srs_create_fixed_base(G1.generator(), scal)
    try:
        ctx = ScheduledMsmContext.from_native_srs(srs_id)
        scalars = [Fr(random.randrange(MODULUS)) for _ in range(32)]
        assert ctx.msm(scalars) == _native.srs_msm(srs_id, scalars)
    finally:
        _native.srs_free(srs_id)


def test_hybrid_srs_msm_matches_native():
    _native = pytest.importorskip("tnsh._native")
    if not _native.available:
        pytest.skip("native layer unavailable")
    from tnsh.commit import kzg
    from tnsh.field.g1 import G1

    random.seed(47)
    n = 96
    sb = b"".join(
        random.randrange(MODULUS).to_bytes(32, "little") for _ in range(n)
    )
    srs_id = _native.srs_create_fixed_base(G1.generator(), sb)
    try:
        scal = [Fr(random.randrange(MODULUS)) for _ in range(n)]
        want = _native.srs_msm(srs_id, scal)
        # adaptive policy: first call is exact either way — host-only on a
        # cold kernel shape, hybrid when another SRS already compiled it
        assert kzg._hybrid_srs_msm(srs_id, scal, n) == want
        st = kzg._tpu_msm_stats[kzg._msm_bucket(srs_id, n)]
        assert st["host"] is not None
        # prewarm -> measured split engages; results stay identical
        kzg.prewarm_tpu_msm(srs_id, n)
        assert st["tpu"] is not None
        assert kzg._hybrid_srs_msm(srs_id, scal, n) == want
        raw = b"".join(int(s).to_bytes(32, "little") for s in scal)
        assert kzg._hybrid_srs_msm(srs_id, raw, n) == want
    finally:
        _native.srs_free(srs_id)


def test_compiled_kernel_constructors_are_cached():
    """Round-3 regression (VERDICT r3 weak #2): a refactor moved the
    @lru_cache off _compiled_msm_kernel_pallas, so every TPU MSM re-traced
    the full scheduled kernel (~30 s/call, 37x end-to-end).  Lock the cache
    on BOTH engine constructors: same shape twice => exactly one miss."""
    from tnsh.commit import msm_sched

    for ctor, cached, args2 in (
        (msm_sched._compiled_msm_kernel,
         msm_sched._compiled_msm_kernel,
         (1, 512, 4, 16)),
        (msm_sched._compiled_msm_kernel_pallas,
         msm_sched._compiled_msm_kernel_pallas_cached,
         # default-arg and explicit-arg call forms must share ONE entry
         # (lru_cache does not normalize defaults — a mismatch compiles
         # the same kernel twice, ~400 s on TPU)
         (1, 512, 4, 16, False)),
    ):
        assert hasattr(cached, "cache_info"), (
            f"{cached.__name__} lost its @lru_cache"
        )
        cached.cache_clear()
        a = ctor(1, 512, 4, 16)
        b = ctor(*args2)
        assert a is b, f"{ctor.__name__} rebuilt for an identical shape"
        info = cached.cache_info()
        assert info.misses == 1 and info.hits == 1
    # the shared Pallas segment builder keeps its own cache, keyed on the
    # interpret flag too (a non-interpret kernel must never serve an
    # interpret-mode caller — the cross-test poisoning this caught)
    assert hasattr(msm_sched._make_insert_seg_cached, "cache_info")


def test_engine_selection_by_measurement(points, monkeypatch):
    """VERDICT r3 task 7: engine choice must come from measurement, not a
    platform check.  A stubbed slow 'pallas' engine must lose the
    measure_engines race and never be routed to afterwards."""
    import time

    from tnsh.commit import msm_sched

    calls = {"pallas": 0}

    def slow_pallas(chunks, m, w_count, r_c, interpret=False):
        real = msm_sched._compiled_msm_kernel(chunks, m, w_count, r_c)

        def wrapper(*args):
            calls["pallas"] += 1
            # decisively slower than the XLA engine + per-call host
            # overhead (~4 s at this size on the 2-core CI host)
            time.sleep(8.0)
            return real(*args)

        return wrapper

    monkeypatch.setattr(
        msm_sched, "_compiled_msm_kernel_pallas", slow_pallas
    )
    monkeypatch.setattr(msm_sched, "_pallas_msm_enabled", lambda: True)
    monkeypatch.setattr(msm_sched, "_ENGINE_CHOICE", {})
    ctx = ScheduledMsmContext(points)
    random.seed(83)
    scal = [Fr(random.randrange(MODULUS)) for _ in range(len(points))]
    rates = ctx.measure_engines(scal)
    assert set(rates) == {"xla", "pallas"}
    assert rates["xla"] > rates["pallas"]
    assert msm_sched._ENGINE_CHOICE[ctx._last_base_key] == "xla"
    # subsequent default-engine calls must route to the measured winner
    before = calls["pallas"]
    assert ctx.msm(scal) == host_msm(points, scal)
    assert calls["pallas"] == before, "slow engine was routed to anyway"


def test_pallas_insert_engine_matches_native(monkeypatch):
    """The Pallas VMEM-resident insertion engine (round-3 flagship) must
    produce the exact group element of the native host MSM.  Runs the
    kernel in Mosaic interpret mode on the CPU mesh (~80 s) — the same
    kernel code path the TPU compiles."""
    _native = pytest.importorskip("tnsh._native")
    if not _native.available:
        pytest.skip("native layer unavailable")
    monkeypatch.setenv("TNSH_PALLAS_INTERPRET", "1")
    from tnsh.commit.msm_sched import ScheduledMsmContext
    from tnsh.field.g1 import G1

    random.seed(71)
    n = 4096
    sb = b"".join(
        random.randrange(MODULUS).to_bytes(32, "little") for _ in range(256)
    ) * (n // 256)
    srs_id = _native.srs_create_fixed_base(G1.generator(), sb[: 32 * n])
    try:
        ctx = ScheduledMsmContext.from_native_srs(srs_id)
        scal = b"".join(
            random.randrange(1 << 20).to_bytes(32, "little")
            for _ in range(n)
        )
        got = ctx.msm(scal)
        want = _native.srs_msm(srs_id, scal)
        assert got == want
    finally:
        _native.srs_free(srs_id)
