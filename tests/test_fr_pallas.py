"""Equality tests for the Pallas elementwise Fr kernels (fr_pallas).

Every kernel must unpack to the SAME canonical field elements as the XLA
mle_jax path (and therefore the host golden path) — the backend-equality
invariant.  Runs in Mosaic interpret mode on the CPU mesh: the identical
kernel code the TPU compiles.
"""

import numpy as np
import pytest

from tnsh.field.fr import MODULUS, Fr
from tnsh.poly import mle_jax


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("TNSH_PALLAS_INTERPRET", "1")


def _rand_tables(rng, n, k):
    import jax.numpy as jnp

    return [
        jnp.asarray(mle_jax.pack_mle(
            [Fr(int(v)) for v in rng.integers(0, 1 << 62, n)]
        ))
        for _ in range(k)
    ]


def _canon(planes):
    return [int(v) for v in mle_jax.unpack_fr(planes)]


def test_enabled_under_interpret():
    from tnsh.field import fr_pallas

    assert fr_pallas.enabled()
    assert fr_pallas.can_fold(2 * fr_pallas.BLOCK)
    assert not fr_pallas.can_fold(fr_pallas.BLOCK)


def test_fold_matches_xla():
    import jax.numpy as jnp

    from tnsh.field import fr_pallas

    rng = np.random.default_rng(5)
    n = 4 * fr_pallas.BLOCK  # 2 blocks after de-interleave
    (t,) = _rand_tables(rng, n, 1)
    r = jnp.asarray(mle_jax.pack_fr_scalar(Fr(0x1234567890ABCDEF)))
    got = fr_pallas.fold(t, r)
    want = mle_jax._fold_jit_xla(t, r)
    assert _canon(got) == _canon(want)


def test_product_round_evals_matches_xla():
    import jax.numpy as jnp

    from tnsh.field import fr_pallas

    rng = np.random.default_rng(6)
    n = 4 * fr_pallas.BLOCK
    tables = _rand_tables(rng, n, 3)
    got = fr_pallas.product_round_evals(tables)
    want = mle_jax._product_round_evals_jit_xla(tables, None)
    assert _canon(got) == _canon(want)
    # scaled variant (scale applied post-sum — distributive, exact)
    s = jnp.asarray(mle_jax.pack_fr_scalar(Fr(987654321123456789)))
    got_s = fr_pallas.product_round_evals(tables, s)
    want_s = mle_jax._product_round_evals_jit_xla(tables, s)
    assert _canon(got_s) == _canon(want_s)


def test_sop_round_evals_matches_xla():
    import jax.numpy as jnp

    from tnsh.field import fr_pallas

    rng = np.random.default_rng(7)
    n = 2 * fr_pallas.BLOCK  # 1 block: grid accumulate is covered by the
    # product test; this one pins the term/coeff kernel structure
    tables = _rand_tables(rng, n, 3)
    coeffs = [
        jnp.asarray(mle_jax.pack_fr_scalar(Fr(c)))
        for c in (1, MODULUS - 1, 7)
    ]
    idxs = ((0, 1, 2), (0, 1), (2,))
    got = fr_pallas.sum_of_products_round_evals(tables, coeffs, idxs)
    want = mle_jax._sop_round_evals_jit_xla(tables, coeffs, idxs)
    assert _canon(got) == _canon(want)


def test_routed_entry_points_use_pallas_and_match():
    """fold_jit / *_round_evals_jit must route large tables to Pallas when
    enabled and produce canonical results identical to XLA."""
    import jax.numpy as jnp

    from tnsh.field import fr_pallas

    rng = np.random.default_rng(8)
    n = 2 * fr_pallas.BLOCK
    tables = _rand_tables(rng, n, 2)
    r = jnp.asarray(mle_jax.pack_fr_scalar(Fr(42424242)))
    assert _canon(mle_jax.fold_jit(tables[0], r)) == _canon(
        mle_jax._fold_jit_xla(tables[0], r)
    )
    assert _canon(mle_jax.product_round_evals_jit(tables)) == _canon(
        mle_jax._product_round_evals_jit_xla(tables, None)
    )
    # small tables fall back to XLA (no Pallas shape built)
    small = _rand_tables(rng, 64, 1)[0]
    assert _canon(mle_jax.fold_jit(small, r)) == _canon(
        mle_jax._fold_jit_xla(small, r)
    )


def test_mont_mul_chain_matches_iterated():
    from tnsh.field import fr_pallas
    from tnsh.field.fr_jax import fr_mont_mul

    import jax.numpy as jnp

    rng = np.random.default_rng(9)
    n = fr_pallas.BLOCK
    x = _rand_tables(rng, n, 1)[0]
    y = _rand_tables(rng, n, 1)[0]
    iters = 5
    got = fr_pallas.mont_mul_chain(x, y, iters)
    want = x
    for _ in range(iters):
        want = fr_mont_mul(want, y)
    assert _canon(got) == _canon(want)
