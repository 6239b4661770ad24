"""Pallas TPU kernel tests (run in interpret mode on the CPU test mesh)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tnsh.field.fr import Fr
from tnsh.field.limbs import FR_SPEC, pack_ints, unpack_ints
from tnsh.poly.mle import MultilinearExtension
from tnsh.poly.mle_jax import pack_fr_scalar, pack_mle, unpack_fr


def _on_cpu():
    return jax.devices()[0].platform == "cpu"


class TestPallasKernels:
    def test_mont_mul_pallas(self):
        from jax.experimental.pallas import tpu as pltpu

        from tnsh.field.fr_pallas import mont_mul_pallas

        random.seed(71)
        p = FR_SPEC.modulus
        n = 1024
        xs = [random.randrange(p) for _ in range(n)]
        ys = [random.randrange(p) for _ in range(n)]
        ax = jnp.asarray(pack_ints(xs, FR_SPEC))
        ay = jnp.asarray(pack_ints(ys, FR_SPEC))
        ctx = pltpu.force_tpu_interpret_mode() if _on_cpu() else _nullcontext()
        with ctx:
            got = unpack_ints(np.asarray(mont_mul_pallas(ax, ay)), FR_SPEC)
        assert got == [x * y % p for x, y in zip(xs, ys)]

    def test_fold_halves_pallas(self):
        from jax.experimental.pallas import tpu as pltpu

        from tnsh.field.fr_pallas import fold_halves_pallas

        random.seed(72)
        p = FR_SPEC.modulus
        n = 2048
        evals = [Fr(random.randrange(p)) for _ in range(n)]
        mle = MultilinearExtension.from_evaluations(evals)
        r = Fr(random.randrange(p))
        table = jnp.asarray(pack_mle(evals))
        ctx = pltpu.force_tpu_interpret_mode() if _on_cpu() else _nullcontext()
        with ctx:
            folded = fold_halves_pallas(
                table, jnp.asarray(pack_fr_scalar(r))
            )
        assert unpack_fr(folded) == mle.fix_last_variable(r).evaluations

    def test_small_fallback_path(self):
        # half < BLOCK takes the XLA fallback branch.
        from tnsh.field.fr_pallas import fold_halves_pallas

        random.seed(73)
        p = FR_SPEC.modulus
        evals = [Fr(random.randrange(p)) for _ in range(16)]
        mle = MultilinearExtension.from_evaluations(evals)
        r = Fr(random.randrange(p))
        folded = fold_halves_pallas(
            jnp.asarray(pack_mle(evals)), jnp.asarray(pack_fr_scalar(r))
        )
        assert unpack_fr(folded) == mle.fix_last_variable(r).evaluations

    def test_bit_reverse_schedule_equivalence(self):
        """Fold-halves over a bit-reversed table == reference fold order."""
        from tnsh.field.fr_pallas import bit_reverse_permutation

        random.seed(74)
        p = FR_SPEC.modulus
        nv = 4
        evals = [Fr(random.randrange(p)) for _ in range(1 << nv)]
        mle = MultilinearExtension.from_evaluations(evals)
        point = [Fr(random.randrange(p)) for _ in range(nv)]
        perm = bit_reverse_permutation(nv)
        rev = [evals[perm[i]] for i in range(1 << nv)]
        cur = MultilinearExtension.from_evaluations(rev)
        for r in point:
            cur = cur.fix_last_variable(r)
        assert cur.evaluations[0] == mle.evaluate(point)


class _nullcontext:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False
