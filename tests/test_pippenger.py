"""TPU Pippenger MSM tests (CPU mesh, small window width for compile speed)."""

import random

from tnsh.field.fr import MODULUS, Fr
from tnsh.field.g1 import G1
from tnsh.commit.kzg import msm as msm_host
from tnsh.commit.pippenger_jax import build_schedule, msm_pippenger_jax


class TestSchedule:
    def test_schedule_covers_every_point_once_per_window(self):
        random.seed(81)
        scalars = [random.randrange(MODULUS) for _ in range(40)]
        c = 4
        idx, r = build_schedule(scalars, c)
        windows = (254 + c - 1) // c
        buckets = 1 << c
        assert idx.shape == (r, windows * buckets)
        for w in range(windows):
            block = idx[:, w * buckets:(w + 1) * buckets]
            scheduled = sorted(int(v) for v in block.flatten() if v >= 0)
            expected = sorted(
                i for i, s in enumerate(scalars) if (s >> (w * c)) & (buckets - 1)
            )
            assert scheduled == expected
            # bucket 0 column is never populated
            assert (block[:, 0] == -1).all()


class TestPippengerMSM:
    def test_matches_host(self):
        random.seed(82)
        g = G1.generator()
        points = [g * random.randrange(1, 10**9) for _ in range(24)]
        scalars = [Fr(random.randrange(MODULUS)) for _ in range(24)]
        assert msm_pippenger_jax(points, scalars, c=4) == msm_host(
            points, scalars
        )

    def test_edge_cases(self):
        g = G1.generator()
        pts = [g * 7, g * 7, G1.zero(), g * 3, g * 11]
        scs = [Fr(5), Fr(5), Fr(3), Fr(0), Fr(MODULUS - 1)]
        assert msm_pippenger_jax(pts, scs, c=4) == msm_host(pts, scs)
        assert msm_pippenger_jax([], [], c=4).is_zero()

    def test_small_scalars(self):
        # digits concentrated in the lowest window; most windows empty
        g = G1.generator()
        pts = [g * (i + 2) for i in range(8)]
        scs = [Fr(i + 1) for i in range(8)]
        assert msm_pippenger_jax(pts, scs, c=4) == msm_host(pts, scs)
