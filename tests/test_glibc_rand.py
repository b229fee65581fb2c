"""glibc rand() replica unit tests.

Golden values were captured from glibc's actual rand() on this machine via the
reference binary's init printout (nbody-seq.c:440-449) and a known-answer
sequence for srand(1).
"""

import numpy as np

from parallel_nbody_tpu.utils.glibc_rand import GlibcRand, nbody_init_arrays


def test_srand_1_known_answer():
    # First draws of glibc rand() after srand(1) (well-known KAT).
    rng = GlibcRand(1)
    assert [rng.rand() for _ in range(5)] == [
        1804289383, 846930886, 1681692777, 1714636915, 1957747793,
    ]


def test_seed_zero_maps_to_one():
    a = GlibcRand(0)
    b = GlibcRand(1)
    assert [a.rand() for _ in range(10)] == [b.rand() for _ in range(10)]


def test_nbody_init_n4_matches_reference_binary():
    # Captured from `/root/reference/nbody/nbody-seq 4 0 <1024x768 ppm> 0`.
    x, y, xv, yv, mass, radius = nbody_init_arrays(4, 1024, 768)
    np.testing.assert_array_equal(x, [313.0, 876.0, 512.0, 234.0])
    np.testing.assert_array_equal(y, [9.0, 766.0, 215.0, 46.0])
    np.testing.assert_allclose(xv, [4.575, -4.292, 3.406, 1.617], atol=5e-4)
    np.testing.assert_allclose(yv, [2.837, 4.851, -2.268, -2.845], atol=5e-4)


def test_radius_mass_model():
    n = 8
    _, _, _, _, mass, radius = nbody_init_arrays(n, 1024, 768)
    diag = np.sqrt(1024.0**2 + 768.0**2)
    for b in range(n):
        r = 1.0 + ((b * b + 1.0) * diag) / (25.0 * (n * n + 1.0))
        assert radius[b] == r
        assert mass[b] == r * r * r


def test_draws_are_31_bit():
    rng = GlibcRand(27102015)
    draws = rng.randn_many(1000)
    assert draws.min() >= 0
    assert draws.max() < 2**31
