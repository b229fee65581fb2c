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


def test_large_unsigned_seeds_match_glibc():
    """glibc stores the unsigned srand() seed into an int32_t, so seeds
    >= 2**31 start the Schrage recurrence from a NEGATIVE word whose C
    '/'+'%' truncate toward zero (Python's divmod floors — the historical
    bug here).  KATs captured from glibc's actual srand/rand on this
    machine (gcc, glibc TYPE_3)."""
    expected = {
        3000000000: [2058147116, 854483408, 922419988, 286396165,
                     2068523933, 1172167191, 573677598, 1899216469],
        2147483648: [1336741213, 1210407648, 1447044896, 337392383,
                     82502902, 538660432, 1313908778, 370221063],
        4294967295: [254925627, 1205188300, 366127624, 1401405153,
                     76053476, 1604170158, 1302235366, 362229243],
    }
    for seed, draws in expected.items():
        rng = GlibcRand(seed)
        assert [rng.rand() for _ in range(8)] == draws, seed


def test_draws_are_31_bit():
    rng = GlibcRand(27102015)
    draws = rng.randn_many(1000)
    assert draws.min() >= 0
    assert draws.max() < 2**31
