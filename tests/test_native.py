"""Native library bridge tests: bit-identity with the Python implementations."""

import numpy as np
import pytest

from parallel_nbody_tpu.utils import native_bridge
from parallel_nbody_tpu.utils.glibc_rand import GlibcRand, nbody_init_arrays


needs_native = pytest.mark.skipif(not native_bridge.available(),
                                  reason="native lib unavailable")


@needs_native
def test_rand_stream_bit_identical():
    py = GlibcRand(27102015)
    native = native_bridge.glibc_rand_fill(27102015, 5000)
    np.testing.assert_array_equal(native, py.randn_many(5000))


@needs_native
def test_rand_stream_bit_identical_large_seed():
    # Seeds >= 2**31 wrap to a negative int32 seed word (C truncation in
    # the first Schrage step); both implementations must agree with glibc.
    for seed in (3000000000, 2147483648, 4294967295):
        py = GlibcRand(seed)
        native = native_bridge.glibc_rand_fill(seed, 500)
        np.testing.assert_array_equal(native, py.randn_many(500))


@needs_native
def test_init_bit_identical_to_python():
    nat = native_bridge.nbody_init(1000, 1024, 768, 27102015)
    # Force the Python path by staying under the dispatch threshold via
    # direct construction.
    rng = GlibcRand(27102015)
    diag = np.sqrt(1024.0**2 + 768.0**2)
    for b in range(1000):
        x = rng.rand() % 1024
        y = rng.rand() % 768
        r = 1.0 + ((b * b + 1.0) * diag) / (25.0 * (1000 * 1000 + 1.0))
        xv = ((rng.rand() % 20000) - 10000) / 2000.0
        yv = ((rng.rand() % 20000) - 10000) / 2000.0
        assert nat[0][b] == x and nat[1][b] == y
        assert nat[2][b] == xv and nat[3][b] == yv
        assert nat[5][b] == r and nat[4][b] == r * r * r


@needs_native
def test_large_init_dispatches_native(monkeypatch):
    # nbody_init_arrays uses native for n >= 4096; results must match the
    # Python oracle for a sampled prefix.  Spy on the bridge call: values
    # alone cannot prove the native path ran (the Python fallback is
    # bit-identical by design), so a silently-dead dispatch would otherwise
    # stay green forever.
    calls = []
    real = native_bridge.nbody_init

    def spy(*a, **kw):
        calls.append(a)
        return real(*a, **kw)

    monkeypatch.setattr(native_bridge, "nbody_init", spy)
    x, y, xv, yv, m, r = nbody_init_arrays(4096, 1024, 768)
    assert calls, "n=4096 init did not dispatch to the native path"
    rng = GlibcRand(27102015)
    for b in range(8):
        assert x[b] == rng.rand() % 1024
        assert y[b] == rng.rand() % 768
        rng.rand(), rng.rand()


@needs_native
def test_ppm_blit(tmp_path):
    from parallel_nbody_tpu.utils import ppm
    p = str(tmp_path / "b.ppm")
    h = ppm.create(p, 32, 16)
    px = np.random.default_rng(0).integers(0, 255, (16, 32, 3)).astype(np.uint8)
    assert native_bridge.ppm_blit(p, h.data_offset, px)
    np.testing.assert_array_equal(ppm.read_pixels(h), px)


def test_native_formatter_matches_python():
    import numpy as np
    import pytest
    from parallel_nbody_tpu.utils import native_bridge
    if not native_bridge.available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(0)
    # Mix of magnitudes incl. the ~1e6 forces seen in real outputs, exact
    # halves (banker's-rounding hazard), negatives, zeros.
    vals = [rng.uniform(-1e6, 1e6, 64),
            np.array([0.0, -0.0, 0.0005, -0.0005, 1.0005, 2.5, -2.5] * 8
                     + [0.0] * 8)]
    for base in vals:
        cols = [np.roll(base, k) for k in range(6)]
        native = native_bridge.format_state_native(*cols)
        py = "".join("%10.3f %10.3f %10.3f %10.3f %10.3f %10.3f\n"
                     % tuple(c[i] for c in cols)
                     for i in range(base.shape[0]))
        assert native == py
