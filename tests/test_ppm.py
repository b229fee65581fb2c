"""P6 PPM I/O tests (header parsing incl. comments, in-place frame writes —
the map_P6/Eat_Space/Get_Number contract, nbody-seq.c:171-304)."""

import numpy as np
import pytest

from parallel_nbody_tpu.utils import ppm


def test_create_and_read_header(tmp_path):
    p = str(tmp_path / "a.ppm")
    ppm.create(p, 128, 96)
    h = ppm.read_header(p)
    assert (h.xdim, h.ydim, h.maxval) == (128, 96, 255)
    assert ppm.read_pixels(h).shape == (96, 128, 3)


def test_header_with_comments(tmp_path):
    p = str(tmp_path / "c.ppm")
    with open(p, "wb") as f:
        f.write(b"P6\n# a GIMP-style comment\n64 # inline\n32\n255\n")
        f.write(bytes(64 * 32 * 3))
    h = ppm.read_header(p)
    assert (h.xdim, h.ydim) == (64, 32)


def test_reject_p5(tmp_path):
    p = str(tmp_path / "bad.ppm")
    with open(p, "wb") as f:
        f.write(b"P5\n4 4\n255\n" + bytes(16))
    with pytest.raises(ppm.PPMError):
        ppm.read_header(p)


def test_reject_zero_dimensions(tmp_path):
    # A zero dim would reach init's rand() % xdim — SIGFPE in the native
    # path, ZeroDivisionError in Python; the parser must reject it first.
    p = str(tmp_path / "zero.ppm")
    with open(p, "wb") as f:
        f.write(b"P6\n0 768\n255\n")
    with pytest.raises(ppm.PPMError):
        ppm.read_header(p)


def test_reject_16bit(tmp_path):
    p = str(tmp_path / "deep.ppm")
    with open(p, "wb") as f:
        f.write(b"P6\n4 4\n65535\n" + bytes(4 * 4 * 6))
    with pytest.raises(ppm.PPMError):
        ppm.read_header(p)


def test_write_pixels_roundtrip_preserves_header(tmp_path):
    p = str(tmp_path / "w.ppm")
    h = ppm.create(p, 16, 8)
    px = np.arange(16 * 8 * 3, dtype=np.uint8).reshape(8, 16, 3)
    ppm.write_pixels(h, px)
    h2 = ppm.read_header(p)
    assert (h2.xdim, h2.ydim) == (16, 8)
    np.testing.assert_array_equal(ppm.read_pixels(h2), px)


def test_reference_arena_header():
    import os
    path = "/root/reference/nbody.ppm"
    if not os.path.exists(path):
        pytest.skip("reference arena unavailable")
    h = ppm.read_header(path)
    assert (h.xdim, h.ydim) == (1024, 768)


def test_long_comment_header(tmp_path):
    # Headers with comment blocks beyond 256 bytes must parse (the reference
    # scans the whole mmapped file; a short fixed read must not reject them).
    from parallel_nbody_tpu.utils import ppm
    p = str(tmp_path / "longhdr.ppm")
    comment = b"# " + b"x" * 600 + b"\n"
    with open(p, "wb") as f:
        f.write(b"P6\n" + comment + b"16 8\n255\n")
        f.write(bytes(16 * 8 * 3))
    hdr = ppm.read_header(p)
    assert (hdr.xdim, hdr.ydim) == (16, 8)
