"""Checkpoint/resume exactness tests."""

import numpy as np

from parallel_nbody_tpu.config import SimConfig
from parallel_nbody_tpu.models.engine import run
from parallel_nbody_tpu.state import init_state
from parallel_nbody_tpu.utils import checkpoint as ckpt
from parallel_nbody_tpu.utils.output import format_state

CFG = SimConfig(force_mode="trig", dtype="float64")


def test_save_load_roundtrip(tmp_path):
    st = run(CFG, init_state(16, CFG), 50)
    path = str(tmp_path / "s.npz")
    ckpt.save_state(path, st, 50)
    loaded, step = ckpt.load_state(path, CFG)
    assert step == 50
    for a, b in zip(st, loaded):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_is_bit_exact(tmp_path):
    full = run(CFG, init_state(16, CFG), 100)
    half = run(CFG, init_state(16, CFG), 40)
    path = str(tmp_path / "h.npz")
    ckpt.save_state(path, half, 40)
    resumed, step = ckpt.load_state(path, CFG)
    out = run(CFG, resumed, 100 - step)
    assert format_state(out) == format_state(full)


def test_orbax_roundtrip_sharded(tmp_path):
    """Orbax checkpoint of a globally-sharded state restores bit-exactly,
    including restore-with-resharding."""
    import jax
    import numpy as np
    from parallel_nbody_tpu.config import SimConfig
    from parallel_nbody_tpu.parallel.mesh import (body_sharding, make_mesh,
                                                  shard_state)
    from parallel_nbody_tpu.state import init_state, pad_state
    from parallel_nbody_tpu.utils.checkpoint import (load_state_orbax,
                                                     save_state_orbax)

    cfg = SimConfig(dtype="float64")
    st = init_state(32, cfg)
    padded, _ = pad_state(st, 8)
    mesh = make_mesh(8)
    sharded = shard_state(padded, mesh)

    path = str(tmp_path / "ckpt")
    save_state_orbax(path, sharded, 123)

    restored, step, n_real = load_state_orbax(path, cfg)
    assert step == 123
    assert n_real == padded.x.shape[0]  # no n_real passed: padded length
    for a, b in zip(restored, sharded):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Restore directly into a 4-way sharding (resharding on read).
    mesh4 = make_mesh(4)
    resharded, _, _ = load_state_orbax(path, cfg,
                                       sharding=body_sharding(mesh4))
    assert resharded.x.sharding.mesh.size == 4
    np.testing.assert_array_equal(np.asarray(resharded.x),
                                  np.asarray(sharded.x))


def test_checkpoint_records_true_step_on_resume_past_target(tmp_path,
                                                            capsys):
    """Resuming a step-100 checkpoint with argv steps=50 runs zero steps;
    the re-saved checkpoint must record step 100 (the state's true step
    count), not argv's 50 — else a later resume re-runs steps on a state
    that already took them."""
    from parallel_nbody_tpu import cli
    from parallel_nbody_tpu.utils import checkpoint as ckpt_mod
    from parallel_nbody_tpu.utils import ppm

    arena = str(tmp_path / "arena.ppm")
    ppm.create(arena, 64, 48)
    ck1 = str(tmp_path / "ck1.npz")
    ck2 = str(tmp_path / "ck2.npz")
    args = ["nbody", "4", "0", arena, "100", "--devices=1",
            "--dtype=float64"]
    assert cli.main(args + ["--checkpoint=%s" % ck1]) == 0
    assert cli.main(["nbody", "4", "0", arena, "50",
                     "--resume=%s" % ck1, "--checkpoint=%s" % ck2,
                     "--devices=1", "--dtype=float64"]) == 0
    capsys.readouterr()
    cfg = SimConfig(xdim=64, ydim=48, dtype="float64")
    st1, step1 = ckpt_mod.load_state(ck1, cfg)
    st2, step2 = ckpt_mod.load_state(ck2, cfg)
    assert step1 == 100
    assert step2 == 100  # NOT argv's 50
    np.testing.assert_array_equal(np.asarray(st1.x), np.asarray(st2.x))
    np.testing.assert_array_equal(np.asarray(st1.xv), np.asarray(st2.xv))


def test_cli_orbax_save_failure_is_guarded(tmp_path, monkeypatch, capsys):
    """ADVICE r3: a failing Orbax save (e.g. host-local arrays in a
    multi-process run) must not crash the driver after the whole simulation
    ran — the CLI reports "Cannot checkpoint" and still prints the result."""
    from parallel_nbody_tpu import cli
    from parallel_nbody_tpu.utils import checkpoint as ckpt_mod
    from parallel_nbody_tpu.utils import ppm

    def boom(*a, **kw):
        raise ValueError("Cannot serialize host local jax.Array")

    monkeypatch.setattr(ckpt_mod, "save_state_orbax", boom)
    arena = str(tmp_path / "arena.ppm")
    ppm.create(arena, 64, 48)
    rc = cli.main(["nbody", "4", "0", arena, "1",
                   "--checkpoint=%s" % str(tmp_path / "ck"),
                   "--devices=1", "--dtype=float64"])
    out = capsys.readouterr()
    assert rc == 0
    assert "Cannot checkpoint to" in out.err
    assert len(out.out.splitlines()) == 4  # the result still printed


def test_orbax_save_refuses_to_replace_regular_file(tmp_path):
    """Orbax's force=True save would silently DELETE an existing regular
    file at the target path (say the arena PPM) and write a checkpoint
    directory in its place — save_state_orbax must refuse instead (round-5
    probe finding)."""
    import pytest

    from parallel_nbody_tpu.utils.checkpoint import save_state_orbax

    victim = tmp_path / "precious.txt"
    victim.write_text("do not eat")
    st = init_state(4, CFG)
    with pytest.raises(ValueError, match="refusing to replace"):
        save_state_orbax(str(victim), st, 1)
    assert victim.read_text() == "do not eat"  # untouched


def test_cli_orbax_checkpoint_to_existing_file_is_loud_and_safe(tmp_path,
                                                               capsys):
    """Through the CLI the refusal surfaces as the standard "Cannot
    checkpoint" report (run output still delivered, file still intact)."""
    from parallel_nbody_tpu import cli
    from parallel_nbody_tpu.utils import ppm

    arena = str(tmp_path / "arena.ppm")
    ppm.create(arena, 64, 48)
    before = open(arena, "rb").read()
    rc = cli.main(["nbody", "4", "0", arena, "1",
                   "--checkpoint=%s" % arena,  # existing FILE, no .npz
                   "--devices=1", "--dtype=float64"])
    out = capsys.readouterr()
    assert rc == 0
    assert "Cannot checkpoint to" in out.err
    assert len(out.out.splitlines()) == 4
    assert open(arena, "rb").read() == before  # arena survived


def test_cli_npz_save_failure_is_guarded(tmp_path, capsys):
    """An npz checkpoint into a missing parent directory must not crash the
    driver into a traceback after the whole simulation ran (round-5 probe
    finding) — same contract as the Orbax guard: report and still deliver
    the run's output."""
    from parallel_nbody_tpu import cli
    from parallel_nbody_tpu.utils import ppm

    arena = str(tmp_path / "arena.ppm")
    ppm.create(arena, 64, 48)
    rc = cli.main(["nbody", "4", "0", arena, "1",
                   "--checkpoint=%s" % str(tmp_path / "no" / "parent.npz"),
                   "--devices=1", "--dtype=float64"])
    out = capsys.readouterr()
    assert rc == 0
    assert "Cannot checkpoint to" in out.err
    assert len(out.out.splitlines()) == 4  # the result still printed
