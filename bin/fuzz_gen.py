"""Seeded config generators shared by the fuzz harnesses (bin/fuzz-*.sh).

One generator per harness kind, one RNG stream per seed: the draw ORDER here
is load-bearing — the committed sweep records in tests_out/fuzz* were
produced from these exact sequences, so a reordered draw silently changes
what a recorded seed covers.

    python bin/fuzz_gen.py parity SEED COUNT   # lines: N STEPS FLAGS...
    python bin/fuzz_gen.py resume SEED COUNT   # lines: N TOTAL SPLIT FMT F1 F2
    python bin/fuzz_gen.py parity2 SEED COUNT  # lines: N STEPS PROCS FLAGS...
    python bin/fuzz_gen.py resume2 SEED COUNT  # resume + per-leg kernel draw

``parity2`` (VERDICT r4 #3) extends the parity draw with the two axes the
original generator fixed: the KERNEL VARIANT (trig default / --fast /
--pallas — all three print byte-identical fp64 output, proven by the
recorded NP-grid) and the PROCESS COUNT (PROCS=2 configs run under the
2-process jax.distributed launcher, bin/multihost-cli.sh, so the
distributed runtime's rank-0 output is fuzz-diffed against the reference
binary).  It is a NEW kind rather than a change to ``parity`` because the
committed tests_out/fuzz records pin the original stream byte-for-byte.

``resume2`` applies the same variant axis to the checkpoint/resume fuzz:
each LEG independently draws a kernel (trig / --fast / --pallas) on top of
its sharding, so a checkpoint written under one kernel is resumed under
another — checkpoints must be kernel-agnostic state, and every cross-kernel
hand-off must still byte-match the reference binary's uninterrupted runs.
Again a new kind: the tests_out/fuzz_resume records pin ``resume``'s stream.

Sharding draws are conservatively capped by the body count (devices <= N,
2-D mesh only at N >= 16).  The engine handles oversubscribed meshes fine —
empty shards are just padding, byte-verified vs the reference at N=4 on 8
shards and N=5 on a 2x4 grid — but the caps are LOAD-BEARING for the
committed records: loosening them would change every pinned stream.
"""

import random
import sys


def sharding(rng, n):
    mode = rng.choice(['devices', 'devices', 'ring', 'mesh2d'])
    if mode == 'mesh2d' and n >= 16:
        r = rng.choice([1, 2, 4])
        return '--mesh2d=%dx%d' % (r, 8 // r)
    if mode == 'ring' and n >= 2:
        return '--devices=%d --comm=ring' % rng.randint(2, min(8, n))
    return '--devices=%d' % rng.randint(1, min(8, n))


def main():
    kind, seed, count = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    # Validate BEFORE the loop: a typo'd kind with count=0 must still be a
    # loud nonzero exit, never an empty-but-successful config stream (the
    # harnesses' fail-loudly contract).
    if kind not in ('parity', 'resume', 'parity2', 'resume2'):
        raise SystemExit('unknown generator kind: %r' % kind)
    if count <= 0:
        raise SystemExit('config count must be positive, got %d' % count)
    rng = random.Random(seed)
    for _ in range(count):
        if kind == 'parity':
            # Small enough that the fp64 trig parity path stays a few
            # seconds per run on one CPU core.
            n = rng.randint(2, 256)
            steps = rng.randint(1, 500)
            print(n, steps, sharding(rng, n))
        elif kind == 'parity2':
            n = rng.randint(2, 256)
            steps = rng.randint(1, 500)
            kern = rng.choice(['', '--fast', '--pallas'])
            procs = rng.choice([1, 1, 1, 2])
            if procs == 2:
                # The 2-process launcher owns the sharding (--devices=4 over
                # the global gloo mesh, 2 virtual devices per process), so
                # the draw only picks the collective family; N must admit 4
                # shards, and steps are capped — each config pays two full
                # process startups + compiles.
                n = max(n, 4)
                steps = min(steps, 200)
                flags = (kern + ' '
                         + rng.choice(['--comm=allgather', '--comm=ring']))
            else:
                flags = kern + ' ' + sharding(rng, n)
            print(n, steps, procs, flags.strip())
        else:  # resume / resume2
            # Tighter than parity: each config costs THREE fp64 runs
            # (reference oracle + two engine legs).
            n = rng.randint(2, 200)
            total = rng.randint(2, 300)
            split = rng.randint(1, total - 1)
            fmt = rng.choice(['npz', 'orbax'])

            def leg():
                flags = sharding(rng, n)
                if kind == 'resume2':
                    # Kernel drawn AFTER the sharding so resume2's streams
                    # share nothing positional with resume's; legs draw
                    # independently, so cross-kernel hand-offs (e.g.
                    # checkpoint under --pallas, resume under trig) occur.
                    kern = rng.choice(['', '--fast', '--pallas'])
                    flags = (kern + ' ' + flags).strip()
                return flags.replace(' ', '|')

            # One config line; legs' flags are | -separated (no spaces).
            print(n, total, split, fmt, leg(), leg())


if __name__ == '__main__':
    main()
