"""``python -m parallel_nbody_tpu`` — alias for the CLI driver
(same argv contract as the reference binaries, see cli.py)."""

import sys

from .cli import main

if __name__ == "__main__":
    sys.exit(main())
