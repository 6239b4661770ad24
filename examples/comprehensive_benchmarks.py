"""Comprehensive benchmarks example — name-parity wrapper for the CLI
(reference examples/comprehensive_benchmarks.rs; implementation in
tnsh/bench/cli.py)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tnsh.bench.cli import main  # noqa: E402

if __name__ == "__main__":
    raise SystemExit(main())
