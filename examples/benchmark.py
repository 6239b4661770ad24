"""Quick benchmark demo — port of reference ``examples/benchmark.rs``
(benchmark.rs:1-38): one comparative Twist/Shout run at log size 6 with 16
operations, pretty-printed."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tnsh import ProtocolBenchmarks  # noqa: E402


def main() -> None:
    print("Running comparative benchmark (log size 6, 16 operations)...\n")
    twist, shout = ProtocolBenchmarks.comparative_benchmark(6, 16)
    ProtocolBenchmarks.print_comparative_results(twist, shout)


if __name__ == "__main__":
    main()
