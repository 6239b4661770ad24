"""Micro-benchmarks for the Twist/Shout provers.

Counterpart of the reference's criterion harness
(benches/prover_bench.rs:6-51) — same groups (``twist_prover`` /
``shout_prover``) over the same log sizes (8, 10, 12), except that the
reference's bodies are empty ``black_box`` stubs (SURVEY caveat 9) while
these actually run the provers and report measured numbers.

Usage: ``python benches/prover_bench.py [--log-sizes 8,10,12] [--json]``
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tnsh.core.params import setup_params  # noqa: E402
from tnsh.field.fr import Fr  # noqa: E402
from tnsh.protocols.shout import LookupTable, Shout  # noqa: E402
from tnsh.protocols.twist import MemoryTrace, Twist  # noqa: E402
from tnsh.utils.profiling import PhaseTimer  # noqa: E402


def bench_twist_prover(log_size: int, timer: PhaseTimer) -> dict:
    setup_params.cache_clear()
    with timer.phase(f"twist/setup/{log_size}"):
        pp, vp = setup_params(log_size)
    size = 1 << log_size
    trace = MemoryTrace(size)
    for i in range(size):
        if i % 3 == 0:
            trace.write(i % size, Fr(i * 42))
        else:
            trace.read((i // 2) % size)
    twist = Twist(pp)
    with timer.phase(f"twist/prove/{log_size}"):
        proof = twist.prove(trace)
    with timer.phase(f"twist/verify/{log_size}"):
        assert twist.verify(proof, vp)
    prove_s = timer.phases[f"twist/prove/{log_size}"]
    return {"group": "twist_prover", "log_size": log_size,
            "ops": size, "ops_per_s": size / prove_s}


def bench_shout_prover(log_size: int, timer: PhaseTimer) -> dict:
    setup_params.cache_clear()
    with timer.phase(f"shout/setup/{log_size}"):
        pp, vp = setup_params(log_size)
    size = 1 << log_size
    table = LookupTable([Fr(i * i) for i in range(size)])
    for i in range(size):
        table.lookup(i % size)
    shout = Shout(pp)
    with timer.phase(f"shout/prove/{log_size}"):
        proof = shout.prove(table)
    with timer.phase(f"shout/verify/{log_size}"):
        assert shout.verify(proof, vp)
    prove_s = timer.phases[f"shout/prove/{log_size}"]
    return {"group": "shout_prover", "log_size": log_size,
            "ops": size, "ops_per_s": size / prove_s}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-sizes", default="8,10,12")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()
    sizes = [int(s) for s in args.log_sizes.split(",")]

    timer = PhaseTimer()
    results = []
    for ls in sizes:
        results.append(bench_twist_prover(ls, timer))
        results.append(bench_shout_prover(ls, timer))

    if args.json:
        print(json.dumps({"results": results, "phases": timer.phase_report()},
                         indent=2))
    else:
        print(f"{'group':<14} {'log':>4} {'ops':>8} {'prove ops/s':>12}")
        for r in results:
            print(f"{r['group']:<14} {r['log_size']:>4} {r['ops']:>8} "
                  f"{r['ops_per_s']:>12.0f}")
        print()
        for name, rep in sorted(timer.phase_report().items()):
            print(f"  {name:<24} {rep['mean_ms']:>9.2f} ms")


if __name__ == "__main__":
    main()
