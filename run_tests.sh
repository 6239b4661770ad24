#!/bin/sh
# The one-command full test suite: one pytest process PER TEST FILE.
#
# jaxlib 0.9's XLA:CPU crashes (SIGSEGV/SIGABRT) compiling or cache-
# loading a large executable once a single process has accumulated enough
# compiled programs — 3x-reproduced in round 4's review at
# test_msm_sched.py:86 and bisected in round 5: the crash follows the
# CUMULATIVE-EVER compile volume (fr_pallas + jax_backend state killed
# the scheduled-MSM compile; with msm_sched isolated it re-appeared at
# test_twist_bits' device-oracle compile).  In-process mitigation
# (jax.clear_caches at msm-module start) only pushes the threshold out,
# so the suite runs each file in a fresh process: every file passes
# solo, and a crash in one file can no longer take down the rest.
#
# Usage: ./run_tests.sh [extra pytest args]
status=0
for f in tests/test_*.py; do
    echo "== $f"
    if ! python -m pytest "$f" -q "$@"; then
        status=1
        echo "== $f FAILED"
    fi
done
if [ "$status" -eq 0 ]; then
    echo "ALL FILES GREEN"
else
    echo "SUITE FAILED"
fi
exit $status
