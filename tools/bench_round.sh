#!/usr/bin/env bash
# Derive the in-flight round for bench.py's prior-round artifact filter
# (r11 VERDICT next-round #2 — the last round-inference residual edge).
#
# bench.py's own derivation (`git ls-files CORRECTNESS_r*.json` -> max+1)
# is immune to the driver's UNTRACKED in-flight correctness file, but if
# CORRECTNESS_r{N}.json were COMMITTED mid-round and bench re-run inside
# round N, the git derivation would infer N+1 and let round-N artifacts
# through the prior-round filter.  bench.py has the $BENCH_CURRENT_ROUND
# override for exactly this (bench.py `_current_round` step 1); this
# script computes the value the harness should pass:
#
#   1. an explicit $BENCH_CURRENT_ROUND wins (passthrough),
#   2. else the round the sweep artifact in flight is about to stamp
#      ($ROUNDCHECK_SWEEP_JSON named SWEEP_r{N}_*.json) — the round the
#      certification chain KNOWS it is in, independent of what is
#      committed,
#   3. else prints nothing (bench falls back to its git derivation,
#      which is correct in every non-mid-round-commit state).
set -euo pipefail
if [[ -n "${BENCH_CURRENT_ROUND:-}" ]]; then
    echo "${BENCH_CURRENT_ROUND}"
elif [[ "${ROUNDCHECK_SWEEP_JSON:-}" =~ SWEEP_r0*([0-9]+) ]]; then
    echo "${BASH_REMATCH[1]}"
fi
