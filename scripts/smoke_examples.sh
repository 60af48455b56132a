#!/usr/bin/env bash
# Serial --smoke run of every example CLI on the current backend (the real
# TPU when available). This is the round's integration gate: each script
# compiles and runs its real optimization flow end-to-end with synthetic
# targets and random-init weights (zero-egress environment).
#
# Usage: bash scripts/smoke_examples.sh [per-example timeout seconds]
# First run compiles (~1-6 min per distinct program on the axon tunnel,
# cached afterwards via the persistent compilation cache) — allow ~25 min
# cold, ~10 min warm.

set -u
cd "$(dirname "$0")/.."
TIMEOUT="${1:-1500}"
FAILED=0

EXAMPLES=(
    invert_biggan_basincma
    invert_biggan_adam
    invert_biggan_cma
    invert_biggan_nevergrad
    invert_biggan_hybrid_nevergrad
    invert_biggan_batched
    invert_biggan_with_transform
    invert_biggan_transform_batched
    edit_biggan
    invert_stylegan2_cars_basincma
    invert_stylegan2_cars_adam
    invert_stylegan2_cars_cma
    invert_stylegan2_cars_ng
    invert_stylegan2_cars_hybrid_ng
    invert_stylegan2_ffhq_basincma
    invert_biggan_basincma_sharded
)

for ex in "${EXAMPLES[@]}"; do
    echo "=== $ex ==="
    timeout "$TIMEOUT" python "examples/$ex.py" --smoke \
        > "/tmp/smoke_$ex.log" 2>&1
    rc=$?
    echo "$ex rc=$rc"
    if [ "$rc" -ne 0 ]; then
        FAILED=1
        tail -5 "/tmp/smoke_$ex.log"
    fi
done

echo "ALL DONE (failed=$FAILED)"
exit "$FAILED"
