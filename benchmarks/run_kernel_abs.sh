#!/bin/bash
# One-session kernel A/B battery for the round-3 serving kernels.
#
# The shared chip swings ~1.7x between sessions with no code change, so
# every impl decision must come from numbers captured back-to-back in ONE
# session (ROADMAP "same-session comparisons only"). Run this when the
# tunnel is up; each harness prints JSON lines and everything lands under
# /tmp/kernel_abs_<ts>/ for the RESULTS.md write-up.
#
# Budget: first run compiles ~10 fresh [512, 1M] programs over the tunnel
# (~4-7 min each worst case, cached afterwards) — expect 1-2 h cold,
# ~25 min warm.
set -u
cd "$(dirname "$0")/.."
TS=$(date +%m%d_%H%M)
OUT=/tmp/kernel_abs_$TS
mkdir -p "$OUT"
# Append (never overwrite) PYTHONPATH: some deployments inject the TPU
# plugin's site dir through it (e.g. /root/.axon_site) — clobbering that
# drops the backend registration and every run dies at jax.devices().
export PYTHONPATH="$PWD:$PWD/benchmarks${PYTHONPATH:+:$PYTHONPATH}"

run() {
  name=$1
  shift
  echo "== $name ($(date +%H:%M:%S)) =="
  timeout 5400 python -u "$@" 2>&1 | tee "$OUT/$name.log"
}

# Decisive first: the full serving program across impl choices.
run matrix_bf16 benchmarks/bench_program_matrix.py
run matrix_int8 benchmarks/bench_program_matrix.py --tier int8
run matrix_int4 benchmarks/bench_program_matrix.py --tier int4
# Stage-level attribution for the write-up.
run rescore benchmarks/bench_rescore.py
run bucket benchmarks/bench_fused_bucket.py
run stages benchmarks/profile_stages.py
echo "results in $OUT"
