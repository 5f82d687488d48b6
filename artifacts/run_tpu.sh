#!/bin/bash
# Parameterized TPU round-runner: one process session per stage, every run
# leaves stdout AND stderr in artifacts/ (a 0-byte stdout artifact means the
# stage died — check the .err; never commit it as evidence).
#
# Usage: artifacts/run_tpu.sh <round-tag> [stage ...]
#   stages (default: tests bench): tests bench workloads scaling latency
#
# Relay facts (see PARITY.md): grants are per-process, kernels recompile in
# every fresh process (~3-5 min/executable); budget generous timeouts and
# never run CPU test suites concurrently with a TPU stage.
set -u
TAG=${1:?usage: run_tpu.sh <round-tag> [stage ...]}
shift
STAGES=${@:-"tests bench"}
cd "$(dirname "$0")/.."

run() {  # run <name> <timeout> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($TAG) ==="
  timeout "$tmo" "$@" 2>"artifacts/${name}_${TAG}.err" \
    | tee "artifacts/${name}_${TAG}.out"
  local rc=${PIPESTATUS[0]}
  if [ "$rc" != 0 ] || [ ! -s "artifacts/${name}_${TAG}.out" ]; then
    echo "FAILED rc=$rc (or empty stdout) — see artifacts/${name}_${TAG}.err"
  fi
}

for st in $STAGES; do
  case $st in
    tests)     run tpu_tests 5400 env OPTIK_TPU_TESTS=1 \
                   python -m pytest tests/test_tpu.py -q ;;
    bench)     run bench 2400 python bench.py ;;
    profbench) OPTIK_PROFILE=artifacts/profile_$TAG \
                   run bench 2400 python bench.py ;;
    workloads) run workloads 3600 python benchmarks/bench_workloads.py ;;
    aux)       run aux 3600 python benchmarks/run_aux.py ;;
    scaling)   run scaling 2400 python benchmarks/bench_scaling.py ;;
    latency)   run latency 2400 python benchmarks/bench_latency.py ;;
    *)         echo "unknown stage: $st" ;;
  esac
done
