#!/bin/bash
# One TPU process session: north-star bench + BASELINE configs 2-5.
# (Relay grants are per-process and slow; batch everything into few procs.)
cd /root/repo
echo "=== bench.py (north star) ===" 
timeout 2400 python bench.py 2>artifacts/bench_r02.err | tee artifacts/bench_r02.json
echo "=== bench_workloads.py (BASELINE configs 2-5) ==="
timeout 3600 python benchmarks/bench_workloads.py 2>artifacts/workloads_r02.err | tee artifacts/WORKLOADS_r02.jsonl
