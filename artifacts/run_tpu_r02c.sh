#!/bin/bash
cd /root/repo
echo "=== tune2: capacity-safe 3-phase ==="
timeout 4500 python benchmarks/exp_tune2_r02.py 2>artifacts/tune2_r02.err | tee artifacts/TUNE2_r02.jsonl
echo "=== workloads re-run (ik_batch now routes cascade) ==="
timeout 3600 python benchmarks/bench_workloads.py 2>artifacts/workloads2_r02.err | tee artifacts/WORKLOADS2_r02.jsonl
