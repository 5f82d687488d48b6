#!/bin/bash
cd /root/repo
echo "=== on-device tests (3-phase default routing) ==="
OPTIK_TPU_TESTS=1 timeout 3600 python -m pytest tests/test_tpu.py -q 2>&1 | tail -3
echo "=== bench.py (3-phase default) ==="
timeout 2400 python bench.py 2>artifacts/bench_r02d.err | tee artifacts/bench_r02d.json
echo "=== workloads (device-validated seeds + cascade route) ==="
timeout 3600 python benchmarks/bench_workloads.py 2>artifacts/workloads3_r02.err | tee artifacts/WORKLOADS3_r02.jsonl
