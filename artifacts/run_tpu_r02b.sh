#!/bin/bash
cd /root/repo
echo "=== on-device kernel/cascade/routing tests ==="
OPTIK_TPU_TESTS=1 timeout 3600 python -m pytest tests/test_tpu.py -q 2>&1 | tail -5
echo "=== cascade tuning sweep ==="
timeout 5400 python benchmarks/exp_tune_r02.py 2>artifacts/tune_r02.err | tee artifacts/TUNE_r02.jsonl
