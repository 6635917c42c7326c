#!/bin/bash
cd /root/repo
while pgrep -f "probe_r3q.py" >/dev/null; do sleep 15; done
timeout 1800 python -u benchmarks/tpu_oracle_parity.py > benchmarks/logs/tpu_oracle_parity.log 2>&1
echo done > benchmarks/logs/queue4_done.txt
