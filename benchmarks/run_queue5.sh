#!/bin/bash
cd /root/repo
while pgrep -f "tpu_oracle_parity.py" >/dev/null; do sleep 15; done
timeout 2000 python -u benchmarks/probe_r3r.py > benchmarks/logs/probe_r3r.log 2>&1
echo done > benchmarks/logs/queue5_done.txt
