#!/bin/bash
cd /root/repo
while pgrep -f "probe_r3h.py" >/dev/null; do sleep 15; done
timeout 2400 python -u benchmarks/probe_r3g.py > benchmarks/logs/probe_r3g.log 2>&1
timeout 1800 python -u benchmarks/tpu_oracle_parity.py > benchmarks/logs/tpu_oracle_parity.log 2>&1
timeout 2400 python -u benchmarks/probe_r3j.py > benchmarks/logs/probe_r3j.log 2>&1
echo done > benchmarks/logs/queue2_done.txt
