#!/bin/bash
# Sequential TPU probe queue (one script at a time on the tunnel).
cd /root/repo
while pgrep -f "probe_r3i.py" >/dev/null; do sleep 10; done
timeout 2400 python -u benchmarks/probe_r3g.py > benchmarks/logs/probe_r3g.log 2>&1
timeout 1800 python -u benchmarks/tpu_oracle_parity.py > benchmarks/logs/tpu_oracle_parity.log 2>&1
timeout 2400 python -u benchmarks/probe_r3h.py > benchmarks/logs/probe_r3h.log 2>&1
echo queue-done > benchmarks/logs/queue_done.txt
timeout 2400 python -u benchmarks/probe_r3j.py > benchmarks/logs/probe_r3j.log 2>&1
echo queue-done-j >> benchmarks/logs/queue_done.txt
