#!/bin/bash
cd /root/repo
while pgrep -f "probe_r3j.py" >/dev/null; do sleep 15; done
timeout 2400 python -u benchmarks/probe_r3k.py > benchmarks/logs/probe_r3k.log 2>&1
echo done > benchmarks/logs/queue3_done.txt
