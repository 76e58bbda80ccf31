#!/bin/bash
# Interleaved A/B of the r05 tree vs the r08 tree (VERDICT r07 task 2):
# 3 bench runs each, alternating, same rig, same hour. Each run is a
# fresh JVM. Results append to /root/repo/.ab_results.jsonl as
# {"tree": "r05"|"r08", "run": N, ...bench json...}.
set -u
OUT=/root/repo/.ab_results.jsonl
: > "$OUT"
for i in 1 2 3; do
  for tree in r08 r05; do
    cd "/root/repo/.ab_${tree}"
    line=$(python bench.py 2>/dev/null | tail -1)
    echo "{\"tree\": \"${tree}\", \"run\": ${i}, \"bench\": ${line}}" >> "$OUT"
    echo "done ${tree} run ${i}" >&2
  done
done
echo "A/B complete" >&2
