#!/bin/bash
# Interleaved A/B of the r05 tree vs the r08 tree (VERDICT r07 task 2):
# 3 bench runs each, alternating, same rig, same hour. Each run is a
# fresh JVM. Results append to /root/repo/.ab_results.jsonl as
# {"tree": "r05"|"r08", "run": N, ...bench json...}.
#
# A missing worktree or a crashed bench must FAIL LOUDLY, not
# mislabel the other tree's numbers or append malformed JSON.
set -euo pipefail
OUT=/root/repo/.ab_results.jsonl
: > "$OUT"
for i in 1 2 3; do
  for tree in r08 r05; do
    cd "/root/repo/.ab_${tree}" || { echo "missing worktree .ab_${tree}" >&2; exit 1; }
    line=$(python bench.py | tail -1)
    [ -n "$line" ] || { echo "bench produced no output for ${tree} run ${i}" >&2; exit 1; }
    echo "{\"tree\": \"${tree}\", \"run\": ${i}, \"bench\": ${line}}" >> "$OUT"
    echo "done ${tree} run ${i}" >&2
  done
done
echo "A/B complete" >&2
