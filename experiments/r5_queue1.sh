#!/bin/bash
# Round-5 TPU queue 1: field160k sort A/B, then the headline-scale chunk
# sweep (VERDICT r5 item 2). Sequential — never two TPU processes at once.
cd /root/repo
set -x
python experiments/ray_sort_bench.py field160k > /tmp/sortab2_field160k.log 2>&1
echo "field160k done rc=$?"
for cfg in "256 8 16" "128 8 8" "128 4 8" "64 8 8" "64 4 8" "128 8 99" "64 8 99"; do
  set -- $cfg
  python experiments/headline_chunk_bench.py $1 $2 $3 \
    > /tmp/headline_${1}_${2}_${3}.log 2>&1
  echo "headline $cfg done rc=$?"
done
echo ALL_DONE
