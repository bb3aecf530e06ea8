#!/bin/bash
# Round-5 TPU queue 2: SPH_SUB sub-cull sweep at headline scale, then the
# deferred measurement jobs. Sequential — never two TPU processes at once.
# args: CHUNK SUPER MIN_CHUNKS TILE SUB
cd /root/repo
for cfg in "256 8 16 1024 64" "256 8 16 1024 32" "256 8 16 1024 128" \
           "512 8 16 1024 64" "1024 8 16 1024 64" "1024 8 16 1024 128" \
           "256 8 16 512 64" "256 8 16 2048 64"; do
  set -- $cfg
  python experiments/headline_chunk_bench.py $1 $2 $3 $4 $5 \
    > /tmp/sub_${1}_${4}_${5}.log 2>&1
  echo "sub $cfg rc=$?"
done
echo ALL_DONE > /tmp/sub_sweep.done
