#!/bin/bash
# Wait for TPU tunnel recovery, then run pallas check + bench.
cd /root/repo
for i in $(seq 1 200); do
  if timeout 120 python -c "
import jax, jax.numpy as jnp
(jnp.ones((128,128))@jnp.ones((128,128))).block_until_ready()
print('ok')
" > /dev/null 2>&1; then
    echo "TPU recovered after $i probes at $(date)" >> .tpu_recover.log
    timeout 6000 python tools/check_pallas_frontend.py > .check_pallas_r3.json 2> .check_pallas_r3.log
    echo "check_pallas done rc=$? at $(date)" >> .tpu_recover.log
    timeout 7000 python bench.py --budget-s 500 > .bench_r3_try1.json 2> .bench_r3_try1.log
    echo "bench done rc=$? at $(date)" >> .tpu_recover.log
    exit 0
  fi
  sleep 60
done
echo "TPU never recovered" >> .tpu_recover.log
