#!/bin/bash
# Log when the tunnel recovers (the stalled bench resumes by itself).
for i in $(seq 1 120); do
  if timeout 90 python -c "
import jax, jax.numpy as jnp, numpy as np
float(np.asarray((jnp.ones((128,128))@jnp.ones((128,128)))).sum())
" > /dev/null 2>&1; then
    echo "TPU recovered after $i probes at $(date)" >> .tpu_recover.log
    exit 0
  fi
  sleep 30
done
echo "TPU never recovered $(date)" >> .tpu_recover.log
