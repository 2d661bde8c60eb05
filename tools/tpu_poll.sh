#!/bin/bash
# Poll the tunneled TPU until it answers; log recovery time.
while true; do
  if timeout 45 python -c "
import jax, numpy as np, jax.numpy as jnp
np.asarray(jnp.zeros(2)+1)
print('ok')" 2>/dev/null | grep -q ok; then
    echo "TPU RECOVERED at $(date)" 
    break
  fi
  sleep 60
done
