#!/bin/bash
# Probe the axon TPU tunnel: exits 0 with device list if up, 1 if timed out.
timeout "${1:-300}" python -c "
import jax
ds = jax.devices()
print('TUNNEL_UP', [(d.platform, d.device_kind) for d in ds])
" 2>&1 | tail -3
