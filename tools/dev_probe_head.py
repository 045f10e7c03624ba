"""Probe: localize compiled-vs-interpret discrepancy in fused_step_head.

Sets identity-like weights so delta == relu(h[..., 0]) shifted by a chosen
tap; any residual row/col shift in the compiled kernel shows up directly.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if os.environ.get("SA_DEV_CPU", "0") == "1":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from stereoanywhere_tpu.ops.pallas import step_fused as sf

interpret = jax.default_backend() == "cpu"
rng = np.random.default_rng(0)
B, H, W2, ch = 1, 32, 64, 128
h = jnp.asarray(rng.standard_normal((B, H, W2, ch)).astype(np.float32))
coords = jnp.zeros((B, H, W2), jnp.float32)
levels = []
wl = W2
for _ in range(4):
    levels.append(jnp.zeros((B, H, W2, wl), jnp.float32))
    wl //= 2

for (dy, dx) in [(1, 1), (0, 0), (2, 2)]:
    kf1 = jnp.zeros((3, 3, ch, 256)).at[1, 1, 0, 0].set(1.0)
    bf1 = jnp.zeros((256,))
    k2 = jnp.zeros((3, 3, 256, 2)).at[dy, dx, 0, 0].set(1.0)
    b2 = jnp.zeros((2,))
    hw = sf.pack_head_weights(kf1, bf1, k2, b2, jnp.float32)
    cn, _ = sf.fused_step_head(h, coords, levels, levels, hw, interpret=interpret)
    # expected: delta[r,c] = relu(h0)[r+dy-1, c+dx-1] (zeros outside)
    exp = jnp.pad(jax.nn.relu(h[..., 0]), ((0, 0), (1, 1), (1, 1)))[
        :, dy : dy + H, dx : dx + W2
    ]
    err = np.asarray(jnp.abs(cn - exp))
    print(f"tap({dy},{dx}): max err {err.max():.3e}", end="")
    if err.max() > 1e-4:
        bad = np.argwhere(err[0] > 1e-4)
        print(f"  bad rows {np.unique(bad[:, 0])[:12]} cols {np.unique(bad[:, 1])[:12]}")
    else:
        print()
