"""Dev driver: exactness of the fused step kernels vs their XLA references
(interpret mode on CPU, compiled on TPU)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("SA_DEV_CPU", "0") == "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if os.environ.get("SA_DEV_F32", "0") == "1":
    # make the XLA reference's f32 convs actually compute in f32 on TPU
    # (default TPU matmul precision truncates f32 inputs to bf16 passes)
    jax.config.update("jax_default_matmul_precision", "highest")
import jax.numpy as jnp
import numpy as np

from stereoanywhere_tpu.ops.pallas import step_fused as sf

interpret = jax.default_backend() == "cpu"
rng = np.random.default_rng(0)
B, H, W2 = 1, 32, 64
ch = 128
dt = jnp.float32

def arr(*shape, scale=1.0):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * scale, dtype=dt)

h = arr(B, H, W2, ch)
coords0 = jnp.broadcast_to(jnp.arange(W2, dtype=jnp.float32)[None, None, :], (B, H, W2))
coords = coords0 - jnp.abs(arr(B, H, W2, scale=5.0).astype(jnp.float32))
levels_a, levels_b = [], []
wl = W2
for _ in range(4):
    levels_a.append(arr(B, H, W2, wl))
    levels_b.append(arr(B, H, W2, wl))
    wl //= 2

kf1, bf1 = arr(3, 3, ch, 256, scale=0.05), arr(256, scale=0.1)
k2, b2 = arr(3, 3, 256, 2, scale=0.05), arr(2, scale=0.1)

hw = sf.pack_head_weights(kf1, bf1, k2, b2, dt)
cn, cf = sf.fused_step_head(h, coords, levels_a, levels_b, hw, interpret=interpret)
cn_r, cf_r = sf.step_head_ref(h, coords, levels_a, levels_b, kf1, bf1, k2, b2)
print("head coords err:", float(jnp.max(jnp.abs(cn - cn_r))))
print("head corr err:  ", float(jnp.max(jnp.abs(cf - cf_r))), "scale", float(jnp.max(jnp.abs(cf_r))))

k1, b1 = arr(1, 1, 36, 64, scale=0.1), arr(64, scale=0.1)
k2c, b2c = arr(3, 3, 64, 64, scale=0.05), arr(64, scale=0.1)
kcf1, bcf1 = arr(7, 7, 2, 64, scale=0.05), arr(64, scale=0.1)
kcf2, bcf2 = arr(3, 3, 64, 64, scale=0.05), arr(64, scale=0.1)
kmc, bmc = arr(3, 3, 192, 126, scale=0.05), arr(126, scale=0.1)
mw = sf.pack_motion_weights(k1, b1, k2c, b2c, kcf1, bcf1, kcf2, bcf2, kmc, bmc, 4, 4, dt)
flowcols = sf.make_flowcols((cn_r - coords0).astype(dt))
mo = sf.fused_step_motion(cf_r, flowcols, mw, interpret=interpret)
mo_r = sf.step_motion_ref(cf_r, cn_r, k1, b1, k2c, b2c, kcf1, bcf1, kcf2, bcf2, kmc, bmc)
print("motion err:", float(jnp.max(jnp.abs(mo - mo_r))), "scale", float(jnp.max(jnp.abs(mo_r))))

xup = arr(B, H, W2, ch)
czrq = arr(B, H, W2, 3 * ch, scale=0.3)
kz, bz = arr(3, 3, 3 * ch, ch, scale=0.05), arr(ch, scale=0.1)
kr, br_ = arr(3, 3, 3 * ch, ch, scale=0.05), arr(ch, scale=0.1)
kq, bq = arr(3, 3, 3 * ch, ch, scale=0.05), arr(ch, scale=0.1)
gw = sf.pack_gru_weights(kz, bz, kr, br_, kq, bq, dt)
hn = sf.fused_step_gru(h, [mo_r, xup], czrq, gw, interpret=interpret)
hn_r = sf.step_gru_ref(h, mo_r, xup, czrq, kz, bz, kr, br_, kq, bq)
print("gru err:", float(jnp.max(jnp.abs(hn - hn_r))), "scale", float(jnp.max(jnp.abs(hn_r))))
