"""Iterative update block: motion encoder + 3-scale ConvGRU cascade + heads.

Reference update.py:46-197.  NHWC.

Design note (TPU): the ConvGRU runs `iters` times inside a `lax.scan`
(stereoanywhere.py top module); all shapes here are static and every conv is
an MXU matmul after im2col — XLA fuses the gate nonlinearities into them.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from stereoanywhere_tpu.models.layers import Conv
from stereoanywhere_tpu.ops.interp import interp_like, pool2x


class ConvGRU(nn.Module):
    """Conv gated recurrent unit with precomputed context injections
    (reference update.py:46-62)."""

    hidden_dim: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, h, cz, cr, cq, *x_list):
        k, p = self.kernel_size, self.kernel_size // 2
        x = jnp.concatenate(x_list, axis=-1)
        hx = jnp.concatenate([h, x], axis=-1)
        z = jax.nn.sigmoid(Conv(self.hidden_dim, k, 1, p, name="convz")(hx) + cz)
        r = jax.nn.sigmoid(Conv(self.hidden_dim, k, 1, p, name="convr")(hx) + cr)
        q = jnp.tanh(
            Conv(self.hidden_dim, k, 1, p, name="convq")(jnp.concatenate([r * h, x], axis=-1)) + cq
        )
        return (1 - z) * h + z * q


class MotionEncoder(nn.Module):
    """Encodes stereo-corr + mono-corr + flow into motion features
    (reference BasicMotionEncoder, update.py:64-90).

    NOTE: convc1/convc2 weights are SHARED between the stereo and mono
    correlation inputs (reference update.py:81-85).
    """

    @nn.compact
    def __call__(self, flow, corr, corr_mono):
        convc1 = Conv(64, 1, 1, 0, name="convc1")
        convc2 = Conv(64, 3, 1, 1, name="convc2")
        cor = jax.nn.relu(convc2(jax.nn.relu(convc1(corr))))
        cor_mono = jax.nn.relu(convc2(jax.nn.relu(convc1(corr_mono))))
        flo = jax.nn.relu(Conv(64, 7, 1, 3, name="convf1")(flow))
        flo = jax.nn.relu(Conv(64, 3, 1, 1, name="convf2")(flo))
        out = jax.nn.relu(
            Conv(126, 3, 1, 1, name="_conv")(jnp.concatenate([cor, cor_mono, flo], axis=-1))
        )
        return jnp.concatenate([out, flow], axis=-1)


class UpdateHead(nn.Module):
    """conv-relu-conv head (reference update.py:6-14)."""

    hidden_dim: int = 256
    output_dim: int = 1

    @nn.compact
    def __call__(self, x):
        x = jax.nn.relu(Conv(self.hidden_dim, 3, 1, 1, name="conv1")(x))
        return Conv(self.output_dim, 3, 1, 1, name="conv2")(x)


class MultiUpdateBlock(nn.Module):
    """3-level GRU cascade with cross-scale pooling/interp
    (reference BasicMultiUpdateBlock, update.py:134-197).

    net = [1/4, 1/8, 1/16] hidden states; inp = per-scale (cz, cr, cq).
    Returns (new_net, mask_logits, delta_flow).
    """

    hidden_dims: Sequence[int] = (128, 128, 128)
    n_gru_layers: int = 3
    n_downsample: int = 2

    @nn.compact
    def __call__(self, net, inp, corr, corr_mono, flow):
        hd = self.hidden_dims
        net = list(net)

        if self.n_gru_layers == 3:
            net[2] = ConvGRU(hd[0], name="gru32")(net[2], *inp[2], pool2x(net[1]))
        if self.n_gru_layers >= 2:
            if self.n_gru_layers > 2:
                net[1] = ConvGRU(hd[1], name="gru16")(
                    net[1], *inp[1], pool2x(net[0]), interp_like(net[2], net[1])
                )
            else:
                net[1] = ConvGRU(hd[1], name="gru16")(net[1], *inp[1], pool2x(net[0]))

        motion = MotionEncoder(name="encoder")(flow, corr, corr_mono)
        if self.n_gru_layers > 1:
            net[0] = ConvGRU(hd[2], name="gru08")(
                net[0], *inp[0], motion, interp_like(net[1], net[0])
            )
        else:
            net[0] = ConvGRU(hd[2], name="gru08")(net[0], *inp[0], motion)

        delta_flow = UpdateHead(256, 2, name="flow_head")(net[0])

        factor = 2 ** self.n_downsample
        m = jax.nn.relu(Conv(256, 3, 1, 1, name="mask_0")(net[0]))
        mask = 0.25 * Conv(factor * factor * 9, 1, 1, 0, name="mask_2")(m)

        return net, mask, delta_flow


class RefinementStep(nn.Module):
    """One scan-shaped GRU iteration: correlation lookups + MultiUpdateBlock
    body + epipolar-projected coordinate update (reference
    stereoanywhere.py:267-294 loop body).

    Designed for `nn.scan(RefinementStep, variable_broadcast='params',
    in_axes=nn.broadcast)`: carry = (net tuple, coords1, last mask);
    consts = (stereo pyramid levels, mono pyramid levels, inp_list, coords0).
    Submodule names (gru08/encoder/flow_head/mask_*) are identical to
    MultiUpdateBlock's so the torch converter path is `update_block/...`.
    """

    hidden_dims: Sequence[int] = (128, 128, 128)
    n_gru_layers: int = 3
    n_downsample: int = 2
    corr_radius: int = 4
    emit_outputs: bool = True  # False in test mode: no per-iter ys
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, carry, consts):
        import jax.numpy as jnp

        from stereoanywhere_tpu.ops.corr_lookup import CorrPyramid, lookup_corr_pyramid

        net, coords1, _prev_mask = carry
        stereo_levels, mono_levels, inp, coords0 = consts
        radius = self.corr_radius
        cdt = jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

        coords1 = jax.lax.stop_gradient(coords1)
        lookup_x = coords1[..., 0]
        stereo_corr = lookup_corr_pyramid(CorrPyramid(stereo_levels, radius), lookup_x).astype(cdt)
        mono_corr = lookup_corr_pyramid(CorrPyramid(mono_levels, radius), lookup_x).astype(cdt)
        flow_x = coords1 - coords0
        flow2 = jnp.concatenate([flow_x, jnp.zeros_like(flow_x)], axis=-1).astype(cdt)

        hd = self.hidden_dims
        net = list(net)
        if self.n_gru_layers == 3:
            net[2] = ConvGRU(hd[0], name="gru32")(net[2], *inp[2], pool2x(net[1]))
        if self.n_gru_layers >= 2:
            if self.n_gru_layers > 2:
                net[1] = ConvGRU(hd[1], name="gru16")(
                    net[1], *inp[1], pool2x(net[0]), interp_like(net[2], net[1])
                )
            else:
                net[1] = ConvGRU(hd[1], name="gru16")(net[1], *inp[1], pool2x(net[0]))
        motion = MotionEncoder(name="encoder")(flow2, stereo_corr, mono_corr)
        if self.n_gru_layers > 1:
            net[0] = ConvGRU(hd[2], name="gru08")(
                net[0], *inp[0], motion, interp_like(net[1], net[0])
            )
        else:
            net[0] = ConvGRU(hd[2], name="gru08")(net[0], *inp[0], motion)

        delta_flow = UpdateHead(256, 2, name="flow_head")(net[0])
        factor = 2 ** self.n_downsample
        m = jax.nn.relu(Conv(256, 3, 1, 1, name="mask_0")(net[0]))
        mask = 0.25 * Conv(factor * factor * 9, 1, 1, 0, name="mask_2")(m)

        # epipolar projection: only the x-delta is applied (ref :277)
        coords1_new = coords1 + delta_flow[..., 0:1].astype(jnp.float32)
        out = (coords1_new - coords0, mask) if self.emit_outputs else 0
        return (tuple(net), coords1_new, mask), out
