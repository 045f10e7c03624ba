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

from stereoanywhere_tpu.models.layers import Conv, ParamConv
from stereoanywhere_tpu.ops.interp import interp_like, pool2x


class ConvGRU(nn.Module):
    """Conv gated recurrent unit with precomputed context injections
    (reference update.py:46-62).

    TPU note: the z and r gates read the same [h, x] input, so their convs
    are fused into a single conv with concatenated output channels — one
    pass over hx, identical per-channel math and parameter layout.
    """

    hidden_dim: int
    kernel_size: int = 3
    fused: bool = False  # Pallas fused kernels (TPU inference path only)

    @nn.compact
    def __call__(self, h, cz, cr, cq, *x_list):
        """cz/cr/cq: the scale's context injections, pre-split by the caller.

        A/B note (1024², device traces r4): passing them as ONE [cz|cr|cq]
        tensor sliced here measured 4.10 ms/iter vs 3.86 for this pre-split
        form — XLA staged the wider 2hd slice into scoped VMEM every
        iteration, costing more than the three per-iter const copies the
        whole-tensor form was meant to remove."""
        k, p = self.kernel_size, self.kernel_size // 2
        x = jnp.concatenate(x_list, axis=-1)
        hd = self.hidden_dim

        kz, bz = ParamConv(self.hidden_dim, k, name="convz")(h.shape[-1] + x.shape[-1])
        kr, br = ParamConv(self.hidden_dim, k, name="convr")(h.shape[-1] + x.shape[-1])
        kq, bq = ParamConv(self.hidden_dim, k, name="convq")(h.shape[-1] + x.shape[-1])

        if self.fused and k == 3:
            from stereoanywhere_tpu.ops.pallas.gru_fused import (
                gru_fused,
                gru_fused_supported,
            )

            if gru_fused_supported(h):
                # 0.97 vs 2.14 ms/step at the 1024² level-0 shapes (device
                # measurement, tools/profile_gru_fused.py): the [h,x] concat
                # never materializes, conv pads live in VMEM scratch, gates
                # fuse into the conv accumulator.  No VJP — the caller gates
                # this to test_mode.
                return gru_fused(
                    h, x, cz, cr, cq,
                    jnp.concatenate([kz, kr], axis=-1),
                    jnp.concatenate([bz, br]),
                    kq, bq,
                )

        def conv(inp, kernel, bias=None):
            y = jax.lax.conv_general_dilated(
                inp,
                kernel.astype(inp.dtype),
                window_strides=(1, 1),
                padding=((p, p), (p, p)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y if bias is None else y + bias.astype(y.dtype)

        # Split-operand form of conv([h, x]) / conv([r*h, x]): the h/rh and x
        # channel slices get separate convs whose outputs add — identical
        # math (conv is linear in channels), but the [h, x] concats never
        # materialize and the two x-halves (z/r gates and q) share ONE conv.
        ch = h.shape[-1]
        kx_all = jnp.concatenate([kz[:, :, ch:], kr[:, :, ch:], kq[:, :, ch:]], axis=-1)
        x_all = conv(x, kx_all)
        zr_h = conv(h, jnp.concatenate([kz[:, :, :ch], kr[:, :, :ch]], axis=-1))
        bzr = jnp.concatenate([bz, br])
        zr = zr_h + x_all[..., : 2 * hd] + bzr.astype(zr_h.dtype)
        z = jax.nn.sigmoid(zr[..., :hd] + cz)
        r = jax.nn.sigmoid(zr[..., hd:] + cr)
        q_h = conv(r * h, kq[:, :, :ch], bq)
        q = jnp.tanh(q_h + x_all[..., 2 * hd :] + cq)
        return (1 - z) * h + z * q


def gru_cascade(hidden_dims, n_gru_layers, net, inp, motion, fused=False):
    """Shared 3-level ConvGRU cascade with cross-scale pooling/interp
    (reference update.py:164-183) — the common body of MultiUpdateBlock,
    MultiUpdateScalerBlock and RefinementStep.  Must be called inside an
    @nn.compact parent; submodule names (gru32/gru16/gru08) land in the
    caller's scope, preserving the torch-converter paths.  `motion` does not
    depend on net, so computing it before or after gru16 is equivalent.

    inp: per-scale (cz, cr, cq) triples, pre-split by the caller (see the
    A/B note in ConvGRU.__call__)."""
    hd = hidden_dims
    net = list(net)
    # fused only at the 1/4 level: it carries ~80% of the GRU FLOPs; at the
    # small levels the Pallas custom-call layout boundary costs XLA more in
    # neighbor relayouts than the kernel saves
    if n_gru_layers == 3:
        net[2] = ConvGRU(hd[0], name="gru32")(net[2], *inp[2], pool2x(net[1]))
    if n_gru_layers >= 2:
        if n_gru_layers > 2:
            net[1] = ConvGRU(hd[1], name="gru16")(
                net[1], *inp[1], pool2x(net[0]), interp_like(net[2], net[1])
            )
        else:
            net[1] = ConvGRU(hd[1], name="gru16")(net[1], *inp[1], pool2x(net[0]))
    if n_gru_layers > 1:
        net[0] = ConvGRU(hd[2], fused=fused, name="gru08")(
            net[0], *inp[0], motion, interp_like(net[1], net[0])
        )
    else:
        net[0] = ConvGRU(hd[2], fused=fused, name="gru08")(net[0], *inp[0], motion)
    return net


class MotionEncoder(nn.Module):
    """Encodes stereo-corr + mono-corr + flow into motion features
    (reference BasicMotionEncoder, update.py:64-90).

    NOTE: convc1/convc2 weights are SHARED between the stereo and mono
    correlation inputs (reference update.py:81-85).
    """

    @nn.compact
    def __call__(self, flow, corr, corr_mono):
        from stereoanywhere_tpu.models.layers import paired_conv_apply

        # The stereo and mono correlation streams share convc1/convc2 weights
        # (reference update.py:81-85); run them PAIRED in the lane axis
        # (block-diagonal kernels, exact same sums): a batch-2 36/64-channel
        # conv fills under half the MXU's 128 lanes, and the batch concat /
        # split relayouts leave the scan body.
        k1, b1 = ParamConv(64, 1, name="convc1")(corr.shape[-1])
        k2c, b2c = ParamConv(64, 3, name="convc2")(64)
        both = jnp.concatenate([corr, corr_mono], axis=-1)  # (B,H,W,72)
        both = jax.nn.relu(paired_conv_apply(both, k1, b1, 1, 0))
        both = jax.nn.relu(paired_conv_apply(both, k2c, b2c, 1, 1))  # [cor|cor_mono]
        # A/B note (1024², device trace r4): slicing convf1 to its one
        # non-zero input channel (flow y is structurally zero) is exact but
        # measured WORSE (3.65 vs 3.50 ms/loop) — the 7x7 tiny-Cin emitter
        # is window-overhead-bound, not Cin-bound.  Plain conv kept.
        flo = jax.nn.relu(Conv(64, 7, 1, 3, name="convf1")(flow))
        flo = jax.nn.relu(Conv(64, 3, 1, 1, name="convf2")(flo))
        out = jax.nn.relu(
            Conv(126, 3, 1, 1, name="_conv")(jnp.concatenate([both, flo], axis=-1))
        )
        return jnp.concatenate([out, flow], axis=-1)


class UpdateHead(nn.Module):
    """conv-relu-conv head (reference update.py:6-14).

    Measured negative (do not re-add): column-packing conv2's 1-2 output
    channels via layers.conv_small_cout_packed — a win for the mono DPT
    output convs — LOSES inside the GRU scan on all three axes (A/B,
    2026-08-20): 512² loop 0.926→1.019 ms/iter, 1024² 3.867→4.220, and
    ~34 ms/step in training where the 160-wide crop is ragged vs pack=64
    (backward relayouts).  In-scan XLA already fuses conv2 into the
    neighboring ops; the packed stride-`pack` conv breaks that fusion."""

    hidden_dim: int = 256
    output_dim: int = 1
    # Emit only the first `out_slice` output channels (kernel sliced before
    # the conv — exact, not a post-slice).  RefinementStep consumes ONLY the
    # x-delta (delta_flow[..., 0:1]; the reference zeroes the y component,
    # stereoanywhere.py:277), so its flow head runs with out_slice=1.
    # Params stay (3,3,hidden,output_dim) for the converter.
    out_slice: int | None = None
    # tap_stack: evaluate conv2 as ONE matmul x @ K9 (the 9 taps stacked as
    # output columns) followed by a 9-slice shifted add — exact same sums
    # with zero padding.  The direct co<=2 conv fills 1-2 of the MXU's 128
    # output lanes and measured 10x over its input-read floor in-scan
    # (0.21 ms/iter at 1024²); the matmul form reads x once at full rate.
    tap_stack: bool = False

    @nn.compact
    def __call__(self, x):
        x = jax.nn.relu(Conv(self.hidden_dim, 3, 1, 1, name="conv1")(x))
        k2, b2 = ParamConv(self.output_dim, 3, name="conv2")(self.hidden_dim)
        if self.out_slice is not None:
            k2, b2 = k2[..., : self.out_slice], b2[: self.out_slice]
        co = k2.shape[-1]
        if self.tap_stack:
            bb, hh, ww, _ = x.shape
            # K9: (hidden, 9*co), column t*co+o = tap (dy,dx)=(t//3,t%3), out o
            k9 = k2.reshape(9, self.hidden_dim, co).transpose(1, 0, 2).reshape(
                self.hidden_dim, 9 * co
            )
            z = jnp.einsum(
                "bhwc,cn->bhwn", x, k9.astype(x.dtype),
                preferred_element_type=jnp.float32,
            )
            zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)))
            y = None
            for t in range(9):
                dy, dx = t // 3, t % 3
                term = jax.lax.slice(
                    zp,
                    (0, dy, dx, t * co),
                    (bb, dy + hh, dx + ww, (t + 1) * co),
                )
                y = term if y is None else y + term
            return (y + b2.astype(jnp.float32)).astype(x.dtype)
        y = jax.lax.conv_general_dilated(
            x,
            k2.astype(x.dtype),
            window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + b2.astype(y.dtype)


class SigmoidUpdateHead(nn.Module):
    """conv-relu-conv-sigmoid head (reference update.py:16-24; used by the
    confidence-predicting variants, off in the shipped model)."""

    hidden_dim: int = 256
    output_dim: int = 1

    @nn.compact
    def __call__(self, x):
        x = jax.nn.relu(Conv(self.hidden_dim, 3, 1, 1, name="conv1")(x))
        return jax.nn.sigmoid(Conv(self.output_dim, 3, 1, 1, name="conv2")(x))


class ScaleShiftUpdateHead(nn.Module):
    """Global scale/shift regression head via max-pool + MLP
    (reference update.py:26-44)."""

    hidden_dim: int = 256
    output_dim: int = 2

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        h = Conv(self.hidden_dim, 3, 1, 1, name="conv1")(x)
        h = Conv(self.hidden_dim, 3, 1, 1, name="conv2")(jax.nn.relu(h))
        pooled = jnp.max(h, axis=(1, 2))  # AdaptiveMaxPool2d((1,1)) + flatten
        z = jax.nn.relu(nn.Dense(self.hidden_dim, name="scaler_2")(pooled))
        z = nn.Dense(self.output_dim, name="scaler_4")(z)
        return z.reshape(b, 1, 1, self.output_dim)


class ConfidenceAwareMotionEncoder(nn.Module):
    """Motion encoder with an extra flow-confidence stream
    (reference BasicConfidenceAwareMotionEncoder, update.py:92-122;
    present-but-unused in the shipped model, predict_confidence=False)."""

    @nn.compact
    def __call__(self, flow, flow_conf, corr, corr_mono):
        convc1 = Conv(64, 1, 1, 0, name="convc1")
        convc2 = Conv(64, 3, 1, 1, name="convc2")
        b = corr.shape[0]
        both = jnp.concatenate([corr, corr_mono], axis=0)
        both = jax.nn.relu(convc2(jax.nn.relu(convc1(both))))
        cor, cor_mono = both[:b], both[b:]
        flo = jax.nn.relu(Conv(64, 7, 1, 3, name="convf1")(flow))
        flo = jax.nn.relu(Conv(64, 3, 1, 1, name="convf2")(flo))
        cfl = jax.nn.relu(Conv(64, 7, 1, 3, name="convcf1")(flow_conf))
        cfl = jax.nn.relu(Conv(64, 3, 1, 1, name="convcf2")(cfl))
        out = jax.nn.relu(
            Conv(125, 3, 1, 1, name="_conv_with_conf")(
                jnp.concatenate([cor, cor_mono, flo, cfl], axis=-1)
            )
        )
        return jnp.concatenate([out, flow, flow_conf], axis=-1)


class MultiUpdateScalerBlock(nn.Module):
    """3-level GRU cascade predicting local scale, global scale/shift and
    confidence deltas instead of a flow delta (reference
    BasicMultiUpdateScalerBlock, update.py:199-240; present-but-unused in the
    shipped model).

    Reference quirk NOT replicated: the reference calls
    `self.encoder(flow, flow_conf, corr)` with three arguments while
    BasicConfidenceAwareMotionEncoder.forward takes four (flow, flow_conf,
    corr, corr_mono) — a latent TypeError in the unused path (reference
    update.py:226 vs :110).  Here the encoder gets both correlation streams.

    Returns (new_net, delta_lscale, delta_gscale, delta_gshift, delta_conf).
    """

    hidden_dims: Sequence[int] = (128, 128, 128)
    n_gru_layers: int = 3

    @nn.compact
    def __call__(self, net, inp, corr, corr_mono, flow, flow_conf):
        motion = ConfidenceAwareMotionEncoder(name="encoder")(flow, flow_conf, corr, corr_mono)
        net = gru_cascade(self.hidden_dims, self.n_gru_layers, net, inp, motion)

        gscale_gshift = ScaleShiftUpdateHead(256, 2, name="gscale_gshift_head")(net[0])
        delta_gscale = gscale_gshift[..., 0:1]
        delta_gshift = gscale_gshift[..., 1:2]
        delta_conf = SigmoidUpdateHead(256, 1, name="conf_head")(net[0])
        delta_lscale = SigmoidUpdateHead(256, 1, name="lscale_head")(net[0])
        return tuple(net), delta_lscale, delta_gscale, delta_gshift, delta_conf


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
        motion = MotionEncoder(name="encoder")(flow, corr, corr_mono)
        net = gru_cascade(self.hidden_dims, self.n_gru_layers, net, inp, motion)

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
    in_axes=nn.broadcast)`: carry = (net tuple, coords1);
    consts = (stereo pyramid levels, mono pyramid levels, inp_list, coords0).
    Submodule names (gru08/encoder/flow_head/mask_*) are identical to
    MultiUpdateBlock's so the torch converter path is `update_block/...`.

    Test-mode structure (the reference computes the upsample mask every
    iteration but only consumes the last one, stereoanywhere.py:286-287):
    the scan body runs with compute_mask=False — the mask head, the (B,
    H/4, W/4, 144) mask carry slot and the iteration-counter cond this
    replaces all cost real per-iteration HBM traffic — and the FINAL
    iteration runs unscanned with compute_mask=True under the same scope
    (nn.share_scope), returning the mask as its output.
    """

    hidden_dims: Sequence[int] = (128, 128, 128)
    n_gru_layers: int = 3
    n_downsample: int = 2
    corr_radius: int = 4
    emit_outputs: bool = True  # False in test mode: no per-iter ys
    compute_dtype: str = "float32"
    compute_mask: bool = True  # False: skip the convex-upsample mask head
    # "lagged"/"inline": consts[0]/consts[1] are the two pyramids' level
    # tuples, looked up via the XLA pair formulations (ops/corr_lookup.py).
    # "barrel": consts[0] is the volume-interleaved packed levels
    # (ops/pallas/corr_barrel.py pack_pyramid_pair), consts[1] is empty, and
    # lookup_wls carries the logical level widths.
    lookup_impl: str = "lagged"
    lookup_wls: tuple = ()
    fused_gru: bool = False  # Pallas fused ConvGRU (TPU test-mode only)
    # skip_flow_head: run lookup+motion+gru but leave coords unchanged and
    # declare no flow-head params — the PRE-step of the rotated fused-step
    # schedule (ops/pallas/step_fused.py docstring).
    skip_flow_head: bool = False
    # tail_only: skip lookup/motion/gru entirely; just apply the flow head
    # (+ optional mask head) to the carried net — the TAIL of the rotated
    # schedule.  Identical math to the un-rotated loop's final ops.
    tail_only: bool = False

    @nn.compact
    def __call__(self, carry, consts):
        import jax.numpy as jnp

        from stereoanywhere_tpu.ops.corr_lookup import (
            CorrPyramid,
            lookup_corr_pyramid_pair,
        )

        net, coords1 = carry
        stereo_levels, mono_levels, inp, coords0 = consts
        radius = self.corr_radius
        cdt = jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

        coords1 = jax.lax.stop_gradient(coords1)
        if self.tail_only:
            return self._tail(net, coords1, coords0, cdt)
        lookup_x = coords1[..., 0]
        if self.lookup_impl == "barrel":
            from stereoanywhere_tpu.ops.pallas.corr_barrel import lookup_packed_pair

            stereo_corr, mono_corr = lookup_packed_pair(
                stereo_levels, lookup_x, radius, self.lookup_wls
            )
        else:
            stereo_corr, mono_corr = lookup_corr_pyramid_pair(
                CorrPyramid(stereo_levels, radius),
                CorrPyramid(mono_levels, radius),
                lookup_x,
                impl=self.lookup_impl,
            )
        stereo_corr = stereo_corr.astype(cdt)
        mono_corr = mono_corr.astype(cdt)
        flow_x = coords1 - coords0
        flow2 = jnp.concatenate([flow_x, jnp.zeros_like(flow_x)], axis=-1).astype(cdt)

        motion = MotionEncoder(name="encoder")(flow2, stereo_corr, mono_corr)
        net = gru_cascade(
            self.hidden_dims, self.n_gru_layers, net, inp, motion,
            fused=self.fused_gru,
        )

        if self.skip_flow_head:
            net = [n.astype(cdt) for n in net]
            return (tuple(net), coords1), 0
        return self._tail(net, coords1, coords0, cdt)

    def _tail(self, net, coords1, coords0, cdt):
        """Flow head + optional mask head + epipolar coordinate update —
        the common tail of the loop body (also used standalone after the
        rotated fused-step scan)."""
        # out_slice=1: only the x-delta is ever consumed here (the y slot is
        # the reference's zeroed epipolar component) — the conv2 kernel is
        # sliced to one output channel, exact in value and gradient.
        # tap_stack: conv2 as matmul + 9-slice add (see UpdateHead).
        delta_flow = UpdateHead(
            256, 2, name="flow_head", out_slice=1, tap_stack=True
        )(net[0])

        mask = None
        if self.compute_mask or self.emit_outputs:
            factor = 2 ** self.n_downsample
            m = jax.nn.relu(Conv(256, 3, 1, 1, name="mask_0")(net[0]))
            mask = (0.25 * Conv(factor * factor * 9, 1, 1, 0, name="mask_2")(m)).astype(cdt)

        # epipolar projection: only the x-delta is applied (ref :277)
        coords1_new = coords1 + delta_flow[..., 0:1].astype(jnp.float32)
        # keep carry dtypes stable across iterations (params may be f32 while
        # the carry was initialized in the compute dtype, or vice versa)
        net = [n.astype(cdt) for n in net]
        if self.emit_outputs:
            out = (coords1_new - coords0, mask)
        else:
            out = mask if self.compute_mask else 0
        return (tuple(net), coords1_new), out


class _ShellParams(nn.Module):
    """Declares conv params under the SAME flax paths (and with the same
    shapes/inits) as the XLA modules, without tracing their compute — the
    rotated fused-step scan body (FusedRefinementStep) reads raw kernels
    for its Pallas calls while sharing parameters with the un-rotated
    pre/tail steps via nn.share_scope."""

    @nn.compact
    def __call__(self):
        enc = [
            ParamConv(64, 1, name="convc1")(36),
            ParamConv(64, 3, name="convc2")(64),
            ParamConv(64, 7, name="convf1")(2),
            ParamConv(64, 3, name="convf2")(64),
            ParamConv(126, 3, name="_conv")(192),
        ]
        return enc


class FusedRefinementStep(nn.Module):
    """Rotated scan body of the level-0-fused refinement loop:

        delta = flow_head(net0); coords += delta; corrfeat = lookup(coords)
        [XLA: gru32, gru16, interp]; motion = enc(corrfeat, flow)
        net0 = gru08(net0, motion, interp(net1))

    Exact loop rotation of RefinementStep's body (see
    ops/pallas/step_fused.py docstring); the quarter-res plane runs in
    three Pallas kernels, only the 1/8 and 1/16 planes stay in XLA.
    Parameter paths are identical to RefinementStep's (shared scope).

    carry  = (net tuple, coords1 (B,H4,W4) f32 — squeezed x-coordinate)
    consts = (stereo levels, mono levels,
              czrq = per-scale concat(inp[i]) precomputed outside the scan,
              coords0 (B,H4,W4) squeezed)
    """

    hidden_dims: Sequence[int] = (128, 128, 128)
    n_gru_layers: int = 3
    corr_radius: int = 4
    compute_dtype: str = "float32"
    interpret: bool = False  # Pallas interpret mode (CPU integration tests)

    @nn.compact
    def __call__(self, carry, consts):
        import jax.numpy as jnp

        from stereoanywhere_tpu.ops.pallas import step_fused as sf

        net, coords1 = carry
        stereo_levels, mono_levels, czrq, coords0 = consts
        cdt = jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32
        coords1 = jax.lax.stop_gradient(coords1)

        # --- parameter shells (paths identical to the XLA modules) --------
        fh = _FlowHeadShell(name="flow_head")()
        enc = _ShellParams(name="encoder")()
        gshell = [
            _GruShell(in_features=384, name="gru08")(),
            _GruShell(in_features=384, name="gru16")(),
            _GruShell(in_features=256, name="gru32")(),
        ][: self.n_gru_layers]

        hw = sf.pack_head_weights(fh[0][0], fh[0][1], fh[1][0], fh[1][1], cdt)
        mw = sf.pack_motion_weights(
            enc[0][0], enc[0][1], enc[1][0], enc[1][1], enc[2][0], enc[2][1],
            enc[3][0], enc[3][1], enc[4][0], enc[4][1],
            len(stereo_levels), self.corr_radius, cdt,
        )
        gws = [
            sf.pack_gru_weights(gz[0], gz[1], gr[0], gr[1], gq[0], gq[1], cdt)
            for gz, gr, gq in gshell
        ]

        # --- kernel L: flow head + coords update + dual lookup ------------
        cn, corrfeat = sf.fused_step_head(
            net[0], coords1, stereo_levels, mono_levels, hw,
            radius=self.corr_radius, interpret=self.interpret,
        )

        # --- full cascade through the Pallas GRU kernel (reference
        # update.py:164-183 order; XLA keeps only pool2x/interp — its own
        # convs at a custom-call boundary pay a measured 4x relayout tax) --
        net = list(net)
        if self.n_gru_layers == 3:
            net[2] = sf.fused_step_gru(
                net[2].astype(cdt), [pool2x(net[1]).astype(cdt)], czrq[2],
                gws[2], interpret=self.interpret,
            )
        net[1] = sf.fused_step_gru(
            net[1].astype(cdt),
            [pool2x(net[0]).astype(cdt), interp_like(net[2], net[1]).astype(cdt)],
            czrq[1], gws[1], interpret=self.interpret,
        )
        xup = interp_like(net[1], net[0]).astype(cdt)

        # --- kernels F1/F2: motion encoder + level-0 ConvGRU --------------
        flowcols = sf.make_flowcols((cn - coords0).astype(cdt))
        motion = sf.fused_step_motion(corrfeat, flowcols, mw, interpret=self.interpret)
        net[0] = sf.fused_step_gru(
            net[0].astype(cdt), [motion, xup], czrq[0], gws[0],
            interpret=self.interpret,
        )
        net = [n.astype(cdt) for n in net]
        return (tuple(net), cn), 0


class _FlowHeadShell(nn.Module):
    @nn.compact
    def __call__(self):
        return (
            ParamConv(256, 3, name="conv1")(128),
            ParamConv(2, 3, name="conv2")(256),
        )


class _GruShell(nn.Module):
    in_features: int = 384

    @nn.compact
    def __call__(self):
        return (
            ParamConv(128, 3, name="convz")(self.in_features),
            ParamConv(128, 3, name="convr")(self.in_features),
            ParamConv(128, 3, name="convq")(self.in_features),
        )
