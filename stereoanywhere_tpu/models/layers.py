"""Low-level Flax layers with PyTorch-compatible semantics.

Naming is kept mechanically close to the reference modules so the
torch->JAX weight converter (compat/torch_convert.py) is a pure name map:
torch `fnet.layer1.0.conv1.weight` -> flax path `fnet/layer1_0/conv1/kernel`.

Conventions:
- NHWC / NDHWC layouts.
- Explicit symmetric padding tuples (torch pads (p,p); XLA 'SAME' may pad
  asymmetrically, so never use 'SAME').
- BatchNorm runs on stored running statistics by default: the reference
  freezes all BatchNorm at every training step (reference train.py:245 ->
  stereoanywhere.py:78-81), so inference statistics are the only mode the
  shipped model ever uses.  `use_running_average=False` is still supported.
- InstanceNorm has no learnable affine (torch default affine=False,
  reference extractor.py:29-32, submodule.py:17-22).
"""
from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# ---------------------------------------------------------------------------
# Inits


def kaiming_normal_fan_out():
    """He-normal with fan_out mode (reference extractor.py:155-162)."""
    return nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


# ---------------------------------------------------------------------------
# Norms (functional where parameter-free)


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Per-sample, per-channel normalization over spatial dims (no affine).

    Works for NHWC (rank 4) and NDHWC (rank 5).

    Statistics accumulate in f32 (fused into the reduction), but the
    normalization itself is applied in the INPUT dtype: promoting the
    arithmetic materializes a full-resolution f32 copy of the activation
    (measured: 136 MB per norm at 512x512 in the feature encoder).

    The optimization_barrier pins the producer (usually a conv) to run ONCE:
    without it XLA fuses the conv into BOTH consumers — the stats reduction
    and the normalize pass — duplicating the conv work (measured on v5e at
    512x512/64ch: conv+IN 2.70 ms -> 1.64 ms with the barrier; the conv
    alone is 1.21 ms).

    The square-sum is a self-einsum (f32 accumulation) rather than
    `square(x.astype(f32))`: under --xla_allow_excess_precision (set by this
    TPU runtime) an explicit f32 upcast of the activation lets XLA elide the
    producing conv's f32->bf16 downcast and keep the whole post-conv chain —
    transposes, refolds, gating — in f32, doubling its HBM traffic (device
    trace at 1024x1024: three 1.07 GB f32 reshapes in the hourglass).
    """
    x = jax.lax.optimization_barrier(x)
    axes = tuple(range(1, x.ndim - 1))
    mean = jnp.mean(x, axis=axes, keepdims=True, dtype=jnp.float32)
    spec = "b" + "xyzuv"[: x.ndim - 2] + "c"  # rank-generic NHWC/NDHWC/...
    n = 1
    for a in axes:
        n *= x.shape[a]
    s2 = jnp.einsum(f"{spec},{spec}->bc", x, x, preferred_element_type=jnp.float32)
    mean_sq = (s2 / n).reshape(mean.shape)
    var = mean_sq - jnp.square(mean)
    inv = (jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return (x - mean.astype(x.dtype)) * inv


class BatchNorm(nn.Module):
    """BatchNorm2d with torch defaults (eps 1e-5, momentum 0.1, affine).

    Stats live in the 'batch_stats' collection (converted from torch
    running_mean/running_var).
    """

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, use_running_average: bool = True) -> jax.Array:
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        ra_mean = self.variable("batch_stats", "mean", nn.initializers.zeros_init(), None, (features,))
        ra_var = self.variable("batch_stats", "var", nn.initializers.ones_init(), None, (features,))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            # barrier: see instance_norm — keeps the producer un-duplicated
            # across the stats and normalize consumers.
            x = jax.lax.optimization_barrier(x)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axis=axes, dtype=jnp.float32)
            spec = "bhwc"[4 - x.ndim :] if x.ndim <= 4 else "bdhwc"
            n_el = 1
            for a in axes:
                n_el *= x.shape[a]
            s2 = jnp.einsum(f"{spec},{spec}->c", x, x, preferred_element_type=jnp.float32)
            var = s2 / n_el - jnp.square(mean)
            if not self.is_initializing():
                # torch updates running_var with the UNBIASED batch variance
                # (Bessel n/(n-1)) while normalizing with the biased one
                n = 1
                for a in axes:
                    n *= x.shape[a]
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * unbiased
        # apply in the input dtype (avoid materializing f32 activations)
        inv = (jax.lax.rsqrt(var.astype(jnp.float32) + self.epsilon)).astype(x.dtype) * scale.astype(x.dtype)
        return (x - mean.astype(x.dtype)) * inv + bias.astype(x.dtype)


class GroupNorm(nn.Module):
    num_groups: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.GroupNorm(num_groups=self.num_groups, epsilon=self.epsilon)(x)


# ---------------------------------------------------------------------------
# Convs


def Conv(
    features: int,
    kernel_size: int | tuple[int, int] = 3,
    stride: int = 1,
    padding: int = 0,
    use_bias: bool = True,
    dilation: int = 1,
    groups: int = 1,
    name: str | None = None,
) -> nn.Conv:
    """2-D conv factory, torch-style symmetric padding, NHWC.

    A factory (not a wrapper Module) so parameters land directly at
    `<name>/kernel` — keeping flax paths 1:1 with torch attribute paths for
    the weight converter.
    """
    k = kernel_size if isinstance(kernel_size, tuple) else (kernel_size,) * 2
    p = ((padding, padding), (padding, padding))
    return nn.Conv(
        features,
        k,
        strides=(stride, stride),
        padding=p,
        use_bias=use_bias,
        kernel_dilation=(dilation, dilation),
        feature_group_count=groups,
        kernel_init=kaiming_normal_fan_out(),
        name=name,
    )


class ParamConv(nn.Module):
    """Bare conv parameters under torch-compatible paths (<name>/kernel,
    <name>/bias) so the caller can apply the conv itself (block-diagonal
    paired application, fused sibling convs, lax.cond branches, ...).
    Param layout identical to the Conv factory: HWIO kernel + bias."""

    features: int
    kernel_size: int = 3
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        k = self.kernel_size
        kernel = self.param(
            "kernel", kaiming_normal_fan_out(), (k, k, in_features, self.features)
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return kernel, bias


def paired_conv_apply(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None,
    stride: int = 1,
    padding: int = 0,
) -> jax.Array:
    """Apply one conv to TWO views folded into the channel dim.

    x is (B, H, W, 2*Cin) holding [view-A channels | view-B channels]; the
    (kh,kw,Cin,Cout) kernel is applied to each half independently (shared
    weights) via a block-diagonal (kh,kw,2Cin,2Cout) kernel -> (B,H,W,2Cout).

    Exactly equivalent to running the views as separate batch entries (the
    extra multiplications are by structural zeros), but the folded layout
    fills the TPU's 128-lane tiling: a 64-channel 3x3 conv at 512x512 runs
    1.21 ms as (2,H,W,64) and 0.83 ms as (1,H,W,128) on v5e.
    """
    z = jnp.zeros_like(kernel)
    kbd = jnp.concatenate(
        [jnp.concatenate([kernel, z], axis=3), jnp.concatenate([z, kernel], axis=3)],
        axis=2,
    )
    y = jax.lax.conv_general_dilated(
        x,
        kbd.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + jnp.concatenate([bias, bias]).astype(y.dtype)
    return y


def conv_small_cout_packed(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None,
    pack: int = 4,
    padding: int = 1,
) -> jax.Array:
    """Stride-1 conv whose OUTPUT channel count is tiny, applied with `pack`
    adjacent output columns packed into the lane axis.

    A 3x3 conv with Cout=32 fills only 32 of the MXU's 128 output lanes —
    the DPT head's scratch_output_conv2_0 (128->32 at 518^2) ran at 30 TF/s
    incl. a 0.42 ms relayout XLA emitted for its odd lowering (device trace,
    v5e).  Packing 4 output columns widens the kernel to (kh, kw+pack-1) at
    W-stride `pack` with output channels (pack*Cout): column group w' emits
    the original columns pack*w'+s as channel blocks s.  The widened kernel
    holds the original taps shifted by s and structural zeros elsewhere, so
    the sums are EXACTLY the original conv's (zeros are exact in any float
    format); FLOPs grow (kw+pack-1)/kw but lane utilization grows pack-fold.
    Measured: 1.31 ms -> ~0.3 ms for the head's output convs.

    STATUS (round 4): superseded on the DPT path by
    ops/interp.conv3x3_of_resize_halfpix (the conv folds into the preceding
    resize's matmuls: 0.80 ms for the whole output stage vs ~1.5 here incl.
    the input relayout).  Kept as a tested building block for small-Cout
    convs that do NOT follow a linear resize.  Also measured NEGATIVE
    in-scan for the GRU flow head (see UpdateHead) — the tap-stack matmul
    form won there instead.

    x: (B, H, W, Cin); kernel: (kh, kw, Cin, Cout), symmetric torch padding.
    Returns (B, H, W, pack*Cout) column-packed output — `unpack_columns`
    restores (B, H, W, Cout); or feed a following 1x1 conv directly in the
    packed layout (block-diagonal weights) to stay wide.
    """
    b, h, w, cin = x.shape
    kh, kw, _, co = kernel.shape
    wq = -(-w // pack)
    kwide = kw + pack - 1
    kp = jnp.zeros((kh, kwide, cin, pack, co), kernel.dtype)
    for s in range(pack):
        kp = kp.at[:, s : s + kw, :, s, :].set(kernel)
    kp = kp.reshape(kh, kwide, cin, pack * co)
    # last packed column group reads up to col pack*(wq-1)-padding+kwide-1
    pad_r = pack * (wq - 1) - padding + kwide - w
    y = jax.lax.conv_general_dilated(
        x,
        kp.astype(x.dtype),
        window_strides=(1, pack),
        padding=((padding, padding), (padding, pad_r)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (B, H, wq, pack*co)
    if bias is not None:
        y = y + jnp.tile(bias, pack).astype(y.dtype)
    return y


def unpack_columns(y: jax.Array, w: int, co: int) -> jax.Array:
    """(B, H, wq, pack*co) column-packed -> (B, H, w, co)."""
    b, h, wq, pc = y.shape
    pack = pc // co
    return y.reshape(b, h, wq * pack, co)[:, :, :w, :]


class SmallCinConv(nn.Module):
    """Conv whose INPUT channel count is tiny (2-4), lowered to explicit
    im2col (conv_general_dilated_patches) + MXU matmul on accelerators.

    XLA's direct lowering of e.g. a 7x7 conv on a 3-channel 512^2 image ran
    at 4% MXU / 58 GB/s (trace: cnet conv1 0.62 ms for 5.1 GFLOP); the
    explicit patch extraction is bandwidth-bound (~0.2 ms) and the matmul
    (k*k*Cin contraction lanes) runs at full rate.  Param layout identical
    to the Conv factory (kernel (k,k,Cin,Co) + bias), so checkpoints and
    converters are unaffected.  CPU keeps the direct conv (XLA:CPU is fine
    and the golden tests compare against torch there).

    STATUS: measured NET-NEGATIVE end-to-end on v5e (67 -> 71 ms at 512^2)
    — XLA materializes the 49-slice patch extraction as standalone copies,
    the same failure mode as the banded fold's 8-window stack.  Kept as a
    tested building block (exactness covered in tests/test_conv3d_fold.py)
    but NOT wired into the model; the direct conv stands until a Pallas
    patch-extract kernel exists.
    """

    features: int
    kernel_size: int = 7
    stride: int = 1
    padding: int = 3
    use_im2col: bool | None = None  # None: accelerator-only

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k, s, p = self.kernel_size, self.stride, self.padding
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", kaiming_normal_fan_out(), (k, k, cin, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        use = (
            jax.default_backend() != "cpu" if self.use_im2col is None else self.use_im2col
        )
        if not use:
            y = jax.lax.conv_general_dilated(
                x, kernel.astype(x.dtype), (s, s), ((p, p), (p, p)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y + bias.astype(y.dtype)
        patches = jax.lax.conv_general_dilated_patches(
            x, (k, k), (s, s), ((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # (..., Cin*k*k), channel-major
        km = kernel.transpose(2, 0, 1, 3).reshape(cin * k * k, self.features)
        y = jnp.einsum(
            "bhwf,fo->bhwo", patches, km.astype(patches.dtype),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        return y + bias.astype(y.dtype)


def Conv3d(
    features: int,
    kernel_size: int = 3,
    stride: int = 1,
    padding: int = 0,
    use_bias: bool = True,
    groups: int = 1,
    name: str | None = None,
) -> nn.Conv:
    """3-D conv factory, torch-style symmetric padding, NDHWC."""
    return nn.Conv(
        features,
        (kernel_size,) * 3,
        strides=(stride,) * 3,
        padding=((padding, padding),) * 3,
        use_bias=use_bias,
        feature_group_count=groups,
        kernel_init=kaiming_normal_fan_out(),
        name=name,
    )


class ConvTransposeTorch(nn.Module):
    """Transposed conv matching torch ConvTranspose2d semantics exactly.

    Implemented as an input-dilated conv with a spatially-flipped kernel —
    the literal gradient-of-conv definition torch uses.  Output size:
    (H-1)*stride - 2*padding + kernel.
    """

    features: int
    kernel_size: int
    stride: int
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel_size
        b, h, w, in_features = x.shape
        # Stored in torch ConvTranspose2d layout-equivalent: (kh, kw, out, in)
        # so the converter maps weight (in, out, kh, kw) -> transpose(2,3,1,0).
        kernel = self.param(
            "kernel", kaiming_normal_fan_out(), (k, k, self.features, in_features)
        )
        if k == self.stride and self.padding == 0:
            # Non-overlapping transposed conv (the DPT head's 4x4/s4 and
            # 2x2/s2 resize layers) == exact matmul + depth-to-space: each
            # output pixel out[ki+di, kj+dj, o] = sum_c in[i,j,c]*K[di,dj,o,c]
            # — no window overlap, so the lhs-dilated conv lowering (16x
            # structurally-zero MACs at k=4) is pure waste.  Same sums,
            # MXU-shaped.
            km = kernel.transpose(3, 0, 1, 2).reshape(
                in_features, k * k * self.features
            )
            y = jnp.einsum(
                "bhwc,cf->bhwf", x, km.astype(x.dtype),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
            y = y.reshape(b, h, w, k, k, self.features)
            y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * k, w * k, self.features)
        else:
            flipped = jnp.flip(kernel, axis=(0, 1)).transpose(0, 1, 3, 2)  # (kh,kw,in,out)
            pad = k - 1 - self.padding
            y = jax.lax.conv_general_dilated(
                x,
                flipped.astype(x.dtype),
                window_strides=(1, 1),
                padding=((pad, pad), (pad, pad)),
                lhs_dilation=(self.stride, self.stride),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


# ---------------------------------------------------------------------------
# Activations

_ACTS: dict[str, Callable] = {
    "relu": jax.nn.relu,
    "lrelu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.01),
    "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
    "none": lambda x: x,
}


class Conv3dParams(nn.Module):
    """Bare conv3d parameters under the Conv3d-compatible path
    (<name>/kernel: (k,k,k,Ci,Co)), for callers that apply the conv via a
    custom lowering (the banded fold).

    kernel_init MUST match whatever the direct-conv branch of the caller
    uses, so the fold/direct choice never changes random initialization."""

    features: int
    kernel_size: int = 3
    use_bias: bool = False
    kernel_init: Callable = kaiming_normal_fan_out()

    @nn.compact
    def __call__(self, in_features: int):
        k = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init, (k,) * 3 + (in_features, self.features)
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return kernel, bias


def _use_banded_conv3d(ci: int, co: int) -> bool:
    """Banded fold on accelerators for SMALL-channel 3-D convs; direct conv3d
    on CPU (XLA:CPU convs are fine there and tests compare against the torch
    oracle on CPU) and for channel counts where XLA's direct lowering already
    tiles the MXU acceptably (measured crossover ~ ci*co 512 on v5e:
    8->1/8->8/8->16 fold 2.0-2.7x faster, 16->32 1.3x, 32->32 0.7x)."""
    return ci * co <= 512 and jax.default_backend() != "cpu"


class BasicConv(nn.Module):
    """Conv(+3d) -> norm -> activation (reference submodule.py:25-53).

    norm 'instance' (affine-free) or 'none'; bias disabled like the reference.

    TPU: 3-D convs with k=3 are applied via the blocked banded fold
    (ops/conv3d_fold.py) — same math, MXU-shaped operands.
    """

    features: int
    is_3d: bool = False
    norm: str = "instance"
    act: str = "lrelu"
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    deconv: bool = False  # 2-D transposed conv (reference BasicConv deconv=True)

    @nn.compact
    def __call__(
        self, x: jax.Array, folded_w: int | None = None, folded_nb: int | None = None
    ) -> jax.Array:
        if folded_w is not None:
            # Lane-folded 3-D path: x is (B, D, H, W*Ci) (ops/folded.py) —
            # avoids the 16x lane padding of materialized low-channel NDHWC
            # tensors.  With folded_nb, x is the carried block layout
            # (B, nb, D, H, (W/nb)*Ci) — same math, no per-conv window
            # stack/unstack passes.  Same parameters as every other branch.
            assert self.is_3d and not self.deconv and self.norm in ("instance", "none")
            from stereoanywhere_tpu.ops.folded import (
                conv3d_blocked_io,
                conv3d_folded_io,
                instance_norm_blocked,
                instance_norm_folded,
            )

            if folded_nb is not None:
                ci = x.shape[-1] * folded_nb // folded_w
                kernel, _ = Conv3dParams(
                    self.features, self.kernel_size, use_bias=False, name="conv"
                )(ci)
                x = conv3d_blocked_io(
                    x, kernel, (self.stride,) * 3, self.padding, w=folded_w
                )
                if self.norm == "instance":
                    x = instance_norm_blocked(x, self.features)
                return _ACTS[self.act](x)
            ci = x.shape[-1] // folded_w
            kernel, _ = Conv3dParams(
                self.features, self.kernel_size, use_bias=False, name="conv"
            )(ci)
            x = conv3d_folded_io(
                x, kernel, (self.stride,) * 3, self.padding, w=folded_w
            )
            if self.norm == "instance":
                x = instance_norm_folded(x, self.features)
            return _ACTS[self.act](x)
        if self.deconv:
            assert not self.is_3d, "3-D deconv unused by the reference extractors"
            x = ConvTransposeTorch(
                self.features, self.kernel_size, self.stride, self.padding,
                use_bias=False, name="conv",
            )(x)
        elif self.is_3d and self.kernel_size == 1 and self.stride == 1:
            # 1x1x1 conv3d == channel matmul.  XLA's conv3d lowering pads the
            # minor dims (measured 2.6 ms for a 0.27-GFLOP 32->16 matmul at
            # 64^3); the einsum runs it as a plain MXU contraction.
            kernel = Conv3dParams(self.features, 1, use_bias=False, name="conv")(
                x.shape[-1]
            )[0]
            x = jnp.einsum(
                "bdhwc,co->bdhwo", x, kernel[0, 0, 0].astype(x.dtype),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
        elif (
            self.is_3d
            and self.kernel_size == 3
            and _use_banded_conv3d(x.shape[-1], self.features)
        ):
            from stereoanywhere_tpu.ops.conv3d_fold import conv3d_folded

            kernel, _ = Conv3dParams(self.features, 3, use_bias=False, name="conv")(
                x.shape[-1]
            )
            x = conv3d_folded(x, kernel, (self.stride,) * 3, self.padding)
        else:
            conv_cls = Conv3d if self.is_3d else Conv
            x = conv_cls(
                self.features,
                kernel_size=self.kernel_size,
                stride=self.stride,
                padding=self.padding,
                use_bias=False,
                name="conv",
            )(x)
        if self.norm == "instance":
            x = instance_norm(x)
        elif self.norm == "batch":
            x = BatchNorm(name="norm")(x)
        return _ACTS[self.act](x)
