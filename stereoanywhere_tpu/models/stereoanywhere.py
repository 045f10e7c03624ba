"""StereoAnywhere top module — dual-branch iterative stereo, TPU-native.

Reimplements the full forward dataflow of the reference
(stereoanywhere.py:95-299) in NHWC with static shapes and a `lax.scan` GRU
loop.  Sign convention: the public output is POSITIVE disparity; internally
flow = coords1 - coords0 = -disparity like the reference (negation at the
reference's call sites, test.py:225).

Inputs (all NHWC):
  image2, image3: (B,H,W,3) in [0,1]   (left, right)
  mde2, mde3:     (B,H,W,1) normalized mono depth in [0,1]
H, W must be multiples of 32 (the eval harness pads, reference test.py:204-213).

Returns a dict:
  test_mode:  {'disparity': (B,H,W,1) positive}
  train mode: adds 'disparities' (iters,B,H,W,1), coarse mono/scaled
  disparities for both views and confidences (reference stereoanywhere.py:299).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from stereoanywhere_tpu.config import StereoAnywhereConfig
from stereoanywhere_tpu.models.extractor import ContextEncoder, FeatureEncoder
from stereoanywhere_tpu.models.hourglass import Hourglass
from stereoanywhere_tpu.models.layers import Conv
from stereoanywhere_tpu.models.update import RefinementStep
from stereoanywhere_tpu.ops import (
    all_pairs_correlation,
    build_corr_pyramid,
    convex_upsample,
    estimate_left_confidence,
    estimate_left_disparity,
    estimate_normals,
    estimate_right_confidence,
    estimate_right_disparity,
    fuzzy_and,
    generate_masks,
    handcrafted_mirror_detector,
    joint_minmax_normalize,
    lookup_corr_pyramid,
    softlrc,
    truncate_corr_volume,
    weighted_lsq,
)
from stereoanywhere_tpu.ops.interp import (
    resize_bilinear_align_corners,
    resize_nearest,
    resize_trilinear_align_corners,
)
from stereoanywhere_tpu.ops.folded import (
    build_masked_volume_blocked,
    build_masked_volume_folded,
    from_blocks,
    pick_nb,
    unfold,
)
from stereoanywhere_tpu.ops.volume import apply_bin_masks, gauss_corr_volume


class Conv3dClassifier(nn.Module):
    """Conv3d(C -> 1, k3, p1, no bias) over NDHWC (reference stereoanywhere.py:73-74).

    On accelerators the 1-output-channel conv3d is applied via the banded
    fold (ops/conv3d_fold.py): XLA's direct lowering left the MXU >99% idle
    (measured 12.9 ms at 512x512; folded ~0.2 ms)."""

    @nn.compact
    def __call__(self, x, folded_w: int | None = None, return_kernel: bool = False):
        from stereoanywhere_tpu.models.layers import Conv3dParams, _use_banded_conv3d
        from stereoanywhere_tpu.ops.conv3d_fold import conv3d_folded

        if return_kernel:
            # expose the (3,3,3,Ci,1) kernel so the caller can batch sibling
            # classifiers into ONE conv (inference fuses classifier_mono +
            # classifier_monoconf: a co=1 banded conv fills only wb of the
            # MXU's 128 output lanes)
            ci = (
                x.shape[-1] * x.shape[1] // folded_w
                if x.ndim == 5
                else x.shape[-1] // folded_w
            ) if folded_w is not None else x.shape[-1]
            kernel, _ = Conv3dParams(
                1, 3, use_bias=False, kernel_init=nn.initializers.lecun_normal(), name="conv"
            )(ci)
            return kernel

        if folded_w is not None:
            # x is lane-folded (B, W3, H, W2*C) — or, when 5-D, the carried
            # block layout (B, nb, W3, H, (W2/nb)*C).  The torch kernel axes
            # were trained in (H, W2, W3) order (unfolded path below):
            # permuting the KERNEL spatial axes to (W3, H, W2) instead of
            # transposing the data gives the identical convolution with the
            # volume left in hourglass order.  Returns (B, W3, H, W2) folded
            # or (B, nb, W3, H, W2/nb) blocked.
            from stereoanywhere_tpu.ops.folded import conv3d_blocked_io, conv3d_folded_io

            if x.ndim == 5:
                ci = x.shape[-1] * x.shape[1] // folded_w
                kernel, _ = Conv3dParams(
                    1, 3, use_bias=False, kernel_init=nn.initializers.lecun_normal(), name="conv"
                )(ci)
                return conv3d_blocked_io(
                    x, kernel.transpose(2, 0, 1, 3, 4), (1, 1, 1), 1, w=folded_w
                )
            ci = x.shape[-1] // folded_w
            kernel, _ = Conv3dParams(
                1, 3, use_bias=False, kernel_init=nn.initializers.lecun_normal(), name="conv"
            )(ci)
            return conv3d_folded_io(
                x, kernel.transpose(2, 0, 1, 3, 4), (1, 1, 1), 1, w=folded_w
            )
        if _use_banded_conv3d(x.shape[-1], 1):
            # lecun_normal matches nn.Conv's default below: the fold/direct
            # choice must not change random initialization.
            kernel, _ = Conv3dParams(
                1, 3, use_bias=False, kernel_init=nn.initializers.lecun_normal(), name="conv"
            )(x.shape[-1])
            return conv3d_folded(x, kernel, (1, 1, 1), 1)
        return nn.Conv(1, (3, 3, 3), padding=((1, 1),) * 3, use_bias=False, name="conv")(x)


class StereoAnywhere(nn.Module):
    cfg: StereoAnywhereConfig = StereoAnywhereConfig()

    @nn.compact
    def __call__(
        self,
        image2: jax.Array,
        image3: jax.Array,
        mde2: jax.Array,
        mde3: jax.Array,
        iters: int = 32,
        test_mode: bool = True,
        train: bool = False,
        debug: bool = False,
    ) -> dict[str, Any]:
        cfg = self.cfg
        b, h, w, c = image2.shape

        # --- internal width alignment (TPU geometry fix) -------------------
        # KITTI's pad-32 width (1248 -> W/4 = 312 = 8*39) denies the blocked
        # hourglass its wb=16 split: 384x1248 measures 165.5 ms vs 145.8 at
        # 384x1280 on v5e — 12% slower despite 2.6% fewer pixels
        # (ARCHITECTURE.md geometry finding).  For large inference inputs,
        # replicate-pad the width to a multiple of 64 (W/4 % 16 == 0) and
        # crop the disparity back — the same protocol-sanctioned border the
        # eval harness's ShapeBucketer adds, now built into the model so
        # raw-shape serving gets the fast geometry too.  Gated to wide
        # inputs so small/golden-test shapes are untouched bit-for-bit.
        w_orig = None
        if (
            test_mode
            and not debug
            and cfg.width_pad_align
            and w >= cfg.width_pad_min
            and w % cfg.width_pad_align != 0
        ):
            w_orig = w
            w = -(-w // cfg.width_pad_align) * cfg.width_pad_align
            pads = ((0, 0), (0, 0), (0, w - w_orig), (0, 0))
            image2 = jnp.pad(image2, pads, mode="edge")
            image3 = jnp.pad(image3, pads, mode="edge")
            mde2 = jnp.pad(mde2, pads, mode="edge")
            mde3 = jnp.pad(mde3, pads, mode="edge")

        f = cfg.downsample_factor
        h4, w4 = h // f, w // f
        w_lowres = w4
        cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

        if c == 1:
            image2 = jnp.concatenate([image2] * 3, axis=-1)
            image3 = jnp.concatenate([image3] * 3, axis=-1)
            image2, image3 = joint_minmax_normalize([image2, image3])

        image2 = image2 * 2.0 - 1.0
        image3 = image3 * 2.0 - 1.0

        # --- mono pyramids (reference stereoanywhere.py:109-114) -----------
        mde2_low = resize_bilinear_align_corners(mde2, (h4, w4))
        mde3_low = resize_bilinear_align_corners(mde3, (h4, w4))
        vf = 2 ** cfg.vol_downsample
        if cfg.vol_downsample > 0:
            mde2_vlow = resize_bilinear_align_corners(mde2, (h // vf, w // vf))
            mde3_vlow = resize_bilinear_align_corners(mde3, (h // vf, w // vf))
        else:
            mde2_vlow, mde3_vlow = mde2, mde3
        normal_gain = w_lowres / cfg.normal_gain
        normals2 = estimate_normals(mde2_low, normal_gain)
        normals3 = estimate_normals(mde3_low, normal_gain)

        # --- context encoder on replicated mono depth (ref :116-120) -------
        # Norm-layer mode: the reference calls freeze_bn() at EVERY training
        # step (reference train.py:245), so BatchNorm always normalizes with
        # running stats; batch-stat mode exists only behind freeze_bn=False.
        norm_train = train and not cfg.freeze_bn
        # cnet consumes the left mono depth "replicated to 3 channels"
        # (reference stereoanywhere.py:116) — passed as ONE channel; the
        # encoder's conv1 sums its kernel over Cin instead (exact, 3x less
        # full-res 7x7 contraction; ContextEncoder docstring).
        cnet_out = ContextEncoder(
            output_dims=(tuple(cfg.context_dims), tuple(cfg.context_dims)),
            name="cnet",
        )(mde2.astype(cdt), train=norm_train)
        net_list = [jnp.tanh(o[0]) for o in cnet_out]
        inp_list = []
        for i, o in enumerate(cnet_out):
            # pre-split into (cz, cr, cq): measured BETTER than passing the
            # whole 3*hd tensor and slicing in the scan body (see the A/B
            # note in ConvGRU.__call__).
            ctx = Conv(cfg.context_dims[i] * 3, 3, 1, 1, name=f"context_zqr_convs_{i}")(
                jax.nn.relu(o[1])
            )
            inp_list.append(tuple(jnp.split(ctx, 3, axis=-1)))

        # --- feature encoder, both views as one doubled batch (ref :122) ---
        fmaps = FeatureEncoder(cfg.fnet_dim, name="fnet")(
            jnp.concatenate([image2, image3], axis=0).astype(cdt), train=norm_train
        )
        # f32 volumes for exact reference parity; bf16 end-to-end in mixed
        # precision (the reference's `.float()` at stereoanywhere.py:126 is a
        # CUDA-autocast artifact, not a numerical requirement).
        fmap2 = fmaps[:b].astype(cdt)
        fmap3 = fmaps[b:].astype(cdt)

        # --- mono-depth feature pyramids for hourglass attention (ref :124-125)
        hv, wv = mde2_vlow.shape[1], mde2_vlow.shape[2]
        fmde2 = [
            resize_bilinear_align_corners(mde2_vlow, (hv // (2 ** i), wv // (2 ** i)))
            for i in range(cfg.n_downsample, 6)
        ]
        fmde3 = [
            resize_bilinear_align_corners(mde3_vlow, (hv // (2 ** i), wv // (2 ** i)))
            for i in range(cfg.n_downsample, 6)
        ]

        # --- all-pairs volumes (ref :135-136): MXU batched matmuls ---------
        stereo_vol = all_pairs_correlation(fmap2, fmap3)  # (B,H4,W4,W4)
        mono_vol = (1.73 * all_pairs_correlation(normals2.astype(cdt), normals3.astype(cdt))).astype(jnp.float32)

        left_masks = generate_masks(mde2_low, cfg.vol_n_masks)   # (B,H4,W4,N)
        right_masks = generate_masks(mde3_low, cfg.vol_n_masks)

        orig_vol_dhw = mono_vol.shape[1:4]
        if cfg.vol_downsample > 0:
            tgt = tuple(s // vf for s in orig_vol_dhw)
            mono_vol = resize_trilinear_align_corners(mono_vol[..., None], tgt)[..., 0]
            left_masks = resize_nearest(left_masks, (tgt[0], tgt[1]))
            right_masks = resize_nearest(right_masks, (tgt[0], tgt[2]))

        # --- optional stereo-volume aggregation (ref :147-159; default OFF,
        # the released checkpoint aggregates only the mono volume) ----------
        # Carried block layout for the folded hourglasses (ops/folded.py):
        # nb_vol >= 2 keeps the banded convs' block axis alive across the
        # whole aggregation network (halo exchange instead of window
        # stack/unstack per conv).  None/1 -> plain folded path.
        nb_vol = pick_nb(left_masks.shape[2]) if cfg.hourglass_blocked else None
        blocked_vol = cfg.hourglass_folded and nb_vol is not None and nb_vol >= 2

        if cfg.use_aggregate_stereo_vol:
            if cfg.hourglass_folded:
                if blocked_vol:
                    masked_stereo = build_masked_volume_blocked(
                        stereo_vol.astype(jnp.float32), left_masks, right_masks,
                        cdt, nb_vol,
                    )
                else:
                    masked_stereo = build_masked_volume_folded(
                        stereo_vol.astype(jnp.float32), left_masks, right_masks,
                        jnp.float32,
                    ).astype(cdt)
                agg_s = Hourglass(
                    cfg.vol_n_masks, cfg.volume_channels, folded=True,
                    blocked=blocked_vol, name="hourglass_stereo",
                )(masked_stereo, fmde2, fmde3)
                # stereo stack (ref :150-151; same identity-first quirk as mono)
                for i in range(cfg.n_additional_hourglass):
                    if i == 0:
                        continue  # HourglassIdentity
                    agg_s = Hourglass(
                        cfg.volume_channels, cfg.volume_channels, folded=True,
                        blocked=blocked_vol, name=f"hourglass_stereo_stack_{i}",
                    )(agg_s, fmde2, fmde3)
                w2_vol = left_masks.shape[2]
                agg_disp_stereo = Conv3dClassifier(name="classifier_stereo")(
                    agg_s, folded_w=w2_vol
                )
                if blocked_vol:
                    agg_disp_stereo = from_blocks(agg_disp_stereo)
                agg_disp_stereo = agg_disp_stereo.astype(jnp.float32).transpose(
                    0, 2, 3, 1
                )  # (B,H,W2,W3)
            else:
                masked_stereo = apply_bin_masks(
                    stereo_vol.astype(jnp.float32), left_masks, right_masks
                ).transpose(0, 3, 1, 2, 4).astype(cdt)
                agg_s = Hourglass(cfg.vol_n_masks, cfg.volume_channels, name="hourglass_stereo")(
                    masked_stereo, fmde2, fmde3
                )
                for i in range(cfg.n_additional_hourglass):
                    if i == 0:
                        continue  # HourglassIdentity
                    agg_s = Hourglass(
                        cfg.volume_channels, cfg.volume_channels,
                        name=f"hourglass_stereo_stack_{i}",
                    )(agg_s, fmde2, fmde3)
                agg_s = agg_s.transpose(0, 2, 3, 1, 4)
                agg_disp_stereo = Conv3dClassifier(name="classifier_stereo")(agg_s).astype(jnp.float32)[..., 0]
            coarse_dispstereo2_low = estimate_left_disparity(agg_disp_stereo)
            coarse_dispstereo3_low = estimate_right_disparity(agg_disp_stereo)
            coarse_dispstereo2 = resize_bilinear_align_corners(coarse_dispstereo2_low, (h, w)) * f
            coarse_dispstereo3 = resize_bilinear_align_corners(coarse_dispstereo3_low, (h, w)) * f
        else:
            agg_disp_stereo = None
            coarse_dispstereo2 = coarse_dispstereo3 = None

        # --- masked mono volume -> hourglass -> classifiers (ref :161-166) -
        # Build directly in the hourglass layout: fusing the transpose into
        # the broadcast product avoids materializing the (B,H,W2,W3,N) volume
        # twice (2x2.1 GB at 1024x1024).  The folded build additionally packs
        # (W2, N) into one lane axis — see ops/folded.py.
        if cfg.hourglass_folded:
            if blocked_vol:
                masked_mono = build_masked_volume_blocked(
                    mono_vol, left_masks, right_masks, cdt, nb_vol
                )  # (B, nb, W3, H, (W2/nb)*N)
            else:
                masked_mono = build_masked_volume_folded(
                    mono_vol, left_masks, right_masks, cdt
                )  # (B, W3, H, W2*N)
        else:
            masked_mono = (
                mono_vol.transpose(0, 3, 1, 2)[..., None].astype(cdt)
                * left_masks[:, None, :, :, :].astype(cdt)
                * right_masks.transpose(0, 2, 1, 3)[:, :, :, None, :].astype(cdt)
            )
        agg = Hourglass(
            cfg.vol_n_masks, cfg.volume_channels,
            folded=cfg.hourglass_folded, blocked=blocked_vol, name="hourglass_mono",
        )(masked_mono, fmde2, fmde3)
        # Additional stacked hourglasses (ref :69-72,163-164; default 0).
        # Reference quirk kept: stack[0] is HourglassIdentity, and the loop
        # runs range(n) over a list of length n+1, so the LAST appended
        # hourglass is never applied — effectively (n-1) real passes.
        for i in range(cfg.n_additional_hourglass):
            if i == 0:
                continue  # HourglassIdentity
            agg = Hourglass(
                cfg.volume_channels, cfg.volume_channels,
                folded=cfg.hourglass_folded, blocked=blocked_vol,
                name=f"hourglass_mono_stack_{i}",
            )(agg, fmde2, fmde3)
        # The reference un-permutes the volume to (H,W2,W3) BEFORE the
        # classifier conv3d (reference hourglass.py:91 -> stereoanywhere.py:165),
        # so the learned 3x3x3 kernel axes correspond to (H,W2,W3); match that
        # (the folded classifier permutes the KERNEL instead of the data).
        if cfg.hourglass_folded:
            w2_vol = left_masks.shape[2]
            if test_mode and blocked_vol:
                # Inference: batch both classifiers into ONE banded conv
                # (identical math — concatenated output channels; a co=1
                # conv fills only wb of the MXU's 128 output lanes).  The
                # conf head's stop_gradient is a no-op without grads.
                from stereoanywhere_tpu.ops.folded import conv3d_blocked_io

                k_mono = Conv3dClassifier(name="classifier_mono")(
                    agg, folded_w=w2_vol, return_kernel=True
                )
                k_conf = Conv3dClassifier(name="classifier_monoconf")(
                    agg, folded_w=w2_vol, return_kernel=True
                )
                kk = jnp.concatenate([k_mono, k_conf], axis=-1)  # (3,3,3,Ci,2)
                both = conv3d_blocked_io(
                    agg, kk.transpose(2, 0, 1, 3, 4), (1, 1, 1), 1, w=w2_vol,
                    out_co_major=True,
                )  # (B, nb, W3, H, 2*(W2/nb)), lanes co-major: [mono cols | conf cols]
                wb_cls = both.shape[-1] // 2
                agg_disp = from_blocks(both[..., :wb_cls])
                agg_conf = from_blocks(both[..., wb_cls:])
            else:
                agg_disp = Conv3dClassifier(name="classifier_mono")(agg, folded_w=w2_vol)
                agg_conf = Conv3dClassifier(name="classifier_monoconf")(
                    jax.lax.stop_gradient(agg), folded_w=w2_vol
                )
                if blocked_vol:
                    agg_disp = from_blocks(agg_disp)
                    agg_conf = from_blocks(agg_conf)
            agg_disp = agg_disp.astype(jnp.float32).transpose(0, 2, 3, 1)  # (B,H,W2,W3)
            agg_conf = agg_conf.astype(jnp.float32).transpose(0, 2, 3, 1)
        else:
            agg = agg.transpose(0, 2, 3, 1, 4)  # (B,W3,H,W2,C) -> (B,H,W2,W3,C)
            agg_disp = Conv3dClassifier(name="classifier_mono")(agg).astype(jnp.float32)
            agg_conf = Conv3dClassifier(name="classifier_monoconf")(
                jax.lax.stop_gradient(agg)
            ).astype(jnp.float32)
            agg_disp = agg_disp[..., 0]  # (B,H,W2,W3)
            agg_conf = agg_conf[..., 0]

        if cfg.vol_downsample > 0:
            agg_disp = resize_trilinear_align_corners(agg_disp[..., None], orig_vol_dhw)[..., 0]
            agg_conf = resize_trilinear_align_corners(agg_conf[..., None], orig_vol_dhw)[..., 0]

        # --- coarse disparities + confidences (ref :174-189) ---------------
        coarse_dispmono2_low = estimate_left_disparity(agg_disp)
        coarse_dispmono3_low = estimate_right_disparity(agg_disp)
        conf2_low = estimate_left_confidence(agg_conf)
        conf3_low = estimate_right_confidence(agg_conf)

        coarse_dispmono2 = resize_bilinear_align_corners(coarse_dispmono2_low, (h, w)) * f
        coarse_dispmono3 = resize_bilinear_align_corners(coarse_dispmono3_low, (h, w)) * f
        coarse_conf2 = resize_bilinear_align_corners(conf2_low, (h, w))
        coarse_conf3 = resize_bilinear_align_corners(conf3_low, (h, w))

        lrc2_low, lrc3_low = softlrc(coarse_dispmono2_low, coarse_dispmono3_low, cfg.lrc_th)
        dispconf2_low = fuzzy_and(conf2_low, lrc2_low)
        dispconf3_low = fuzzy_and(conf3_low, lrc3_low)

        # --- global scale/shift via weighted LSQ (ref :191-197) ------------
        scale, shift = weighted_lsq(
            jnp.concatenate([mde2_low, mde3_low], axis=-1),
            jnp.concatenate([coarse_dispmono2_low, coarse_dispmono3_low], axis=-1),
            jnp.concatenate([dispconf2_low, dispconf3_low], axis=-1),
        )
        scaled_mde2_low = scale * mde2_low + shift
        scaled_mde2 = (scale * mde2 + shift) * f
        scaled_mde3 = (scale * mde3 + shift) * f
        scaled_mde3_low = scale * mde3_low + shift

        lrc_scaled2_low, _ = softlrc(scaled_mde2_low, scaled_mde3_low, cfg.lrc_th)

        # --- mirror detection + stereo-volume truncation (ref :201-205) ----
        if cfg.use_truncate_vol:
            mirror_conf = handcrafted_mirror_detector(
                coarse_dispmono2_low,
                scaled_mde2_low,
                dispconf2_low,
                lrc_scaled2_low,
                conf_th=cfg.mirror_conf_th,
            )
            trunc_mask = jax.lax.stop_gradient(
                truncate_corr_volume(scaled_mde2_low, mirror_conf, None, cfg.mirror_attenuation)
            )
        else:
            trunc_mask = jnp.ones_like(stereo_vol[..., :1])

        _stereo_vol = agg_disp_stereo if cfg.use_aggregate_stereo_vol else stereo_vol
        _mono_vol = agg_disp if cfg.use_aggregate_mono_vol else mono_vol

        # --- train-time volume-corruption augmentation (ref :214-251) ------
        if train and cfg.volume_corruption_prob > 0:
            _stereo_vol, _mono_vol = self._corrupt_volumes(
                _stereo_vol, _mono_vol, mde2_low, coarse_dispmono2_low, w_lowres
            )

        stereo_pyr = build_corr_pyramid(
            (trunc_mask * _stereo_vol).astype(cdt), cfg.corr_levels, cfg.corr_radius
        )
        mono_pyr = build_corr_pyramid(_mono_vol.astype(cdt), cfg.corr_levels, cfg.corr_radius)

        # --- iterative refinement: nn.scan over RefinementStep (ref :261-294)
        coords0 = jnp.broadcast_to(
            jnp.arange(w4, dtype=jnp.float32)[None, None, :, None], (b, h4, w4, 1)
        )
        coords1 = coords0 if cfg.init_disparity_zero else coords0 - scaled_mde2_low

        step_kw = dict(
            hidden_dims=tuple(cfg.context_dims),
            n_gru_layers=cfg.n_gru_layers,
            n_downsample=cfg.n_downsample,
            corr_radius=cfg.corr_radius,
            compute_dtype=cfg.compute_dtype,
            # Pallas fused ConvGRU (ops/pallas/gru_fused.py): OFF — standalone
            # it is 2.2x the XLA step (0.97 vs 2.14 ms at the 1024² level-0
            # shapes) but IN-SCAN the custom-call layout boundary makes XLA
            # re-lay-out every neighboring conv: loop 138 -> 154.5 ms (all
            # levels fused) / 194.4 ms (level-0 only), device traces
            # 2026-08-20.  Demoted to the negative-kernel index (no shipped
            # path isolates the GRU from the scan).
            fused_gru=False,
        )
        inp_list = [tuple(t.astype(cdt) for t in triple) for triple in inp_list]
        net_init = tuple(n.astype(cdt) for n in net_list)

        # Lookup dispatch.  The Pallas barrel-shift kernel
        # (ops/pallas/corr_barrel.py) reads each volume level from HBM
        # exactly once per iteration, but measured SLOWER than the XLA
        # formulations on v5e (0.65 ms vs 0.18 ms per iteration-pair at
        # 512^2 — Mosaic lane rotates are not cheap); "auto" therefore
        # resolves to the XLA path and "barrel" must be forced explicitly
        # (inference-only: the kernel has no VJP).  The packed interleave is
        # hoisted here, outside the scan.
        use_barrel = (
            cfg.lookup_impl == "barrel"
            and test_mode
            and cdt == jnp.bfloat16
            and jax.default_backend() == "tpu"
            and (b * h4) % 4 == 0
            and 2 * cfg.corr_radius + 1 <= 16
        )
        if use_barrel:
            from stereoanywhere_tpu.ops.pallas.corr_barrel import pack_pyramid_pair

            step_kw["lookup_impl"] = "barrel"
            step_kw["lookup_wls"] = tuple(l.shape[-1] for l in stereo_pyr.levels)
            packed = pack_pyramid_pair(stereo_pyr.levels, mono_pyr.levels, cfg.corr_radius)
            consts = (packed, (), inp_list, coords0)
        else:
            # "auto" -> window: the windowed-slab tent (ops/corr_lookup.py
            # _lookup_level_window_pair) evaluates tent weights only in a
            # (block+2r+2)-lane slab around each row's coordinate instead of
            # the full Wl axis, removing the measured VPU wall of the dense
            # formulations.  In-model fits (tools/profile_model.py,
            # 2026-08-19): 512^2 65 -> 58.0 ms (loop 1.25 -> 1.02 ms/iter),
            # 1024^2 343.5 -> 314.8 ms (5.5 -> 4.64 ms/iter) vs the prior
            # inline default.  Fully differentiable; tiny/indivisible levels
            # fall back to the inline tent inside the pair function.
            impl = "window" if cfg.lookup_impl == "auto" else cfg.lookup_impl
            if impl == "mxu" and not (
                test_mode and jax.default_backend() == "tpu" and (b * h4) % 4 == 0
            ):
                # the Pallas MXU-reduction kernel has no VJP and requires the
                # TPU backend; outside those conditions fall back to the XLA
                # inline tent (same math).
                impl = "inline"
            step_kw["lookup_impl"] = impl
            consts = (stereo_pyr.levels, mono_pyr.levels, inp_list, coords0)

        def make_scan(length, **kw):
            # unroll amortizes the while-loop's per-iteration kernel-launch
            # overhead and widens XLA's fusion window across iterations.
            unroll = max(u for u in range(1, cfg.scan_unroll + 1) if length % u == 0)
            return nn.scan(
                RefinementStep,
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=nn.broadcast,
                out_axes=0,
                length=length,
                unroll=unroll,
            )(**step_kw, **kw, name="update_block")

        # Level-0-fused rotated schedule (ops/pallas/step_fused.py): the
        # scan body runs the whole quarter-res plane in three Pallas
        # kernels; one un-rotated PRE-step (the XLA body minus the flow
        # head) and a flow-head/mask TAIL bracket the scan — an exact loop
        # rotation of the reference iteration (stereoanywhere.py:267-294).
        from stereoanywhere_tpu.ops.pallas.step_fused import fused_step_supported

        use_fused_step = (
            test_mode
            and cfg.fused_level0 in ("on", "interpret")
            and not use_barrel
            and cfg.n_gru_layers == 3
            and tuple(cfg.context_dims) == (128, 128, 128)
            and cfg.corr_radius == 4
            and fused_step_supported(net_init[0])
        )

        if test_mode and use_fused_step:
            from stereoanywhere_tpu.models.update import FusedRefinementStep

            fkw = dict(
                hidden_dims=tuple(cfg.context_dims),
                n_gru_layers=cfg.n_gru_layers,
                corr_radius=cfg.corr_radius,
                compute_dtype=cfg.compute_dtype,
                interpret=cfg.fused_level0 == "interpret",
            )
            scan_f = None
            if iters > 1:
                # interpret mode: interpreted Pallas calls inside a rolled
                # nn.scan trip a JAX lowering-cache bug (closed_call
                # KeyError); full unroll lowers each body inline (CPU tests
                # only — tiny shapes)
                scan_f = nn.scan(
                    FusedRefinementStep,
                    variable_broadcast="params",
                    split_rngs={"params": False},
                    in_axes=nn.broadcast,
                    out_axes=0,
                    length=iters - 1,
                    unroll=iters - 1 if cfg.fused_level0 == "interpret" else 1,
                )(**fkw, name="update_block")
            pre = RefinementStep(
                **step_kw, emit_outputs=False, compute_mask=False,
                skip_flow_head=True,
                name=None if scan_f is not None else "update_block",
            )
            anchor = scan_f if scan_f is not None else pre
            if scan_f is not None:
                nn.share_scope(pre, scan_f)
            (net_c, coords1), _ = pre((net_init, coords1), consts)
            if scan_f is not None:
                czrq = tuple(
                    jnp.concatenate(triple, axis=-1) for triple in inp_list
                )
                consts_f = (
                    stereo_pyr.levels, mono_pyr.levels, czrq, coords0[..., 0],
                )
                carry_f = (net_c, coords1[..., 0])
                carry_f, _ = scan_f(carry_f, consts_f)
                net_c, cn_sq = carry_f
                coords1 = cn_sq[..., None]
            tail = RefinementStep(
                **step_kw, emit_outputs=False, compute_mask=True, tail_only=True
            )
            nn.share_scope(tail, anchor)
            (net_final, coords1), mask_final = tail((net_c, coords1), consts)
        elif test_mode:
            # iters-1 light steps (no mask head / mask carry), then ONE
            # unscanned step under the same scope computing the mask the
            # convex upsample consumes (see RefinementStep docstring).
            # Unroll A/B (round 4, 1024², measured at divisible scan
            # lengths): unroll=2 is 3.83 ms/iter vs 3.71 at unroll=1 — the
            # scan glue is per-iteration conv-emitter staging, not
            # back-edge copies, so unrolling only grows the program.
            carry = (net_init, coords1)
            if iters > 1:
                step_scan = make_scan(iters - 1, emit_outputs=False, compute_mask=False)
                carry, _ = step_scan(carry, consts)
                last_step = RefinementStep(
                    **step_kw, emit_outputs=False, compute_mask=True
                )
                nn.share_scope(last_step, step_scan)
            else:
                last_step = RefinementStep(
                    **step_kw, emit_outputs=False, compute_mask=True, name="update_block"
                )
            (net_final, coords1), mask_final = last_step(carry, consts)
        else:
            step_mod = make_scan(iters, emit_outputs=True, compute_mask=True)
            (net_final, coords1), ys = step_mod((net_init, coords1), consts)

        result: dict[str, Any] = {}
        if test_mode:
            flow_x = coords1 - coords0
            flow_up = convex_upsample(
                flow_x, mask_final.astype(jnp.float32), cfg.n_downsample
            )
            result["disparity"] = -flow_up
            if w_orig is not None:
                result["disparity"] = result["disparity"][:, :, :w_orig]
        else:
            flows, masks = ys  # (iters,B,h4,w4,1), (iters,B,h4,w4,9ff)
            it = flows.shape[0]
            flows_flat = flows.reshape((it * b, h4, w4, 1))
            masks_flat = masks.astype(jnp.float32).reshape((it * b, h4, w4, 9 * f * f))
            ups = convex_upsample(flows_flat, masks_flat, cfg.n_downsample)
            result["disparities"] = -ups.reshape((it, b, h, w, 1))
            result["disparity"] = result["disparities"][-1]

        if debug:
            if cfg.hourglass_folded:
                # debug tensors always in the unfolded layouts of the
                # non-folded path, so layer-wise comparisons are layout-free
                dbg_masked_f = from_blocks(masked_mono) if blocked_vol else masked_mono
                dbg_agg_f = from_blocks(agg) if blocked_vol else agg
                dbg_masked = unfold(dbg_masked_f, cfg.vol_n_masks)
                dbg_agg = unfold(dbg_agg_f, cfg.volume_channels).transpose(0, 2, 3, 1, 4)
            else:
                dbg_masked, dbg_agg = masked_mono, agg
            result.update(
                dbg_agg_disp=agg_disp,
                dbg_agg_conf=agg_conf,
                dbg_mono_vol=mono_vol,
                dbg_stereo_vol=stereo_vol,
                dbg_masked_mono=dbg_masked,
                dbg_coarse_dispmono2_low=coarse_dispmono2_low,
                dbg_agg=dbg_agg,
                dbg_fmde2=fmde2,
                dbg_trunc_mask=trunc_mask,
                dbg_fmap2=fmap2,
            )

        # Coarse outputs (positive disparity convention; reference returns
        # these in train mode, stereoanywhere.py:299 — we also expose them in
        # test mode for diagnostics at negligible cost).
        if coarse_dispstereo2 is not None:
            result["coarse_dispstereo2"] = coarse_dispstereo2
            result["coarse_dispstereo3"] = coarse_dispstereo3
        result.update(
            coarse_dispmono2=coarse_dispmono2,
            coarse_dispmono3=coarse_dispmono3,
            coarse_scaled_mde2=scaled_mde2,
            coarse_scaled_mde3=scaled_mde3,
            coarse_conf2=coarse_conf2,
            coarse_conf3=coarse_conf3,
            scale=scale,
            shift=shift,
        )
        return result

    # ------------------------------------------------------------------
    def _corrupt_volumes(self, stereo_vol, mono_vol, mde2_low, coarse_disp_low, w_lowres):
        """6-way mutually-exclusive volume corruption (reference :214-251).

        The reference chains `elif random.random() < p` six times, so branch i
        fires with probability (1-p)^i * p — we replicate that distribution
        with a PRNG-keyed first-success select, all under stop_gradient.
        Branches: 0/1/2 corrupt the stereo volume (roll/noise/zero),
        3/4/5 the mono volume.
        """
        cfg = self.cfg
        key = self.make_rng("corruption")
        k_u, k_mask, k_shift, k_noise = jax.random.split(key, 4)

        us = jax.random.uniform(k_u, (6,))
        hit = us < cfg.volume_corruption_prob
        # index of first success; 6 = no corruption
        idx = jnp.argmax(jnp.concatenate([hit, jnp.array([True])]).astype(jnp.int32))

        aug_masks = generate_masks(mde2_low, cfg.vol_aug_n_masks)  # (B,H,W,Nm)
        mi = jax.random.randint(k_mask, (), 0, cfg.vol_aug_n_masks)
        left_mask = jnp.take(aug_masks, mi, axis=-1)[..., None]  # (B,H,W2,1)

        shift_amt = jax.random.randint(k_shift, (), 1, w_lowres + 1)

        # Blend in each volume's own dtype: the f32 mask would otherwise
        # promote a bf16 volume, making the lax.switch branches disagree
        # (corrupted slots f32, untouched slots bf16).
        def roll(vol):
            m = left_mask.astype(vol.dtype)
            rolled = jnp.roll(vol, shift_amt, axis=2)  # roll along W2 (ref dims=3)
            return vol * (1 - m) + rolled * m

        def noise(vol):
            m = left_mask.astype(vol.dtype)
            nz = jax.random.uniform(k_noise, left_mask.shape, vol.dtype)
            return vol * (1 - m) + vol * nz * m

        def zero(vol):
            m = left_mask.astype(vol.dtype)
            curve = gauss_corr_volume(
                jnp.zeros_like(coarse_disp_low), jnp.max(vol)
            ).astype(vol.dtype)
            return vol * (1 - m) + vol * curve * m

        sg = jax.lax.stop_gradient
        # Only the corrupted volume is detached (reference uses `.detach()` on
        # the blended result; the untouched volume keeps its gradients).
        branches = [
            lambda: (sg(roll(stereo_vol)), mono_vol),
            lambda: (sg(noise(stereo_vol)), mono_vol),
            lambda: (sg(zero(stereo_vol)), mono_vol),
            lambda: (stereo_vol, sg(roll(mono_vol))),
            lambda: (stereo_vol, sg(noise(mono_vol))),
            lambda: (stereo_vol, sg(zero(mono_vol))),
            lambda: (stereo_vol, mono_vol),
        ]
        return jax.lax.switch(idx, branches)
