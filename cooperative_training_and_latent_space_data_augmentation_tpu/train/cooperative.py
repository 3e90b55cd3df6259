"""Cooperative FTN+STN solver — the framework's flagship model.

TPU-native re-design of the reference's
``AdvancedTripletReconSegmentationModel``
(medseg/models/advanced_triplet_recon_segmentation_model.py:24-802):

  FTN (fast-thinking): DualBranchEncoder -> (z_i, z_s); image decoder z_i -> I';
  segmentation decoder z_s -> S0.  STN (slow-thinking): denoising shape
  autoencoder refining/correcting segmentations.

Where the reference runs ~9 separate module forwards + latent-gradient
masking + a backward per iteration as eager CUDA calls, here the ENTIRE
cooperative iteration — input-noise injection, 4 standard losses, latent
hard-example generation (jax.grad through frozen decoders), 4 hard losses,
and the 5-subnetwork Adam update — is ONE jitted XLA graph whose batch axis
shards over a `jax.sharding.Mesh` (see parallel/mesh.py).

Method surface mirrors the reference facade: fast_predict, encode_image,
decode_image, decode_segmentation_from_image_code, encode_shape, decode_shape,
recon_shape, standard_training, hard_example_generation, hard_example_training,
perturb_latent_code, predict, slow_refinement, evaluate, save_model/
save_snapshots/load_snapshots.

BatchNorm semantics (4 modes of model_util._disable_tracking_bn_stats:414-451):
  * standard-training forwards normalize with batch stats AND merge updated
    running stats into the state (torch train mode);
  * hard-example generation/training forwards normalize with batch stats but
    their running-stat updates are DISCARDED (torch train + frozen stats);
  * eval normalizes with running stats;
  * during masking, gradients flow only to the latent code, which subsumes
    the reference's frozen-affine trick.
  Deviation noted: the reference's *saliency* forward inside
  mask_latent_code_* runs in plain train mode and therefore pollutes BN
  running stats as a side effect (model_util.py:214-221); we follow the
  documented intent (frozen stats everywhere in generation) instead.
"""

from __future__ import annotations

import os
import pickle
import zlib
from functools import partial
from os.path import join
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from cooperative_training_and_latent_space_data_augmentation_tpu.config import (
    LatentDAConfig,
    MaskConfig,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.models.encoder_decoder import (
    Decoder,
    DualBranchEncoder,
    Encoder,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.ops import losses as L
from cooperative_training_and_latent_space_data_augmentation_tpu.ops import masking
from cooperative_training_and_latent_space_data_augmentation_tpu.ops.image import construct_input
from cooperative_training_and_latent_space_data_augmentation_tpu.train.state import TrainState

MODULE_NAMES = (
    "image_encoder",
    "segmentation_decoder",
    "shape_encoder",
    "shape_decoder",
    "image_decoder",
)

NETWORK_TYPES = (
    "FCN_16_standard",
    "FCN_16_standard_share_code",   # ablation: z_i := z_s (advanced...py:199-201)
    "FCN_16_standard_w_o_filter",   # ablation: z_s := z_i (advanced...py:202-203)
)


class _DropoutKeys:
    """Per-forward dropout key stream.

    torch draws a fresh dropout mask on every module forward; folding the
    step key only by submodule name would hand the SAME mask to every
    invocation of that submodule within one train step (standard pass, hard
    pass, gt- vs pred-recon, frozen-decoder generation), correlating the
    standard and hard losses' dropout noise.  This stream folds in a
    trace-time call counter on top of the module-name tag, so repeated
    applies draw independent masks.  The counter advances at trace time in
    deterministic program order, so compiled graphs are reproducible.
    """

    def __init__(self, key: jax.Array):
        self._key = key
        self._count = 0

    def next(self, name: str) -> Dict[str, jax.Array]:
        self._count += 1
        tag = (zlib.crc32(name.encode()) + self._count) & 0x7FFFFFFF
        return {"dropout": jax.random.fold_in(self._key, tag)}


def _resolve_rngs(rngs, name: str):
    """Materialize flax rngs for one submodule forward: a `_DropoutKeys`
    stream yields a fresh per-call key; a plain dict (external callers) is
    folded by module name only."""
    if rngs is None:
        return None
    if isinstance(rngs, _DropoutKeys):
        return rngs.next(name)
    # zlib.crc32: stable across processes (hash() is salted)
    return {k: jax.random.fold_in(v, zlib.crc32(name.encode()) & 0x7FFFFFFF)
            for k, v in rngs.items()}


def _mask_settings(cfg: MaskConfig) -> masking.MaskSettings:
    return masking.MaskSettings(
        loss_name=cfg.loss_name,
        mask_type=cfg.mask_type,
        max_threshold=cfg.max_threshold,
        random_threshold=cfg.random_threshold,
        if_soft=cfg.if_soft,
    )


class CooperativeTripletSolver:
    """Builds the 5 subnetworks and exposes pure/jitted train & predict fns."""

    def __init__(
        self,
        network_type: str = "FCN_16_standard",
        image_ch: int = 1,
        num_classes: int = 4,
        learning_rate: float = 1e-4,
        n_iter: int = 1,
        encoder_dropout: Optional[float] = None,
        decoder_dropout: Optional[float] = None,
        input_hw: Tuple[int, int] = (192, 192),
        temperature: float = 2.0,
        compute_dtype: Optional[Any] = None,
        remat: bool = False,
    ):
        """``compute_dtype``: conv compute dtype; ``jnp.bfloat16`` runs the
        conv stacks on the MXU in bf16 (params, norms, latents, logits, and
        losses stay float32) — the TPU mixed-precision speed path.

        ``remat``: rematerialize each submodule forward in the backward pass
        (jax.checkpoint) — trades ~30% more FLOPs for a large cut in
        activation memory, for big-batch / high-res training."""
        assert network_type in NETWORK_TYPES, f"unknown network_type {network_type}"
        assert "16" in network_type  # '16' => reduce_factor 4 (advanced...py:87-90)
        self.network_type = network_type
        self.image_ch = image_ch
        self.num_classes = num_classes
        self.learning_rate = learning_rate
        self.n_iter = n_iter
        self.input_hw = input_hw
        self.temperature = temperature
        self.compute_dtype = compute_dtype
        self.remat = remat
        self.has_dropout = bool(encoder_dropout) or bool(decoder_dropout)
        f = 4
        self.feature_reduce = f
        self.latent_ch = 512 // f  # 128
        self.latent_hw = (input_hw[0] // 16, input_hw[1] // 16)

        # module plan mirrors get_network (advanced...py:86-106)
        dt = compute_dtype
        self.modules = {
            "image_encoder": DualBranchEncoder(feature_reduce=f, dropout=encoder_dropout,
                                               dtype=dt),
            "segmentation_decoder": Decoder(
                output_channel=num_classes, feature_reduce=f, up_type="NN",
                dropout=decoder_dropout, dtype=dt),
            "image_decoder": Decoder(
                output_channel=image_ch, feature_reduce=f, up_type="Conv2",
                last_act="sigmoid", dropout=decoder_dropout, dtype=dt),
            "shape_encoder": Encoder(feature_reduce=f, act="relu",
                                     dropout=encoder_dropout, dtype=dt),
            "shape_decoder": Decoder(
                output_channel=num_classes, feature_reduce=f, up_type="NN",
                dropout=decoder_dropout, dtype=dt),
        }
        self.tx = optax.adam(learning_rate)
        self._predict_cache: Dict[Tuple[Optional[int], bool], Callable] = {}

    # ------------------------------------------------------------- state
    def init_state(self, rng: jax.Array) -> TrainState:
        h, w = self.input_hw
        lh, lw = self.latent_hw
        keys = jax.random.split(rng, len(MODULE_NAMES))
        sample = {
            "image_encoder": jnp.zeros((1, h, w, self.image_ch)),
            "segmentation_decoder": jnp.zeros((1, lh, lw, self.latent_ch)),
            "image_decoder": jnp.zeros((1, lh, lw, self.latent_ch)),
            "shape_encoder": jnp.zeros((1, h, w, self.num_classes)),
            "shape_decoder": jnp.zeros((1, lh, lw, self.latent_ch)),
        }
        params, stats = {}, {}
        for key, name in zip(keys, MODULE_NAMES):
            variables = self.modules[name].init(key, sample[name], train=False)
            params[name] = variables["params"]
            stats[name] = variables.get("batch_stats", {})
        return TrainState(
            params=params,
            batch_stats=stats,
            opt_state=self.tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------ module runs
    def _run(self, name, params, stats, x, train: bool, update: bool,
             method=None, rngs=None):
        """Apply one submodule functionally; returns (out, new_stats_dict).

        ``train``  -> BN normalizes with batch stats (else running stats).
        ``update`` -> merge emitted running-stat updates into the state
                      (torch track_running_stats).
        ``rngs``   -> flax RNGs: a `_DropoutKeys` stream (train step; fresh
                      key per forward) or a {'dropout': key} dict (external
                      callers; folded per-submodule).
        """
        module = self.modules[name]
        variables = {"params": params[name], "batch_stats": stats[name]}
        rngs = _resolve_rngs(rngs, name)
        if train:
            def fwd(variables, x):
                return module.apply(variables, x, train=True,
                                    mutable=["batch_stats"], method=method,
                                    rngs=rngs)

            if self.remat:
                fwd = jax.checkpoint(fwd)
            out, ups = fwd(variables, x)
            if update:
                new = dict(stats)
                new[name] = ups["batch_stats"]
                return out, new
            return out, stats
        out = module.apply(variables, x, train=False, method=method)
        return out, stats

    # ----------------------------------------------------- reference surface
    def encode_image(self, params, stats, x, train=False, update=False, rngs=None):
        """(z_i, z_s) with network-variant code sharing (advanced...py:191-206)."""
        (z_i, z_s), stats = self._run("image_encoder", params, stats, x, train, update,
                                      rngs=rngs)
        if "share_code" in self.network_type:
            z_i = z_s
        elif "w_o_filter" in self.network_type:
            z_s = z_i
        return (z_i, z_s), stats

    def decode_image(self, params, stats, z_i, train=False, update=False, rngs=None):
        return self._run("image_decoder", params, stats, z_i, train, update, rngs=rngs)

    def decode_segmentation(self, params, stats, z_s, train=False, update=False,
                            rngs=None):
        return self._run("segmentation_decoder", params, stats, z_s, train, update,
                         rngs=rngs)

    def decode_segmentation_from_image_code(self, params, stats, z_i,
                                            train=False, update=False):
        """z_i -> filter_code -> segmentation (advanced...py:208-221)."""
        z_s, stats = self._run("image_encoder", params, stats, z_i, train, update,
                               method=DualBranchEncoder.filter_code)
        return self.decode_segmentation(params, stats, z_s, train, update)

    def encode_shape(self, params, stats, segmentation, is_label_map=False,
                     train=False, update=False, rng=None, smooth_label=False,
                     rngs=None):
        """STN encoder on temperature-softmaxed logits / one-hot labels
        (advanced...py:233-246; construct_input basic_operations.py:110-158)."""
        prediction_map = construct_input(
            segmentation, num_classes=self.num_classes,
            apply_softmax=not is_label_map, is_labelmap=is_label_map,
            temperature=self.temperature, smooth_label=smooth_label, rng=rng)
        return self._run("shape_encoder", params, stats, prediction_map, train, update,
                         rngs=rngs)

    def decode_shape(self, params, stats, z, train=False, update=False, rngs=None):
        return self._run("shape_decoder", params, stats, z, train, update, rngs=rngs)

    def recon_shape(self, params, stats, segmentation, is_label_map=False,
                    train=False, update=False, rngs=None):
        """STN refinement S' -> STN(S') (advanced...py:262-269)."""
        z, stats = self.encode_shape(params, stats, segmentation, is_label_map,
                                     train, update, rngs=rngs)
        return self.decode_shape(params, stats, z, train, update, rngs=rngs)

    def fast_predict(self, params, stats, x, train=False, update=False, rngs=None):
        """((z_i, z_s), y0) (advanced...py:561-601)."""
        (z_i, z_s), stats = self.encode_image(params, stats, x, train, update,
                                              rngs=rngs)
        y0, stats = self.decode_segmentation(params, stats, z_s, train, update,
                                             rngs=rngs)
        return (z_i, z_s), y0, stats

    # --------------------------------------------------------- training math
    def standard_training(self, params, stats, clean_image, label, perturbed_image,
                          separate_training=False, compute_gt_recon=True,
                          update_stats=True, rngs=None):
        """The 4 standard losses (advanced...py:414-467).  Returns
        (losses_dict, (z_i, z_s), new_stats)."""
        train = True
        (z_i, z_s), y0, stats = self.fast_predict(
            params, stats, perturbed_image, train=train, update=update_stats,
            rngs=rngs)
        seg_loss = L.cross_entropy_2d(y0, label)

        image_recon, stats = self.decode_image(params, stats, z_i, train,
                                               update_stats, rngs=rngs)
        image_recon_loss = 0.5 * jnp.mean((image_recon - clean_image) ** 2)

        if compute_gt_recon:
            gt_recon, stats = self.recon_shape(
                params, stats, label, is_label_map=True, train=train,
                update=update_stats, rngs=rngs)
            gt_shape_recon_loss = L.cross_entropy_2d(gt_recon, label)
        else:
            gt_shape_recon_loss = jnp.zeros(())

        y0_in = jax.lax.stop_gradient(y0) if separate_training else y0
        p_recon, stats = self.recon_shape(params, stats, y0_in, is_label_map=False,
                                          train=train, update=update_stats,
                                          rngs=rngs)
        pred_shape_recon_loss = L.cross_entropy_2d(p_recon, label)
        out = {
            "seg": seg_loss,
            "image": image_recon_loss,
            "gt_shape": gt_shape_recon_loss,
            "shape": pred_shape_recon_loss,
        }
        return out, (z_i, z_s), stats

    def _frozen_decoder_fn(self, name: str, params, stats, rngs=None) -> Callable:
        """Decoder closure for masking: stop-gradiented params (set_grad False,
        advanced...py:486-487), batch-stat normalization, no stat updates.
        ``rngs``: {'dropout': key} when the decoders carry dropout (torch
        keeps dropout active during generation's train-mode forwards)."""
        frozen = jax.lax.stop_gradient(params[name])
        frozen_stats = stats[name]

        def fn(z):
            # resolve per call: the closure runs several trace-time forwards
            # (saliency pass inside masking + the final decode) and each must
            # draw its own dropout mask, like torch's per-forward draws
            out, _ = self.modules[name].apply(
                {"params": frozen, "batch_stats": frozen_stats}, z,
                train=True, mutable=["batch_stats"],
                rngs=_resolve_rngs(rngs, name))
            return out

        return fn

    def _merge_saliency_stats(self, name: str, params, stats, code, branch,
                              rngs=None):
        """Reference-parity BN-stat update from ONE saliency forward.

        The torch reference's saliency pass (model_util.py:214-218) runs the
        RAW train-mode decoder on the unmasked code, so its BatchNorms
        UPDATE running stats; only the final decode freezes tracking
        (advanced...py:503-504,518-519 ``disable_track_bn_stats=True``).
        The rebuild freezes BOTH by default (the documented deviation,
        PARITY.md deviation ledger); SALIENCY_BN_UPDATE=1 restores the
        reference semantics for the A/B.  ``branch`` gates the merge: the
        dropout branch (0) draws no saliency forward."""
        out, ups = self.modules[name].apply(
            {"params": jax.lax.stop_gradient(params[name]),
             "batch_stats": stats[name]},
            code, train=True, mutable=["batch_stats"],
            rngs=_resolve_rngs(rngs, name))
        del out
        did = branch != 0
        merged = jax.tree.map(lambda old, new: jnp.where(did, new, old),
                              stats[name], ups["batch_stats"])
        new = dict(stats)
        new[name] = merged
        return new

    def hard_example_generation(self, params, stats, z_i, z_s, clean_image, label,
                                rng, latent_da: LatentDAConfig, rngs=None,
                                return_stats: bool = False):
        """Perturb cached latents -> (perturbed_image, perturbed_seg)
        (advanced...py:469-523).  Outputs are stop-gradiented constants.

        ``return_stats=True`` additionally returns the (possibly updated)
        batch_stats: under SALIENCY_BN_UPDATE=1 the saliency forwards
        track running stats like the reference's raw train-mode decoder
        (see :meth:`_merge_saliency_stats`); otherwise stats pass through."""
        saliency_update = os.environ.get("SALIENCY_BN_UPDATE", "0") == "1"
        k_img, k_seg = jax.random.split(rng)
        perturbed_image = None
        perturbed_seg = None
        new_stats = stats
        if latent_da.gen_corrupted_image:
            dec = self._frozen_decoder_fn("image_decoder", params, stats, rngs=rngs)
            masked_zi, _, br = masking.perturb_latent_code(
                jax.lax.stop_gradient(z_i), dec, clean_image, k_img,
                _mask_settings(latent_da.image_code),
                num_classes=self.num_classes, return_branch=True)
            perturbed_image = jax.lax.stop_gradient(dec(masked_zi))
            if saliency_update:
                new_stats = self._merge_saliency_stats(
                    "image_decoder", params, new_stats,
                    jax.lax.stop_gradient(z_i), br, rngs=rngs)
        if latent_da.gen_corrupted_seg:
            dec = self._frozen_decoder_fn("segmentation_decoder", params, stats,
                                          rngs=rngs)
            masked_zs, _, br = masking.perturb_latent_code(
                jax.lax.stop_gradient(z_s), dec, label, k_seg,
                _mask_settings(latent_da.shape_code),
                num_classes=self.num_classes, return_branch=True)
            perturbed_seg = jax.lax.stop_gradient(dec(masked_zs))
            if saliency_update:
                new_stats = self._merge_saliency_stats(
                    "segmentation_decoder", params, new_stats,
                    jax.lax.stop_gradient(z_s), br, rngs=rngs)
        if return_stats:
            return perturbed_image, perturbed_seg, new_stats
        return perturbed_image, perturbed_seg

    def hard_example_training(self, params, stats, perturbed_image, clean_image,
                              perturbed_seg, label, separate_training=False,
                              rngs=None):
        """The 4 hard losses (advanced...py:525-559); BN stats frozen."""
        zero = jnp.zeros(())
        out = {"seg": zero, "image": zero, "shape": zero, "perturbed_shape": zero}
        if perturbed_image is not None:
            std, _, _ = self.standard_training(
                params, stats, clean_image, label,
                perturbed_image=jax.lax.stop_gradient(perturbed_image),
                separate_training=separate_training, compute_gt_recon=False,
                update_stats=False, rngs=rngs)
            out["seg"], out["image"], out["shape"] = std["seg"], std["image"], std["shape"]
        if perturbed_seg is not None:
            seg_in = jax.lax.stop_gradient(perturbed_seg)
            p_recon, _ = self.recon_shape(params, stats, seg_in, is_label_map=False,
                                          train=True, update=False, rngs=rngs)
            out["perturbed_shape"] = L.cross_entropy_2d(p_recon, label)
        return out

    # ------------------------------------------------- fused STN pass batch
    @staticmethod
    def _merge_sequential_stats(base, stacked, update_flags):
        """Fold P vmapped-pass running-stat emissions into the value that P
        SEQUENTIAL passes would have produced.

        Each vmapped pass starts from the same base running value ``r``, so
        its emitted leaf is ``ups_p = m*r + (1-m)*batch_p`` — which means the
        sequential fold ``r <- m*r + (1-m)*batch_p`` can be applied WITHOUT
        reconstructing ``batch_p`` (no (1-m) division, no precision loss):
        ``r_cur <- m*r_cur + (ups_p - m*r)``.  Passes with ``update_flags[p]
        == False`` (BN-stat-frozen hard passes) are skipped entirely.
        """

        from cooperative_training_and_latent_space_data_augmentation_tpu.models.blocks import (
            BN_MOMENTUM as m,
        )

        def leaf(r, ups):
            r_cur = r
            for p, upd in enumerate(update_flags):
                if upd:
                    r_cur = m * r_cur + (ups[p] - m * r)
            return r_cur

        if not any(update_flags):
            return base
        return jax.tree.map(leaf, base, stacked)

    def _stn_passes_fused(self, params, stats, inputs, update_flags):
        """Run P STN (shape encoder -> shape decoder) passes as ONE vmapped
        application — the TPU restructuring of the reference's four
        sequential ``recon_shape`` calls per iteration
        (advanced...py:450-466 standard, :525-559 hard).

        Exactness (pinned by tests/test_cooperative.py): ``jax.vmap`` maps
        BatchNorm's batch reductions, so each pass normalizes with ITS OWN
        batch statistics exactly like a sequential run; running stats never
        feed train-mode normalization, so the only sequential coupling is
        the running-stat update order, reconstructed in closed form by
        :meth:`_merge_sequential_stats`.  The payoff: every conv in the STN
        sees a P*N batch (one big MXU-friendly op) instead of P sequential
        N-batches.

        Args:
          inputs: (P, N, H, W, C) stacked construct_input outputs.
          update_flags: static per-pass bools, in the reference's sequential
            order (True = this pass tracked BN stats).
        Returns (recons (P, N, H, W, num_classes), new_stats).
        """
        enc = self.modules["shape_encoder"]
        dec = self.modules["shape_decoder"]
        v_enc = {"params": params["shape_encoder"],
                 "batch_stats": stats["shape_encoder"]}
        v_dec = {"params": params["shape_decoder"],
                 "batch_stats": stats["shape_decoder"]}

        def one(x):
            z, e_ups = enc.apply(v_enc, x, train=True, mutable=["batch_stats"])
            y, d_ups = dec.apply(v_dec, z, train=True, mutable=["batch_stats"])
            return y, (e_ups["batch_stats"], d_ups["batch_stats"])

        if self.remat:
            one = jax.checkpoint(one)
        recons, (e_stk, d_stk) = jax.vmap(one)(inputs)
        new = dict(stats)
        new["shape_encoder"] = self._merge_sequential_stats(
            stats["shape_encoder"], e_stk, update_flags)
        new["shape_decoder"] = self._merge_sequential_stats(
            stats["shape_decoder"], d_stk, update_flags)
        return recons, new

    def _ftn_passes_fused(self, params, stats, images, update_flags):
        """Run P FTN passes (DualBranchEncoder -> seg decoder, image decoder)
        as ONE vmapped P*N application — VERDICT r4 #4's restructuring of the
        step's remaining sequential halves: the standard pass on the noised
        image and the hard pass on the generated perturbed image
        (advanced...py:414-467 standard, :525-559 hard) share every conv.

        Same exactness argument as :meth:`_stn_passes_fused`: vmap maps
        BatchNorm's batch reductions so each pass normalizes with ITS OWN
        batch statistics (the reference's per-half semantics: standard half
        torch train mode, hard half train + frozen tracking), and the
        running-stat merge is reconstructed in closed form with
        ``update_flags`` (standard True, hard False).

        Args:
          images: (P, N, H, W, C) stacked FTN inputs.
          update_flags: static per-pass BN-stat-tracking bools.
        Returns ((z_i, z_s, y0, image_recon) each (P, ...), new_stats).
        """
        enc = self.modules["image_encoder"]
        segd = self.modules["segmentation_decoder"]
        imgd = self.modules["image_decoder"]
        v_enc = {"params": params["image_encoder"],
                 "batch_stats": stats["image_encoder"]}
        v_seg = {"params": params["segmentation_decoder"],
                 "batch_stats": stats["segmentation_decoder"]}
        v_img = {"params": params["image_decoder"],
                 "batch_stats": stats["image_decoder"]}

        def one(x):
            (z_i, z_s), e_ups = enc.apply(v_enc, x, train=True,
                                          mutable=["batch_stats"])
            if "share_code" in self.network_type:
                z_i = z_s
            elif "w_o_filter" in self.network_type:
                z_s = z_i
            y0, s_ups = segd.apply(v_seg, z_s, train=True,
                                   mutable=["batch_stats"])
            recon, i_ups = imgd.apply(v_img, z_i, train=True,
                                      mutable=["batch_stats"])
            return ((z_i, z_s, y0, recon),
                    (e_ups["batch_stats"], s_ups["batch_stats"],
                     i_ups["batch_stats"]))

        if self.remat:
            one = jax.checkpoint(one)
        outs, (e_stk, s_stk, i_stk) = jax.vmap(one)(images)
        new = dict(stats)
        new["image_encoder"] = self._merge_sequential_stats(
            stats["image_encoder"], e_stk, update_flags)
        new["segmentation_decoder"] = self._merge_sequential_stats(
            stats["segmentation_decoder"], s_stk, update_flags)
        new["image_decoder"] = self._merge_sequential_stats(
            stats["image_decoder"], i_stk, update_flags)
        return outs, new

    # ----------------------------------------------------------- train step
    def make_train_step(self, latent_da: Optional[LatentDAConfig] = None,
                        separate_training: bool = False,
                        input_noise_std: float = 0.05,
                        donate: bool = True,
                        fused_stn: Optional[bool] = None,
                        fused_ftn: Optional[bool] = None):
        """Build the fused jitted cooperative train step.

        Collapses the reference's per-iteration sequence
        (train_adv_supervised_segmentation_triplet.py:171-235): noise
        injection, standard_training, hard_example_generation,
        hard_example_training, single backward over the summed loss, and the
        5-optimizer step — into one XLA graph.
        """
        use_latent_da = latent_da is not None and (
            latent_da.gen_corrupted_image or latent_da.gen_corrupted_seg)
        if fused_stn is None:
            # measured end-to-end WASH on the default Pallas-conv path
            # (bench.py A/B: 86.2 ms sequential vs 86.6 ms fused — the CHW
            # kernel already runs one full-size matmul per image, so a P*N
            # batch only multiplies its grid); default off, kept as a
            # pinned-exact opt-in for stock-XLA configs where batching the
            # four STN passes can still improve conv tiling.
            fused_stn = os.environ.get("FUSED_STN", "0") == "1"
        # the fused path draws no per-pass dropout keys; dropout configs use
        # the sequential reference path
        fused_stn = fused_stn and not self.has_dropout
        if fused_ftn is None:
            fused_ftn = os.environ.get("FUSED_FTN", "0") == "1"
        # the 2N FTN batch exists only when a hard IMAGE pass exists, and —
        # like fused_stn — draws no per-pass dropout keys
        fused_ftn = (fused_ftn and not self.has_dropout and use_latent_da
                     and latent_da.gen_corrupted_image)

        def step(state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array):
            clean_image = batch["image"]
            label = batch["label"]
            k_noise, k_da, k_drop = jax.random.split(rng, 3)
            rngs = _DropoutKeys(k_drop) if self.has_dropout else None
            noise = input_noise_std * jax.random.normal(
                k_noise, clean_image.shape, clean_image.dtype)
            noised_image = jnp.clip(clean_image + noise, 0.0, 1.0)

            def loss_fn_sequential(params):
                std, (z_i, z_s), stats = self.standard_training(
                    params, state.batch_stats, clean_image, label, noised_image,
                    separate_training=separate_training, compute_gt_recon=True,
                    update_stats=True, rngs=rngs)
                standard_loss = std["seg"] + std["image"] + std["shape"] + std["gt_shape"]

                metrics = {
                    "loss/standard/total": standard_loss,
                    "loss/standard/seg": std["seg"],
                    "loss/standard/image": std["image"],
                    "loss/standard/shape": std["shape"],
                    "loss/standard/gt_shape": std["gt_shape"],
                }
                if use_latent_da:
                    perturbed_image, perturbed_seg, stats = \
                        self.hard_example_generation(
                            params, stats, z_i, z_s,
                            jax.lax.stop_gradient(clean_image), label, k_da,
                            latent_da, rngs=rngs, return_stats=True)
                    hard = self.hard_example_training(
                        params, stats, perturbed_image, clean_image, perturbed_seg,
                        label, separate_training=separate_training, rngs=rngs)
                    hard_loss = (hard["seg"] + hard["image"] + hard["shape"]
                                 + hard["perturbed_shape"])
                    metrics.update({
                        "loss/hard/total": hard_loss,
                        "loss/hard/seg": hard["seg"],
                        "loss/hard/image": hard["image"],
                        "loss/hard/shape": hard["shape"] + hard["perturbed_shape"],
                    })
                else:
                    zero = jnp.zeros(())
                    hard_loss = zero
                    metrics.update({
                        "loss/hard/total": zero, "loss/hard/seg": zero,
                        "loss/hard/image": zero, "loss/hard/shape": zero,
                    })
                total = standard_loss + hard_loss
                metrics["loss/total"] = total
                return total, (metrics, stats)

            def loss_fn_fused(params):
                """Same math as the sequential path, with all STN recon
                passes (gt, pred, hard-pred, perturbed-seg) batched into ONE
                vmapped application.  Legal reorder: every STN input exists
                before any STN output is needed (outputs only feed loss
                terms, which sum), and hard passes never write BN stats, so
                running the STN after hard generation leaves all values and
                the final stat state identical (the reference interleaves
                them only textually, train...py:195-231)."""
                stats0 = state.batch_stats
                # --- standard FTN: encoder + seg decode + image decode
                (z_i, z_s), y0, stats = self.fast_predict(
                    params, stats0, noised_image, train=True, update=True)
                std_seg = L.cross_entropy_2d(y0, label)
                image_recon, stats = self.decode_image(params, stats, z_i,
                                                       True, True)
                std_image = 0.5 * jnp.mean((image_recon - clean_image) ** 2)

                # --- hard generation + hard FTN (frozen stats)
                perturbed_image = perturbed_seg = None
                hard_seg = hard_image = jnp.zeros(())
                if use_latent_da:
                    perturbed_image, perturbed_seg, stats = \
                        self.hard_example_generation(
                            params, stats, z_i, z_s,
                            jax.lax.stop_gradient(clean_image), label, k_da,
                            latent_da, return_stats=True)
                if perturbed_image is not None:
                    (zi_h, _), y0_h, _ = self.fast_predict(
                        params, stats, jax.lax.stop_gradient(perturbed_image),
                        train=True, update=False)
                    hard_seg = L.cross_entropy_2d(y0_h, label)
                    hard_recon, _ = self.decode_image(params, stats, zi_h,
                                                      True, False)
                    hard_image = 0.5 * jnp.mean((hard_recon - clean_image) ** 2)

                # --- ALL STN passes, one vmapped batch (reference order)
                def stn_in(logits):
                    x = (jax.lax.stop_gradient(logits) if separate_training
                         else logits)
                    return construct_input(x, num_classes=self.num_classes,
                                           apply_softmax=True,
                                           temperature=self.temperature)

                passes = [construct_input(label, num_classes=self.num_classes,
                                          apply_softmax=False, is_labelmap=True),
                          stn_in(y0)]
                flags = [True, True]
                if perturbed_image is not None:
                    passes.append(stn_in(y0_h))
                    flags.append(False)
                if perturbed_seg is not None:
                    passes.append(stn_in(jax.lax.stop_gradient(perturbed_seg)))
                    flags.append(False)
                recons, stats = self._stn_passes_fused(
                    params, stats, jnp.stack(passes), tuple(flags))
                stn_ce = [L.cross_entropy_2d(recons[p], label)
                          for p in range(len(passes))]
                std_gt_shape, std_shape = stn_ce[0], stn_ce[1]
                nxt = 2
                hard_shape = hard_perturbed = jnp.zeros(())
                if perturbed_image is not None:
                    hard_shape = stn_ce[nxt]
                    nxt += 1
                if perturbed_seg is not None:
                    hard_perturbed = stn_ce[nxt]

                standard_loss = std_seg + std_image + std_shape + std_gt_shape
                hard_loss = hard_seg + hard_image + hard_shape + hard_perturbed
                metrics = {
                    "loss/standard/total": standard_loss,
                    "loss/standard/seg": std_seg,
                    "loss/standard/image": std_image,
                    "loss/standard/shape": std_shape,
                    "loss/standard/gt_shape": std_gt_shape,
                    "loss/hard/total": (hard_loss if use_latent_da
                                        else jnp.zeros(())),
                    "loss/hard/seg": hard_seg,
                    "loss/hard/image": hard_image,
                    "loss/hard/shape": hard_shape + hard_perturbed,
                }
                total = standard_loss + hard_loss
                metrics["loss/total"] = total
                return total, (metrics, stats)

            def loss_fn_fused_ftn(params):
                """Sequential math with the standard and hard FTN passes
                batched into ONE 2N vmapped application (VERDICT r4 #4).

                The data dependency (the hard input is DECODED from the
                standard pass's latents) is broken by a VALUE-ONLY encoder
                pre-pass: generation consumes ``stop_gradient`` latents in
                both the reference (if_detach=True, advanced...py:501,515)
                and the sequential path here, and train-mode BN normalizes
                by the batch's own statistics, so the pre-pass latents equal
                the standard half's to float-reorder tolerance — no gradient
                ever flows through generation, so only the forward is paid
                (~3 ms of the ~50 ms hard path, saved/step_knockout.md).
                STN passes stay sequential (FUSED_STN measured a wash)."""
                stats0 = state.batch_stats
                # --- value-only pre-pass feeding generation
                (z_i0, z_s0), _ = self.encode_image(
                    params, stats0, noised_image, train=True, update=False)
                perturbed_image, perturbed_seg, stats0 = \
                    self.hard_example_generation(
                        params, stats0, jax.lax.stop_gradient(z_i0),
                        jax.lax.stop_gradient(z_s0),
                        jax.lax.stop_gradient(clean_image), label, k_da,
                        latent_da, return_stats=True)

                # --- standard + hard FTN as one 2N pass (per-half BN stats)
                images = jnp.stack([noised_image,
                                    jax.lax.stop_gradient(perturbed_image)])
                (z_i_pk, _z_s_pk, y0_pk, recon_pk), stats = \
                    self._ftn_passes_fused(params, stats0, images,
                                           (True, False))
                y0, y0_h = y0_pk[0], y0_pk[1]
                std_seg = L.cross_entropy_2d(y0, label)
                hard_seg = L.cross_entropy_2d(y0_h, label)
                std_image = 0.5 * jnp.mean((recon_pk[0] - clean_image) ** 2)
                hard_image = 0.5 * jnp.mean((recon_pk[1] - clean_image) ** 2)

                # --- STN passes, sequential reference order
                gt_recon, stats = self.recon_shape(
                    params, stats, label, is_label_map=True, train=True,
                    update=True)
                std_gt_shape = L.cross_entropy_2d(gt_recon, label)
                y0_in = (jax.lax.stop_gradient(y0) if separate_training
                         else y0)
                p_recon, stats = self.recon_shape(
                    params, stats, y0_in, is_label_map=False, train=True,
                    update=True)
                std_shape = L.cross_entropy_2d(p_recon, label)
                y0h_in = (jax.lax.stop_gradient(y0_h) if separate_training
                          else y0_h)
                h_recon, _ = self.recon_shape(
                    params, stats, y0h_in, is_label_map=False, train=True,
                    update=False)
                hard_shape = L.cross_entropy_2d(h_recon, label)
                hard_perturbed = jnp.zeros(())
                if perturbed_seg is not None:
                    ps_recon, _ = self.recon_shape(
                        params, stats, jax.lax.stop_gradient(perturbed_seg),
                        is_label_map=False, train=True, update=False)
                    hard_perturbed = L.cross_entropy_2d(ps_recon, label)

                standard_loss = std_seg + std_image + std_shape + std_gt_shape
                hard_loss = hard_seg + hard_image + hard_shape + hard_perturbed
                total = standard_loss + hard_loss
                metrics = {
                    "loss/standard/total": standard_loss,
                    "loss/standard/seg": std_seg,
                    "loss/standard/image": std_image,
                    "loss/standard/shape": std_shape,
                    "loss/standard/gt_shape": std_gt_shape,
                    "loss/hard/total": hard_loss,
                    "loss/hard/seg": hard_seg,
                    "loss/hard/image": hard_image,
                    "loss/hard/shape": hard_shape + hard_perturbed,
                    "loss/total": total,
                }
                return total, (metrics, stats)

            loss_fn = (loss_fn_fused_ftn if fused_ftn
                       else loss_fn_fused if fused_stn
                       else loss_fn_sequential)

            (_, (metrics, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                params=new_params, batch_stats=new_stats, opt_state=new_opt,
                step=state.step + 1)
            return new_state, metrics

        return jax.jit(step, donate_argnums=(0,) if donate else ())

    # ----------------------------------------------------------- inference
    def predict(self, params, stats, x, n_iter: Optional[int] = None,
                softmax: bool = False):
        """FTN prediction + (n_iter-1) STN refinements (advanced...py:375-394).

        Note: the reference's inner slow_refinement loop re-applies the STN to
        the SAME input logits n_steps times (advanced...py:627-629), so the
        effective refinement count equals the outer predict loop's n_iter-1;
        we implement that effective behavior directly.
        """
        if n_iter is None:
            n_iter = self.n_iter
        _, pred, _ = self.fast_predict(params, stats, x, train=False)
        for _ in range(max(0, n_iter - 1)):
            pred, _ = self.recon_shape(params, stats,
                                       jax.lax.stop_gradient(pred),
                                       is_label_map=False, train=False)
        if softmax:
            pred = jax.nn.softmax(pred, axis=-1)
        return pred

    def make_predict(self, n_iter: Optional[int] = None, softmax: bool = False):
        fn = partial(self.predict, n_iter=n_iter, softmax=softmax)
        return jax.jit(lambda params, stats, x: fn(params, stats, x))

    def slow_refinement(self, params, stats, pred_logit, n_steps: int = 1,
                        auto_stop: bool = False, tol: float = 1e-4,
                        save_internal_predicts: bool = False):
        """LITERAL reference semantics (advanced...py:608-641).

        The reference's inner loop computes ``s_t = recon_shape(pred_logit)``
        each step — always on the ORIGINAL argument, never on the previous
        refinement — so the value semantics collapse statically:

        * n_steps >= 1, no auto_stop: result = recon_shape(pred_logit)
          (every iteration recomputes the same value).
        * auto_stop: at step 0, diff = RMS(pred_logit - refined); if
          diff < tol the reference restores ``s_t = prev`` — the UNREFINED
          input — and breaks.  From step 1 on, prev == s_t == refined
          bitwise (eval-mode STN is deterministic), so diff == 0 < tol and
          the restored ``prev`` is still ``refined``.  Net:
          result = where(RMS(pred - refined) < tol, pred_logit, refined).
        * n_steps == 0: the loop body never runs; result = pred_logit.

        ``save_internal_predicts`` reproduces the reference's dict including
        its index-0 quirk (pre-seeded with the input, then overwritten by the
        first refinement).  One jit-safety deviation: the dict's KEY SET
        cannot depend on traced values, so under auto_stop with n_steps >= 2
        key 1 is always present (its value duplicates key 0's when the step-0
        stop fired, exactly where the reference would have truncated).
        Value equivalence for n_steps in {1,2,3} is pinned by
        tests/test_cooperative.py.
        """
        internal = {0: [pred_logit]}
        if n_steps < 1:
            return (pred_logit, internal) if save_internal_predicts \
                else pred_logit
        refined, _ = self.recon_shape(params, stats,
                                      jax.lax.stop_gradient(pred_logit),
                                      is_label_map=False, train=False)
        if auto_stop:
            diff0 = jnp.sqrt(jnp.mean((pred_logit - refined) ** 2))
            stop0 = diff0 < tol
            s_t = jnp.where(stop0, pred_logit, refined)
            internal[0] = [s_t]
            if n_steps >= 2:
                # reached only when step 0 did not stop; step 1 always stops
                # (diff == 0) and restores prev == refined == s_t.
                internal[1] = [s_t]
        else:
            s_t = refined
            for i in range(n_steps):
                internal[i] = [refined]
        return (s_t, internal) if save_internal_predicts else s_t

    def evaluate(self, params, stats, x, targets, running_metric,
                 n_iter: Optional[int] = None):
        """Predict + update a RunningScore; returns (pred_labels, cached)
        where cached = (images, preds, gts) for PNG dumps
        (advanced...py:643-664).  Uses a cached JITTED predict — eager
        per-op dispatch is pathological on tunneled TPU backends."""
        key = (n_iter, False)
        if key not in self._predict_cache:
            self._predict_cache[key] = self.make_predict(n_iter=n_iter)
        pred = self._predict_cache[key](params, stats, x)
        pred_lbl = jnp.argmax(pred, axis=-1)
        targets_np = np.asarray(targets)
        pred_np = np.asarray(pred_lbl)
        running_metric.update(targets_np, pred_np)
        return pred_lbl, (np.asarray(x), pred_np, targets_np)

    def get_recon_diff(self, params, stats, x):
        """|I - I'|, |S1 - S0|, S0, S1, I' (advanced...py:352-373)."""
        (z_i, z_s), first, _ = self.fast_predict(params, stats, x, train=False)
        refined, _ = self.recon_shape(params, stats, first, is_label_map=False,
                                      train=False)
        recon_image, _ = self.decode_image(params, stats, z_i, train=False)
        return (jnp.abs(x - recon_image), jnp.abs(refined - first),
                first, refined, recon_image)

    # --------------------------------------------------------- persistence
    def save_model(self, state: TrainState, save_dir: str, epoch_iter,
                   save_optimizers: bool = False):
        """Per-submodule serialized params under
        {save_dir}/{epoch}/checkpoints/{module}.msgpack
        (mirrors advanced...py:666-678's per-module .pth layout)."""
        epoch_path = join(save_dir, str(epoch_iter), "checkpoints")
        os.makedirs(epoch_path, exist_ok=True)
        for name in MODULE_NAMES:
            blob = serialization.to_bytes(
                {"params": state.params[name], "batch_stats": state.batch_stats[name]})
            with open(join(epoch_path, f"{name}.msgpack"), "wb") as f:
                f.write(blob)
        if save_optimizers:
            with open(join(epoch_path, "optimizer.msgpack"), "wb") as f:
                f.write(serialization.to_bytes(state.opt_state))

    def load_model(self, state: TrainState, checkpoint_dir: str) -> TrainState:
        """Load per-submodule files saved by save_model (advanced...py:107-131)."""
        params = dict(state.params)
        stats = dict(state.batch_stats)
        for name in MODULE_NAMES:
            path = join(checkpoint_dir, f"{name}.msgpack")
            with open(path, "rb") as f:
                target = {"params": state.params[name],
                          "batch_stats": state.batch_stats[name]}
                restored = serialization.from_bytes(target, f.read())
            params[name] = restored["params"]
            stats[name] = restored["batch_stats"]
        return state.replace(params=params, batch_stats=stats)

    def save_snapshots(self, state: TrainState, save_dir: str, epoch: int) -> str:
        """Monolithic crash/resume snapshot (advanced...py:680-701):
        {network_type, epoch, full train-state bytes}."""
        epoch_path = join(save_dir, "interrupted", "checkpoints")
        os.makedirs(epoch_path, exist_ok=True)
        save_path = join(epoch_path, self.network_type + ".pkl")
        payload = {
            "network_type": self.network_type,
            "epoch": int(epoch),
            "state": serialization.to_bytes(state),
        }
        with open(save_path, "wb") as f:
            pickle.dump(payload, f)
        return save_path

    def load_snapshots(self, state: TrainState, file_path: Optional[str]
                       ) -> Tuple[TrainState, int]:
        """Resume from snapshot; returns (state, start_epoch)
        (advanced...py:703-738)."""
        if not file_path or not os.path.exists(file_path):
            if file_path:
                print(f"warning: {file_path} does not exist")
            return state, 0
        with open(file_path, "rb") as f:
            payload = pickle.load(f)
        assert payload["network_type"] == self.network_type, (
            payload["network_type"], self.network_type)
        restored = serialization.from_bytes(state, payload["state"])
        return restored, int(payload["epoch"])
