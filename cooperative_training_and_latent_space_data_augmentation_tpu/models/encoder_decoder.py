"""FTN/STN encoder & decoder networks (flax.linen, NHWC).

TPU-native re-design of ``medseg/models/ebm/encoder_decoder.py``:

  * ``Encoder``          <- MyEncoder (:351-415): inc double-conv(64/f) ->
    LeakyReLU -> 4x ResConvDown (128/f, 256/f, 512/f, 512/f) -> 1x1 conv + BN
    -> activation.  192x192 input -> 12x12 latent (4 downsamplings),
    512//f latent channels.
  * ``Decoder``          <- MyDecoder (:418-453): 4x ResUp
    (in -> 256/f -> 128/f -> 64/f -> 64/f) -> 1x1 conv -> optional last act.
    NO skip connections — decoding must depend only on the (maskable) latent.
  * ``DualBranchEncoder`` <- Dual_Branch_Encoder (:456-503): general encoder
    -> z_i; code decoupler [conv3-BN-LReLU-conv3-BN-ReLU] -> z_s = filter(z_i).

The default plan (``feature_reduce=4``, "FCN_16_standard",
advanced_triplet_recon_segmentation_model.py:86-106) gives channel widths
16/32/64/128/128 and 128-channel latents at 12x12 for 192x192 inputs.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from cooperative_training_and_latent_space_data_augmentation_tpu.models.blocks import (
    BatchNorm,
    ConvBlock,
    ResConvDown,
    ResUp,
    chw_chain_ok,
    conv_kernel_init,
    leaky_relu,
    s2_chain_ok,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.ops.pallas_conv import (
    chw_to_nhwc,
    nhwc_to_chw,
    pallas_s2_enabled,
)

_ACTS = {
    "relu": nn.relu,
    "sigmoid": nn.sigmoid,
    "none": None,
    None: None,
}


class Encoder(nn.Module):
    """Skip-free conv encoder (MyEncoder).

    ``act``: final activation over the latent — the FTN/STN encoders use ReLU
    (advanced_triplet_recon_segmentation_model.py:93-95,103-104).
    """

    feature_reduce: int = 4
    act: Optional[str] = "relu"
    dropout: Optional[float] = None
    dtype: Optional[jnp.dtype] = None  # conv compute dtype (bf16 mixed precision)

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.feature_reduce
        dt = self.dtype

        # CHW STAGE CHAINING: while consecutive stages are inside the Pallas
        # kernel's win region (<=64 ch), activations stay in the (N, C, H*W)
        # kernel layout ACROSS stage boundaries — the stride-2 downsample
        # rides the phase kernel (ops/pallas_conv.py) instead of a stock
        # NHWC conv, so no transposes occur between inc and the first
        # >64-channel stage.  `hw` tracks the CHW dims (None = NHWC).
        chain0 = (pallas_s2_enabled()
                  and chw_chain_ok(x.shape[-1], 64 // f))
        x1 = ConvBlock(64 // f, dtype=dt)(x, train, keep_chw=chain0)
        x1 = leaky_relu(x1)
        hw = (x.shape[1], x.shape[2]) if chain0 else None

        def down(feats, xin, hw):
            cur = hw is not None
            c_in = xin.shape[1] if cur else xin.shape[-1]
            dims = hw if cur else (xin.shape[1], xin.shape[2])
            if s2_chain_ok(c_in, feats, *dims):
                out = ResConvDown(feats, self.dropout, dtype=dt)(
                    xin, train, chw=hw, keep_chw=True)
                return out, (dims[0] // 2, dims[1] // 2)
            if cur:
                xin = chw_to_nhwc(xin, *hw)
            return ResConvDown(feats, self.dropout, dtype=dt)(xin, train), None

        x2, hw = down(128 // f, x1, hw)
        x3, hw = down(256 // f, x2, hw)
        x4, hw = down(512 // f, x3, hw)
        x5, hw = down(512 // f, x4, hw)
        if hw is not None:
            x5 = chw_to_nhwc(x5, *hw)
        # latent head stays float32: the latent code is what gets masked and
        # differentiated through during hard-example generation.
        x5 = nn.Conv(512 // f, (1, 1), kernel_init=conv_kernel_init,
                     dtype=jnp.float32)(x5.astype(jnp.float32))
        x5 = BatchNorm()(x5, use_running_average=not train)
        act = _ACTS[self.act]
        if act is not None:
            x5 = act(x5)
        return x5


class Decoder(nn.Module):
    """Skip-free conv decoder (MyDecoder).

    ``up_type``: 'NN' for segmentation/shape decoders (logit output), 'Conv2'
    + sigmoid last act for the image decoder
    (advanced_triplet_recon_segmentation_model.py:96-106).
    """

    output_channel: int
    feature_reduce: int = 4
    up_type: str = "NN"
    last_act: Optional[str] = None
    dropout: Optional[float] = None
    dtype: Optional[jnp.dtype] = None  # conv compute dtype (bf16 mixed precision)

    @nn.compact
    def __call__(self, z, train: bool = False):
        f = self.feature_reduce
        dt = self.dtype

        # CHW stage chaining (see Encoder): NN/bilinear upsamples have a CHW
        # path (blocks.upsample_*_chw), so once the channel widths enter the
        # Pallas win region the whole tail of the decoder stays in the kernel
        # layout with no per-stage NHWC round trips.
        def up(feats, xin, hw):
            cur = hw is not None
            c_in = xin.shape[1] if cur else xin.shape[-1]
            dims = hw if cur else (xin.shape[1], xin.shape[2])
            can = (pallas_s2_enabled()
                   and self.up_type in ("NN", "bilinear", "Conv2")
                   and chw_chain_ok(c_in, feats))
            if can:
                xc = xin if cur else nhwc_to_chw(xin)
                out = ResUp(feats, self.up_type, self.dropout, dtype=dt)(
                    xc, train, chw=dims, keep_chw=True)
                return out, (dims[0] * 2, dims[1] * 2)
            if cur:
                xin = chw_to_nhwc(xin, *hw)
            return ResUp(feats, self.up_type, self.dropout,
                         dtype=dt)(xin, train), None

        x, hw = up(256 // f, z, None)
        x, hw = up(128 // f, x, hw)
        x, hw = up(64 // f, x, hw)
        x, hw = up(64 // f, x, hw)
        if hw is not None:
            x = chw_to_nhwc(x, *hw)
        # output head stays float32: losses/softmax consume these logits.
        x = nn.Conv(self.output_channel, (1, 1), kernel_init=conv_kernel_init,
                    dtype=jnp.float32)(x.astype(jnp.float32))
        act = _ACTS[self.last_act]
        if act is not None:
            x = act(x)
        return x


class CodeDecoupler(nn.Module):
    """z_i -> z_s filter: conv3-BN-LReLU-conv3-BN-ReLU (Dual_Branch_Encoder.code_decoupler).

    Always float32: both ends are latent codes (masking targets)."""

    features: int

    @nn.compact
    def __call__(self, z, train: bool = False):
        h = nn.Conv(self.features, (3, 3), padding="SAME", kernel_init=conv_kernel_init,
                    dtype=z.dtype)(z)
        h = BatchNorm()(h, use_running_average=not train)
        h = leaky_relu(h)
        h = nn.Conv(self.features, (3, 3), padding="SAME", kernel_init=conv_kernel_init,
                    dtype=h.dtype)(h)
        h = BatchNorm()(h, use_running_average=not train)
        return nn.relu(h)


class DomainSpecificEncoder(nn.Module):
    """Encoder with per-domain BatchNorm banks
    (encoder_decoder.DomainSpecificEncoder:568-643 + ds_res_convdown
    :506-565): same topology as :class:`Encoder` but every norm is a
    :class:`DomainSpecificBatchNorm` selected by a static ``domain_id``.
    """

    feature_reduce: int = 1
    num_domains: int = 2
    act: Optional[str] = "sigmoid"
    dropout: Optional[float] = None

    @nn.compact
    def __call__(self, x, domain_id: int = 0, train: bool = False):
        from cooperative_training_and_latent_space_data_augmentation_tpu.models.layers import (
            DomainSpecificBatchNorm,
        )

        f = self.feature_reduce
        dsbn = lambda name: DomainSpecificBatchNorm(self.num_domains, name=name)

        # inc: conv3-DSBN-LReLU-conv3-DSBN (ds inc convs, :577-597)
        h = nn.Conv(64 // f, (3, 3), padding="SAME",
                    kernel_init=conv_kernel_init, dtype=x.dtype)(x)
        h = dsbn("norm_1")(h, domain_id, train)
        h = leaky_relu(h)
        h = nn.Conv(64 // f, (3, 3), padding="SAME",
                    kernel_init=conv_kernel_init, dtype=h.dtype)(h)
        h = dsbn("norm_2")(h, domain_id, train)
        h = leaky_relu(h)

        def ds_res_down(feats, h, idx):
            # ds_res_convdown (:506-565): stride-2 conv then DSBN residual core
            h = nn.Conv(h.shape[-1], (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)), kernel_init=conv_kernel_init,
                        dtype=h.dtype)(h)
            sc = nn.Conv(feats, (1, 1), kernel_init=conv_kernel_init,
                         dtype=h.dtype)(h)
            r = nn.Conv(feats, (3, 3), padding="SAME",
                        kernel_init=conv_kernel_init, dtype=h.dtype)(h)
            r = dsbn(f"down{idx}_norm_1")(r, domain_id, train)
            r = leaky_relu(r)
            r = nn.Conv(feats, (3, 3), padding="SAME",
                        kernel_init=conv_kernel_init, dtype=r.dtype)(r)
            r = dsbn(f"down{idx}_norm_2")(r, domain_id, train)
            out = leaky_relu(sc + r)
            if self.dropout is not None and self.dropout > 0:
                out = nn.Dropout(rate=self.dropout, broadcast_dims=(1, 2),
                                 deterministic=not train)(out)
            return out

        h = ds_res_down(128 // f, h, 1)
        h = ds_res_down(256 // f, h, 2)
        h = ds_res_down(512 // f, h, 3)
        h = ds_res_down(512 // f, h, 4)
        h = nn.Conv(512 // f, (1, 1), kernel_init=conv_kernel_init,
                    dtype=h.dtype)(h)
        h = dsbn("final_norm")(h, domain_id, train)
        act = _ACTS[self.act]
        return act(h) if act is not None else h


class DualBranchEncoder(nn.Module):
    """FTN encoder producing (z_i, z_s) (Dual_Branch_Encoder, :456-503)."""

    feature_reduce: int = 4
    dropout: Optional[float] = None
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        f = self.feature_reduce
        self.general_encoder = Encoder(feature_reduce=f, act="relu",
                                       dropout=self.dropout, dtype=self.dtype)
        self.code_decoupler = CodeDecoupler(features=512 // f)

    def __call__(self, x, train: bool = False):
        z_i = self.general_encoder(x, train)
        z_s = self.code_decoupler(z_i, train)
        return z_i, z_s

    def filter_code(self, z_i, train: bool = False):
        """z_i -> z_s only (used by decode_segmentation_from_image_code,
        advanced_triplet_recon_segmentation_model.py:208-221)."""
        return self.code_decoupler(z_i, train)

    def encode(self, x, train: bool = False):
        return self.general_encoder(x, train)
