"""Plain single-network segmentation solver (baselines).

Re-design of ``medseg/models/base_segmentation_model.py`` (SegmentationModel,
:24-329): a registry of baseline networks, one Adam optimizer, jitted
train/predict/evaluate, checkpointing, and an optional EMA teacher
(model_util.ExponentialMovingAverage:21-101).  The reference file is
partially stale (bad imports / nonexistent kwargs, see SURVEY C7); we
replicate the capability, not the bugs.
"""

from __future__ import annotations

import os
import pickle
from functools import partial
from os.path import join
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from cooperative_training_and_latent_space_data_augmentation_tpu.models.unet import (
    FCN,
    ResConvUNet,
    UNet,
    UNetv2,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.ops import losses as L
from cooperative_training_and_latent_space_data_augmentation_tpu.train.state import TrainState

# network registry (base_segmentation_model.py:78-138); ``dtype`` is the
# conv compute dtype (bf16 mixed precision; norms/logits stay f32).
NETWORK_REGISTRY: Dict[str, Callable[..., Any]] = {
    "UNet_16": lambda num_classes, image_ch, dtype=None: UNet(num_classes=num_classes, feature_scale=4, dtype=dtype),
    "UNet_32": lambda num_classes, image_ch, dtype=None: UNet(num_classes=num_classes, feature_scale=2, dtype=dtype),
    "UNet_64": lambda num_classes, image_ch, dtype=None: UNet(num_classes=num_classes, feature_scale=1, dtype=dtype),
    "UNetv2_16": lambda num_classes, image_ch, dtype=None: UNetv2(num_classes=num_classes, feature_scale=4, dtype=dtype),
    "SN_UNet_16": lambda num_classes, image_ch, dtype=None: UNet(num_classes=num_classes, feature_scale=4, if_SN=True, dtype=dtype),
    "IN_SN_UNet_16": lambda num_classes, image_ch, dtype=None: UNet(num_classes=num_classes, feature_scale=4, norm="instance", if_SN=True, dtype=dtype),
    "FCN_16": lambda num_classes, image_ch, dtype=None: FCN(num_classes=num_classes, feature_scale=4, dtype=dtype),
    "FCN_64": lambda num_classes, image_ch, dtype=None: FCN(num_classes=num_classes, feature_scale=1, dtype=dtype),
    "ResUNet_16": lambda num_classes, image_ch, dtype=None: ResConvUNet(num_classes=num_classes, feature_scale=4, dtype=dtype),
    "ResUNet_64": lambda num_classes, image_ch, dtype=None: ResConvUNet(num_classes=num_classes, feature_scale=1, dtype=dtype),
}


class SegmentationSolver:
    """One-network solver: train_step/predict/evaluate/checkpointing."""

    def __init__(self, network_type: str = "UNet_16", image_ch: int = 1,
                 num_classes: int = 4, learning_rate: float = 1e-4,
                 loss_type: str = "cross entropy", use_ema: bool = False,
                 ema_decay: float = 0.999, compute_dtype=None,
                 optimizer_name: str = "Adam", steps_per_epoch: int = 1,
                 clip_grad: bool = False):
        """``optimizer_name`` mirrors the reference registry
        (base_segmentation_model.set_optmizers:214-223): 'Adam' = plain Adam;
        'AdaAdam' = Adam + step LR decay (x0.5 every 50 EPOCHS — pass
        ``steps_per_epoch`` so the per-update count converts to epochs).
        ``clip_grad`` adds the IGEBM Adam-bound gradient clip
        (model_util.clip_grad:138-154; defined-but-unused in the reference,
        exposed here as a working option)."""
        assert network_type in NETWORK_REGISTRY, (
            f"unknown network {network_type}; have {sorted(NETWORK_REGISTRY)}")
        self.network_type = network_type
        self.image_ch = image_ch
        self.num_classes = num_classes
        self.loss_type = loss_type
        self.use_ema = use_ema
        self.ema_decay = ema_decay
        self.model = NETWORK_REGISTRY[network_type](num_classes, image_ch,
                                                    dtype=compute_dtype)
        from cooperative_training_and_latent_space_data_augmentation_tpu.utils.schedulers import (
            make_optimizer,
        )

        if optimizer_name == "Adam":
            self.tx = make_optimizer(learning_rate, clip=clip_grad)
        elif optimizer_name == "AdaAdam":
            self.tx = make_optimizer(learning_rate, policy="step",
                                     lr_decay_iters=50, clip=clip_grad,
                                     steps_per_epoch=steps_per_epoch)
        else:
            raise NotImplementedError(
                f"optimizer {optimizer_name!r}; have Adam | AdaAdam")

    def init_state(self, rng: jax.Array, input_hw: Tuple[int, int] = (192, 192)
                   ) -> TrainState:
        x = jnp.zeros((1, input_hw[0], input_hw[1], self.image_ch))
        variables = self.model.init(rng, x, train=False)
        params = variables["params"]
        stats = variables.get("batch_stats", {})
        if self.use_ema:
            params = {"online": params, "ema": jax.tree.map(jnp.copy, params)}
            opt_state = self.tx.init(params["online"])
        else:
            opt_state = self.tx.init(params)
        return TrainState(params=params, batch_stats=stats, opt_state=opt_state,
                          step=jnp.zeros((), jnp.int32))

    def _online(self, params):
        return params["online"] if self.use_ema else params

    def make_train_step(self, donate: bool = True):
        def step(state: TrainState, batch, rng):
            image, label = batch["image"], batch["label"]
            rng, k_drop = jax.random.split(rng)

            def loss_fn(p):
                out, ups = self.model.apply(
                    {"params": p, "batch_stats": state.batch_stats},
                    image, train=True, mutable=["batch_stats"],
                    rngs={"dropout": k_drop})
                if isinstance(out, tuple):  # deeply supervised nets
                    main, auxs = out
                    loss = L.basic_loss_fn(main, label, self.loss_type)
                    for a in auxs:
                        loss = loss + 0.5 * L.basic_loss_fn(a, label, self.loss_type)
                else:
                    loss = L.basic_loss_fn(out, label, self.loss_type)
                return loss, ups.get("batch_stats", {})

            online = self._online(state.params)
            (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(online)
            updates, new_opt = self.tx.update(grads, state.opt_state, online)
            new_online = optax.apply_updates(online, updates)
            if self.use_ema:
                d = self.ema_decay
                new_ema = jax.tree.map(lambda e, o: d * e + (1 - d) * o,
                                       state.params["ema"], new_online)
                new_params = {"online": new_online, "ema": new_ema}
            else:
                new_params = new_online
            new_state = state.replace(params=new_params, batch_stats=new_stats,
                                      opt_state=new_opt, step=state.step + 1)
            return new_state, {"loss/total": loss}

        return jax.jit(step, donate_argnums=(0,) if donate else ())

    def predict(self, state: TrainState, x, softmax: bool = False,
                use_ema_params: bool = False):
        params = state.params["ema"] if (self.use_ema and use_ema_params) else (
            self._online(state.params))
        out = self.model.apply({"params": params, "batch_stats": state.batch_stats},
                               x, train=False)
        if isinstance(out, tuple):
            out = out[0]
        return jax.nn.softmax(out, -1) if softmax else out

    def make_predict(self, softmax: bool = False):
        return jax.jit(partial(self.predict, softmax=softmax))

    def evaluate(self, state: TrainState, x, targets_npy, running_metric):
        pred = np.asarray(jnp.argmax(self.predict(state, x), axis=-1))
        running_metric.update(label_trues=np.asarray(targets_npy), label_preds=pred)
        return pred

    # persistence (base_segmentation_model.py:273-320)
    def save_model(self, state: TrainState, save_dir: str, epoch_iter) -> str:
        path = join(save_dir, str(epoch_iter), "checkpoints")
        os.makedirs(path, exist_ok=True)
        fname = join(path, f"{self.network_type}.msgpack")
        with open(fname, "wb") as f:
            f.write(serialization.to_bytes(
                {"params": state.params, "batch_stats": state.batch_stats}))
        return fname

    def load_model(self, state: TrainState, path: str) -> TrainState:
        with open(path, "rb") as f:
            restored = serialization.from_bytes(
                {"params": state.params, "batch_stats": state.batch_stats}, f.read())
        return state.replace(params=restored["params"],
                             batch_stats=restored["batch_stats"])

    def save_snapshots(self, state: TrainState, save_dir: str, epoch: int) -> str:
        os.makedirs(save_dir, exist_ok=True)
        path = join(save_dir, f"{self.network_type}_snapshot.pkl")
        with open(path, "wb") as f:
            pickle.dump({"network_type": self.network_type, "epoch": int(epoch),
                         "state": serialization.to_bytes(state)}, f)
        return path

    def load_snapshots(self, state: TrainState, path: Optional[str]
                       ) -> Tuple[TrainState, int]:
        if not path or not os.path.exists(path):
            return state, 0
        with open(path, "rb") as f:
            payload = pickle.load(f)
        return (serialization.from_bytes(state, payload["state"]),
                int(payload["epoch"]))
