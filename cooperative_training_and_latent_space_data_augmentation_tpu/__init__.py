"""TPU-native cooperative training + latent-space data augmentation framework.

A ground-up JAX/XLA/pjit re-design of the capabilities of
``cherise215/Cooperative_Training_and_Latent_Space_Data_Augmentation``
(MICCAI 2021, arXiv:2107.01079): a Fast-Thinking Network (FTN: shared image
encoder with dual latent heads + image decoder + segmentation decoder), a
Slow-Thinking Network (STN: denoising shape autoencoder), latent-space hard
example generation (random channel dropout + gradient-targeted channel/spatial
masking), and the cooperative training loop — all fused into a single jitted,
mesh-shardable train step.

Design notes (TPU-first, not a port):
  * NHWC layout everywhere (TPU conv-native), vs the reference's NCHW.
  * Functional state: one pytree {params, batch_stats, opt_state, step};
    the reference's five per-subnetwork Adam optimizers collapse into one
    labelled optax transform (Adam is per-parameter, so numerics match).
  * The full cooperative iteration (noise injection -> standard losses ->
    grad-through-decoder latent masking -> hard-example losses -> update)
    is ONE XLA graph; batch axis shards over a `jax.sharding.Mesh`.
  * All augmentation / corruption ops are pure jnp functions (device-side),
    replacing the reference's CPU numpy/scipy/TorchIO DataLoader pipeline.
"""

__version__ = "0.1.0"

from cooperative_training_and_latent_space_data_augmentation_tpu import config  # noqa: F401
