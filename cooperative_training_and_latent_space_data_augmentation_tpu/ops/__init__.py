from cooperative_training_and_latent_space_data_augmentation_tpu.ops import (  # noqa: F401
    image,
    losses,
    masking,
)
