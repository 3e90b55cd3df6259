from cooperative_training_and_latent_space_data_augmentation_tpu.utils.logging import (  # noqa: F401
    ScalarLogger,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.utils.seed import (  # noqa: F401
    set_seed,
)
