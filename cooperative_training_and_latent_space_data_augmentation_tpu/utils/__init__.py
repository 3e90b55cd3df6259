from cooperative_training_and_latent_space_data_augmentation_tpu.utils.logging import (  # noqa: F401
    ScalarLogger,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.utils.seed import (  # noqa: F401
    set_seed,
)

from cooperative_training_and_latent_space_data_augmentation_tpu.utils.estimate import (  # noqa: F401
    count_params,
    estimate_size,
    extract_features,
    param_bytes,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.utils.schedulers import (  # noqa: F401
    ReduceLROnPlateau,
    clip_grad_by_adam_bound,
    lr_poly,
    make_lr_schedule,
    make_optimizer,
    make_plateau_scheduler,
)
