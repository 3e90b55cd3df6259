from cooperative_training_and_latent_space_data_augmentation_tpu.data.splits import (  # noqa: F401
    get_ACDC_split_policy,
    get_UKBB_split_policy,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.data.synthetic import (  # noqa: F401
    SyntheticSegDataset,
)

from cooperative_training_and_latent_space_data_augmentation_tpu.data.prostate import (  # noqa: F401
    ProstateDecathlonDataset,
    get_prostate_split_policy,
)
