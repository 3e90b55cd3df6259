from cooperative_training_and_latent_space_data_augmentation_tpu.train.cooperative import (  # noqa: F401
    CooperativeTripletSolver,
    TrainState,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.train.segmentation import (  # noqa: F401
    SegmentationSolver,
)
