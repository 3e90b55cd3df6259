from cooperative_training_and_latent_space_data_augmentation_tpu.eval.metrics import (  # noqa: F401
    RunningScore,
    RunningSegmentationScore,
    runningScore,
    runningMySegmentationScore,
)

from cooperative_training_and_latent_space_data_augmentation_tpu.eval.post_process import (  # noqa: F401
    keep_largest_connected_components,
)

from cooperative_training_and_latent_space_data_augmentation_tpu.eval.pairwise_measures import (  # noqa: F401
    MorphologyOps,
    PairwiseMeasures,
    PairwiseMeasuresRegression,
)
