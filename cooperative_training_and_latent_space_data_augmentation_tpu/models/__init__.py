from cooperative_training_and_latent_space_data_augmentation_tpu.models.blocks import (  # noqa: F401
    ConvBlock,
    ResConvDown,
    ResUp,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.models.encoder_decoder import (  # noqa: F401
    Decoder,
    DualBranchEncoder,
    Encoder,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.models.unet import (  # noqa: F401
    FCN,
    UNet,
    DeeplySupervisedUNet,
)
