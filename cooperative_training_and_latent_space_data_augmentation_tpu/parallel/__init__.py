from cooperative_training_and_latent_space_data_augmentation_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicate_sharding,
    shard_batch,
    shard_train_step,
)
