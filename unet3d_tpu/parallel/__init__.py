from unet3d_tpu.parallel.mesh import (make_mesh, make_sharded_train_step,
                                      shard_batch, replicate_state)
