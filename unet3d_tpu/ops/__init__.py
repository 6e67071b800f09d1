from unet3d_tpu.ops import (affine, augment, conv3d, crop, interpolate, normalize,
                            one_hot, resample, threshold)
