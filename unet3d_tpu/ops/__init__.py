from unet3d_tpu.ops import affine, one_hot, normalize, resample, threshold, crop
