from unet3d_tpu.config import factory
