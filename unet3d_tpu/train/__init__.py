from unet3d_tpu.train.train import run_training
