from unet3d_tpu.data.image import Volume
from unet3d_tpu.data.io import load_image, load_single_image, reorder_image, save_volume
