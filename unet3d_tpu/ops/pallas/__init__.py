from unet3d_tpu.ops.pallas.conv3d_kernel import pallas_conv3d, pallas_conv3d_available
