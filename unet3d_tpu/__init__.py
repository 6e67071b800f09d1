"""unet3d_tpu — a TPU-native volumetric deep-learning framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of ellisdg/3DUnetCNN
(config-driven 3D medical-image segmentation: NIfTI data pipeline, encoder-decoder
CNN model zoo, training engine with checkpoint/resume, whole-volume inference).

Layout convention: host-facing arrays are channel-first ``(C, D, H, W)`` to match the
reference's public data API; on-device compute uses channel-last ``(N, D, H, W, C)``
(NDHWC) so XLA tiles convolutions onto the MXU.

Reference layer map: /root/reference SURVEY.md §1 (unet3d/{utils,transforms,datasets,
models,train,predict,scripts}).
"""

__version__ = "0.1.0"
