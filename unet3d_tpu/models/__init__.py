from unet3d_tpu.models.registry import MODEL_REGISTRY, fetch_model_by_name, create_model
