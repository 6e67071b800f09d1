from unet3d_tpu.utils.config import load_json, dump_json, get_class_name, get_kwargs, in_config
