from .clip_text import TextConfig, encode_text, init_text_params
from .spacetime_vit import SpaceTimeConfig, init_spacetime_params, spacetime_forward
from .obj_decoder import (
    DecoderConfig,
    DecoderOutput,
    decoder_forward,
    init_decoder_params,
    obj_proj,
    txt_proj,
    vid_proj,
)
from .clip_image import (
    ClipResNetConfig,
    ClipVitConfig,
    clip_image_tower_from_state_dict,
    clip_resnet_encode,
    clip_vit_encode,
    init_clip_resnet_params,
    init_clip_vit_params,
)
from .zoo import available_models, clip_preprocess, load_clip
from .lavila import (
    LavilaConfig,
    encode_image,
    init_lavila_params,
    lavila_forward,
    timesformer_base_config,
    timesformer_large_config,
)

__all__ = [
    "ClipResNetConfig",
    "ClipVitConfig",
    "clip_image_tower_from_state_dict",
    "clip_resnet_encode",
    "clip_vit_encode",
    "init_clip_resnet_params",
    "init_clip_vit_params",
    "available_models",
    "clip_preprocess",
    "load_clip",
    "TextConfig",
    "encode_text",
    "init_text_params",
    "SpaceTimeConfig",
    "init_spacetime_params",
    "spacetime_forward",
    "DecoderConfig",
    "DecoderOutput",
    "decoder_forward",
    "init_decoder_params",
    "obj_proj",
    "txt_proj",
    "vid_proj",
    "LavilaConfig",
    "encode_image",
    "init_lavila_params",
    "lavila_forward",
    "timesformer_base_config",
    "timesformer_large_config",
]
