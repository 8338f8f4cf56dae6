from .tokenizer import CONTEXT_LENGTH, ClipTokenizer, get_tokenizer, tokenize
from .load import LoadedClip, available_models, load, load_state_dict
from .resnet import ClipResNetConfig, ModifiedResNetTower, import_resnet_tower
from .towers import (
    ClipArch,
    ClipTextConfig,
    ClipTextTower,
    ClipVisionConfig,
    ClipVisionTower,
    build_towers,
    import_text_tower,
    import_vision_tower,
    infer_clip_config,
)

__all__ = [
    "CONTEXT_LENGTH",
    "ClipTokenizer",
    "get_tokenizer",
    "tokenize",
    "ClipTextConfig",
    "ClipTextTower",
    "ClipVisionConfig",
    "ClipVisionTower",
    "import_text_tower",
    "import_vision_tower",
    "ClipArch",
    "ClipResNetConfig",
    "ModifiedResNetTower",
    "import_resnet_tower",
    "build_towers",
    "infer_clip_config",
    "LoadedClip",
    "available_models",
    "load",
    "load_state_dict",
]
