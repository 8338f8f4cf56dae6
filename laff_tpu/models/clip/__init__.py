from .tokenizer import CONTEXT_LENGTH, ClipTokenizer, get_tokenizer, tokenize
from .towers import (
    ClipTextConfig,
    ClipTextTower,
    ClipVisionConfig,
    ClipVisionTower,
    import_text_tower,
    import_vision_tower,
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
]
