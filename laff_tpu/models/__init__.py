from .attention import ATTENTION_TYPES, get_attention_layer
from .laff import FusionTower, LAFFModel
from .layers import TransformNet
from .gru import GruEncoder
from .spec import AttentionSpec, GruSpec, LAFFSpec, TowerSpec, TransformSpec

__all__ = [
    "ATTENTION_TYPES",
    "get_attention_layer",
    "FusionTower",
    "LAFFModel",
    "TransformNet",
    "GruEncoder",
    "AttentionSpec",
    "GruSpec",
    "LAFFSpec",
    "TowerSpec",
    "TransformSpec",
]
