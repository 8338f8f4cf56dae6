"""CLIP weight acquisition: model name or file -> flax towers.

Mirrors the reference loader surface (`/root/reference/model/clip/clip.py`):
the `_MODELS` name->URL table (clip.py:18-23), `_download` with sha256
verification (clip.py:26-53), `available_models` (clip.py:68-70), and
`load`'s dual handling of TorchScript JIT archives vs plain state dicts
(clip.py:102-121). The reference's JIT-graph device/dtype patching
(clip.py:125-159) has no analog here by construction: we never execute
TorchScript — the archive is only a weight container, extracted via
``state_dict()`` and imported into the flax towers, so baked-in device
constants are irrelevant.

Offline environments: place the downloaded ``.pt`` next to the name the
table expects (``<root>/<basename>``) — if its sha256 matches the table it
is used without any network access.
"""

import hashlib
import os
import urllib.request
import warnings
from typing import Dict, List, NamedTuple

# reference model/clip/clip.py:18-23 — the released checkpoints the
# reference supports (URL path carries the expected sha256)
_MODELS = {
    "RN50": "https://openaipublic.azureedge.net/clip/models/afeb0e10f9e5a86da6080e35cf09123aca3b358a0c3e3b6c78a7b63bc04b6762/RN50.pt",
    "RN101": "https://openaipublic.azureedge.net/clip/models/8fa8567bab74a42d41c5915025a8e4538c3bdbe8804a470a72f30b0d94fab599/RN101.pt",
    "RN50x4": "https://openaipublic.azureedge.net/clip/models/7e526bd135e493cef0776de27d5f42653e6b4c8bf9e0f653bb11773263205fdd/RN50x4.pt",
    "ViT-B/32": "https://openaipublic.azureedge.net/clip/models/40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/ViT-B-32.pt",
}

# JIT archives register these as buffers; the reference deletes them before
# building the model (model/clip/model.py:430-432)
_NON_WEIGHT_KEYS = ("input_resolution", "context_length", "vocab_size")


def available_models() -> List[str]:
    """Reference ``clip.available_models`` (clip.py:68-70)."""
    return list(_MODELS.keys())


def _sha256_file(path: str) -> str:
    """Chunked digest — released CLIP checkpoints are 250-400 MB; never
    slurp them into memory just to hash."""
    h = hashlib.sha256()
    with open(path, "rb") as fh:
        for chunk in iter(lambda: fh.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _download(url: str, root: str) -> str:
    """Fetch ``url`` into ``root`` with sha256 verification
    (reference clip.py:26-53). A pre-placed file with a matching digest
    short-circuits the network entirely, which is the supported path in
    zero-egress environments. The download lands in a per-process temp
    file and is renamed into place only after the digest checks out, so
    a concurrent loader in another process (multi-host pods share the
    cache dir) or an interrupted download never leaves a corrupt file at
    the final path."""
    os.makedirs(root, exist_ok=True)
    expected = url.split("/")[-2]
    target = os.path.join(root, os.path.basename(url))
    if os.path.exists(target) and not os.path.isfile(target):
        raise RuntimeError(f"{target} exists and is not a regular file")
    if os.path.isfile(target):
        if _sha256_file(target) == expected:
            return target
        warnings.warn(f"{target} exists, but the SHA256 checksum does not "
                      "match; re-downloading the file")
    tmp = f"{target}.tmp.{os.getpid()}"
    try:
        with urllib.request.urlopen(url) as src, open(tmp, "wb") as dst:
            while True:
                buf = src.read(8192)
                if not buf:
                    break
                dst.write(buf)
    except OSError as e:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise RuntimeError(
            f"could not download {url} ({e}); in an offline environment, "
            f"place the released checkpoint at {target} (sha256 {expected})"
        ) from e
    if _sha256_file(tmp) != expected:
        os.unlink(tmp)
        raise RuntimeError(
            "Model has been downloaded but the SHA256 checksum does not "
            "match")
    os.replace(tmp, target)  # atomic on POSIX: readers see old-or-new only
    return target


def load_state_dict(path: str) -> Dict:
    """Extract a flat CLIP state dict from ``path``: a TorchScript JIT
    archive (the format OpenAI released), a plain ``torch.save``d state
    dict, or a checkpoint dict wrapping one (reference clip.py:102-112 +
    model.py:430-432 buffer stripping)."""
    import torch

    try:
        module = torch.jit.load(path, map_location="cpu")
        sd = dict(module.state_dict())
    except RuntimeError:
        sd = torch.load(path, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        if "state_dict" in sd and not any(
                k.startswith("visual.") or k.startswith("transformer.")
                for k in sd):
            sd = sd["state_dict"]
        sd = dict(sd)
    for key in _NON_WEIGHT_KEYS:
        sd.pop(key, None)
    return sd


class LoadedClip(NamedTuple):
    text_tower: object
    text_vars: Dict
    vision_tower: object
    vision_vars: Dict
    arch: object
    input_resolution: int


def load(name_or_path: str, download_root: str = None) -> LoadedClip:
    """Reference ``clip.load`` analog (clip.py:73-123): resolve a model
    name via the released-checkpoint table (downloading with sha256
    verification, or using a pre-placed file offline) or accept a direct
    file path, then infer the architecture from weight shapes and build
    the flax towers. Returns the towers plus the vision input resolution
    (what the reference feeds its ``_transform``)."""
    from .towers import build_towers, infer_clip_config

    if name_or_path in _MODELS:
        root = download_root or os.environ.get(
            "LAFF_TPU_CLIP_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "clip"))
        path = _download(_MODELS[name_or_path], root)
    elif os.path.isfile(name_or_path):
        path = name_or_path
    else:
        raise RuntimeError(f"Model {name_or_path} not found; available "
                           f"models = {available_models()}")

    sd = load_state_dict(path)
    text_tower, text_vars, vision_tower, vision_vars = build_towers(sd)
    arch = infer_clip_config(sd)
    if arch.vision is None:
        res = 0
    else:
        res = arch.vision.image_size
    return LoadedClip(text_tower, text_vars, vision_tower, vision_vars,
                      arch, res)
