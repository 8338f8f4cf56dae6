"""CLIP tower + BPE tokenizer: tokenizer parity with the reference
implementation (executed as an oracle from the read-only tree) and
numeric parity of the text tower against a torch reimport."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from laff_tpu.models.clip import (
    ClipTextConfig,
    ClipTextTower,
    get_tokenizer,
    import_text_tower,
    tokenize,
)


def test_tokenizer_roundtrip():
    tok = get_tokenizer()
    ids = tok.encode("a dog runs on the grass")
    assert len(ids) > 0
    assert tok.decode(ids).strip() == "a dog runs on the grass"


def test_tokenize_matrix_shape():
    out = tokenize(["hello world", "a cat"])
    assert out.shape == (2, 77)
    tok = get_tokenizer()
    assert out[0, 0] == tok.sot
    assert tok.eot in out[0]
    # long text truncates, eot forced at the end
    long = tokenize("word " * 200)
    assert long.shape == (1, 77)
    assert long[0, -1] == tok.eot


def test_tokenizer_matches_reference_oracle(reference_stubs):
    """Our BPE output must equal the reference vendored tokenizer.
    The reference imports ftfy (not installed); for well-formed unicode
    ftfy.fix_text is the identity, so the shared stubs cover the oracle."""
    import importlib.util

    sys.path.insert(0, "/root/reference")
    try:
        spec = importlib.util.spec_from_file_location(
            "_ref_tok", "/root/reference/model/clip/simple_tokenizer.py"
        )
        ref = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref)
        ref_tok = ref.SimpleTokenizer()
    except Exception as e:
        pytest.skip(f"reference tokenizer unavailable: {e}")
    finally:
        sys.path.remove("/root/reference")

    ours = get_tokenizer()
    for text in [
        "a dog runs on the grass",
        "Hello, WORLD!!! it's 42 degrees...",
        "café naïve résumé",  # non-ascii
        "don't stop believin'",
    ]:
        assert ours.encode(text) == ref_tok.encode(text), text


def _torch_text_tower(sd, ids):
    """Minimal torch evaluation of the CLIP text stack from a state dict."""
    x = sd["token_embedding.weight"][torch.from_numpy(ids)] + sd[
        "positional_embedding"
    ][None, : ids.shape[1]]
    l = ids.shape[1]
    mask = torch.triu(torch.full((l, l), float("-inf")), diagonal=1)
    n_layers = max(
        int(k.split(".")[2]) for k in sd if k.startswith("transformer.resblocks.")
    ) + 1
    for i in range(n_layers):
        p = f"transformer.resblocks.{i}."
        y = torch.nn.functional.layer_norm(
            x, (x.shape[-1],), sd[p + "ln_1.weight"], sd[p + "ln_1.bias"]
        )
        attn_out, _ = torch.nn.functional.multi_head_attention_forward(
            y.transpose(0, 1), y.transpose(0, 1), y.transpose(0, 1),
            x.shape[-1], 4,
            sd[p + "attn.in_proj_weight"], sd[p + "attn.in_proj_bias"],
            None, None, False, 0.0,
            sd[p + "attn.out_proj.weight"], sd[p + "attn.out_proj.bias"],
            attn_mask=mask, need_weights=False,
        )
        x = x + attn_out.transpose(0, 1)
        y = torch.nn.functional.layer_norm(
            x, (x.shape[-1],), sd[p + "ln_2.weight"], sd[p + "ln_2.bias"]
        )
        h = y @ sd[p + "mlp.c_fc.weight"].T + sd[p + "mlp.c_fc.bias"]
        h = h * torch.sigmoid(1.702 * h)
        x = x + h @ sd[p + "mlp.c_proj.weight"].T + sd[p + "mlp.c_proj.bias"]
    x = torch.nn.functional.layer_norm(
        x, (x.shape[-1],), sd["ln_final.weight"], sd["ln_final.bias"]
    )
    eot = torch.from_numpy(ids).argmax(dim=-1)
    pooled = x[torch.arange(x.shape[0]), eot]
    return (pooled @ sd["text_projection"]).numpy()


def test_text_tower_matches_torch(rng):
    cfg = ClipTextConfig(vocab_size=100, context_length=16, width=32,
                         heads=4, layers=2, embed_dim=24)
    torch.manual_seed(0)
    sd = {
        "token_embedding.weight": torch.randn(100, 32) * 0.02,
        "positional_embedding": torch.randn(16, 32) * 0.01,
        "ln_final.weight": torch.rand(32) + 0.5,
        "ln_final.bias": torch.randn(32) * 0.1,
        "text_projection": torch.randn(32, 24) * 0.02,
    }
    for i in range(2):
        p = f"transformer.resblocks.{i}."
        sd[p + "ln_1.weight"] = torch.rand(32) + 0.5
        sd[p + "ln_1.bias"] = torch.randn(32) * 0.1
        sd[p + "ln_2.weight"] = torch.rand(32) + 0.5
        sd[p + "ln_2.bias"] = torch.randn(32) * 0.1
        sd[p + "attn.in_proj_weight"] = torch.randn(96, 32) * 0.05
        sd[p + "attn.in_proj_bias"] = torch.randn(96) * 0.01
        sd[p + "attn.out_proj.weight"] = torch.randn(32, 32) * 0.05
        sd[p + "attn.out_proj.bias"] = torch.randn(32) * 0.01
        sd[p + "mlp.c_fc.weight"] = torch.randn(128, 32) * 0.05
        sd[p + "mlp.c_fc.bias"] = torch.randn(128) * 0.01
        sd[p + "mlp.c_proj.weight"] = torch.randn(32, 128) * 0.05
        sd[p + "mlp.c_proj.bias"] = torch.randn(32) * 0.01

    ids = np.zeros((3, 16), dtype=np.int32)
    for b in range(3):
        n = int(rng.integers(3, 10))
        ids[b, 0] = 97
        ids[b, 1:n] = rng.integers(1, 90, n - 1)
        ids[b, n] = 99  # eot = max id
    expected = _torch_text_tower(sd, ids)

    params = import_text_tower(sd, layers=2)
    tower = ClipTextTower(cfg)
    ours = np.asarray(tower.apply({"params": params}, jnp.asarray(ids)))
    np.testing.assert_allclose(ours, expected, rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# ModifiedResNet visual tower + build_model-style architecture inference
# (VERDICT r3 item 5; reference model/clip/model.py:10-150, 401-438)
# ---------------------------------------------------------------------------

def _load_reference_clip_model():
    """Import the REAL reference torch CLIP module from the read-only tree."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_ref_clip_model", "/root/reference/model/clip/model.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_resnet():
    torch.manual_seed(7)
    ref = _load_reference_clip_model()
    m = ref.ModifiedResNet(layers=(1, 1, 1, 1), output_dim=24, heads=2,
                           input_resolution=32, width=16)
    m.eval()
    return m


def test_resnet_tower_matches_reference_torch(ref_resnet, rng):
    """Flax ModifiedResNetTower == the actual reference torch module on
    random weights (frozen BN, attention pool included)."""
    from laff_tpu.models.clip import (ClipResNetConfig, ModifiedResNetTower,
                                      import_resnet_tower)

    sd = {"visual." + k: v for k, v in ref_resnet.state_dict().items()}
    cfg = ClipResNetConfig(layers=(1, 1, 1, 1), width=16, heads=2,
                           image_size=32, embed_dim=24)
    variables = import_resnet_tower(sd, cfg)
    tower = ModifiedResNetTower(cfg)

    imgs = rng.standard_normal((3, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        expected = ref_resnet(
            torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(tower.apply(variables, jnp.asarray(imgs)))
    np.testing.assert_allclose(ours, expected, rtol=2e-4, atol=2e-4)


def test_resnet_tower_deeper_stage_counts(rng):
    """Uneven per-stage block counts (RN50x-style) round-trip through the
    importer and forward cleanly."""
    from laff_tpu.models.clip import (ClipResNetConfig, ModifiedResNetTower,
                                      import_resnet_tower)

    torch.manual_seed(9)
    ref = _load_reference_clip_model()
    m = ref.ModifiedResNet(layers=(2, 1, 1, 2), output_dim=16, heads=4,
                           input_resolution=32, width=16)
    m.eval()
    sd = {"visual." + k: v for k, v in m.state_dict().items()}
    cfg = ClipResNetConfig(layers=(2, 1, 1, 2), width=16, heads=4,
                           image_size=32, embed_dim=16)
    tower = ModifiedResNetTower(cfg)
    variables = import_resnet_tower(sd, cfg)
    imgs = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        expected = m(torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(tower.apply(variables, jnp.asarray(imgs)))
    np.testing.assert_allclose(ours, expected, rtol=2e-4, atol=2e-4)


def _tiny_full_clip_sd(vit: bool):
    """A complete (tiny) CLIP state dict: text stack + visual tower."""
    torch.manual_seed(11)
    sd = {
        "token_embedding.weight": torch.randn(100, 64) * 0.02,
        "positional_embedding": torch.randn(16, 64) * 0.01,
        "ln_final.weight": torch.rand(64) + 0.5,
        "ln_final.bias": torch.randn(64) * 0.1,
        "text_projection": torch.randn(64, 24) * 0.02,
        "logit_scale": torch.tensor(4.6),
    }
    for i in range(2):
        p = f"transformer.resblocks.{i}."
        sd[p + "ln_1.weight"] = torch.rand(64) + 0.5
        sd[p + "ln_1.bias"] = torch.randn(64) * 0.1
        sd[p + "ln_2.weight"] = torch.rand(64) + 0.5
        sd[p + "ln_2.bias"] = torch.randn(64) * 0.1
        sd[p + "attn.in_proj_weight"] = torch.randn(192, 64) * 0.05
        sd[p + "attn.in_proj_bias"] = torch.randn(192) * 0.01
        sd[p + "attn.out_proj.weight"] = torch.randn(64, 64) * 0.05
        sd[p + "attn.out_proj.bias"] = torch.randn(64) * 0.01
        sd[p + "mlp.c_fc.weight"] = torch.randn(256, 64) * 0.05
        sd[p + "mlp.c_fc.bias"] = torch.randn(256) * 0.01
        sd[p + "mlp.c_proj.weight"] = torch.randn(64, 256) * 0.05
        sd[p + "mlp.c_proj.bias"] = torch.randn(64) * 0.01
    ref = _load_reference_clip_model()
    if vit:
        vt = ref.VisualTransformer(input_resolution=16, patch_size=8,
                                   width=64, layers=2, heads=4, output_dim=24)
        vt.eval()
        sd.update({"visual." + k: v for k, v in vt.state_dict().items()})
    else:
        rn = ref.ModifiedResNet(layers=(1, 1, 1, 1), output_dim=24, heads=2,
                                input_resolution=32, width=16)
        rn.eval()
        sd.update({"visual." + k: v for k, v in rn.state_dict().items()})
    return sd


@pytest.mark.parametrize("vit", [True, False])
def test_infer_clip_config_from_shapes(vit):
    """build_model-style shape sniffing recovers the architecture for both
    tower families (reference model/clip/model.py:401-438)."""
    from laff_tpu.models.clip import infer_clip_config

    arch = infer_clip_config(_tiny_full_clip_sd(vit))
    assert arch.vit == vit
    assert arch.text.vocab_size == 100
    assert arch.text.context_length == 16
    assert arch.text.width == 64
    assert arch.text.layers == 2
    assert arch.text.embed_dim == 24
    if vit:
        assert arch.vision.patch_size == 8
        assert arch.vision.image_size == 16
        assert arch.vision.width == 64
        assert arch.vision.layers == 2
    else:
        assert arch.vision.layers == (1, 1, 1, 1)
        assert arch.vision.width == 16
        assert arch.vision.image_size == 32
        assert arch.vision.heads == 8  # width * 32 // 64
    assert arch.vision.embed_dim == 24


@pytest.mark.parametrize("vit", [True, False])
def test_build_towers_end_to_end(vit, rng):
    """build_towers: any checkpoint -> working flax towers, no hand config."""
    from laff_tpu.models.clip import build_towers

    sd = _tiny_full_clip_sd(vit)
    text_tower, text_vars, vision_tower, vision_vars = build_towers(sd)

    ids = np.zeros((2, 16), dtype=np.int32)
    ids[:, 0] = 97
    ids[0, 1], ids[0, 2] = 5, 99
    ids[1, 1], ids[1, 2] = 7, 99
    txt_out = np.asarray(text_tower.apply(text_vars, jnp.asarray(ids)))
    assert txt_out.shape == (2, 24)

    size = 16 if vit else 32
    imgs = rng.standard_normal((2, size, size, 3)).astype(np.float32)
    vis_out = np.asarray(vision_tower.apply(vision_vars, jnp.asarray(imgs)))
    assert vis_out.shape == (2, 24)
    assert np.isfinite(vis_out).all() and np.isfinite(txt_out).all()


def test_strongclip_swap_infers_architecture(tmp_path, rng):
    """strongclip_text_featurizer sniffs the text architecture from the
    checkpoint's weight shapes (non-default width/layers load without a
    hand config) and encodes captions to the torch oracle's values."""
    from laff_tpu.engine.predictor import strongclip_text_featurizer
    from laff_tpu.models.clip import tokenize

    torch.manual_seed(13)
    # width 256 -> inferred heads = 256 // 64 = 4, matching the oracle
    width, layers, embed = 256, 2, 24
    sd = {
        "token_embedding.weight": torch.randn(49408, width) * 0.02,
        "positional_embedding": torch.randn(77, width) * 0.01,
        "ln_final.weight": torch.rand(width) + 0.5,
        "ln_final.bias": torch.randn(width) * 0.1,
        "text_projection": torch.randn(width, embed) * 0.02,
    }
    for i in range(layers):
        p = f"transformer.resblocks.{i}."
        sd[p + "ln_1.weight"] = torch.rand(width) + 0.5
        sd[p + "ln_1.bias"] = torch.randn(width) * 0.1
        sd[p + "ln_2.weight"] = torch.rand(width) + 0.5
        sd[p + "ln_2.bias"] = torch.randn(width) * 0.1
        sd[p + "attn.in_proj_weight"] = torch.randn(3 * width, width) * 0.05
        sd[p + "attn.in_proj_bias"] = torch.randn(3 * width) * 0.01
        sd[p + "attn.out_proj.weight"] = torch.randn(width, width) * 0.05
        sd[p + "attn.out_proj.bias"] = torch.randn(width) * 0.01
        sd[p + "mlp.c_fc.weight"] = torch.randn(4 * width, width) * 0.05
        sd[p + "mlp.c_fc.bias"] = torch.randn(4 * width) * 0.01
        sd[p + "mlp.c_proj.weight"] = torch.randn(width, 4 * width) * 0.05
        sd[p + "mlp.c_proj.bias"] = torch.randn(width) * 0.01

    d = tmp_path / "coll" / "TextData" / "clip_ft"
    d.mkdir(parents=True)
    torch.save({"model": {"clip_model." + k: v for k, v in sd.items()}},
               d / "model_best.pth.tar")

    feat = strongclip_text_featurizer(str(tmp_path), "coll", dir_name="clip_ft")
    caps = ["a dog runs", "two people talking"]
    out = feat.encode_batch(caps)
    assert out.shape == (2, embed)

    ids = np.asarray(tokenize(caps))
    expected = _torch_text_tower(sd, ids.astype(np.int64))
    np.testing.assert_allclose(out, expected, rtol=2e-4, atol=2e-4)


def _jit_archive_from_sd(sd, path):
    """Pack a flat state dict into a TorchScript archive with the same
    nested-module layout the released CLIP .pt files use."""
    root = torch.nn.Module()
    for k, v in sd.items():
        parts = k.split(".")
        m = root
        for p in parts[:-1]:
            if not hasattr(m, p):
                m.add_module(p, torch.nn.Module())
            m = getattr(m, p)
        if v.is_floating_point():
            m.register_parameter(parts[-1], torch.nn.Parameter(v.clone()))
        else:  # e.g. BN num_batches_tracked (int64) in RN-family dumps
            m.register_buffer(parts[-1], v.clone())
    # the released archives also carry non-weight buffers that the
    # reference strips before build_model (model/clip/model.py:430-432)
    root.register_buffer("input_resolution", torch.tensor(16))
    root.register_buffer("context_length", torch.tensor(16))
    root.register_buffer("vocab_size", torch.tensor(100))
    torch.jit.save(torch.jit.script(root), str(path))


@pytest.mark.parametrize("container", ["jit", "state_dict", "checkpoint"])
def test_clip_load_containers(tmp_path, container):
    """clip.load-style acquisition (ref model/clip/clip.py:102-121): a
    TorchScript JIT archive, a plain state dict, and a checkpoint wrapper
    all yield the same towers as build_towers on the raw dict."""
    from laff_tpu.models.clip import build_towers, load, load_state_dict

    sd = _tiny_full_clip_sd(vit=True)
    path = tmp_path / "tiny.pt"
    if container == "jit":
        _jit_archive_from_sd(sd, path)
    elif container == "state_dict":
        torch.save(sd, path)
    else:
        torch.save({"state_dict": sd}, path)

    got = load_state_dict(str(path))
    assert set(got) == set(sd), (
        set(sd) ^ set(got))  # JIT buffer keys stripped, weights intact
    for k in sd:
        np.testing.assert_array_equal(got[k].numpy(), sd[k].numpy())

    loaded = load(str(path))
    assert loaded.input_resolution == 16
    _, ref_text_vars, _, ref_vis_vars = build_towers(sd)
    ids = np.zeros((1, 16), dtype=np.int32)
    ids[:, 0] = 97
    ids[0, 1] = 99
    a = np.asarray(loaded.text_tower.apply(loaded.text_vars,
                                           jnp.asarray(ids)))
    b = np.asarray(loaded.text_tower.apply(ref_text_vars, jnp.asarray(ids)))
    np.testing.assert_array_equal(a, b)


def test_clip_load_name_resolution(tmp_path, monkeypatch):
    """Name resolution via the _MODELS table: a pre-placed file with a
    matching sha256 loads without network; a bad name lists the table;
    a missing file in an offline env raises with placement instructions."""
    import hashlib
    import importlib

    from laff_tpu.models.clip import available_models, load

    load_mod = importlib.import_module("laff_tpu.models.clip.load")

    assert set(available_models()) == {"RN50", "RN101", "RN50x4", "ViT-B/32"}

    sd = _tiny_full_clip_sd(vit=True)
    path = tmp_path / "Tiny.pt"
    torch.save(sd, path)
    sha = hashlib.sha256(path.read_bytes()).hexdigest()
    monkeypatch.setitem(load_mod.load.__globals__["_MODELS"], "Tiny",
                        f"https://127.0.0.1:1/clip/{sha}/Tiny.pt")

    loaded = load("Tiny", download_root=str(tmp_path))
    assert loaded.arch.vit and loaded.input_resolution == 16

    with pytest.raises(RuntimeError, match="available models"):
        load("NoSuchModel", download_root=str(tmp_path))

    # wrong digest on disk -> re-download attempt -> offline placement hint
    monkeypatch.setitem(load_mod.load.__globals__["_MODELS"], "Tiny2",
                        f"https://127.0.0.1:1/clip/{'0' * 64}/Tiny2.pt")
    (tmp_path / "Tiny2.pt").write_bytes(b"garbage")
    with pytest.raises(RuntimeError, match="place the released checkpoint"):
        with pytest.warns(UserWarning, match="SHA256"):
            load("Tiny2", download_root=str(tmp_path))
    # atomicity: the failed re-download never touched the existing file
    # at the final path and left no temp droppings behind
    assert (tmp_path / "Tiny2.pt").read_bytes() == b"garbage"
    assert not list(tmp_path.glob("*.tmp.*"))


def test_rn50x4_full_load_path(tmp_path, rng):
    """VERDICT r4 item 7: the RN-family width multipliers through the FULL
    acquisition path. An RN50x4-shaped TorchScript archive (vision width
    80 -> heads 40, stages (4, 6, 10, 6), 288 px, embed 640; text width
    640 -> heads 10) round-trips clip.load-style acquisition -> shape
    inference -> tower import, and both towers match the reference torch
    CLIP built from the same state dict (reference RN50x4 geometry per
    build_model, model/clip/model.py:401-438)."""
    from laff_tpu.models.clip import load
    from laff_tpu.models.clip.resnet import ClipResNetConfig

    torch.manual_seed(17)
    ref = _load_reference_clip_model()
    m = ref.CLIP(
        embed_dim=640, image_resolution=288, vision_layers=(4, 6, 10, 6),
        vision_width=80, vision_patch_size=None, context_length=77,
        vocab_size=49408, transformer_width=640, transformer_heads=10,
        transformer_layers=12,
    )
    m.eval()
    sd = {k: v.detach().clone() for k, v in m.state_dict().items()}
    path = tmp_path / "RN50x4.pt"
    _jit_archive_from_sd(sd, path)

    loaded = load(str(path))
    arch = loaded.arch
    assert not arch.vit
    assert isinstance(arch.vision, ClipResNetConfig)
    assert arch.vision.layers == (4, 6, 10, 6)
    assert arch.vision.width == 80
    assert arch.vision.heads == 40          # width * 32 // 64
    assert arch.vision.image_size == 288    # (sqrt(82 - 1)) * 32
    assert arch.vision.embed_dim == 640
    assert arch.text.width == 640
    assert arch.text.heads == 10
    assert arch.text.layers == 12
    assert loaded.input_resolution == 288

    # text parity against the reference CLIP's own encode_text
    from laff_tpu.models.clip import tokenize

    ids = np.asarray(tokenize(["a dog runs", "two people talk quietly"]))
    with torch.no_grad():
        want_txt = m.encode_text(torch.from_numpy(ids.astype(np.int64)))
    got_txt = np.asarray(
        loaded.text_tower.apply(loaded.text_vars, jnp.asarray(ids)))
    np.testing.assert_allclose(got_txt, want_txt.numpy(),
                               rtol=1e-3, atol=1e-3)

    # vision parity at the native 288 px through all 26 bottlenecks
    imgs = rng.standard_normal((1, 288, 288, 3)).astype(np.float32)
    with torch.no_grad():
        want_vis = m.encode_image(
            torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
    got_vis = np.asarray(
        loaded.vision_tower.apply(loaded.vision_vars, jnp.asarray(imgs)))
    np.testing.assert_allclose(got_vis, want_vis, rtol=1e-3, atol=1e-3)
