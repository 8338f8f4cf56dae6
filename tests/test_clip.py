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
