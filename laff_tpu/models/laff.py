"""The LAFF dual-encoder model family.

Re-designs the reference model classes (``model/model.py``) as two
symmetric flax towers:

  FusionTower  <- MultiScaleTxtEncoderAttention (txt, 1641-1709)
               <- VisMutiTransformNetAddAttnetion (vis, 1830-1881)
               <- VisMutiTransformNetPlusFrameFeat (FrameLAFF, 2101-2194)
               <- MultiScaleTxtNet / VisTransformNet ('concat' path, 703-726 / 279-308)

  LAFFModel    <- W2VVPP / W2VVPP_MutiVis / W2VVPP_MultiHeadAttention /
                  W2VVPP_MutiVisFrameFeat (registry names preserved)

Inputs are dense, fixed-shape arrays produced by the data pipeline
(laff_tpu.data): BoW / W2V / precomputed CLIP and BERT vectors arrive as
(B, D) features; the GRU consumes padded (B, T) token ids + lengths; frame
features arrive padded (B, T, D) + (B, T) masks. Nothing dynamic ever
enters the jitted graph.

The reference's per-sample frame-attention Python loop
(``model/model.py:2167-2173``) becomes one masked batched softmax. (That
loop also reads sample 0's mask for every batch element — a reference bug
we do NOT reproduce; we use each sample's own mask.)
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norms import l2norm
from .attention import get_attention_layer
from .gru import GruEncoder
from .layers import TransformNet
from .spec import LAFFSpec, TowerSpec, TransformSpec


def _dtype_of(spec):
    return jnp.bfloat16 if spec.compute_dtype == "bfloat16" else None


def _densify_bow(inputs: Dict[str, jnp.ndarray], dim: int) -> Dict[str, jnp.ndarray]:
    """Scatter sparse (ids, counts) bow pairs back to the dense (B, vocab)
    row the encoders consume (TextBatcher ``indexed_bow``); counts are
    pre-normalized host-side and padding ids hit the sink column, so the
    result is exactly the dense encoding."""
    inputs = dict(inputs)
    ids = inputs.pop("bow_ids")
    cnt = inputs.pop("bow_cnt")
    b = ids.shape[0]
    dense = jnp.zeros((b, dim + 1), cnt.dtype)
    dense = dense.at[jnp.arange(b)[:, None], ids].add(cnt)
    inputs["bow"] = dense[:, :dim]
    return inputs


def _transform_spec_for(spec: TowerSpec, name: str, dim_in: int) -> TransformSpec:
    overrides = dict(spec.transform_overrides)
    if name in overrides:
        return overrides[name]
    if name in spec.no_transform:
        # BN-only passthrough (reference fc=False, activation=False path)
        return TransformSpec(
            dim_in=dim_in, dim_out=spec.common_dim, fc=False,
            activation=None, dropout=0.0, batch_norm=True,
        )
    return TransformSpec(
        dim_in=dim_in, dim_out=spec.common_dim, fc=True,
        activation=spec.activation, dropout=spec.dropout,
        batch_norm=spec.batch_norm,
    )


class FusionTower(nn.Module):
    """feature dict -> (B, H, d) multi-space embedding (or (B, D) for
    single-space attention kinds / 'concat').

    ``tied_modules`` maps feature names to TransformNets owned by the
    parent LAFFModel and shared with the other tower (cross-tower weight
    tying, reference ``txt_fc_same_with_vis_fc``); '__concat__' ties the
    concat-path transform."""

    spec: TowerSpec
    is_visual: bool = False
    tied_modules: Optional[Dict[str, nn.Module]] = None

    @nn.compact
    def __call__(
        self,
        inputs: Dict[str, jnp.ndarray],
        train: bool = False,
    ) -> jnp.ndarray:
        spec = self.spec
        features = list(spec.features)

        # -- device-side BoW densification --------------------------------
        # the feed may ship the bow vector in sparse (ids, counts) form
        # (TextBatcher indexed_bow) so only ~max_tokens int32/f32 pairs per
        # caption cross the host link instead of a vocab-wide dense row;
        # scattering here reproduces the dense encoding exactly (counts are
        # pre-normalized host-side; padding ids hit the sink column)
        if "bow_ids" in inputs:
            inputs = _densify_bow(inputs, dict(spec.features)["bow"])

        # -- FrameLAFF: pool per-frame features into video-level vectors ----
        frame_pooled: Dict[str, jnp.ndarray] = {}
        if spec.frame_features:
            fa = spec.frame_attention
            for fname, fdim in spec.frame_features:
                frames = inputs[f"{fname}@frames"]  # (B, T, D)
                fmask = inputs.get(f"{fname}@mask")  # (B, T)
                if spec.frame_add_fc:
                    frames = nn.Dense(
                        fdim,
                        kernel_init=nn.initializers.xavier_uniform(),
                        name=f"frame_fc_{_safe(fname)}",
                    )(frames)
                pooled = get_attention_layer(
                    fa.kind, 1, fa, name=f"frame_attn_{_safe(fname)}"
                )(frames, mask=fmask)
                if pooled.ndim == 3:  # multi-head frame attention -> flatten
                    pooled = pooled.reshape(pooled.shape[0], -1)
                frame_pooled[fname] = pooled
            if not spec.frame_feat_with_video_feat:
                features = []
            features = features + list(spec.frame_features)

        # -- 'concat' fusion: concat raw features -> single TransformNet ----
        if spec.attention.kind == "concat":
            raw = [
                self._raw_feature(name, inputs, frame_pooled, train)
                for name, _ in features
            ]
            cat = jnp.concatenate(raw, axis=1)
            return TransformNet(
                dim_out=spec.common_dim, activation=spec.activation,
                dropout=spec.dropout, batch_norm=spec.batch_norm,
                dtype=_dtype_of(spec),
                shared_fc=self._tied("__concat__"),
                name="transform",
            )(cat, train=train)

        # -- per-feature projection into the common space -------------------
        locals_ = []
        for name, dim in features:
            feat = self._raw_feature(name, inputs, frame_pooled, train)
            if self.is_visual and train:
                # all-zero feature batches destabilize BN/attention; the
                # reference substitutes noise (model/model.py:1819-1821)
                is_zero = jnp.sum(jnp.abs(feat)) == 0.0
                noise = jax.random.normal(
                    self.make_rng("dropout"), feat.shape, feat.dtype
                )
                feat = jnp.where(is_zero, noise, feat)
            tspec = _transform_spec_for(spec, name, dim)
            if name in spec.no_transform and not tspec.fc:
                reps = spec.common_dim // feat.shape[-1]
                feat = jnp.tile(feat, (1, reps))
            feat = TransformNet(
                dim_out=tspec.dim_out, fc=tspec.fc,
                activation=tspec.activation, dropout=tspec.dropout,
                batch_norm=tspec.batch_norm,
                dtype=_dtype_of(spec),
                shared_fc=self._tied(name),
                name=f"transform_{_safe(name)}",
            )(feat, train=train)
            locals_.append(feat)

        if spec.feat_add_concat:
            cat = jnp.concatenate(
                [self._raw_feature(n, inputs, frame_pooled, train) for n, _ in features],
                axis=1,
            )
            cat = TransformNet(
                dim_out=spec.common_dim, activation=spec.activation,
                dropout=spec.dropout, batch_norm=spec.batch_norm,
                dtype=_dtype_of(spec),
                name="transform_feat_add_concat",
            )(cat, train=train)
            locals_.append(cat)

        local_embs = jnp.stack(locals_, axis=1)  # (B, L, common)

        if spec.expert_embedding:
            experts = self.param(
                "expert_embedding",
                nn.initializers.normal(1.0),
                (local_embs.shape[1], spec.common_dim),
            )
            local_embs = local_embs + experts[None, :, :]
        if spec.expert_l2norm:
            local_embs = l2norm(local_embs, axis=2)

        attn = get_attention_layer(
            spec.attention.kind, len(features), spec.attention, name="attention"
        )
        return attn(local_embs)

    def _tied(self, name):
        if self.tied_modules:
            return self.tied_modules.get(name)
        return None

    def _raw_feature(self, name, inputs, frame_pooled, train):
        if name in frame_pooled:
            return frame_pooled[name]
        if name == "rnn":
            return GruEncoder(self.spec.gru, name="gru")(
                inputs["rnn_ids"], inputs["rnn_len"]
            )
        if name == "bert" and self.spec.bert is not None and "bert_ids" in inputs:
            # live in-graph BERT (reference BertTxtEncoder bert_frozen=False,
            # model/model.py:437-466); pooler output, like the reference
            from transformers import BertConfig
            from transformers.models.bert.modeling_flax_bert import FlaxBertModule

            cfg = BertConfig(**dict(self.spec.bert.config_kwargs))
            module = FlaxBertModule(config=cfg, name="bert")
            out = module(
                inputs["bert_ids"], inputs["bert_mask"],
                token_type_ids=inputs.get("bert_type"),
                deterministic=not train,
            )
            return out.pooler_output
        if name == "netvlad":
            from .attention import NetVLAD

            return NetVLAD(num_clusters=self.spec.netvlad_clusters,
                           name="netvlad")(
                inputs["netvlad_tokens"], inputs.get("netvlad_mask")
            )
        return inputs[name]


def _safe(name: str) -> str:
    return name.replace(".", "_").replace(",", "_").replace("/", "_").replace("+", "_")


class LAFFModel(nn.Module):
    """Dual-encoder: ``encode_txt`` / ``encode_vis`` produce common-space
    embeddings; similarity and loss live in laff_tpu.ops (pure functions),
    the optimizer in the trainer — not inside the model, unlike the
    reference's model-owns-everything design."""

    spec: LAFFSpec

    def setup(self):
        txt_tied, vis_tied = self._build_tied_transforms()
        self.txt_tower = FusionTower(self.spec.txt, is_visual=False,
                                     tied_modules=txt_tied, name="txt_net")
        self.vis_tower = FusionTower(self.spec.vis, is_visual=True,
                                     tied_modules=vis_tied, name="vis_net")
        # task2 concept-space heads (intent-implementation, see Task2Spec):
        # raw features -> concept LOGITS (fc -> dropout -> BN); the sigmoid
        # the reference configures (activation_task2) is applied at the
        # loss, not mid-stack — the reference TransformNet ordering would
        # put BatchNorm AFTER the sigmoid, whose unbounded output breaks
        # the probability semantics the BCE/Jaccard objective requires
        # (unknowable intent: the reference task2 loss never executes)
        t2 = self.spec.task2
        if t2 is not None:
            act = None if t2.activation == "sigmoid" else t2.activation
            self.task2_vis_head = TransformNet(
                dim_out=t2.n_concepts, activation=act,
                dropout=t2.dropout, batch_norm=t2.batch_norm,
                name="task2_vis_head",
            )
            if t2.txt_feature != "no":
                self.task2_txt_head = TransformNet(
                    dim_out=t2.n_concepts, activation=act,
                    dropout=t2.dropout, batch_norm=t2.batch_norm,
                    name="task2_txt_head",
                )

    def _build_tied_transforms(self):
        """Cross-tower weight tying (reference ``txt_fc_same_with_vis_fc``,
        'txt fc 和 vis fc 相同'): ONE Dense (fc1), owned by this module,
        used by both towers for each tied pair; dropout and BatchNorm
        statistics stay per-tower (blending BN running stats across the two
        input distributions wrecks eval-mode normalization). The
        reference's multi-head class only validates dims — its module swap
        is a silent no-op (model/model.py:1956-1963 assigns into a
        throwaway ``dict(named_modules())``); we implement the documented
        intent, as the base W2VVPP class does (model/model.py:764-768)."""
        if not self.spec.tied_transforms:
            return None, None
        txt_tied: Dict[str, nn.Module] = {}
        vis_tied: Dict[str, nn.Module] = {}
        modules = []
        for txt_name, vis_name in self.spec.tied_transforms:
            if txt_name == "__concat__":
                if (self.spec.txt.attention.kind != "concat"
                        or self.spec.vis.attention.kind != "concat"):
                    raise ValueError(
                        "__concat__ tying needs 'concat' fusion on both towers"
                    )
                dim_in = sum(d for _, d in self.spec.txt.features)
                vis_in = sum(d for _, d in self.spec.vis.features)
            else:
                dim_in = dict(self.spec.txt.features)[txt_name]
                vis_in = dict(self.spec.vis.features)[vis_name]
                tspec = _transform_spec_for(self.spec.vis, vis_name, vis_in)
                if not tspec.fc:
                    raise ValueError(
                        f"txt_fc_same_with_vis_fc: vis feature {vis_name!r} "
                        f"has no fc to tie (no_transform)"
                    )
            if dim_in != vis_in or self.spec.txt.common_dim != self.spec.vis.common_dim:
                # reference raise: "txt_fc is not matching vis_fc"
                raise ValueError(
                    f"txt_fc_same_with_vis_fc: tied pair ({txt_name}, "
                    f"{vis_name}) dims do not match "
                    f"({dim_in}/{self.spec.txt.common_dim} vs "
                    f"{vis_in}/{self.spec.vis.common_dim})"
                )
            module = nn.Dense(
                self.spec.vis.common_dim,
                kernel_init=nn.initializers.xavier_uniform(),
                bias_init=nn.initializers.zeros,
                dtype=_dtype_of(self.spec.vis),
                name=f"tied_fc_{_safe(txt_name)}_{_safe(vis_name)}",
            )
            txt_tied[txt_name] = module
            vis_tied[vis_name] = module
            modules.append(module)
        self._tied_modules = tuple(modules)  # keep them registered in setup
        return txt_tied, vis_tied

    def encode_concepts(
        self,
        txt_inputs: Optional[Dict[str, jnp.ndarray]],
        vis_inputs: Dict[str, jnp.ndarray],
        train: bool = False,
    ):
        """Concept-space logits (task2 intent): the visual head reads the
        concatenated raw video-level features (reference dim plumbing
        ``vis_fc_layers_task2[0] = vis_fc_layers[0]``, trainer.py:238),
        the text head the main task's ``txt_feature_task2`` feature
        (trainer.py:244-251). Returns (txt_logits | None, vis_logits)."""
        t2 = self.spec.task2
        raw = jnp.concatenate(
            [vis_inputs[name] for name, _ in self.spec.vis.features], axis=1
        )
        vis_logits = self.task2_vis_head(raw, train=train)
        txt_logits = None
        if t2.txt_feature != "no" and txt_inputs is not None:
            feat = t2.txt_feature
            if feat == "bow" and "bow_ids" in txt_inputs:
                txt_inputs = _densify_bow(
                    txt_inputs, dict(self.spec.txt.features)["bow"]
                )
            txt_logits = self.task2_txt_head(txt_inputs[feat], train=train)
        return txt_logits, vis_logits

    def forward_with_concepts(
        self,
        txt_inputs: Dict[str, jnp.ndarray],
        vis_inputs: Dict[str, jnp.ndarray],
        train: bool = False,
    ):
        """One apply for the training step when task2 is active: common-space
        embeddings plus concept logits, so tower and head BatchNorm updates
        land in a single mutable pass."""
        if "bow_ids" in txt_inputs:
            # densify ONCE here: both the txt tower and the bow concept
            # head consume the dense row, so the vocab-wide scatter must
            # not rely on XLA CSE to dedup
            txt_inputs = _densify_bow(
                txt_inputs, dict(self.spec.txt.features)["bow"]
            )
        txt_embs = self.encode_txt(txt_inputs, train=train)
        vis_embs = self.encode_vis(vis_inputs, train=train)
        txt_conc, vis_conc = self.encode_concepts(
            txt_inputs, vis_inputs, train=train
        )
        return txt_embs, vis_embs, txt_conc, vis_conc

    def encode_txt(self, inputs: Dict[str, jnp.ndarray], train: bool = False):
        return self.txt_tower(inputs, train=train)

    def encode_vis(self, inputs: Dict[str, jnp.ndarray], train: bool = False):
        return self.vis_tower(inputs, train=train)

    def __call__(
        self,
        txt_inputs: Dict[str, jnp.ndarray],
        vis_inputs: Dict[str, jnp.ndarray],
        train: bool = False,
    ):
        return (
            self.encode_txt(txt_inputs, train=train),
            self.encode_vis(vis_inputs, train=train),
        )


def get_attention_weights(model: LAFFModel, variables, inputs, side: str = "txt"):
    """Fusion-attention weights for a batch (reference
    ``get_attention_weight``, Attention.py:75-76 / model.py:1707-1709).

    Returns the sown softmax gate weights: (B, L) for single-head kinds,
    (B, L, H) for the multi-head LAFF gate.
    """
    method = model.encode_txt if side == "txt" else model.encode_vis
    _, state = model.apply(
        variables, inputs, method=method, mutable=["intermediates"]
    )
    tower = "txt_net" if side == "txt" else "vis_net"
    inter = state["intermediates"][tower]
    node = inter.get("attention") or next(iter(inter.values()))
    return np.asarray(node["attn_weights"][0]) if "attn_weights" in node else None
