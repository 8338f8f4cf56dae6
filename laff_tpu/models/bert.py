"""Live BERT text featurization (reference BertTxtEncoder,
``model/model.py:437-466``).

Uses the flax BERT from transformers (pooler output, matching the
reference) as a feed-side featurizer: captions -> (B, 768). The frozen
path is the only one the reference configs exercise (bert_frozen=True in
the LAFF config); fine-tuning BERT end-to-end would move the tower into
the model graph, which the precomputed-feature path already covers for
the headline configs.
"""

from __future__ import annotations

import numpy as np

from ..utils import get_logger

logger = get_logger(__name__)


class BertTokensFeaturizer:
    """captions -> token-id arrays for the IN-GRAPH BERT tower
    (``bert_frozen=False``): the feed ships ids/mask/type and the
    FusionTower runs the transformer inside the jitted step, so BERT
    fine-tunes with the rest of the model."""

    emit_tokens = True

    def __init__(self, name_or_path: str = "bert-base-uncased",
                 do_lower_case: bool = True, max_length: int = 64,
                 vocab_file: str = "") -> None:
        if vocab_file:
            from transformers import BertTokenizer

            self.tokenizer = BertTokenizer(
                vocab_file=vocab_file, do_lower_case=do_lower_case
            )
        else:
            from transformers import AutoTokenizer

            self.tokenizer = AutoTokenizer.from_pretrained(
                name_or_path, do_lower_case=do_lower_case
            )
        self.max_length = max_length

    def encode_tokens(self, captions):
        enc = self.tokenizer(
            list(captions), return_tensors="np", padding="max_length",
            truncation=True, max_length=self.max_length,
        )
        out = {
            "bert_ids": enc["input_ids"].astype(np.int32),
            "bert_mask": enc["attention_mask"].astype(np.int32),
        }
        if "token_type_ids" in enc:
            out["bert_type"] = enc["token_type_ids"].astype(np.int32)
        return out


def import_bert_params(name_or_path: str):
    """Pretrained flax BERT params for the in-graph tower, when
    ``name_or_path`` is a local checkout (no downloads in airgapped
    deployments). Returns None when unavailable."""
    import os

    if not os.path.isdir(os.path.expanduser(name_or_path)):
        return None
    from transformers import FlaxBertModel

    model = FlaxBertModel.from_pretrained(os.path.expanduser(name_or_path))
    logger.info("imported pretrained BERT params from %s", name_or_path)
    return model.params


class LiveBertTextFeaturizer:
    """Batched caption -> pooler-output features via flax BERT."""

    def __init__(self, name_or_path: str = "bert-base-uncased",
                 do_lower_case: bool = True, max_length: int = 64) -> None:
        import jax
        from transformers import AutoTokenizer, FlaxBertModel

        self.tokenizer = AutoTokenizer.from_pretrained(
            name_or_path, do_lower_case=do_lower_case
        )
        self.model = FlaxBertModel.from_pretrained(name_or_path)
        self.max_length = max_length

        def _run(input_ids, attention_mask, token_type_ids):
            out = self.model(
                input_ids=input_ids,
                attention_mask=attention_mask,
                token_type_ids=token_type_ids,
            )
            return out.pooler_output

        self._fn = jax.jit(_run)
        logger.info("live BERT featurizer loaded from %s", name_or_path)

    def encode_batch(self, captions) -> np.ndarray:
        enc = self.tokenizer(
            list(captions), return_tensors="np", padding="max_length",
            truncation=True, max_length=self.max_length,
        )
        return np.asarray(
            self._fn(enc["input_ids"], enc["attention_mask"],
                     enc.get("token_type_ids"))
        )
