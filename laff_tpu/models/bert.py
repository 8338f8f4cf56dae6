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
