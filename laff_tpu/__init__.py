"""LAFF-TPU: a TPU-native (JAX/XLA/Pallas/pjit) text-to-video retrieval framework.

Re-designed from scratch with the capabilities of ruc-aimc-lab/LAFF
(Lightweight Attentional Feature Fusion, ECCV 2022). The compute path is
pure-functional JAX compiled by XLA; hot kernels (fused LAFF attention,
tiled similarity + on-chip top-k) are Pallas TPU kernels; scaling is via
``jax.sharding.Mesh`` + jit/shard_map, not a process-per-GPU runtime.

Layer map (mirrors SURVEY.md section 1, rebuilt TPU-first):
  laff_tpu.store     -- BigFile feature store (mmap reader, binary writer)
  laff_tpu.text      -- tokenizer / vocabulary / host-side text featurizers
  laff_tpu.ops       -- numerics: norms, similarities, losses, Pallas kernels
  laff_tpu.models    -- projection heads, attention zoo, LAFF model families
  laff_tpu.data      -- datasets, fixed-shape collation, prefetching feed
  laff_tpu.parallel  -- mesh construction, sharding rules, sharded sim engine
  laff_tpu.engine    -- trainer / predictor drivers, config system, checkpoints
  laff_tpu.eval      -- rank metrics, re-ranking, TRECVID AVS harness
  laff_tpu.utils     -- logging, timers, progress meters
"""

__version__ = "0.1.0"
