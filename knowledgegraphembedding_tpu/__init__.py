"""TPU-native knowledge-graph-embedding training framework.

A from-scratch JAX/XLA/Pallas redesign with the full capability surface of
the reference PyTorch KGE codebase (kahrabian/KnowledgeGraphEmbedding):
TransE / DistMult / ComplEx / RotatE / pRotatE scorers, head-/tail-batch
rejection-sampled negatives, self-adversarial softmax loss, dense-Adam
training with the one-shot LR decay, filtered MRR/Hits@k ranking, countries
AUC-PR, checkpoint/resume, and a flag-compatible CLI — plus multi-chip
sharding over a jax.sharding.Mesh that the reference never had.
"""

__version__ = "0.1.0"

from .config import ModelSpec, TrainSpec, RunConfig, MODEL_NAMES  # noqa: F401
