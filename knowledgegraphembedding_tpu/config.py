"""Static model / training configuration.

TPU-native re-design of the reference KGE framework's hyperparameter surface
(reference: codes/model.py §KGEModel.__init__ ≈L25-100 and codes/run.py
§parse_args ≈L27-80).  Everything here is *static* under `jax.jit`: a
`ModelSpec` is frozen + hashable so it can be passed as a static argument and
baked into the compiled program.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

MODEL_NAMES = ("TransE", "DistMult", "ComplEx", "RotatE", "pRotatE")

#: Fixed epsilon used to derive the uniform init range from gamma
#: (reference: codes/model.py ≈L33 `self.epsilon = 2.0`).
EPSILON = 2.0


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Hashable, jit-static description of a KGE model.

    Mirrors the reference's constructor arguments
    (codes/model.py §KGEModel.__init__):
      - ``hidden_dim`` is the *base* dim; doubling flags widen the stored
        embedding tables (complex-valued models store (re, im) concatenated).
      - ``embedding_range = (gamma + epsilon) / hidden_dim`` controls both the
        uniform init and RotatE/pRotatE phase scaling.
    """

    model_name: str
    nentity: int
    nrelation: int
    hidden_dim: int
    gamma: float
    double_entity_embedding: bool = False
    double_relation_embedding: bool = False

    def __post_init__(self):
        if self.model_name not in MODEL_NAMES:
            raise ValueError(f"model {self.model_name} not supported")
        # Reference asserts (codes/model.py ≈L60-66):
        if self.model_name == "RotatE" and not (
            self.double_entity_embedding and not self.double_relation_embedding
        ):
            raise ValueError("RotatE should use --double_entity_embedding")
        if self.model_name == "ComplEx" and not (
            self.double_entity_embedding and self.double_relation_embedding
        ):
            raise ValueError(
                "ComplEx should use --double_entity_embedding and "
                "--double_relation_embedding"
            )

    @property
    def embedding_range(self) -> float:
        return (self.gamma + EPSILON) / self.hidden_dim

    @property
    def entity_dim(self) -> int:
        return self.hidden_dim * 2 if self.double_entity_embedding else self.hidden_dim

    @property
    def relation_dim(self) -> int:
        return (
            self.hidden_dim * 2 if self.double_relation_embedding else self.hidden_dim
        )

    @property
    def has_modulus(self) -> bool:
        """pRotatE carries an extra trainable scalar (codes/model.py ≈L52-55)."""
        return self.model_name == "pRotatE"


@dataclasses.dataclass(frozen=True)
class TrainSpec:
    """Jit-static training hyperparameters.

    Mirrors codes/run.py §parse_args defaults. Dynamic quantities (learning
    rate, step) are *not* here — they are runtime scalars so the LR decay
    (codes/run.py §main ≈L300) never triggers a recompile.
    """

    negative_sample_size: int = 128
    batch_size: int = 1024
    negative_adversarial_sampling: bool = False
    adversarial_temperature: float = 1.0
    uni_weight: bool = False
    regularization: float = 0.0
    # TPU-native scoring strategy for the negative branch:
    #   'gather' — reference-shaped row gather + elementwise reduce
    #   'dense'  — bilinear models only: one MXU matmul against the whole
    #              entity table + take (ops/matmul_scoring.py)
    #   'auto'   — dense for DistMult/ComplEx when it is cheaper
    scoring: str = "auto"
    # 'f32' (reference parity) or 'bf16' (mixed precision: bf16 gathers and
    # score math with f32 reductions, f32 master weights + Adam — the
    # standard TPU recipe; halves the HBM-bound gather/scatter traffic).
    precision: str = "f32"


@dataclasses.dataclass
class RunConfig:
    """Full mutable run configuration — the analogue of the reference's
    argparse namespace (codes/run.py §parse_args), kept 1:1 so that
    ``best_config.sh`` lines translate mechanically and ``config.json``
    round-trips (codes/run.py §override_config ≈L83-100)."""

    cuda: bool = False  # accepted for CLI compat; TPU backend ignores it
    do_train: bool = False
    do_valid: bool = False
    do_test: bool = False
    evaluate_train: bool = False
    countries: bool = False
    regions: Optional[list] = None
    data_path: Optional[str] = None
    model: str = "TransE"
    double_entity_embedding: bool = False
    double_relation_embedding: bool = False
    negative_sample_size: int = 128
    hidden_dim: int = 500
    gamma: float = 12.0
    negative_adversarial_sampling: bool = False
    adversarial_temperature: float = 1.0
    batch_size: int = 1024
    regularization: float = 0.0
    test_batch_size: int = 4
    uni_weight: bool = False
    learning_rate: float = 0.0001
    cpu_num: int = 10
    init_checkpoint: Optional[str] = None
    save_path: Optional[str] = None
    max_steps: int = 100000
    warm_up_steps: Optional[int] = None
    save_checkpoint_steps: int = 10000
    valid_steps: int = 10000
    log_steps: int = 100
    test_log_steps: int = 1000
    nentity: int = 0  # filled by cli.main — do not set manually
    nrelation: int = 0  # filled by cli.main — do not set manually
    seed: int = 0
    # TPU-native extensions (absent from the reference):
    eval_chunk_size: int = 4096  # candidate-axis chunk for filtered ranking
    num_shards: int = 1  # entity-table row shards / data-parallel degree
    use_pallas: Optional[bool] = None  # fused Pallas eval kernel (None = auto on TPU)
    prefetch_depth: int = 4  # host->device sampler pipeline depth
    scoring: str = "auto"  # negative-scoring strategy (see TrainSpec.scoring)
    precision: str = "f32"  # 'f32' | 'bf16' (see TrainSpec.precision)
    sampler_backend: str = "auto"  # 'auto' | 'native' | 'numpy'
    negative_sharing: str = "none"  # 'none' (reference) | 'batch' (shared negs)
    steps_per_dispatch: int = 1  # >1: fused k-step train blocks (fused_train.py)
    model_shards: int = 1  # >1: 2-D (data, model) mesh — embedding-dim sharding
    # crc32 of the train triples, stamped by cli.main and saved in
    # config.json so a resume against DIFFERENT data (e.g. a synthetic
    # generator whose output changed) warns instead of silently evaluating
    # a mismatched graph. Not a CLI flag.
    data_fingerprint: int = 0
    async_checkpoint: bool = True  # background checkpoint writes (checkpoint.py)
    sharded_checkpoint: bool = False  # fleets: per-process shard files (checkpoint.py)
    profile_dir: Optional[str] = None  # jax.profiler trace output dir
    eval_filter: str = "auto"  # 'auto' | 'host' | 'device' (device-resident CSR)
    platform: str = "auto"  # 'auto' | 'cpu' | 'tpu' (force the JAX backend)
    multihost: bool = False  # jax.distributed fleet (mesh spans all processes)
    coordinator_address: Optional[str] = None
    num_processes: Optional[int] = None
    process_id: Optional[int] = None
    # 'gspmd'    — annotate shardings, let XLA insert collectives
    # 'shardmap' — hand-scheduled collectives (all_gather table fwd,
    #              psum_scatter grads bwd; parallel/shard_map_step.py)
    spmd_mode: str = "gspmd"

    def model_spec(self) -> ModelSpec:
        return ModelSpec(
            model_name=self.model,
            nentity=self.nentity,
            nrelation=self.nrelation,
            hidden_dim=self.hidden_dim,
            gamma=self.gamma,
            double_entity_embedding=self.double_entity_embedding,
            double_relation_embedding=self.double_relation_embedding,
        )

    def train_spec(self) -> TrainSpec:
        return TrainSpec(
            negative_sample_size=self.negative_sample_size,
            batch_size=self.batch_size,
            negative_adversarial_sampling=self.negative_adversarial_sampling,
            adversarial_temperature=self.adversarial_temperature,
            uni_weight=self.uni_weight,
            regularization=self.regularization,
            scoring=self.scoring,
            precision=self.precision,
        )
