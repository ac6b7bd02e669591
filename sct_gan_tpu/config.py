"""Configuration tree for all model variants.

The reference scatters hyperparameters across constructor defaults
(`SCT-GAN/model.py:24-36`, `SCT-GAN/train.py:481-494`, `SCT-GAN/dataset.py:102-109`)
and notebook constants. Here every variant is a frozen dataclass serialized with
checkpoints.
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional

VULNERABILITY_TYPES = [
    "ARTHM", "DOS", "LE", "RENT", "TimeM", "TimeO", "Tx-Origin", "UE",
]


@dataclass(frozen=True)
class ModelConfig:
    """Architecture hyperparameters (reference: SCT-GAN/model.py:24-36)."""

    d_model: int = 768
    nhead: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 2048
    dropout: float = 0.3
    max_length: int = 1024
    max_lines: int = 1024          # static line-slot count (ref pads to 1024)
    vocab_size: int = 50265
    num_vulnerability_types: int = 8
    use_gan: bool = False
    # TPU-native knobs (no reference equivalent)
    compute_dtype: str = "bfloat16"   # matmul/activation dtype; params stay fp32
    use_flash_attention: bool = True  # Pallas kernel on TPU; jnp reference elsewhere
    pad_attention_heads: bool = True  # fold the dh->128-lane pad into the
                                      # q/k/v/out projection weights (exact;
                                      # kills per-call activation pad copies)
    remat: bool = False               # jax.checkpoint encoder/decoder blocks
    # Pad the vocab-sized parameters (embedding tables, LM head) up to a
    # multiple of this. 50265 → 50304: (a) the MXU lane dimension of the
    # LM-head matmul is 128-aligned instead of XLA-padding it per call, and
    # (b) the vocab axis becomes divisible by every practical mp size, so
    # the Megatron-style vocab-parallel rules in parallel/mesh.py actually
    # apply (50265 is odd — unpadded, the LM head and both embedding tables
    # silently FELL BACK to replication on any mp mesh). Exposed logits are
    # always sliced back to vocab_size inside the model; the fused LM-CE op
    # masks the pad columns out of its logsumexp (ops/fused_ce.py), so all
    # outputs are bit-equivalent to an unpadded model with the same weights.
    # 1 = no padding.
    vocab_pad_multiple: int = 128
    # Sort-based embedding backward (ops/embed.py): replaces the duplicate-
    # index scatter-add the default gather VJP lowers to with a
    # sort + cumsum-boundary-difference + sorted scatter of unique rows.
    # Same forward; gradient equal up to f32 reassociation (tests/test_ops).
    # Round-5 on-chip A/B at production geometry (B=8, L=1024, 50304×768):
    # 93.31 ms/step vs 91.45 default — the sort pipeline LOSES ~1.9 ms to
    # XLA's native colliding scatter-add, so this stays off; kept as a
    # measured alternative for geometries with heavier id collision.
    sorted_embed_grad: bool = False
    # Sequence-parallel (context-parallel) encoding over a named mesh axis
    # (SURVEY §5.7 — the reference hard-caps L=1024, model.py:32; this is
    # the long-context scaling hook). When set (e.g. "sp"), the ENCODE path
    # expects to run inside a `jax.shard_map` over that axis with the
    # sequence dimension sharded: every attention all-gathers K/V (and the
    # key-padding mask) across the axis while Q stays local — the standard
    # all-gather context-parallel schedule, whose collectives ride the ICI
    # ring — and the positional-encoding slice is offset by
    # `lax.axis_index`. Use parallel.sequence.sp_encode, which builds the
    # sp model clone and the shard_map; do NOT set this on a model called
    # outside shard_map (axis_index would be unbound). Encode-only:
    # decoder/generation paths ignore it.
    seq_axis: Optional[str] = None

    @property
    def padded_vocab_size(self) -> int:
        m = max(int(self.vocab_pad_multiple), 1)
        return (self.vocab_size + m - 1) // m * m

    # Documented non-parity knob. The reference computes the line-slot
    # count as token_to_line.max()+1 over the WHOLE batch (model.py:484):
    # a long contract unmasks line slots of every short contract in the
    # batch. The reference only ever serves batch-1 at inference, so its
    # published results never exhibit the coupling — batched serving here
    # would. True = per-row line counts (batch-of-one == batched);
    # False (default) = reference parity.
    per_sample_line_counts: bool = False


@dataclass(frozen=True)
class DataConfig:
    """Data pipeline config (reference: SCT-GAN/dataset.py:102-109, 275-332)."""

    data_path: str = ""
    tokenizer_name: str = "microsoft/codebert-base"
    max_length: int = 1024
    batch_size: int = 8
    vulnerability_types: tuple = tuple(VULNERABILITY_TYPES)
    split_seed: int = 42
    train_frac: float = 0.8


@dataclass(frozen=True)
class TrainConfig:
    """Trainer config (reference: SCT-GAN/train.py:481-494, 530-540)."""

    learning_rate: float = 1e-6
    weight_decay: float = 0.1
    max_grad_norm: float = 1.0
    adam_b1: float = 0.9
    adam_b2: float = 0.98
    adam_eps: float = 1e-9
    # LR multipliers per parameter group (train.py:530-538)
    contract_head_lr_mult: float = 2.0
    line_head_lr_mult: float = 3.0
    discriminator_lr_mult: float = 0.5
    # ReduceLROnPlateau (train.py:543-550)
    plateau_factor: float = 0.3
    plateau_patience: int = 5
    plateau_min_lr: float = 1e-6
    # Early stopping (train.py:582)
    patience: int = 24
    # Warm-up epochs for the line-vuln weight (train.py:671)
    warmup_epochs: int = 5
    use_augmentation: bool = False
    use_gan: bool = False
    num_epochs: int = 400
    checkpoint_dir: str = "checkpoints"
    # Save the rolling "latest" checkpoint every N epochs (1 = reference
    # parity, train.py:1719; raise on slow-transfer runtimes — "best" saves
    # on improvement regardless)
    latest_every: int = 1
    # Optional ceiling for the adaptive line-head LR boosts. None = reference
    # parity: the x2-per-epoch low-recall boost (train.py:1574-1593)
    # COMPOUNDS unboundedly and can blow past stability (observed: 3e-4 ->
    # 4.8e-3 in 3 epochs -> universal grad-explosion skips). Set a cap
    # (e.g. 5e-4) for long runs where convergence matters more than
    # reproducing that failure mode.
    line_lr_max: Optional[float] = None
    # Single-pass fused tree optimizer (optimizer.FusedOptimizer):
    # numerically identical to the optax chain
    # (tests/test_fused_optimizer.py), but each leaf is touched once with
    # all clip factors composed as scalars and the skip gate folded into
    # the coefficients — no per-stage tree rewrites, no keep-where sweep.
    # (The round-2 concat-into-one-vector design measured SLOWER, 33.1 vs
    # 18.5 ms/step — the 896 MB gather/scatter swamped the launch savings —
    # and was replaced by this.) Default ON since round 5: the optax chain
    # remains only as the identity-test oracle.
    fused_optimizer: bool = True
    # Fuse the LM head matmul + mean token CE into one custom-VJP op
    # (ops/fused_ce.py): the (B, S, 50k) logits are produced AND reduced
    # inside the op — never materialized between model and loss — and the
    # backward is scatter-free (softmax - onehot). Value is bit-identical
    # to the unfused path; gradients match to f32 rounding
    # (tests/test_ops.py::test_fused_linear_cross_entropy_*).
    fused_lm_ce: bool = True
    # Augmentation variant bank: pre-generate up to N tokenized variants per
    # contract the first time it is seen, then sample among them on later
    # epochs. Kills the host-bound epoch (the reference re-runs its regex
    # transforms + re-tokenizes every contract every epoch,
    # SCT-GAN/train.py:774-866 — measured ~48x device time at corpus scale).
    # 0 = reference-parity fresh regeneration each batch.
    aug_bank_size: int = 6
    # Validation signal for model selection. The reference selects its best
    # checkpoint, counts early-stop patience, and steps ReduceLROnPlateau on
    # the TOTAL validation loss (train.py:1656-1721) — which its LM term
    # dominates. On corpora where the LM task converges quickly that stops
    # training while the contract head (gradient-starved early by the
    # alpha=0.05/gamma=4 focal loss) is still improving: rounds 3-5 all
    # measured best-at-epoch-~35 checkpoints with weak contract PR-AUC while
    # longer-trained runs score far higher. "detection" switches the ONE
    # validation scalar (best/early-stop/plateau alike) to
    # contract_vuln_loss + line_vuln_loss. Documented non-parity knob;
    # "gen_loss" = reference parity.
    model_select: str = "gen_loss"
    # Label pairing for augmented batches. The reference keeps "original
    # vulnerability data by index" (SCT-GAN/train.py:829-839): augmented
    # pair i gets batch-slot i's labels even though selected_pairs is a
    # random sample pooled across ALL the batch's contracts — so ~(B-1)/B
    # of augmented examples train against the WRONG contract's labels.
    # True (default) pairs each augmented example with its actual source
    # contract's labels (the input side of a pair is that contract's
    # original text, so labels align exactly). False reproduces the
    # reference quirk verbatim.
    aug_label_correct: bool = True
    seed: int = 0
    # Parallelism: number of data-parallel shards (1 = single chip)
    dp_shards: int = 1
    # Hardware RBG PRNG for dropout keys. DISABLED by default: on the
    # current TPU runtime the rng-bit-generator op miscompiles when fused
    # into the full train-step graph — every loss turns NaN while the same
    # forward in a smaller jit is finite (verified by A/B: threefry is
    # clean on the identical graph/batch; rbg NaNs all of them, and the
    # NaN vanishes when capture_intermediates breaks up the fusion).
    # Threefry with jax_threefry_partitionable (enabled by the trainer)
    # recovers most of the mask-generation cost.
    fast_rng: bool = False


@dataclass(frozen=True)
class VariantConfig:
    """A fully-assembled variant = model + data + train configs."""

    name: str = "sct-gan"
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, default=str)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "VariantConfig":
        return cls(
            name=d.get("name", "sct-gan"),
            model=ModelConfig(**d.get("model", {})),
            data=DataConfig(**{k: (tuple(v) if k == "vulnerability_types" else v)
                               for k, v in d.get("data", {}).items()}),
            train=TrainConfig(**d.get("train", {})),
        )


def sct_gan_config(**overrides) -> VariantConfig:
    """Canonical SCT-GAN variant: GAN + augmentation (SCT-GAN/model.py:23)."""
    model = ModelConfig(use_gan=True, **overrides.pop("model", {}))
    train = TrainConfig(use_gan=True, use_augmentation=True,
                        **overrides.pop("train", {}))
    return VariantConfig(name="sct-gan", model=model, train=train, **overrides)


def model_v3_config(**overrides) -> VariantConfig:
    """Model-v3 variant: same architecture, no GAN/aug (Model-v3/model.py)."""
    model = ModelConfig(use_gan=False, **overrides.pop("model", {}))
    train = TrainConfig(use_gan=False, use_augmentation=False,
                        **overrides.pop("train", {}))
    return VariantConfig(name="model-v3", model=model, train=train, **overrides)


@dataclass(frozen=True)
class TASCConfig:
    """Legacy TASC GAN variants (Binary-TASC-model/model.py:261,
    MultiClass-TASC-model/model_code_loc.py:385)."""

    d_model: int = 768
    nhead: int = 8
    num_layers: int = 6
    dim_feedforward: int = 2048
    dropout: float = 0.1
    vocab_size: int = 50265
    decoder_vocab_size: int = 50000
    max_gen_length: int = 512
    multiclass: bool = False
    num_vulnerability_types: int = 4   # multiclass heads
    learning_rate: float = 2e-4        # Adam lr, beta1=0.5 (TASC trainers)
    adam_b1: float = 0.5
    compute_dtype: str = "bfloat16"
    # frozen CodeBERT embedder (RoBERTa-base unless shrunk for tests)
    codebert_num_layers: int = 12
    codebert_nhead: int = 12
    codebert_ffn: int = 3072
    max_length: int = 512


def binary_tasc_config(**overrides) -> TASCConfig:
    return TASCConfig(multiclass=False, **overrides)


def multiclass_tasc_config(**overrides) -> TASCConfig:
    return TASCConfig(multiclass=True, num_vulnerability_types=4, **overrides)
