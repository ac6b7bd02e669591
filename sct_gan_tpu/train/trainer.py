"""SmartContractTrainer — host control loop around the jitted train step.

Behavioral parity with the reference trainer (SCT-GAN/train.py:480-1721),
re-architected for TPU: the device executes ONE compiled step program the
whole run; the host owns only control decisions (epoch adaptivity, plateau
scheduling, interventions, checkpointing), all of which mutate *runtime
scalars* threaded into the step — never the compiled graph.

Host-side adaptive control reproduced:
  * dataset vulnerability scan → dynamic line weight 5/3/2 (train.py:623-705);
  * startup dimension smoke test (train.py:709-772);
  * 5-epoch line-weight warm-up (train.py:906-907);
  * oscillation detection on first-batch line-logit mean/std → loss-scale +
    stability-factor halving, with post-warmup-only gating (train.py:1015-1041)
    and epoch-level recovery growth (train.py:1529-1546);
  * recall-swing stability damping + precision/recall focal retuning
    (train.py:1548-1568);
  * dead-line-head LR boosts, no-prediction emergency boosts
    (train.py:1574-1625);
  * ReduceLROnPlateau on val gen loss + LR-floor rescue + val-loss-explosion
    10× cut (train.py:1628-1654);
  * early stopping patience 24, best/latest checkpointing (train.py:1656-1721).

Parallelism: batches are sharded over the mesh's "dp" axis and parameters
placed by the mp rules (parallel/mesh.py); XLA inserts the gradient psum.
The reference is single-GPU (train.py:495) — this axis is new capability.
"""
from __future__ import annotations

import json
import math
import os
import random
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TrainConfig, VariantConfig
from ..data.augmentation import SmartContractAugmenter
from ..losses.syntax import SyntaxLossTables
from ..models.sct_transformer import SmartContractTransformer
from ..parallel.mesh import make_mesh, shard_batch, shard_params
from .checkpoint import (AsyncSaver, checkpoint_suffix,
                         save_checkpoint)
from .optimizer import (FusedOptimizer, GroupLRs, ReduceLROnPlateau,
                        build_gradient_transform, fusion_mask_tree,
                        group_index_tree)
from .train_step import (DynamicScalars, TrainState, make_eval_step,
                         make_train_step)

_HISTORY_KEYS = [
    "train_loss", "val_loss", "contract_vuln_loss", "line_vuln_loss",
    "learning_rate", "discriminator_loss", "syntax_loss",
    "line_vuln_accuracy", "line_vuln_precision", "line_vuln_recall",
]



def _fetch_metrics(metrics):
    """One-RPC metric fetch: jax.device_get on a dict issues a D2H round
    trip PER LEAF — on the tunneled runtime that is ~0.4 s x 20 scalars per
    batch, and it queues behind any in-flight checkpoint fetch. Stack the
    scalars into one device vector and fetch once."""
    keys = list(metrics.keys())
    vec = np.asarray(jnp.stack([metrics[k].astype(jnp.float32)
                                for k in keys]))
    return {k: float(vec[i]) for i, k in enumerate(keys)}

class SmartContractTrainer:
    """Train the SmartContractTransformer with the reference's GAN recipe."""

    def __init__(
        self,
        model: SmartContractTransformer,
        train_dataloader,
        val_dataloader,
        tokenizer,
        learning_rate: float = 1e-6,
        weight_decay: float = 0.1,
        max_grad_norm: float = 1.0,
        use_augmentation: bool = False,
        use_gan: bool = False,
        config: Optional[TrainConfig] = None,
        mesh=None,
        seed: int = 0,
        verbose: bool = True,
    ):
        cfg = config or TrainConfig(
            learning_rate=learning_rate, weight_decay=weight_decay,
            max_grad_norm=max_grad_norm, use_augmentation=use_augmentation,
            use_gan=use_gan)
        self.cfg = cfg
        self.model = model
        self.tokenizer = tokenizer
        self.train_dataloader = train_dataloader
        self.val_dataloader = val_dataloader
        self.use_augmentation = cfg.use_augmentation
        self.use_gan = cfg.use_gan
        self.verbose = verbose
        self._log = print if verbose else (lambda *a, **k: None)

        self.mesh = mesh if mesh is not None else make_mesh()
        if cfg.fast_rng:
            # typed key carrying the RBG impl (raw PRNGKey arrays would be
            # reinterpreted as threefry by downstream consumers).
            # WARNING: known to miscompile (NaN losses) inside the full
            # train-step graph on the current TPU runtime — see
            # TrainConfig.fast_rng.
            self.rng = jax.random.key(seed, impl="rbg")
        else:
            # partitionable threefry lowers to vectorizable counter-mode
            # hashing — much cheaper mask generation than the default
            # stateful lowering, and safe where the rbg op is not
            jax.config.update("jax_threefry_partitionable", True)
            self.rng = jax.random.PRNGKey(seed)
        self._py_rng = random.Random(seed)
        # pre-tokenized augmentation variants, keyed by contract source
        # (see _bank_variants; TrainConfig.aug_bank_size)
        self._aug_bank: Dict[str, List[np.ndarray]] = {}
        self._saver = AsyncSaver(log=self._log)

        # -- parameters ------------------------------------------------------
        max_len = model.config.max_length
        init_batch = {
            "input_ids": jnp.zeros((2, max_len), jnp.int32),
            "attention_mask": jnp.ones((2, max_len), jnp.int32),
            "ast_input_ids": jnp.zeros((2, max_len), jnp.int32),
            "ast_attention_mask": jnp.ones((2, max_len), jnp.int32),
            "token_to_line": jnp.zeros((2, max_len), jnp.int32),
        }
        self.rng, init_rng = jax.random.split(self.rng)
        variables = model.init(
            {"params": init_rng}, init_batch["input_ids"],
            init_batch["attention_mask"], init_batch["ast_input_ids"],
            init_batch["ast_attention_mask"],
            target_ids=init_batch["input_ids"],
            token_to_line=init_batch["token_to_line"], deterministic=True)
        params = shard_params(variables["params"], self.mesh)

        # -- optimizer + steps ----------------------------------------------
        self.grad_tx = build_gradient_transform(
            params, use_gan=self.use_gan, max_grad_norm=cfg.max_grad_norm,
            adam_b1=cfg.adam_b1, adam_b2=cfg.adam_b2, adam_eps=cfg.adam_eps,
            weight_decay=cfg.weight_decay)
        self.group_idx = group_index_tree(params, self.use_gan)
        # single-pass fused tree optimizer (optimizer.FusedOptimizer):
        # identical numerics to the optax chain, one touch per leaf,
        # mesh-sharding compatible (no concat — GSPMD lowers its reductions
        # to the right collectives under mp too)
        self.fused_opt = (FusedOptimizer(
            params, use_gan=self.use_gan, max_grad_norm=cfg.max_grad_norm,
            adam_b1=cfg.adam_b1, adam_b2=cfg.adam_b2, adam_eps=cfg.adam_eps,
            weight_decay=cfg.weight_decay)
            if getattr(cfg, "fused_optimizer", False) else None)
        opt_state = (self.fused_opt.init(params) if self.fused_opt is not None
                     else self.grad_tx.init(params))
        self.state = TrainState(params, opt_state, jnp.int32(0))

        self.syntax_tables = SyntaxLossTables.from_tokenizer(tokenizer)
        fused_lm_ce = getattr(cfg, "fused_lm_ce", False)
        self.train_step = make_train_step(
            model, self.grad_tx, self.group_idx, self.syntax_tables,
            use_gan=self.use_gan, use_augmentation=self.use_augmentation,
            fused_opt=self.fused_opt,
            fusion_mask=fusion_mask_tree(params),
            fused_lm_ce=fused_lm_ce)
        self.eval_step = make_eval_step(
            model, self.syntax_tables, use_gan=self.use_gan,
            use_augmentation=self.use_augmentation, fused_lm_ce=fused_lm_ce)

        # -- group LRs (train.py:530-540) + scheduler -----------------------
        lr = cfg.learning_rate
        if lr > 1e-4:  # reference guard (train.py:596-600)
            self._log("WARNING: Learning rate is too high! Setting to 1e-4")
            lr = 1e-4
        self.lrs: Dict[str, float] = {
            "base": lr,
            "contract": lr * cfg.contract_head_lr_mult,
            "line": lr * cfg.line_head_lr_mult,
            "disc": lr * cfg.discriminator_lr_mult,
        }
        self.scheduler = ReduceLROnPlateau(
            factor=cfg.plateau_factor, patience=cfg.plateau_patience,
            min_lr=cfg.plateau_min_lr)

        # static batch target: all batches pad up to the loader's batch size
        # so the step executable compiles exactly once
        self._static_batch = getattr(train_dataloader, "batch_size", 0) or 0

        # -- augmentation ---------------------------------------------------
        self.augmenter = (SmartContractAugmenter(
            getattr(tokenizer, "name_or_path", "tokenizer"),
            tokenizer=tokenizer) if self.use_augmentation else None)

        # -- dataset vulnerability scan (train.py:623-705) ------------------
        self._scan_dataset()

        # -- adaptive-control state (train.py:669-705) ----------------------
        self.current_epoch = 0
        self.warmup_epochs = cfg.warmup_epochs
        self.prev_line_recall = 0.0
        self.prev_line_precision = 0.0
        self.stability_factor = 1.0
        self.prev_line_logit_mean = 0.0
        self.prev_line_logit_std = 0.0
        self.oscillation_detected = False
        self.consecutive_oscillations = 0
        self.line_loss_scale = 1.0
        self.min_line_loss_scale = 0.1
        self.max_line_loss_scale = 5.0
        self.loss_warmup_epochs = 5
        self.total_line_predictions = 0.0
        self.batches_with_predictions = 0
        self.contract_vuln_weight = 3.0
        self.spatial_alpha = 0.25
        self.spatial_gamma = 2.0
        self.spatial_weight = 0.2

        self.best_val_loss = float("inf")
        # last best val loss durably written to disk — the rollback target
        # when an OOM-valve drop discards a queued best snapshot
        self._persisted_best_val = float("inf")
        self.patience_counter = 0
        self.patience = cfg.patience
        self.training_history: Dict[str, List[float]] = {
            k: [] for k in _HISTORY_KEYS}

        self._dimension_smoke_test(max_len)

    # ------------------------------------------------------------------
    def restore(self, checkpoint_path: str) -> int:
        """Resume from an orbax checkpoint saved by `train` — params,
        optimizer state, step counter, group LRs, plateau-scheduler state and
        training history (the reference's resume flow incl. optimizer state,
        Model-v3/trainning-phase.ipynb cells 11-12). Returns the epoch to
        continue from."""
        from .checkpoint import adapt_vocab_params, load_checkpoint
        full_target = {"params": self.state.params,
                       "opt_state": self.state.opt_state,
                       "step": self.state.step}
        slim_target = {"params": self.state.params, "step": self.state.step}

        def _vocab_fallback():
            # checkpoint saved under a different ModelConfig.vocab_pad_multiple
            # (e.g. a pre-padding 50265-wide LM head restored into the
            # 50304-padded model): restore raw, pad/slice the vocab leaves,
            # resume with a freshly initialized optimizer.
            tree, meta = load_checkpoint(checkpoint_path)
            tree["params"] = adapt_vocab_params(
                tree["params"], self.model.config.padded_vocab_size)
            self._log("checkpoint vocab padding differs from the model's: "
                      "adapted embedding/LM-head shapes; resuming with a "
                      "freshly initialized optimizer")
            return tree, meta

        def _fresh_opt(tree):
            # mirror the constructor: the fused optimizer's state layout
            # (count/mu/nu vectors) differs from the optax chain tuple
            p = shard_params(tree["params"], self.mesh)
            return (self.fused_opt.init(p) if self.fused_opt is not None
                    else self.grad_tx.init(p))

        # the save path records params_only in the meta sidecar — use it to
        # pick the restore target so genuine load errors (corrupt manifest,
        # dtype mismatch) propagate instead of silently degrading to
        # params-only. The try/except stays only for sidecar-less
        # checkpoints (hand-made or foreign).
        meta_path = os.path.abspath(checkpoint_path) + ".meta.json"
        params_only = None
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                params_only = bool(json.load(f).get("params_only", False))
        def _is_shape_mismatch(e: Exception) -> bool:
            # only a shape/structure mismatch may degrade to the vocab
            # fallback — corrupt manifests, dtype errors etc. must propagate
            msg = str(e).lower()
            return "shape" in msg or "structure" in msg

        if params_only is True:
            try:
                tree, meta = load_checkpoint(checkpoint_path,
                                             target=slim_target)
            except Exception as e:
                if not _is_shape_mismatch(e):
                    raise
                tree, meta = _vocab_fallback()
            opt_state = _fresh_opt(tree)
            self._log("checkpoint is params-only (best): resuming with a "
                      "freshly initialized optimizer")
        elif params_only is False:
            try:
                tree, meta = load_checkpoint(checkpoint_path,
                                             target=full_target)
                opt_state = tree["opt_state"]
            except Exception as e:
                if not _is_shape_mismatch(e):
                    raise
                tree, meta = _vocab_fallback()
                opt_state = _fresh_opt(tree)
        else:
            try:
                tree, meta = load_checkpoint(checkpoint_path,
                                             target=full_target)
                opt_state = tree["opt_state"]
            except Exception:
                try:
                    tree, meta = load_checkpoint(checkpoint_path,
                                                 target=slim_target)
                except Exception:
                    tree, meta = _vocab_fallback()
                opt_state = _fresh_opt(tree)
                self._log("checkpoint has no optimizer state (params-only "
                          "best): resuming with a freshly initialized "
                          "optimizer")
        params = shard_params(tree["params"], self.mesh)
        self.state = TrainState(params, opt_state,
                                jnp.asarray(tree["step"]))
        if meta:
            self.best_val_loss = float(meta.get("val_loss", self.best_val_loss))
            self.training_history = meta.get("training_history",
                                             self.training_history)
            if "lrs" in meta:
                self.lrs = {k: float(v) for k, v in meta["lrs"].items()}
            if "scheduler" in meta:
                self.scheduler.load_state_dict(meta["scheduler"])
            self.current_epoch = int(meta.get("epoch", 0))
        self._log(f"Restored checkpoint from {checkpoint_path} "
                  f"(epoch {self.current_epoch})")
        return self.current_epoch

    # ------------------------------------------------------------------
    def _scan_dataset(self) -> None:
        total_contracts = 0
        total_contract_vulns = 0.0
        total_line_vulns = 0.0
        for batch in self.train_dataloader:
            b = batch["contract_vulnerabilities"].shape[0]
            total_contracts += b
            total_contract_vulns += float(batch["contract_vulnerabilities"].sum())
            total_line_vulns += float(batch["vulnerable_lines"].sum())
        self.contract_vuln_rate = (total_contract_vulns / total_contracts
                                   if total_contracts else 0.0)
        seq = self.model.config.max_length
        ntypes = self.model.config.num_vulnerability_types
        self.line_vuln_rate = (total_line_vulns
                               / (total_contracts * seq * ntypes)
                               if total_contracts else 0.0)
        # dynamic weight thresholds (train.py:694-703)
        if self.line_vuln_rate < 0.001:
            self.line_vuln_weight = 5.0
        elif self.line_vuln_rate < 0.01:
            self.line_vuln_weight = 3.0
        else:
            self.line_vuln_weight = 2.0
        self._log(f"Dataset: {total_contracts} contracts, "
                  f"line vuln rate {self.line_vuln_rate:.6f}, "
                  f"line weight {self.line_vuln_weight}")

    def _dimension_smoke_test(self, max_len: int) -> None:
        """Startup dimension test (train.py:709-772): dummy batch through the
        full forward; assert head output shapes."""
        nt = self.model.config.num_vulnerability_types
        dummy = {
            "input_ids": jnp.ones((2, max_len), jnp.int32),
            "attention_mask": jnp.ones((2, max_len), jnp.int32),
            "ast_input_ids": jnp.ones((2, max_len), jnp.int32),
            "ast_attention_mask": jnp.ones((2, max_len), jnp.int32),
            "token_to_line": jnp.zeros((2, max_len), jnp.int32),
        }
        out = jax.eval_shape(
            lambda p: self.model.apply(
                {"params": p}, dummy["input_ids"], dummy["attention_mask"],
                dummy["ast_input_ids"], dummy["ast_attention_mask"],
                target_ids=dummy["input_ids"],
                token_to_line=dummy["token_to_line"], deterministic=True),
            self.state.params)
        cshape = out["contract_vulnerability_logits"].shape
        lshape = out["line_vulnerability_logits"].shape
        if cshape != (2, nt):
            raise ValueError(f"contract head shape {cshape} != (2, {nt})")
        if lshape != (2, self.model.config.max_lines, nt):
            raise ValueError(f"line head shape {lshape} != "
                             f"(2, {self.model.config.max_lines}, {nt})")
        self._log("✓ Model dimension test passed")

    # ------------------------------------------------------------------
    def _scalars(self, warmup_factor: float, for_validation: bool = False
                 ) -> DynamicScalars:
        if for_validation:
            w_l = self.line_vuln_weight * warmup_factor
        else:
            w_l = (self.line_vuln_weight * warmup_factor
                   * self.stability_factor * self.line_loss_scale)
        return DynamicScalars(
            line_vuln_weight=jnp.float32(w_l),
            contract_vuln_weight=jnp.float32(self.contract_vuln_weight),
            spatial_alpha=jnp.float32(self.spatial_alpha),
            spatial_gamma=jnp.float32(self.spatial_gamma),
            spatial_weight=jnp.float32(self.spatial_weight),
        )

    def _group_lrs(self) -> GroupLRs:
        return GroupLRs(jnp.float32(self.lrs["base"]),
                        jnp.float32(self.lrs["contract"]),
                        jnp.float32(self.lrs["line"]),
                        jnp.float32(self.lrs["disc"]))

    # ------------------------------------------------------------------
    def _bank_variants(self, code: str, n: int) -> List[np.ndarray]:
        """Up to ``n`` tokenized variant-target rows for one contract.

        With ``aug_bank_size > 0``, the regex transforms + tokenization run
        ONCE per contract (building a bank of pre-tokenized variants) and
        later epochs just sample rows — the steady-state epoch host cost
        becomes a few numpy gathers instead of the reference's per-batch
        re-augment + re-tokenize (SCT-GAN/train.py:774-866, the 48x
        host-bound incident). ``aug_bank_size == 0`` preserves the
        reference's fresh-regeneration semantics exactly."""
        max_len = self.model.config.max_length

        def _tok_rows(texts: List[str]) -> List[np.ndarray]:
            enc = self.tokenizer(texts, max_length=max_len,
                                 padding="max_length", truncation=True,
                                 return_tensors="np")
            ids = np.asarray(enc["input_ids"], np.int32)
            return [ids[i] for i in range(ids.shape[0])]

        bank_size = getattr(self.cfg, "aug_bank_size", 0)
        if bank_size <= 0:
            pairs = self.augmenter.augment_contract(code, n)
            return _tok_rows([v for _, v in pairs]) if pairs else []
        bank = self._aug_bank.get(code)
        if bank is None:
            pairs = self.augmenter.augment_contract(code, bank_size)
            bank = _tok_rows([v for _, v in pairs]) if pairs else []
            self._aug_bank[code] = bank
        if not bank:
            return []
        k = min(n, len(bank))
        return [bank[i] for i in self._py_rng.sample(range(len(bank)), k)]

    def _create_augmented_batch(self, batch: Dict) -> Dict:
        """Host-side augmented batch (train.py:774-866): 2–3 variants per
        contract, resampled to batch size, original vuln labels preserved by
        index, dummy AST = input clone. The pair's input side is the
        ORIGINAL contract (augment_contract returns (original, variant)), so
        input rows are reused from the already-tokenized batch; only variant
        targets need tokenizing (served from the variant bank)."""
        if not self.use_augmentation or "source_code" not in batch:
            return batch
        source_codes = batch["source_code"]

        pairs = []   # (contract index in batch, variant target ids row)
        for ci, code in enumerate(source_codes):
            n = self._py_rng.randint(2, 3)
            pairs.extend((ci, row) for row in self._bank_variants(code, n))
        if not pairs:
            return batch
        if len(pairs) > len(source_codes):
            pairs = self._py_rng.sample(pairs, len(source_codes))
        # keep the batch shape static (jit compiles once): fill up to the
        # original batch size by repeating pairs
        while len(pairs) < len(source_codes):
            pairs.append(pairs[len(pairs) % max(len(pairs), 1)])

        src = np.asarray([ci for ci, _ in pairs], np.int64)
        target_ids = np.stack([row for _, row in pairs])
        input_ids = np.asarray(batch["input_ids"])[src]
        attention_mask = np.asarray(batch["attention_mask"])[src]
        n = len(pairs)
        if getattr(self.cfg, "aug_label_correct", False):
            # labels from each pair's actual source contract (the pair's
            # input side IS that contract's original text)
            idx = src
        else:
            # reference quirk (train.py:829-839): batch-slot labels by index
            idx = np.minimum(np.arange(n), len(source_codes) - 1)
        return {
            "input_ids": input_ids,
            "attention_mask": attention_mask,
            "ast_input_ids": input_ids,
            "ast_attention_mask": attention_mask,
            "target_ids": target_ids,
            "vulnerable_lines": np.asarray(batch["vulnerable_lines"])[idx],
            "contract_vulnerabilities":
                np.asarray(batch["contract_vulnerabilities"])[idx],
            "token_to_line": np.asarray(batch["token_to_line"])[idx],
        }

    def _pad_to_dp(self, batch: Dict) -> Dict:
        """Pad every batch to ONE static size (the max batch size seen,
        rounded to a dp multiple): ragged tail batches would otherwise
        trigger a full XLA recompile per distinct size (~minutes each on the
        remote compiler).

        Padding rows repeat the last real row but carry ``row_valid=0``, so
        the loss/metric masking in train_step.compute_losses gives them zero
        weight — a padded tail batch yields the same loss, gradients, and
        metrics as the unpadded batch (the reference never pads; duplicated
        rows with full weight would bias every mean toward the last row)."""
        dp = self.mesh.shape.get("dp", 1)
        b = batch["input_ids"].shape[0]
        target = max(getattr(self, "_static_batch", 0),
                     dp * math.ceil(b / dp))
        self._static_batch = target
        if b == target and "row_valid" not in batch:
            # full batch: no mask — masked and plain means are identical
            # with all rows valid, and omitting the mask keeps the hot path
            # on the cheaper unmasked reductions. The jit sees row_valid as
            # an optional batch key, so full and padded batches compile two
            # variants once each (sizes are already static).
            return batch
        pad = target - b
        row_valid = np.zeros(target, dtype=np.float32)
        row_valid[:b] = 1.0
        out = {}
        for k, v in batch.items():
            if isinstance(v, np.ndarray):
                out[k] = np.concatenate([v, np.repeat(v[-1:], pad, axis=0)])
            else:
                out[k] = v
        out["row_valid"] = row_valid
        return out

    # ------------------------------------------------------------------
    def train_epoch(self, epoch: int) -> Dict[str, float]:
        self.current_epoch = epoch
        warmup_factor = min(1.0, (epoch + 1) / self.warmup_epochs)
        scalars = self._scalars(warmup_factor)
        lrs = self._group_lrs()

        sums: Dict[str, float] = {}
        batch_count = 0
        last = {}
        t0 = time.time()
        tokens = 0

        def prepare(batch):
            if self.use_augmentation:
                batch = self._create_augmented_batch(batch)
            return self._pad_to_dp(batch)

        def process(batch_idx: int, metrics, ntokens: int):
            """Host-side bookkeeping for one step's metrics (may run one
            batch late — see the pipelining note below)."""
            nonlocal scalars, batch_count, last, tokens
            try:
                m = _fetch_metrics(metrics)
            except Exception as e:   # per-batch resilience (train.py:1342)
                self._log(f"Error in batch {batch_idx}: {e}")
                return
            tokens += ntokens
            # first-batch oscillation detection (train.py:1015-1041)
            if batch_idx == 0:
                cur_mean = m["line_logits_mean"]
                cur_std = m["line_logits_std"]
                if epoch >= self.loss_warmup_epochs:
                    if epoch > 0:
                        mean_change = abs(cur_mean - self.prev_line_logit_mean)
                        std_change = abs(cur_std - self.prev_line_logit_std)
                        if ((mean_change > 5.0 or std_change > 1.0)
                                and not self.oscillation_detected):
                            self._log(f"⚠️  OSCILLATION DETECTED! mean Δ"
                                      f"{mean_change:.3f} std Δ{std_change:.3f}")
                            self.oscillation_detected = True
                            self.consecutive_oscillations += 1
                            self.line_loss_scale = max(
                                self.min_line_loss_scale,
                                self.line_loss_scale * 0.5)
                            self.stability_factor = max(
                                0.5, self.stability_factor * 0.7)
                            # keep the step's focal retune, refresh the weight
                            scalars = scalars._replace(
                                line_vuln_weight=self._scalars(
                                    warmup_factor).line_vuln_weight)
                    self.prev_line_logit_mean = cur_mean
                    self.prev_line_logit_std = cur_std
                else:
                    self.line_loss_scale = 1.0

            self.total_line_predictions += m["line_predictions"]
            if m["line_predictions"] > 0:
                self.batches_with_predictions += 1

            # NaN/Inf-loss batches are skipped on-device (no param update,
            # train.py:1301-1309) and excluded from the epoch averages here —
            # the reference `continue`s past them before accumulation.
            if m.get("skipped", 0.0) > 0.0 or not math.isfinite(
                    m["total_loss"]):
                self._log(f"⚠️  Skipping batch {batch_idx}: non-finite loss "
                          f"or exploding grads (grad_norm="
                          f"{m.get('grad_norm', float('nan')):.1f})")
                return
            for k in ("gen_loss", "contract_vuln_loss", "line_vuln_loss",
                      "discriminator_loss", "syntax_loss"):
                sums[k] = sums.get(k, 0.0) + m[k]
            batch_count += 1
            last = m

        # Pipelined control loop: the metrics fetch for batch i happens only
        # AFTER batch i+1's step is dispatched, so the device never idles
        # while the host runs augmentation/tokenization for the next batch.
        # Batch 0 is fetched synchronously — its metrics drive the
        # oscillation intervention that must apply from batch 1
        # (train.py:1015-1041 ordering). The per-batch focal retune needs no
        # fetch at all: `scalars` chains device-side between steps.
        from ..parallel.mesh import prefetch_to_device
        pending = None
        for batch_idx, device_batch in enumerate(prefetch_to_device(
                self.train_dataloader, self.mesh, prepare=prepare,
                on_oom=self._saver.drop_pending)):
            try:
                self.rng, step_rng = jax.random.split(self.rng)
                self.state, metrics, scalars = self.train_step(
                    self.state, device_batch, scalars, lrs, step_rng)
            except Exception as e:
                # per-batch resilience (train.py:887-890, 1342-1344): a bad
                # batch is logged and skipped, never kills the epoch
                self._log(f"Error in batch {batch_idx}: {e}")
                continue
            ntokens = device_batch["input_ids"].size
            if batch_idx == 0:
                process(0, metrics, ntokens)
            else:
                if pending is not None:
                    process(*pending)
                pending = (batch_idx, metrics, ntokens)
        if pending is not None:
            process(*pending)

        # sync the per-batch focal retune back to host state so epoch
        # interventions compose with it (train.py:1172-1182 ordering)
        if batch_count:
            sc = jax.device_get(scalars)
            self.spatial_alpha = float(sc.spatial_alpha)
            self.spatial_gamma = float(sc.spatial_gamma)
            self.spatial_weight = float(sc.spatial_weight)

        dt = max(time.time() - t0, 1e-9)
        out = {k: (sums.get(k, 0.0) / batch_count if batch_count else
                   float("inf"))
               for k in ("gen_loss", "contract_vuln_loss", "line_vuln_loss",
                         "discriminator_loss", "syntax_loss")}
        out["line_vuln_accuracy"] = last.get("line_vuln_accuracy", 0.0)
        out["line_vuln_precision"] = last.get("line_vuln_precision", 0.0)
        out["line_vuln_recall"] = last.get("line_vuln_recall", 0.0)
        out["tokens_per_sec"] = tokens / dt
        out["step_time_ms"] = dt / max(batch_count, 1) * 1e3
        return out

    def _select_val(self, val_metrics: Dict[str, float]) -> float:
        """The scalar that picks checkpoints, counts patience, and drives
        the plateau scheduler. Reference parity: val GEN loss
        (train.py:1657-1658). TrainConfig.model_select="detection" uses the
        detection components instead (contract + line focal losses) — the
        LM term dominates the total and converges first, silently ending
        training while the gradient-starved contract head is still
        improving (see config.py:model_select)."""
        if self.cfg.model_select == "detection":
            return (val_metrics["contract_vuln_loss"]
                    + val_metrics["line_vuln_loss"])
        return val_metrics["gen_loss"]

    def validate(self) -> Dict[str, float]:
        warmup_factor = min(1.0, (self.current_epoch + 1) / self.warmup_epochs)
        scalars = self._scalars(warmup_factor, for_validation=True)
        sums: Dict[str, float] = {}
        batch_count = 0
        # sliding-window pipeline: host prep of batch i+1 overlaps the
        # device's step on batch i, but in-flight executions (each pinning
        # its device input batch) stay bounded regardless of val-set size
        import collections
        pending = collections.deque()

        def _fetch_one():
            nonlocal batch_count
            m = _fetch_metrics(pending.popleft())
            for k in ("gen_loss", "contract_vuln_loss", "line_vuln_loss"):
                sums[k] = sums.get(k, 0.0) + m[k]
            batch_count += 1

        for batch in self.val_dataloader:
            if self.use_augmentation:
                batch = self._create_augmented_batch(batch)
            batch = self._pad_to_dp(batch)
            device_batch = shard_batch(batch, self.mesh)
            pending.append(self.eval_step(self.state.params, device_batch,
                                          scalars))
            if len(pending) > 2:
                _fetch_one()
        while pending:
            _fetch_one()
        out = {k: (sums.get(k, 0.0) / batch_count if batch_count else
                   float("inf"))
               for k in ("gen_loss", "contract_vuln_loss", "line_vuln_loss")}
        out["discriminator_loss"] = 0.0
        return out

    # ------------------------------------------------------------------
    def train(self, num_epochs: int, checkpoint_dir: str = "checkpoints",
              profile_dir: Optional[str] = None,
              profile_epoch: int = 1) -> Dict[str, List[float]]:
        """Run the training loop. ``profile_dir`` captures a jax.profiler
        trace of one epoch (TensorBoard-loadable) — the observability the
        reference lacks entirely (SURVEY §5.1)."""
        os.makedirs(checkpoint_dir, exist_ok=True)
        suffix = checkpoint_suffix(self.use_augmentation, self.use_gan)

        for epoch in range(num_epochs):
            self._log(f"\nEpoch {epoch + 1}/{num_epochs}")
            self.current_epoch = epoch
            t_train0 = time.time()
            if profile_dir is not None and epoch == profile_epoch:
                from ..utils.profiling import trace_context
                with trace_context(profile_dir):
                    train_metrics = self.train_epoch(epoch)
            else:
                train_metrics = self.train_epoch(epoch)
            t_val0 = time.time()
            val_metrics = self.validate()
            t_val1 = time.time()

            h = self.training_history
            h["train_loss"].append(train_metrics["gen_loss"])
            h["val_loss"].append(val_metrics["gen_loss"])
            h["contract_vuln_loss"].append(train_metrics["contract_vuln_loss"])
            h["line_vuln_loss"].append(train_metrics["line_vuln_loss"])
            h["learning_rate"].append(self.lrs["base"])
            h["line_vuln_accuracy"].append(train_metrics["line_vuln_accuracy"])
            h["line_vuln_precision"].append(train_metrics["line_vuln_precision"])
            h["line_vuln_recall"].append(train_metrics["line_vuln_recall"])
            h["discriminator_loss"].append(
                train_metrics["discriminator_loss"] if self.use_gan else 0.0)
            h["syntax_loss"].append(train_metrics["syntax_loss"])

            select_val = self._select_val(val_metrics)
            self._log(f"Train Loss: {train_metrics['gen_loss']:.4f}  "
                      f"Val Loss: {val_metrics['gen_loss']:.4f}  "
                      + (f"Select: {select_val:.5f}  "
                         if self.cfg.model_select != "gen_loss" else "")
                      + f"({train_metrics['tokens_per_sec']:.0f} tok/s; "
                      f"train {t_val0 - t_train0:.1f}s "
                      f"val {t_val1 - t_val0:.1f}s)")

            self._epoch_interventions(epoch, train_metrics, val_metrics)

            # -- checkpointing (train.py:1656-1721) -------------------------
            improved = select_val < self.best_val_loss
            meta = {
                "epoch": epoch + 1,
                "val_loss": select_val,
                "training_history": self.training_history,
                "use_augmentation": self.use_augmentation,
                "use_gan": self.use_gan,
                "line_vuln_accuracy": train_metrics["line_vuln_accuracy"],
                "line_vuln_precision": train_metrics["line_vuln_precision"],
                "line_vuln_recall": train_metrics["line_vuln_recall"],
                "lrs": self.lrs,
                "scheduler": self.scheduler.state_dict(),
            }
            state_tree = {"params": self.state.params,
                          "opt_state": self.state.opt_state,
                          "step": self.state.step}
            # best checkpoints exist to be EVALUATED/DEPLOYED: params only.
            # The opt state doubles the snapshot HBM and triples the tunnel
            # D2H (the epoch-11 OOM incident: 3 queued full-state snapshots
            # + the live state exhausted HBM). `latest` keeps the full
            # resume state.
            best_tree = {"params": self.state.params, "step": self.state.step}
            if improved:
                self.best_val_loss = select_val
                self.patience_counter = 0
                # async: the device-side snapshot is immediate, the slow
                # D2H + write runs on the saver thread (checkpoint.AsyncSaver)
                best_val = float(select_val)

                def _mark_persisted(v=best_val):
                    self._persisted_best_val = v

                def _rollback_best():
                    # queued best dropped before writing: future epochs must
                    # compete against the best actually on disk, not the
                    # phantom one (checkpoint.AsyncSaver.drop_pending)
                    self.best_val_loss = self._persisted_best_val
                    self._log("best snapshot dropped before save; "
                              "best_val_loss rolled back to "
                              f"{self.best_val_loss:.4f}")

                self._saver.submit(
                    checkpoint_dir, f"best_model{suffix}_epoch_{epoch + 1}",
                    best_tree, dict(meta, params_only=True),
                    on_saved=_mark_persisted, on_dropped=_rollback_best)
                self._log("🎉 New best validation loss! Saving "
                          f"best_model{suffix}_epoch_{epoch + 1} "
                          "(background)")
            else:
                self.patience_counter += 1
                self._log(f"No improvement for {self.patience_counter} epochs")

            if self.patience_counter >= self.patience:
                self._log(f"Early stopping after {self.patience} epochs "
                          "without improvement")
                break

            if (epoch + 1) % max(self.cfg.latest_every, 1) == 0:
                self._saver.submit(checkpoint_dir, f"latest_model{suffix}",
                                   state_tree, meta)
        # make the written checkpoints visible/complete before returning
        self._saver.wait()
        # guarantee at least one best checkpoint exists (every submit during
        # the run may have been dropped while a previous save was in flight)
        import glob as _glob
        if not _glob.glob(os.path.join(checkpoint_dir, "best_model*")):
            save_checkpoint(checkpoint_dir,
                            f"best_model{suffix}_epoch_{self.current_epoch + 1}",
                            {"params": self.state.params,
                             "step": self.state.step},
                            {"epoch": self.current_epoch + 1,
                             "training_history": self.training_history,
                             "use_augmentation": self.use_augmentation,
                             "use_gan": self.use_gan,
                             "params_only": True})
        return self.training_history

    # ------------------------------------------------------------------
    def _epoch_interventions(self, epoch: int, train_metrics: Dict,
                             val_metrics: Dict) -> None:
        """Epoch-level self-healing (train.py:1529-1654)."""
        line_recall = train_metrics["line_vuln_recall"]
        line_precision = train_metrics["line_vuln_precision"]

        # stabilization growth (train.py:1529-1546)
        if not self.oscillation_detected and epoch > 2:
            if self.line_loss_scale < 1.0:
                self.line_loss_scale = min(1.0, self.line_loss_scale * 1.2)
            if self.stability_factor < 1.0:
                self.stability_factor = min(1.0, self.stability_factor * 1.1)
        self.oscillation_detected = False

        if epoch > 0:
            # recall-swing damping (train.py:1551-1556)
            if ((self.prev_line_recall > 0.8 and line_recall < 0.1)
                    or (self.prev_line_recall < 0.1 and line_recall > 0.8)):
                self._log("⚠️  Recall oscillation — damping stability factor")
                self.stability_factor = max(0.3, self.stability_factor * 0.7)
            # precision/recall focal retuning (train.py:1558-1568)
            if line_precision < 0.01 and line_recall > 0.8:
                self.spatial_alpha = min(0.5, self.spatial_alpha * 1.2)
                self.spatial_gamma = max(1.5, self.spatial_gamma * 0.9)
            if line_precision > 0.8 and line_recall < 0.1:
                self.spatial_alpha = max(0.1, self.spatial_alpha * 0.8)
                self.spatial_gamma = min(3.0, self.spatial_gamma * 1.1)
        self.prev_line_recall = line_recall
        self.prev_line_precision = line_precision

        # dead-line-head LR boosts (train.py:1574-1585)
        def _cap_line_lr():
            cap = self.cfg.line_lr_max
            if cap is not None and self.lrs["line"] > cap:
                self.lrs["line"] = cap
        if line_recall < 0.01 and epoch > 5:
            self.lrs["line"] *= 2.0
            _cap_line_lr()
            self._log(f"⚠️  Low line recall — boosted line LR to "
                      f"{self.lrs['line']:.2e}")
        if line_recall == 0.0 and epoch > 5:
            self.lrs["line"] *= 2.0
            _cap_line_lr()
            self.line_loss_scale = min(self.max_line_loss_scale,
                                       self.line_loss_scale * 1.5)
            self.stability_factor = min(1.0, self.stability_factor * 1.2)
        # no-prediction emergency (train.py:1604-1621)
        if self.batches_with_predictions == 0 and epoch > 5:
            self._log("🚨  No line predictions in any batch — emergency boost")
            self.lrs["line"] *= 3.0
            _cap_line_lr()
            self.line_loss_scale = min(self.max_line_loss_scale,
                                       self.line_loss_scale * 2.0)
            self.stability_factor = 0.8
        self.total_line_predictions = 0.0
        self.batches_with_predictions = 0

        # plateau scheduler on the model-selection signal (reference: val
        # gen loss, train.py:1628; TrainConfig.model_select="detection"
        # routes the same knob everywhere so LR reductions track the signal
        # that picks checkpoints)
        self.lrs, reduced = self.scheduler.step(self._select_val(val_metrics),
                                                self.lrs)
        if reduced:
            self._log(f"Plateau: reduced LRs to base {self.lrs['base']:.2e}")

        # LR-floor rescues (train.py:1631-1645)
        if self.lrs["base"] < 1e-6 and self.patience_counter > 10:
            self._log("🚨 LR critically low — boosting to 5e-5")
            self.lrs = {k: 5e-5 for k in self.lrs}
            self.patience_counter = 0
        elif self.lrs["base"] < 1e-6 and self.patience_counter > 5:
            self._log("⚠️  LR too small — boosting to 1e-5")
            self.lrs = {k: 1e-5 for k in self.lrs}
            self.patience_counter = 0

        # val-loss explosion (train.py:1647-1654)
        if self._select_val(val_metrics) > self.best_val_loss * 2.0:
            self._log("⚠️  Validation loss explosion — cutting LR 10×")
            self.lrs = {k: v * 0.1 for k, v in self.lrs.items()}
            self.patience_counter = 0
