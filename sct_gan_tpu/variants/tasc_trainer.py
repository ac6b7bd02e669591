"""TASC GAN trainers (Binary + MultiClass) — TPU-native.

Parity with `Binary-TASC-model/train.py:156-418` and
`MultiClass-TASC-model/train_code_loc.py:160-591`:

  * `SolidityCodeLoss` — CE(ignore_index=0) + weighted keyword-probability
    syntax loss (including the reference's quirk of indexing every rule's
    probability by the first flattened target token, train.py:120-141),
    `check_solidity_syntax` (pragma/contract regex + brace/paren balance),
    token-set Jaccard `compute_semantic_similarity`.
  * `VulnerabilityDetectionTrainer` — the 3/4-optimizer GAN loop (Adam
    lr=2e-4, β1=0.5): G step fools D; D step real-vs-fake where the "real"
    labels are the MALICIOUS flags (train.py:270); decoder step against the
    input ids from a pragma-solidity seed; multiclass adds the classifier
    step with PatternMatcher weak labels decoded from the batch ids
    (train_code_loc.py:269-283, 348-375). Validation computes syntax-correct
    %, compilable %, semantic similarity (train.py:357-418) and per-pattern
    accuracy (train_code_loc.py:472-591).

TPU-first: the four sequential optimizer steps become ONE jitted program —
four loss/grad computations against the appropriate parameter subtrees with
the reference's exact staleness semantics (D sees pre-update G's synthetic;
the decoder sees post-update G), all fused by XLA. The frozen CodeBERT
embedder runs under `stop_gradient` on device. Only the PatternMatcher weak
labels (host regex over decoded text) stay on host, exactly where the
reference computes them.
"""
from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import TASCConfig
from ..data.pattern_matcher import PatternMatcher
from .codebert import FlaxCodeBERT, load_codebert_params
from .tasc import PATTERN_HEADS, SPECIAL_TOKENS, SmartContractVulnerabilityGAN

_SYNTAX_RULES = {"pragma": 0.2, "contract": 0.15, "function": 0.15,
                 "returns": 0.1, "public": 0.1, "private": 0.1,
                 "view": 0.1, "pure": 0.1}
_TOKEN_MAPPINGS = {"pragma": ["pragma", "solidity"], "contract": ["contract"],
                   "function": ["function"], "returns": ["returns"],
                   "public": ["public"], "private": ["private"],
                   "view": ["view"], "pure": ["pure"]}


class SolidityCodeLoss:
    """CE + keyword-probability syntax loss (train.py:15-141)."""

    def __init__(self, vocab_size: int = 50000):
        self.vocab_size = vocab_size

    def __call__(self, decoded_code: jnp.ndarray,
                 target_ids: jnp.ndarray) -> jnp.ndarray:
        b, s, v = decoded_code.shape
        logits = decoded_code.reshape(-1, v)
        targets = jnp.clip(target_ids.reshape(-1), 0, self.vocab_size - 1)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
        mask = (targets != 0).astype(jnp.float32)   # ignore_index=0
        ce = (nll * mask).sum() / jnp.maximum(mask.sum(), 1.0)
        return ce + self._syntax_loss(logits, targets)

    def _syntax_loss(self, logits, targets):
        """Reference quirk preserved (train.py:119-141): every rule's token
        probability is read at index ``targets[0]``."""
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        token_idx = jnp.clip(targets[0], 0, self.vocab_size - 1)
        loss = jnp.float32(0.0)
        for rule, weight in _SYNTAX_RULES.items():
            for _ in _TOKEN_MAPPINGS[rule]:
                token_prob = probs[:, token_idx]
                loss = loss + weight * (1.0 - token_prob.mean())
        return loss

    @staticmethod
    def check_solidity_syntax(code: str) -> bool:
        """pragma + contract + balanced braces/parens (train.py:45-88)."""
        if not re.search(r"pragma\s+solidity\s+[\^]?[0-9]+\.[0-9]+(\.[0-9]+)?",
                         code):
            return False
        if not re.search(r"contract\s+\w+", code):
            return False
        for open_c, close_c in (("{", "}"), ("(", ")")):
            count = 0
            for ch in code:
                if ch == open_c:
                    count += 1
                elif ch == close_c:
                    count -= 1
                if count < 0:
                    return False
            if count != 0:
                return False
        return True

    @staticmethod
    def compute_semantic_similarity(generated_code: str,
                                    original_code: str) -> float:
        """Token-set Jaccard (train.py:143-154)."""
        gen = set(re.findall(r"\w+", generated_code))
        orig = set(re.findall(r"\w+", original_code))
        if not gen or not orig:
            return 0.0
        union = len(gen | orig)
        return len(gen & orig) / union if union else 0.0


def _subtree_mask(params, top_key: str):
    return {k: jax.tree_util.tree_map(lambda _: k == top_key, v)
            for k, v in params.items()}


class VulnerabilityDetectionTrainer:
    """3/4-optimizer TASC GAN trainer."""

    def __init__(self, model: SmartContractVulnerabilityGAN,
                 train_dataloader, val_dataloader,
                 learning_rate: float = 2e-4, beta1: float = 0.5,
                 tokenizer=None, codebert_params=None, seed: int = 0,
                 verbose: bool = True):
        self.model = model
        self.cfg: TASCConfig = model.config
        self.train_dataloader = train_dataloader
        self.val_dataloader = val_dataloader
        self.tokenizer = tokenizer
        self._log = print if verbose else (lambda *a, **k: None)
        self.decoder_loss = SolidityCodeLoss(self.cfg.decoder_vocab_size)
        self.pattern_matcher = PatternMatcher() if self.cfg.multiclass else None
        self.rng = jax.random.PRNGKey(seed)

        # frozen CodeBERT embedder
        self.codebert = FlaxCodeBERT(
            vocab_size=self.cfg.vocab_size, d_model=self.cfg.d_model,
            num_layers=self.cfg.codebert_num_layers,
            num_heads=self.cfg.codebert_nhead,
            dim_feedforward=self.cfg.codebert_ffn)
        self.codebert_params = (codebert_params if codebert_params is not None
                                else load_codebert_params(self.codebert))
        self._embed = jax.jit(lambda ids, mask: self.codebert.apply(
            {"params": self.codebert_params}, ids, mask))

        # trainable params
        self.rng, init_rng = jax.random.split(self.rng)
        seq = 8
        dummy = jnp.zeros((2, seq, self.cfg.d_model))
        tgt = jnp.zeros((2, 4), jnp.int32)
        self.params = model.init({"params": init_rng}, dummy, dummy,
                                 target_sequence=tgt,
                                 deterministic=True)["params"]

        # per-submodule Adam optimizers (train.py:168-183)
        self.opt_keys = ["generator", "discriminator", "decoder"]
        if self.cfg.multiclass:
            self.opt_keys.append("vulnerability_classifier")
        adam = optax.adam(learning_rate, b1=beta1, b2=0.999)
        self.txs = {k: optax.masked(adam, _subtree_mask(self.params, k))
                    for k in self.opt_keys}
        self.opt_states = {k: tx.init(self.params)
                           for k, tx in self.txs.items()}

        self.best_val_loss = float("inf")
        self.training_history: Dict[str, List[float]] = {
            "g_loss": [], "d_loss": [], "decoder_loss": [], "val_loss": [],
            "classifier_loss": [], "epoch_times": []}
        self._train_step = jax.jit(self._make_train_step())
        self._val_forward = jax.jit(
            lambda params, ce, pe, tgt: self.model.apply(
                {"params": params}, ce, pe, target_sequence=tgt,
                deterministic=True))

    # ------------------------------------------------------------------
    def _make_train_step(self):
        model = self.model
        multiclass = self.cfg.multiclass
        decoder_loss_fn = self.decoder_loss
        txs = self.txs

        def bce(p, t):
            p = jnp.clip(p, 1e-7, 1 - 1e-7)
            return -(t * jnp.log(p) + (1 - t) * jnp.log(1 - p)).mean()

        def step(params, opt_states, contract_emb, path_emb, contract_ids,
                 labels, vulnerability_labels, pattern_labels, rng):
            contract_emb = jax.lax.stop_gradient(contract_emb)
            path_emb = jax.lax.stop_gradient(path_emb)
            combined = contract_emb + path_emb
            b = contract_emb.shape[0]
            real_label = jnp.ones((b, 1), jnp.float32)
            fake_label = jnp.zeros((b, 1), jnp.float32)

            transformed = model.apply(
                {"params": params}, combined, method=model.encode,
                rngs={"dropout": rng}, deterministic=False)[0]
            transformed = jax.lax.stop_gradient(transformed)
            mean_emb = transformed.mean(axis=1)

            # --- G step (old D): g_loss = BCE(D(G(mean)), 1) ---------------
            def g_loss_fn(p):
                synthetic = model.apply({"params": p}, mean_emb,
                                        method=lambda m, x: m.generator(x))
                fake_scores = model.apply(
                    {"params": p}, synthetic,
                    method=lambda m, x: m.discriminator(x))
                return bce(fake_scores, real_label)

            g_loss, g_grads = jax.value_and_grad(g_loss_fn)(params)
            g_upd, g_opt = txs["generator"].update(
                g_grads, opt_states["generator"], params)
            params_after_g = optax.apply_updates(params, g_upd)

            # synthetic from the PRE-update generator (train.py:249-275)
            synthetic_old = jax.lax.stop_gradient(model.apply(
                {"params": params}, mean_emb,
                method=lambda m, x: m.generator(x)))

            # --- D step: real labels are the malicious flags ---------------
            def d_loss_fn(p):
                real_scores = model.apply(
                    {"params": p}, mean_emb,
                    method=lambda m, x: m.discriminator(x))
                fake_scores = model.apply(
                    {"params": p}, synthetic_old,
                    method=lambda m, x: m.discriminator(x))
                return (bce(real_scores, labels.reshape(-1, 1))
                        + bce(fake_scores, fake_label)) / 2.0

            d_loss, d_grads = jax.value_and_grad(d_loss_fn)(params_after_g)
            d_upd, d_opt = txs["discriminator"].update(
                d_grads, opt_states["discriminator"], params_after_g)
            params_after_d = optax.apply_updates(params_after_g, d_upd)

            # --- decoder step: post-update G, pragma-solidity seed ---------
            # (Deviation: the reference teacher-forces only the 2-token
            # [pragma, solidity] seed, so its decoder loss sees a length-2
            # output (train.py:283-321) — degenerate. Here the seed prefixes
            # the full contract ids so the decoder actually learns the
            # sequence; the loss target is identical.)
            seq_len = contract_ids.shape[1]
            vmax = decoder_loss_fn.vocab_size - 1
            seed = jnp.concatenate([
                jnp.full((b, 1), SPECIAL_TOKENS["pragma"], jnp.int32),
                jnp.full((b, 1), SPECIAL_TOKENS["solidity"], jnp.int32),
                jnp.clip(contract_ids[:, 2:].astype(jnp.int32), 0, vmax)],
                axis=1)

            def dec_loss_fn(p):
                synthetic_new = model.apply(
                    {"params": p}, mean_emb,
                    method=lambda m, x: m.generator(x))
                decoded = model.apply(
                    {"params": p}, synthetic_new, transformed, seed,
                    method=lambda m, x, mem, t: m.decoder(x, mem, t))
                return decoder_loss_fn(decoded, contract_ids[:, :seq_len])

            dec_loss, dec_grads = jax.value_and_grad(dec_loss_fn)(
                params_after_d)
            dec_upd, dec_opt = txs["decoder"].update(
                dec_grads, opt_states["decoder"], params_after_d)
            new_params = optax.apply_updates(params_after_d, dec_upd)
            new_opts = {"generator": g_opt, "discriminator": d_opt,
                        "decoder": dec_opt}

            cls_loss = jnp.float32(0.0)
            if multiclass:
                # --- classifier step: BCE(type scores, labels) + per-pattern
                # BCE vs PatternMatcher weak labels ------------------------
                def cls_loss_fn(p):
                    vout = model.apply(
                        {"params": p}, mean_emb,
                        method=lambda m, x: m.vulnerability_classifier(x))
                    loss = bce(vout["vulnerability_scores"],
                               vulnerability_labels)
                    for k in PATTERN_HEADS:
                        loss = loss + bce(vout["pattern_scores"][k],
                                          pattern_labels[k])
                    return loss

                cls_loss, cls_grads = jax.value_and_grad(cls_loss_fn)(
                    new_params)
                cls_upd, cls_opt = txs["vulnerability_classifier"].update(
                    cls_grads, opt_states["vulnerability_classifier"],
                    new_params)
                new_params = optax.apply_updates(new_params, cls_upd)
                new_opts["vulnerability_classifier"] = cls_opt

            metrics = {"g_loss": g_loss, "d_loss": d_loss,
                       "decoder_loss": dec_loss, "classifier_loss": cls_loss}
            return new_params, new_opts, metrics

        return step

    # ------------------------------------------------------------------
    def _pattern_labels(self, contract_ids: np.ndarray) -> Dict[str, np.ndarray]:
        """PatternMatcher weak labels from decoded batch ids
        (train_code_loc.py:269-283)."""
        out = {k: [] for k in PATTERN_HEADS}
        for row in contract_ids:
            code = (self.tokenizer.decode(row) if self.tokenizer is not None
                    else "")
            tensors = self.pattern_matcher.get_pattern_tensor(code)
            for k in PATTERN_HEADS:
                out[k].append(tensors[k])
        return {k: np.stack(v).astype(np.float32) for k, v in out.items()}

    def train_epoch(self) -> Tuple[float, float, float]:
        sums = {"g_loss": 0.0, "d_loss": 0.0, "decoder_loss": 0.0,
                "classifier_loss": 0.0}
        count = 0
        for batch in self.train_dataloader:
            contract_ids = np.asarray(batch["input_ids"])
            ce = self._embed(batch["input_ids"], batch["attention_mask"])
            pe = self._embed(batch["path_input_ids"],
                             batch["path_attention_mask"])
            labels = np.asarray(batch["label"], np.float32)
            b = contract_ids.shape[0]
            if self.cfg.multiclass:
                vuln_labels = np.asarray(batch.get(
                    "vulnerability_labels",
                    np.zeros((b, self.cfg.num_vulnerability_types))),
                    dtype=np.float32)
                pattern_labels = self._pattern_labels(contract_ids)
            else:
                vuln_labels = np.zeros((b, self.cfg.num_vulnerability_types),
                                       np.float32)
                pattern_labels = {k: np.zeros((b, n), np.float32)
                                  for k, n in PATTERN_HEADS.items()}
            self.rng, sub = jax.random.split(self.rng)
            self.params, self.opt_states, metrics = self._train_step(
                self.params, self.opt_states, ce, pe, contract_ids, labels,
                vuln_labels, pattern_labels, sub)
            m = jax.device_get(metrics)
            for k in sums:
                sums[k] += float(m[k])
            count += 1
        avg = {k: v / max(count, 1) for k, v in sums.items()}
        self.training_history["g_loss"].append(avg["g_loss"])
        self.training_history["d_loss"].append(avg["d_loss"])
        self.training_history["decoder_loss"].append(avg["decoder_loss"])
        self.training_history["classifier_loss"].append(
            avg["classifier_loss"])
        return avg["g_loss"], avg["d_loss"], avg["decoder_loss"]

    def validate(self) -> float:
        """Val loss + code-quality metrics (train.py:357-418)."""
        val_loss = 0.0
        quality = {"syntax_correct": 0, "compilable": 0,
                   "semantic_similarity": 0.0}
        pattern_correct = {k: 0 for k in PATTERN_HEADS}
        pattern_total = 0
        batches = 0
        for batch in self.val_dataloader:
            ce = self._embed(batch["input_ids"], batch["attention_mask"])
            pe = self._embed(batch["path_input_ids"],
                             batch["path_attention_mask"])
            labels = np.asarray(batch["label"], np.float32).reshape(-1, 1)
            tgt = np.asarray(batch["input_ids"], np.int32)
            out = jax.device_get(self._val_forward(self.params, ce, pe, tgt))
            p = np.clip(np.asarray(out["real_scores"]), 1e-7, 1 - 1e-7)
            val_loss += float(-(labels * np.log(p)
                                + (1 - labels) * np.log(1 - p)).mean())
            if self.tokenizer is not None:
                ids = np.argmax(np.asarray(out["decoded_code"])[0], axis=-1)
                generated = self.tokenizer.decode(ids)
                if SolidityCodeLoss.check_solidity_syntax(generated):
                    quality["syntax_correct"] += 1
                    quality["compilable"] += 1
                quality["semantic_similarity"] += (
                    SolidityCodeLoss.compute_semantic_similarity(
                        generated, self.tokenizer.decode(tgt[0])))
            if self.cfg.multiclass and self.tokenizer is not None:
                # per-pattern accuracy vs weak labels (train_code_loc:472-591)
                weak = self._pattern_labels(tgt)
                for k in PATTERN_HEADS:
                    pred = (np.asarray(out["pattern_scores"][k]) > 0.5)
                    true = weak[k] > 0.5
                    pattern_correct[k] += int((pred == true).sum())
                pattern_total += tgt.shape[0]
            batches += 1
        avg = val_loss / max(batches, 1)
        self.training_history["val_loss"].append(avg)
        if batches:
            self._log(f"Validation Loss: {avg:.4f}")
            self._log(f"Syntax Correct: {quality['syntax_correct'] / batches:.2%}")
            self._log(f"Compilable: {quality['compilable'] / batches:.2%}")
            self._log("Semantic Similarity: "
                      f"{quality['semantic_similarity'] / batches:.4f}")
            if self.cfg.multiclass and pattern_total:
                for k, n in PATTERN_HEADS.items():
                    acc = pattern_correct[k] / (pattern_total * n)
                    self._log(f"Pattern accuracy [{k}]: {acc:.2%}")
        return avg

    # ------------------------------------------------------------------
    def save(self, checkpoint_dir: str, name: str = "tasc_best") -> str:
        """Persist the full TASC training state.

        Parity with the reference's legacy checkpoint contract
        (Binary-TASC-model/main.ipynb cell 21): per-submodule state dicts
        (generator/discriminator/decoder — here the top-level keys of the
        params tree) plus ALL per-submodule optimizer states, best val loss
        and history. Arrays go through orbax, metadata to the JSON sidecar
        (train/checkpoint.py)."""
        from ..train.checkpoint import save_checkpoint
        tree = {"params": self.params, "opt_states": self.opt_states}
        meta = {
            "best_val_loss": self.best_val_loss,
            "training_history": self.training_history,
            "multiclass": self.cfg.multiclass,
            "epochs_run": len(self.training_history["g_loss"]),
        }
        return save_checkpoint(checkpoint_dir, name, tree, meta)

    def restore(self, checkpoint_path: str) -> int:
        """Restore params + the 3/4 optimizer states + history saved by
        ``save``; training continues where it left off. Returns the number
        of epochs already run."""
        from ..train.checkpoint import load_checkpoint
        target = {"params": self.params, "opt_states": self.opt_states}
        tree, meta = load_checkpoint(checkpoint_path, target=target)
        self.params = jax.tree_util.tree_map(jnp.asarray, tree["params"])
        self.opt_states = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x) if isinstance(x, (np.ndarray, jnp.ndarray))
            else x, tree["opt_states"])
        self.best_val_loss = float(meta.get("best_val_loss",
                                            self.best_val_loss))
        self.training_history = meta.get("training_history",
                                         self.training_history)
        epochs_run = int(meta.get("epochs_run", 0))
        self._log(f"Restored TASC checkpoint from {checkpoint_path} "
                  f"({epochs_run} epochs run)")
        return epochs_run

    def train(self, num_epochs: int,
              checkpoint_dir: Optional[str] = None
              ) -> Dict[str, List[float]]:
        import time
        for epoch in range(num_epochs):
            t0 = time.time()
            g, d, dec = self.train_epoch()
            val = self.validate()
            self.training_history["epoch_times"].append(time.time() - t0)
            self._log(f"Epoch {epoch + 1}/{num_epochs}: G={g:.4f} D={d:.4f} "
                      f"decoder={dec:.4f} val={val:.4f}")
            if val < self.best_val_loss:
                self.best_val_loss = val
                if checkpoint_dir is not None:
                    path = self.save(checkpoint_dir)
                    self._log(f"New best val loss; saved {path}")
        return self.training_history
