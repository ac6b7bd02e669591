"""End-to-end public-API drive on the virtual CPU mesh — the /verify check.

Runs OUTSIDE the repo semantics: only `sys.path` + the public package
surface, exactly what a user of the reference would call. Covers: synthetic
CSV -> loaders -> dp=4 x mp=2 GAN training epoch -> best-checkpoint restore
(params-only) -> detection dict API -> KV-cached generation -> edge probes
(garbage label cells, empty source, over-length contract, unseen token ids).

Run from any scratch directory:
    python /root/repo/tools/verify_drive.py
Known flake: XLA-CPU collective rendezvous can hit its fatal 40 s timeout
when the host is heavily loaded by OTHER processes — run it solo.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["HF_HUB_OFFLINE"] = "1"; os.environ["TRANSFORMERS_OFFLINE"] = "1"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

# data layer
from sct_gan_tpu.data.synthetic import write_corpus_csv
from sct_gan_tpu.data import get_tokenizer, create_dataloaders
write_corpus_csv("corpus.csv", n=16, seed=7)
tok = get_tokenizer()
train, val = create_dataloaders("corpus.csv", tok, batch_size=4, max_length=192)
batch = next(iter(train))
print("batch keys:", sorted(batch.keys())[:4], batch["input_ids"].shape)

# tiny model + trainer with padded heads (the change under test), dp=4 x mp=2
from sct_gan_tpu.config import ModelConfig, TrainConfig
from sct_gan_tpu.models.sct_transformer import SmartContractTransformer
from sct_gan_tpu.parallel.mesh import make_mesh
from sct_gan_tpu.train import SmartContractTrainer
cfg = ModelConfig(d_model=64, nhead=4, num_encoder_layers=2, num_decoder_layers=2,
                  dim_feedforward=128, dropout=0.1, max_length=192, max_lines=192,
                  vocab_size=tok.vocab_size, use_gan=True, compute_dtype="float32",
                  use_flash_attention=False, pad_attention_heads=True)
model = SmartContractTransformer(cfg)
mesh = make_mesh(dp=4, mp=2)
trainer = SmartContractTrainer(model, train, val, tok,
                               config=TrainConfig(learning_rate=1e-4, use_gan=True,
                                                  use_augmentation=True, warmup_epochs=1),
                               mesh=mesh, verbose=False)
hist = trainer.train(1, checkpoint_dir="ckpts")
print("epoch trained, train_loss:", hist["train_loss"][-1])
assert np.isfinite(hist["train_loss"][-1])

# analyzer restore + detection (public dict API)
import glob
ckpt = sorted([p for p in glob.glob("ckpts/*") if not p.endswith(".meta.json")], key=os.path.getmtime)[-1]
from sct_gan_tpu.infer.analyzer import SmartContractAnalyzer
an = SmartContractAnalyzer(model_path=ckpt, use_gan=True, tokenizer=tok,
                           model_config=cfg, verbose=False)
code = "contract T { function w() public { msg.sender.call{value: 1}(\"\"); } }"
res = an.detect_vulnerabilities(code)
print("detect keys:", sorted(res.keys())[:6])

# generation through the fixed padded cache path
gens = an.generate_synthetic_contract("contract T { }", max_length=32,
                                      temperature=0.8)
print("generated:", len(gens), "contract(s), len0:", len(gens[0]))

# probes: garbage labels + empty source + long contract + unseen ids
import csv
with open("bad.csv", "w", newline="") as f:
    w = csv.writer(f); w.writerow(["source_code", "ARTHM_lines", "DOS_lines"])
    w.writerow(["contract A { }", "not a list", "[99999]"])
    w.writerow(["", "[1]", "[]"])
t2, v2 = create_dataloaders("bad.csv", tok, batch_size=2, max_length=64)
b2 = next(iter(t2)); print("garbage-label batch ok:", b2["input_ids"].shape)
long_code = "contract L {" + " uint x;" * 5000 + "}"
r2 = an.detect_vulnerabilities(long_code)
print("long contract ok:", "error" not in r2)
print("unk decode:", tok.decode([tok.vocab_size - 1, 10**6 % tok.vocab_size])[:20])
print("VERIFY OK")
