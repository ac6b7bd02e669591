"""track_repetition break semantics on a stub decoder that always emits the
same token — the deterministic way to force the reference's runaway-
repetition condition (inference.py:1162-1185)."""
import jax
import jax.numpy as jnp
import numpy as np

from sct_gan_tpu.config import ModelConfig
from sct_gan_tpu.infer import make_generate_fn
from sct_gan_tpu.models.sct_transformer import SmartContractTransformer

CFG = ModelConfig(d_model=32, nhead=2, num_encoder_layers=1,
                  num_decoder_layers=1, dim_feedforward=64, dropout=0.0,
                  max_length=64, max_lines=64, vocab_size=256,
                  use_gan=False, compute_dtype="float32",
                  use_flash_attention=False)

REPEAT_TOKEN = 5


class _AlwaysSameToken(SmartContractTransformer):
    """decode_step stub: logits pinned to one token, every step."""

    def decode_step(self, token_ids, pos, caches, cross_kvs, src_mask):
        b = token_ids.shape[0]
        logits = jnp.full((b, self.config.vocab_size), -30.0)
        logits = logits.at[:, REPEAT_TOKEN].set(30.0)
        return logits, caches


def _setup():
    model = _AlwaysSameToken(CFG)
    dummy = jnp.zeros((1, CFG.max_length), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, dummy,
                        jnp.ones_like(dummy), dummy, jnp.ones_like(dummy),
                        target_ids=dummy, token_to_line=dummy,
                        deterministic=True)["params"]
    memory = jnp.zeros((1, CFG.max_length, CFG.d_model))
    src_mask = jnp.ones((1, CFG.max_length), bool)
    return model, params, memory, src_mask


def test_plain_sampler_runs_to_max_length():
    model, params, memory, src_mask = _setup()
    gen = make_generate_fn(model, min_length=60, max_length=64, top_k=0,
                           top_p=1.0, apply_syntax_constraints=False)
    toks = np.asarray(gen(params, memory, src_mask, jax.random.PRNGKey(1),
                          0.5))[0]
    assert (toks[1:] == REPEAT_TOKEN).all()   # repeats forever, no stop


def test_track_repetition_stops_runaway_row():
    """rep_count exceeds break_after=8 -> the row is finished and the rest
    of the buffer stays PAD (reference: `if consecutive_same_tokens > 8:
    break`, inference.py:1184-1185). noise_after is pushed past break_after
    so the break is tested in isolation."""
    model, params, memory, src_mask = _setup()
    gen = make_generate_fn(model, min_length=60, max_length=64, top_k=0,
                           top_p=1.0, apply_syntax_constraints=False,
                           track_repetition=True, break_after=8,
                           noise_after=100)
    toks = np.asarray(gen(params, memory, src_mask, jax.random.PRNGKey(1),
                          0.5))[0]
    run = (toks == REPEAT_TOKEN).sum()
    # first emit (count 0) + 9 more drive rep_count to 9 > 8 -> stop
    assert run == 10, toks[:16]
    assert (toks[run + 1:] == 0).all()        # finished rows emit PAD


def test_noise_injection_diversifies_repeats():
    """After noise_after consecutive repeats the sampling distribution gets
    uniform(0, 0.2) noise over the whole vocab and renormalizes
    (inference.py:1162-1166) — with vocab-many noise mass the repeated
    token loses dominance and the stream diversifies instead of breaking."""
    model, params, memory, src_mask = _setup()
    gen = make_generate_fn(model, min_length=60, max_length=64, top_k=0,
                           top_p=1.0, apply_syntax_constraints=False,
                           track_repetition=True)   # noise_after=3 default
    toks = np.asarray(gen(params, memory, src_mask, jax.random.PRNGKey(1),
                          0.5))[0]
    other = (toks[1:] != REPEAT_TOKEN) & (toks[1:] != 0)
    assert other.sum() >= 3, toks[:20]
    # and no run of the repeat token ever exceeds noise_after+break_after
    runs, cur = [], 0
    for t in toks[1:]:
        cur = cur + 1 if t == REPEAT_TOKEN else 0
        runs.append(cur)
    assert max(runs) <= 12, max(runs)
