"""Inference-stack tests: KV-cached decode parity vs teacher-forced decode,
generation loop, beam search, and the Analyzer API surface."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sct_gan_tpu.config import ModelConfig
from sct_gan_tpu.data.tokenizer import SolidityTokenizer
from sct_gan_tpu.infer import SmartContractAnalyzer, make_beam_search_fn, \
    make_generate_fn
from sct_gan_tpu.infer.generate import _init_caches
from sct_gan_tpu.losses.syntax import SyntaxLossTables
from sct_gan_tpu.models.sct_transformer import SmartContractTransformer

CFG = ModelConfig(d_model=32, nhead=2, num_encoder_layers=1,
                  num_decoder_layers=2, dim_feedforward=64, dropout=0.1,
                  max_length=48, max_lines=48, vocab_size=256,
                  use_gan=True, compute_dtype="float32",
                  use_flash_attention=False)


@pytest.fixture(scope="module")
def model_and_params():
    model = SmartContractTransformer(CFG)
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, CFG.max_length), jnp.int32)
    params = model.init({"params": rng}, dummy, jnp.ones_like(dummy), dummy,
                        jnp.ones_like(dummy), target_ids=dummy,
                        token_to_line=dummy, deterministic=True)["params"]
    return model, params


def test_kv_cached_decode_matches_teacher_forced(model_and_params):
    """Step-by-step KV-cached decode must reproduce the full teacher-forced
    decoder logits position by position."""
    model, params = model_and_params
    rng = np.random.default_rng(0)
    b, s = 2, CFG.max_length
    input_ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (b, s)), jnp.int32)
    mask = jnp.ones((b, s), jnp.int32)
    target = jnp.asarray(rng.integers(0, CFG.vocab_size, (b, s)), jnp.int32)

    memory = model.apply({"params": params}, input_ids, mask,
                         method=model.encode)
    full_logits = model.apply({"params": params}, target, memory,
                              mask.astype(bool),
                              method=model.decode_teacher_forced)

    cross_kvs = model.apply({"params": params}, memory,
                            method=model.precompute_cross_kv)
    caches = _init_caches(CFG, b, dtype=memory.dtype)
    step_logits = []
    for pos in range(8):
        lg, caches = model.apply(
            {"params": params}, target[:, pos:pos + 1], jnp.int32(pos),
            caches, cross_kvs, mask.astype(bool), method=model.decode_step)
        step_logits.append(np.asarray(lg))
    step_logits = np.stack(step_logits, axis=1)    # (B, 8, V)
    np.testing.assert_allclose(step_logits, np.asarray(full_logits[:, :8]),
                               rtol=2e-4, atol=2e-4)


def test_generate_fn_shapes_and_stop(model_and_params):
    model, params = model_and_params
    tok = SolidityTokenizer(vocab_size=CFG.vocab_size)
    tables = SyntaxLossTables.from_tokenizer(tok)
    gen = make_generate_fn(model, tables, min_length=4, max_length=16)
    b = 2
    memory = jnp.zeros((b, CFG.max_length, CFG.d_model))
    src_mask = jnp.ones((b, CFG.max_length), bool)
    tokens = np.asarray(gen(params, memory, src_mask, jax.random.PRNGKey(0),
                            0.8))
    assert tokens.shape == (b, 16)
    assert (tokens[:, 0] == 1).all()          # BOS start
    assert tokens.dtype == np.int32


def test_generate_chunked_cache_matches_full(model_and_params):
    """cache_chunk sub-loops must produce bit-identical tokens to the single
    full-width loop: each step performs the same masked attention and draws
    from the same rng stream regardless of chunk boundaries."""
    model, params = model_and_params
    tok = SolidityTokenizer(vocab_size=CFG.vocab_size)
    tables = SyntaxLossTables.from_tokenizer(tok)
    b = 2
    rng = np.random.default_rng(7)
    memory = jnp.asarray(rng.normal(0, 1, (b, CFG.max_length, CFG.d_model)),
                         jnp.float32)
    src_mask = jnp.ones((b, CFG.max_length), bool)
    kw = dict(min_length=4, max_length=CFG.max_length)
    full = make_generate_fn(model, tables, cache_chunk=None, **kw)
    chunked = make_generate_fn(model, tables, cache_chunk=16, **kw)
    ragged = make_generate_fn(model, tables, cache_chunk=13, **kw)
    key = jax.random.PRNGKey(3)
    want = np.asarray(full(params, memory, src_mask, key, 0.8))
    np.testing.assert_array_equal(
        np.asarray(chunked(params, memory, src_mask, key, 0.8)), want)
    np.testing.assert_array_equal(
        np.asarray(ragged(params, memory, src_mask, key, 0.8)), want)


def test_beam_search_runs(model_and_params):
    model, params = model_and_params
    beam = make_beam_search_fn(model, beam_size=2, max_length=12)
    b = 2
    ids = jnp.ones((b, CFG.max_length), jnp.int32)
    mask = jnp.ones((b, CFG.max_length), jnp.int32)
    out = beam(params, ids, mask, ids, mask, 1.0)
    seq = np.asarray(out["generated_sequence"])
    assert seq.shape == (b, 12)
    assert (seq[:, 0] == 1).all()
    assert np.asarray(out["encoder_output"]).shape == (b, CFG.d_model)


@pytest.fixture(scope="module")
def analyzer():
    tok = SolidityTokenizer(vocab_size=CFG.vocab_size)
    return SmartContractAnalyzer(model_config=CFG, tokenizer=tok,
                                 batch_size=2, verbose=False)


SAMPLE = """pragma solidity ^0.8.0;
contract Wallet {
    mapping(address => uint) public balances;
    function withdraw(uint amount) public {
        require(balances[msg.sender] >= amount);
        (bool ok, ) = msg.sender.call{value: amount}("");
        balances[msg.sender] -= amount;
    }
}"""


def test_detect_vulnerabilities_contract_dict(analyzer):
    res = analyzer.detect_vulnerabilities(SAMPLE, threshold=0.5)
    assert set(res) == {"contract_vulnerabilities", "line_vulnerabilities",
                        "contract_probabilities", "line_probabilities"}
    assert set(res["contract_vulnerabilities"]) == set(
        analyzer.vulnerability_types)
    n_lines = len(SAMPLE.split("\n"))
    assert set(res["line_vulnerabilities"]) == set(range(n_lines))
    for d in res["line_vulnerabilities"].values():
        assert set(d) == set(analyzer.vulnerability_types)
        assert all(isinstance(v, bool) for v in d.values())
    assert len(res["contract_probabilities"][0]) == 8


def test_line_fusion_max_over_valid_lines(analyzer):
    """contract_probabilities with line_fusion (default) equal
    max(head_prob, max over real-line slots of line probs, excluding the
    exact-0.5 empty/pad marker); line_fusion=False returns the head alone."""
    import numpy as np

    tok = analyzer.tokenizer
    plain = SmartContractAnalyzer(model_config=CFG, tokenizer=tok,
                                  params=analyzer.params, batch_size=2,
                                  verbose=False, line_fusion=False)
    fused = analyzer.detect_vulnerabilities(SAMPLE, threshold=0.5)
    head = plain.detect_vulnerabilities(SAMPLE, threshold=0.5)
    n_lines = len(SAMPLE.split("\n"))
    lp = np.asarray(head["line_probabilities"][0])[:n_lines]
    informative = np.where(lp != 0.5, lp, 0.0)
    want = np.maximum(np.asarray(head["contract_probabilities"][0]),
                      informative.max(axis=0))
    np.testing.assert_allclose(
        np.asarray(fused["contract_probabilities"][0]), want,
        rtol=1e-6, atol=1e-7)
    # line outputs are untouched by fusion
    np.testing.assert_array_equal(
        np.asarray(fused["line_probabilities"]),
        np.asarray(head["line_probabilities"]))


def test_detect_safe_and_fallback(analyzer):
    safe = analyzer.detect_vulnerabilities_safe(SAMPLE)
    assert not any(v for line in safe["line_vulnerabilities"].values()
                   for v in line.values())
    fb = analyzer.detect_vulnerabilities_with_fallback(SAMPLE)
    assert set(fb["contract_vulnerabilities"]) == set(
        analyzer.vulnerability_types)


def test_no_decoder_fallback_tier_matches_full(analyzer):
    """The middle fallback tier (retry without target_ids,
    inference.py:228-245) must agree with the full forward on both heads —
    the decoder does not feed the vulnerability heads."""
    import numpy as np

    batch = analyzer._prepare_inputs([SAMPLE])
    cp_full, lp_full = jax.device_get(
        analyzer._detect_fn(analyzer.params, batch))
    cp_nd, lp_nd = jax.device_get(
        analyzer._no_decoder_fn(analyzer.params, batch))
    np.testing.assert_allclose(np.asarray(cp_nd), np.asarray(cp_full),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lp_nd), np.asarray(lp_full),
                               rtol=1e-5, atol=1e-6)


def test_analyze_multiple_contracts_dp_sharded(analyzer):
    """A dp=8 mesh analyzer must produce the same results as the unsharded
    one — GSPMD sharding the batch axis is numerically inert."""
    from sct_gan_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(dp=8, mp=1)
    tok = SolidityTokenizer(vocab_size=CFG.vocab_size)
    sharded = SmartContractAnalyzer(model_config=CFG, tokenizer=tok,
                                    params=analyzer.params, batch_size=1,
                                    verbose=False, mesh=mesh)
    assert sharded._dp == 8
    codes = [SAMPLE.replace("Wallet", f"C{i}") for i in range(11)]
    got = sharded.analyze_multiple_contracts(codes, threshold=0.5)
    want = analyzer.analyze_multiple_contracts(codes, threshold=0.5)
    assert len(got) == len(want) == 11
    for g, w in zip(got, want):
        assert g["contract_index"] == w["contract_index"]
        assert g["contract_vulnerabilities"] == w["contract_vulnerabilities"]
        np.testing.assert_allclose(np.asarray(g["contract_probabilities"]),
                                   np.asarray(w["contract_probabilities"]),
                                   rtol=1e-5, atol=1e-6)


def test_analyze_multiple_contracts_batched(analyzer):
    codes = [SAMPLE, SAMPLE.replace("Wallet", "Bank"),
             SAMPLE.replace("Wallet", "Vault")]
    results = analyzer.analyze_multiple_contracts(codes, threshold=0.5)
    assert len(results) == 3
    assert [r["contract_index"] for r in results] == [0, 1, 2]
    # batched path must agree with the single-contract path
    single = analyzer.detect_vulnerabilities(codes[1], threshold=0.5)
    assert (results[1]["contract_vulnerabilities"]
            == single["contract_vulnerabilities"])
    summary = analyzer.get_vulnerability_summary(results)
    assert summary["total_contracts"] == 3


def test_generate_synthetic_contract(analyzer):
    outs = analyzer.generate_synthetic_contract(SAMPLE, num_contracts=2,
                                                temperature=0.8)
    assert len(outs) == 2
    assert all(isinstance(o, str) and len(o) > 0 for o in outs)


def test_generate_batched_rows_independent(analyzer):
    """num_contracts decode as one batch; rows draw independent samples
    (not N copies of one sequence)."""
    outs = analyzer.generate_synthetic_contract(SAMPLE, num_contracts=3,
                                                temperature=1.0)
    assert len(outs) == 3
    assert all(isinstance(o, str) and len(o) > 0 for o in outs)
    # at T=1.0 on an untrained tiny model, 3 identical sequences would mean
    # the batch shared one draw
    assert len(set(outs)) > 1


def test_template_based_generation(analyzer):
    out = analyzer.generate_template_based_contract(SAMPLE)
    assert out.startswith("// Generated contract based on template")
    assert "contract" in out


def test_diagnostics(analyzer):
    func = analyzer.test_model_functionality()
    assert func["success"]
    assert func["contract_logits_shape"] == (1, 8)
    diag = analyzer.diagnose_generation_model()
    assert "output_weight_std" in diag
    assert len(diag["first_step_top_tokens"]) == 5


def test_debug_forward_intermediates(analyzer):
    stats = analyzer.debug_forward(SAMPLE)
    names = set(stats)
    assert any("line_means" in n for n in names)
    assert any("line_logits" in n for n in names)
    for s in stats.values():
        assert set(s) >= {"mean", "std", "min", "max", "collapsed"}


def test_penalize_repetition_semantics():
    """CTRL-style penalty: previous token's positive logit divided,
    negative multiplied; everything else untouched."""
    from sct_gan_tpu.ops.sampling import penalize_repetition
    logits = jnp.asarray([[2.0, -1.0, 0.5], [3.0, -2.0, 1.0]])
    prev = jnp.asarray([0, 1])
    out = np.asarray(penalize_repetition(logits, prev, penalty=2.0))
    np.testing.assert_allclose(out[0], [1.0, -1.0, 0.5])
    np.testing.assert_allclose(out[1], [3.0, -4.0, 1.0])


def test_generate_repetition_penalty_is_wired(model_and_params):
    """Same seed, penalty on vs off must change the sampled stream (the
    parameter used to be silently ignored)."""
    model, params = model_and_params
    kw = dict(min_length=4, max_length=32, top_k=0, top_p=1.0,
              apply_syntax_constraints=False)
    memory = jnp.zeros((1, CFG.max_length, CFG.d_model))
    src_mask = jnp.ones((1, CFG.max_length), bool)
    rng = jax.random.PRNGKey(7)
    # near-greedy: the plain stream argmax-repeats; a strong penalty must
    # knock the repeated token off the argmax and change the stream
    base = np.asarray(make_generate_fn(model, **kw)(
        params, memory, src_mask, rng, 1e-4))
    pen = np.asarray(make_generate_fn(model, repetition_penalty=10.0, **kw)(
        params, memory, src_mask, rng, 1e-4))
    assert not np.array_equal(base, pen)


def test_beam_search_matches_numpy_oracle(model_and_params):
    """The batched fori_loop beam search must reproduce a straightforward
    per-hypothesis NumPy beam oracle exactly: same expansion (top-k over
    score + log-prob), same EOS freezing (finished rows continue only with
    PAD at log-prob 0), same winner. The oracle calls the same decode_step
    per hypothesis WITHOUT the batched cache-reindex machinery, so any
    gather/reindex bug in make_beam_search_fn diverges the sequences."""
    model, params = model_and_params
    kk, max_len = 3, 10
    rng = np.random.default_rng(7)
    b, s = 2, CFG.max_length
    input_ids = jnp.asarray(rng.integers(2, CFG.vocab_size, (b, s)),
                            jnp.int32)
    mask = jnp.ones((b, s), jnp.int32)

    beam = make_beam_search_fn(model, beam_size=kk, max_length=max_len)
    got = np.asarray(beam(params, input_ids, mask, input_ids, mask,
                          1.0)["generated_sequence"])

    # -- NumPy oracle ------------------------------------------------------
    memory, src_mask = model.apply(
        {"params": params}, input_ids, mask, input_ids, mask,
        method=model.encode_concat)
    cross_all = model.apply({"params": params}, memory,
                            method=model.precompute_cross_kv)

    def step(prefix, row):
        """Decode the full prefix for ONE hypothesis of batch row `row`
        without caches: re-run decode_step from scratch (cache correctness
        is covered by test_kv_cached_decode_matches_teacher_forced)."""
        caches = _init_caches(CFG, 1, dtype=memory.dtype)
        cross = jax.tree_util.tree_map(lambda x: x[row:row + 1], cross_all)
        sm = src_mask[row:row + 1]
        for pos, t in enumerate(prefix):
            lg, caches = model.apply(
                {"params": params},
                jnp.full((1, 1), t, jnp.int32), jnp.int32(pos),
                caches, cross, sm, method=model.decode_step)
        return np.asarray(jax.nn.log_softmax(lg[0].astype(jnp.float32)))

    want = []
    for row in range(b):
        beams = [([1], 0.0, False)]            # (tokens, score, finished)
        for pos in range(max_len - 1):
            cands = []
            for tokens, score, fin in beams:
                if fin:
                    cands.append((tokens + [0], score, True))
                    continue
                lp = step(tokens, row)
                top = np.argsort(-lp)[:kk]
                for t in top:
                    cands.append((tokens + [int(t)], score + float(lp[t]),
                                  t == 2))
            cands.sort(key=lambda x: -x[1])
            beams = cands[:kk]
        want.append(beams[0][0])
    want = np.array([w + [0] * (max_len - len(w)) for w in want])
    np.testing.assert_array_equal(got, want)
