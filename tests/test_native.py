"""Native C++ tokenizer: exact-id parity with the Python tokenizer and
speedup sanity."""
import time

import numpy as np
import pytest

from sct_gan_tpu.data.native_tokenizer import NativeSolidityTokenizer
from sct_gan_tpu.data.synthetic import generate_corpus
from sct_gan_tpu.data.tokenizer import SolidityTokenizer
from sct_gan_tpu.native.build import native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native toolchain unavailable")


@pytest.fixture(scope="module")
def pair():
    py = SolidityTokenizer()
    nat = NativeSolidityTokenizer()
    assert nat.native_active
    return py, nat


@pytest.fixture(scope="module")
def corpus():
    return [r["source_code"] for r in generate_corpus(n=12, seed=9)]


def test_encode_parity(pair, corpus):
    py, nat = pair
    for code in corpus:
        assert nat.encode(code) == py.encode(code)
        assert nat.encode(code, add_special_tokens=False) == py.encode(
            code, add_special_tokens=False)


def test_encode_parity_edge_cases(pair):
    py, nat = pair
    cases = [
        "", "\n\n\n", "  ", 'x = "multi\nline";',
        "a+=b; c==d; e!=f; g<=h; i>=j; k&&l; m||n; o=>p; q->r; s**t;",
        "0xDEADBEEF 123 1.5 _ident $dollar",
        'unterminated "string',
        "pragma solidity ^0.8.0;\ncontract T{uint256 v;}",
    ]
    for code in cases:
        assert nat.encode(code) == py.encode(code), repr(code)


def test_encode_with_lines_matches_per_line_recipe(pair, corpus):
    py, nat = pair
    for code in corpus:
        ids, lines = nat.encode_with_lines(code)
        exp_ids, exp_lines = [], []
        for li, line in enumerate(code.split("\n")):
            line_ids = py.encode(line, add_special_tokens=False)
            exp_ids.extend(line_ids)
            exp_lines.extend([li] * len(line_ids))
        assert ids.tolist() == exp_ids
        assert lines.tolist() == exp_lines


def test_build_token_to_line_native_matches_python(pair, corpus):
    from sct_gan_tpu.data.dataset import build_token_to_line
    py, nat = pair
    for code in corpus:
        a = build_token_to_line(code, py, 256)
        b = build_token_to_line(code, nat, 256)
        np.testing.assert_array_equal(a, b)


def test_native_is_faster(pair, corpus):
    py, nat = pair
    big = "\n".join(corpus) * 4
    t0 = time.perf_counter()
    for _ in range(3):
        py_ids = py.encode(big, add_special_tokens=False)
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        nat_ids = nat.encode(big, add_special_tokens=False)
    t_nat = time.perf_counter() - t0
    assert nat_ids == py_ids
    assert t_nat < t_py, (t_nat, t_py)
