"""Syntax-aware generation loss.

Behavioral parity with SoliditySyntaxLoss (SCT-GAN/train.py:247-431):
cross-entropy over vocab logits plus a syntax penalty scanned over the
*target* token stream — keyword-follower violations (+2.0), missing
semicolons after return/break/continue (+1.5), unbalanced parentheses within
a 19-token lookahead (+1.0) and braces within a 49-token lookahead (+1.0);
the penalty is the *average over violations* (total/count, train.py:423-427).

The reference scans bigrams in a Python double loop per batch
(train.py:378-421). Here the keyword/follower id tables are precomputed once
on the host (``SyntaxLossTables``) and the scan is a handful of vectorized
comparisons + two prefix-sum window checks — one fused XLA kernel, no
recompilation across batches.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

KEYWORD_FOLLOWERS: Dict[str, List[str]] = {
    "function": ["(", "view", "pure", "external", "public", "internal", "private"],
    "contract": ["{", "is", "interface"],
    "if": ["("],
    "for": ["("],
    "while": ["("],
    "require": ["("],
    "assert": ["("],
    "revert": ["("],
    "emit": ["("],
    "return": [";", "("],
    "break": [";"],
    "continue": [";"],
    "import": ['"', "'"],
    "pragma": ["solidity"],
    "struct": ["{"],
    "enum": ["{"],
    "event": ["("],
    "modifier": ["{", "("],
    "mapping": ["("],
}

_PAREN_WINDOW = 19   # range(i+1, min(i+20, S)) → 19 tokens (train.py:403)
_BRACE_WINDOW = 49   # range(i+1, min(i+50, S)) → 49 tokens (train.py:415)


@dataclass(frozen=True)
class SyntaxLossTables:
    """Host-precomputed token-id tables (train.py:260-312)."""

    keyword_ids: Tuple[int, ...]
    follower_ids: Tuple[Tuple[int, ...], ...]   # per keyword, same order
    semicolon_id: int
    open_paren_id: int
    close_paren_id: int
    open_brace_id: int
    close_brace_id: int
    return_id: int
    break_id: int
    continue_id: int

    @classmethod
    def from_tokenizer(cls, tokenizer) -> "SyntaxLossTables":
        unk = getattr(tokenizer, "unk_token_id", None)

        def tid(tok):
            i = tokenizer.convert_tokens_to_ids(tok)
            return -1 if i is None or i == unk else int(i)

        kws, fols = [], []
        for kw, followers in KEYWORD_FOLLOWERS.items():
            k = tid(kw)
            if k < 0:
                continue
            f = tuple(x for x in (tid(t) for t in followers) if x >= 0)
            if f:
                kws.append(k)
                fols.append(f)
        return cls(
            keyword_ids=tuple(kws), follower_ids=tuple(fols),
            semicolon_id=tid(";"), open_paren_id=tid("("),
            close_paren_id=tid(")"), open_brace_id=tid("{"),
            close_brace_id=tid("}"), return_id=tid("return"),
            break_id=tid("break"), continue_id=tid("continue"))


def cross_entropy_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                       row_mask=None) -> jnp.ndarray:
    """Mean token cross-entropy. Parity with F.cross_entropy(..., mean)
    over all positions — the reference does NOT ignore padding
    (train.py:324).

    nll_i = logsumexp(logits_i) − logits_i[target_i], computed WITHOUT
    reshaping or materializing an f32 (B·S, V) array: on a 50k vocab the
    reshape alone forces a 1.6 GB layout copy (profiled at ~18 ms/step) and
    log_softmax another full-size temp. Here the only (…, V)-sized pass is
    the f32 logsumexp reduction, fused by XLA over the bf16 logits.

    ``row_mask`` (B,) weighs batch rows (0 = static-padding row added by
    trainer._pad_to_dp — excluded so the mean matches an unpadded batch)."""
    lse = jax.scipy.special.logsumexp(logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(logits, targets[..., None],
                                 axis=-1)[..., 0].astype(jnp.float32)
    nll = lse - picked
    if row_mask is None:
        return nll.mean()
    m = row_mask.astype(jnp.float32)
    return ((nll * m[:, None]).sum()
            / jnp.maximum(m.sum() * nll.shape[1], 1.0))


def _window_has(token_match: jnp.ndarray, window: int) -> jnp.ndarray:
    """out[i] = any(token_match[i+1 : i+1+window]) via prefix sums, O(S)."""
    cs = jnp.cumsum(token_match.astype(jnp.int32), axis=-1)
    s = token_match.shape[-1]
    idx = jnp.arange(s)
    hi = jnp.minimum(idx + window, s - 1)
    cs_hi = jnp.take(cs, hi, axis=-1)
    cs_lo = cs  # cumulative through position i
    return (cs_hi - cs_lo) > 0


def syntax_penalty(target_ids: jnp.ndarray,
                   tables: SyntaxLossTables,
                   row_mask=None) -> jnp.ndarray:
    """Average violation penalty over the batch (train.py:334-427).

    ``row_mask`` (B,) excludes static-padding rows (trainer._pad_to_dp)
    from both the violation totals and the count."""
    t = target_ids.astype(jnp.int32)
    cur = t[:, :-1]
    nxt = t[:, 1:]
    w = (jnp.ones((t.shape[0], 1), jnp.float32) if row_mask is None
         else row_mask.astype(jnp.float32)[:, None])

    total = jnp.zeros((), dtype=jnp.float32)
    count = jnp.zeros((), dtype=jnp.float32)

    # Keyword-follower violations: +2.0 (unrolled over ~19 static keywords).
    for k, followers in zip(tables.keyword_ids, tables.follower_ids):
        match = cur == k
        ok = jnp.zeros_like(match)
        for f in followers:
            ok = ok | (nxt == f)
        viol = match & ~ok
        n = (viol.astype(jnp.float32) * w).sum()
        total = total + 2.0 * n
        count = count + n

    # Missing semicolon after return/break/continue: +1.5.
    stmt = ((cur == tables.return_id) | (cur == tables.break_id)
            | (cur == tables.continue_id))
    viol = stmt & (nxt != tables.semicolon_id)
    n = (viol.astype(jnp.float32) * w).sum()
    total = total + 1.5 * n
    count = count + n

    # Unbalanced parens/braces within the reference's lookahead windows.
    # The reference scans positions 0..S-2 (train.py:379); keep that range.
    scan = t[:, :-1]
    close_p = _window_has(t == tables.close_paren_id, _PAREN_WINDOW)[:, :-1]
    viol = (scan == tables.open_paren_id) & ~close_p
    n = (viol.astype(jnp.float32) * w).sum()
    total = total + 1.0 * n
    count = count + n

    close_b = _window_has(t == tables.close_brace_id, _BRACE_WINDOW)[:, :-1]
    viol = (scan == tables.open_brace_id) & ~close_b
    n = (viol.astype(jnp.float32) * w).sum()
    total = total + 1.0 * n
    count = count + n

    return jnp.where(count > 0, total / jnp.maximum(count, 1.0), 0.0)


def solidity_syntax_loss(logits: jnp.ndarray, target_ids: jnp.ndarray,
                         tables: SyntaxLossTables,
                         syntax_weight: float = 0.5,
                         row_mask=None):
    """CE + syntax_weight · penalty (train.py:314-332). Returns
    (total, ce, penalty) so the trainer can track the penalty separately."""
    ce = cross_entropy_loss(logits, target_ids, row_mask=row_mask)
    pen = syntax_penalty(target_ids, tables, row_mask=row_mask)
    return ce + syntax_weight * pen, ce, pen
