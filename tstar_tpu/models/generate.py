"""Static-shape autoregressive generation for the Flax Qwen2-VL.

Replaces the reference's ``model.generate(...)`` torch call
(``TStar/interface_grounding.py:121-125``) with a TPU-friendly two-phase
scheme: one jitted PREFILL over the padded prompt fills the KV cache, then a
jitted ``lax.scan`` DECODE emits up to ``max_new_tokens`` tokens with a
per-sequence done-mask (EOS freezes further updates).  All shapes are static:
prompts pad to a bucket length, the cache is (B, max_len, kv_heads, head_dim)
per layer.

Sampling: temperature 0 -> greedy argmax; otherwise categorical over
logits / temperature with an explicit PRNG key (the reference relies on
torch's global RNG).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from tstar_tpu.models.qwen2vl import Qwen2VLConfig, Qwen2VLModel


def init_kv_cache(
    cfg: Qwen2VLConfig, batch: int, max_len: int, dtype=jnp.bfloat16
) -> List[Tuple[jax.Array, jax.Array]]:
    t = cfg.text
    shape = (batch, max_len, t.num_kv_heads, t.head_dim)
    return [
        (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
        for _ in range(t.num_layers)
    ]


# The zero KV caches are created INSIDE the jit (from the static max_len),
# so the prefill writes its K/V in place — no host-side allocation, no
# donation needed, no cache copy.
@functools.partial(jax.jit, static_argnums=(0, 6, 7, 8))
def prefill(
    model: Qwen2VLModel,
    variables,
    input_ids: jax.Array,       # (B, S_pad) right-padded prompts
    prompt_lens: jax.Array,     # (B,) true lengths
    position_ids: jax.Array,    # (3, B, S_pad)
    image_patches: Optional[jax.Array],   # (N, P, patch_dim) or None
    image_grid_hw: Optional[Tuple[int, int]],
    max_len: int,
    cache_dtype=jnp.bfloat16,
):
    """-> (next_token_logits (B, vocab), caches (filled to prompt_lens))."""
    caches = init_kv_cache(model.cfg, input_ids.shape[0], max_len, cache_dtype)

    def fwd(m: Qwen2VLModel):
        b, s = input_ids.shape
        image_embeds = None
        if image_patches is not None:
            enc = m.encode_images(image_patches, image_grid_hw)
            image_embeds = enc.reshape(-1, enc.shape[-1])
        hidden = m.embed(input_ids, image_embeds)

        neg = jnp.finfo(jnp.float32).min
        # Keys live in the cache (max_len slots); during prefill only the
        # causal prompt prefix is visible.
        col = jnp.arange(max_len)
        causal = (col[None, :] <= jnp.arange(s)[:, None])[None, None]   # (1,1,S,M)
        key_valid = (col[None] < prompt_lens[:, None])[:, None, None, :]
        bias = jnp.where(causal & key_valid, 0.0, neg)
        hidden, new_caches = m.decoder(
            hidden, position_ids, bias, caches, jnp.asarray(0)
        )
        last = hidden[jnp.arange(b), prompt_lens - 1]
        return m.logits(last[:, None])[:, 0], new_caches

    return model.apply(variables, method=lambda m: fwd(m))


def _decode_forward(
    model: Qwen2VLModel, variables, token, index, next_pos, key_valid, caches
):
    """One-token decoder forward -> (logits (B, vocab), caches)."""

    def fwd(m: Qwen2VLModel):
        hidden = m.embed(token[:, None], None)
        pos = jnp.broadcast_to(next_pos[None, :, None], (3, token.shape[0], 1))
        max_len = caches[0][0].shape[1]
        neg = jnp.finfo(jnp.float32).min
        ok = key_valid & (jnp.arange(max_len)[None] <= index)
        bias = jnp.where(ok[:, None, None, :], 0.0, neg)
        hidden, new_caches = m.decoder(hidden, pos, bias, caches, index)
        return m.logits(hidden)[:, 0], new_caches

    return model.apply(variables, method=lambda m: fwd(m))


@functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(6,))
def decode_step(
    model: Qwen2VLModel,
    variables,
    token: jax.Array,          # (B,) current input token
    index: jax.Array,          # scalar: cache slot to write
    next_pos: jax.Array,       # (B,) mrope position of this token
    key_valid: jax.Array,      # (B, max_len) slots that hold real K/V
    caches,
):
    """-> (logits (B, vocab), caches).  Single-step entry point (kept for
    callers that drive decoding themselves; ``generate`` uses the fused
    on-device loop below).

    DONATION CONTRACT: the input ``caches`` buffers are donated (in-place
    KV update on TPU) — after a call the passed-in cache pytree is dead and
    the caller MUST thread the RETURNED caches into the next step.  Reusing
    a pre-call cache (e.g. branching or rewinding a decode) raises a
    donated-buffer error; snapshot with ``jax.tree_util.tree_map(jnp.copy,
    caches)`` first if you need to fork."""
    return _decode_forward(model, variables, token, index, next_pos, key_valid, caches)


@functools.partial(
    jax.jit, static_argnums=(0, 2, 3), donate_argnums=(4,)
)
def _decode_loop(
    model: Qwen2VLModel,
    variables,
    max_new_tokens: int,
    greedy: bool,
    caches,
    token0: jax.Array,         # (B,) first sampled token (from prefill)
    done0: jax.Array,          # (B,)
    next_pos0: jax.Array,      # (B,)
    start_index: jax.Array,    # scalar: first cache slot to write
    key_valid: jax.Array,      # (B, max_len)
    eos: jax.Array,            # (E,)
    temperature: jax.Array,    # scalar (ignored when greedy)
    rng: jax.Array,
) -> jax.Array:
    """The whole decode phase as ONE device-side ``lax.while_loop``.

    One dispatch instead of max_new_tokens jit calls — per-call dispatch
    latency dominates short QA decodes on remote-attached devices — while
    keeping the host loop's early exit (the loop ends as soon as every
    sequence has emitted an EOS).  Loop-carried cache buffers update in
    place within the loop; the caches are also RETURNED (and the inputs
    donated) so XLA can alias the prefill cache into the loop instead of
    keeping a second live copy for the whole decode."""
    b = token0.shape[0]
    out0 = jnp.full((b, max_new_tokens), eos[0], jnp.int32)
    out0 = out0.at[:, 0].set(token0)

    def cond(carry):
        step, _, _, _, done, _, _ = carry
        return (step < max_new_tokens) & ~jnp.all(done)

    def body(carry):
        step, caches, token, next_pos, done, out, rng = carry
        logits, caches = _decode_forward(
            model, variables, token, start_index + step - 1, next_pos,
            key_valid, caches,
        )
        rng, key = jax.random.split(rng)
        if greedy:
            new_token = jnp.argmax(logits, -1).astype(jnp.int32)
        else:
            new_token = jax.random.categorical(
                key, logits / temperature, -1
            ).astype(jnp.int32)
        new_token = jnp.where(done, eos[0], new_token)
        done = done | jnp.isin(new_token, eos)
        out = out.at[:, step].set(new_token)
        return step + 1, caches, new_token, next_pos + 1, done, out, rng

    carry = (jnp.int32(1), caches, token0, next_pos0, done0, out0, rng)
    final = jax.lax.while_loop(cond, body, carry)
    return final[5], final[1]


def generate(
    model: Qwen2VLModel,
    variables,
    input_ids,                   # (B, S) right-padded int32
    prompt_lens,                 # (B,)
    position_ids,                # (3, B, S)
    max_new_tokens: int,
    eos_token_ids: Sequence[int],
    temperature: float = 0.0,
    rng: Optional[jax.Array] = None,
    image_patches=None,
    image_grid_hw: Optional[Tuple[int, int]] = None,
    cache_dtype=jnp.bfloat16,
) -> jax.Array:
    """-> generated tokens (B, max_new_tokens), EOS-padded after stop."""
    input_ids = jnp.asarray(input_ids, jnp.int32)
    prompt_lens = jnp.asarray(prompt_lens, jnp.int32)
    position_ids = jnp.asarray(position_ids, jnp.int32)
    b, s_pad = input_ids.shape
    max_len = s_pad + max_new_tokens
    if rng is None:
        rng = jax.random.key(0)
    eos = jnp.asarray(list(eos_token_ids), jnp.int32)

    logits, caches = prefill(
        model, variables, input_ids, prompt_lens, position_ids,
        image_patches, image_grid_hw, max_len, cache_dtype,
    )
    # Text positions continue from max(prompt positions) + 1 per sequence.
    seq_mask = jnp.arange(s_pad)[None] < prompt_lens[:, None]
    next_pos = jnp.max(
        jnp.where(seq_mask[None], position_ids, -1), axis=(0, 2)
    ) + 1  # (B,)

    def sample(logits, key):
        if temperature <= 0.0:
            return jnp.argmax(logits, -1).astype(jnp.int32)
        return jax.random.categorical(key, logits / temperature, -1).astype(jnp.int32)

    rng, key0 = jax.random.split(rng)
    token0 = sample(logits, key0)
    done0 = jnp.isin(token0, eos)

    if max_new_tokens == 1:
        return token0[:, None]

    # Cache slots holding real keys: the true prompt prefix plus every decode
    # slot (decode writes start at s_pad; padded prompt slots stay masked).
    slots = jnp.arange(max_len)[None]
    base_valid = (slots < prompt_lens[:, None]) | (slots >= s_pad)

    # Whole decode phase = ONE on-device while_loop dispatch with early exit
    # (greedy output identical to a per-step host loop; the sampling path's
    # key schedule is split-per-step rather than pre-split).
    out, _ = _decode_loop(
        model, variables, max_new_tokens, temperature <= 0.0,
        caches, token0, done0, next_pos, jnp.asarray(s_pad), base_valid,
        eos, jnp.float32(max(temperature, 1e-6)), rng,
    )
    return out
