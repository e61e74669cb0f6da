"""A/B: XLA dot_product_attention vs Pallas flash at the batched step shape.

r2 measured stock Pallas flash 2x SLOWER at B=1 (S=577).  The r3 B=16 trace
shows XLA's lowering materializing f32 (16,12,577,577) attention probs
(~255 MB/layer) plus K-transpose copies — ~10 ms of a 26 ms step.  This
script re-runs the comparison at the batched shapes, amortized inside one
jit (500-iteration fori_loop) to defeat the relay dispatch floor.

    python scripts/bench_attention_b16.py
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import argparse
    ap = argparse.ArgumentParser(); ap.add_argument("--batch", type=int, default=16)
    args_cli = ap.parse_args()
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    B, H, S, D = args_cli.batch, 12, 577, 64
    S_PAD = 640
    rng = np.random.default_rng(0)
    # Model-realistic layout: the encoder holds (B, S, H, D) activations
    # (jax.nn.dot_product_attention's native layout, zero extra transposes).
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)

    def xla_dpa(q, k, v):
        return jax.nn.dot_product_attention(q, k, v)

    def flash(q, k, v, block_q=128, block_kv=128):
        # Flash wants (B, H, S, D): pay the transposes + padding per call,
        # exactly as the integrated model would.
        def to_flash(t):
            t = t.transpose(0, 2, 1, 3)
            return jnp.pad(t, ((0, 0), (0, 0), (0, S_PAD - S), (0, 0)))

        qp, kp, vp = to_flash(q), to_flash(k), to_flash(v)
        from jax.experimental.pallas.ops.tpu.flash_attention import SegmentIds

        # real tokens share one segment id; pads get another -> real rows
        # never attend pads.  Padded q rows produce garbage we slice away.
        seg = (jnp.arange(S_PAD) < S).astype(jnp.int32)
        seg = jnp.broadcast_to(seg[None], (B, S_PAD))
        bs = BlockSizes(
            block_q=block_q, block_k_major=block_kv, block_k=block_kv,
            block_b=1,
            block_q_major_dkv=block_q, block_k_major_dkv=block_kv,
            block_k_dkv=block_kv, block_q_dkv=block_q,
            block_k_major_dq=block_kv, block_k_dq=block_kv,
            block_q_dq=block_q,
        )
        out = flash_attention(
            qp, kp, vp, segment_ids=SegmentIds(q=seg, kv=seg),
            sm_scale=1.0 / np.sqrt(D), block_sizes=bs,
        )
        return out[:, :, :S, :].transpose(0, 2, 1, 3)

    def loop(fn, n=200):
        @jax.jit
        def run(q, k, v):
            def body(_, carry):
                q, k, v = carry
                o = fn(q, k, v)
                # feed output back so iterations are dependent (no DCE)
                return (o, k, v)
            o, _, _ = jax.lax.fori_loop(0, n, body, (q, k, v))
            return o

        run(q, k, v)  # compile
        t0 = time.perf_counter()
        out = run(q, k, v)
        np.asarray(out[0, 0, :2, :2])  # host fetch fence
        return (time.perf_counter() - t0) / n * 1e3

    # correctness cross-check first (same math within bf16 tolerance)
    ref = np.asarray(jax.jit(xla_dpa)(q, k, v), np.float32)
    got = np.asarray(jax.jit(flash)(q, k, v), np.float32)
    err = np.abs(ref - got).max()
    print(f"max |xla - flash| = {err:.4f}")

    t_xla = loop(xla_dpa)
    print(f"xla_dpa:   {t_xla:.3f} ms per 12-head {B}x{S} attention")
    for bq, bkv in ((128, 128), (128, 640), (640, 128), (320, 320)):
        try:
            t_fl = loop(functools.partial(flash, block_q=bq, block_kv=bkv))
            print(f"flash q{bq}/kv{bkv}: {t_fl:.3f} ms  ({t_xla/t_fl:.2f}x)")
        except Exception as e:
            print(f"flash q{bq}/kv{bkv}: FAILED {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
