"""Parameter sharding rules (tensor parallelism for the Flax models).

Megatron-style TP over the ``model`` mesh axis: attention q/k/v kernels and
MLP fc1 shard their OUTPUT features; out_proj and fc2 shard their INPUT
features (so each pair needs one psum, which XLA inserts automatically from
these annotations).  Norms, embeddings, and small heads replicate.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tstar_tpu.parallel.mesh import MODEL_AXIS


def _rule_for(path: str, ndim: int) -> P:
    if ndim < 2:
        return P()  # biases, norms, 1-d embeddings
    if any(k in path for k in ("q_proj", "k_proj", "v_proj", "fc1", "gate_proj",
                               "up_proj", "qkv")):
        return P(None, MODEL_AXIS)            # (in, out) -> shard out
    if any(k in path for k in ("out_proj", "fc2", "o_proj", "down_proj",
                               "/proj/")):
        return P(MODEL_AXIS, None)            # (in, out) -> shard in
    if "lm_head" in path:
        return P(None, MODEL_AXIS)            # shard vocab
    if "embed_tokens" in path:
        return P(MODEL_AXIS, None)            # shard vocab rows
    return P()  # norms/embeddings/patch conv replicate: hidden dim stays
                # unsharded between blocks (Megatron-style TP)


def owlvit_param_shardings(mesh: Mesh, variables: Any) -> Any:
    """NamedSharding pytree matching the detector variables."""

    def assign(path, leaf):
        p = "/".join(str(k.key) if hasattr(k, "key") else str(k) for k in path)
        return NamedSharding(mesh, _rule_for(p, leaf.ndim))

    return jax.tree_util.tree_map_with_path(assign, variables)


def shard_variables(mesh: Mesh, variables: Any) -> Any:
    """Device-put the variables with TP shardings."""
    shardings = owlvit_param_shardings(mesh, variables)
    return jax.device_put(variables, shardings)
