"""Device mesh + sharding rules (dp × tp) for training and batched serving.

The reference has no distributed stack (SURVEY §2.8-2.9: OS processes and a
replica pool). TPU-native scaling is declarative: build a Mesh, annotate
shardings, let XLA insert the collectives over ICI.

Axes:
- "dp" (data parallel): batch / stream-slot axis. The serving hot path is
  pure DP — no cross-chip traffic per tick.
- "tp" (tensor parallel): attention heads + FFN hidden dim + vocab logits,
  for XL models. Column-parallel first matmul, row-parallel second; XLA
  inserts the psum on the row-parallel output.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, tp: int = 1,
              devices=None) -> Mesh:
    """Mesh with shape (dp = n/tp, tp)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    assert n_devices % tp == 0, (n_devices, tp)
    return Mesh(devices.reshape(n_devices // tp, tp), ("dp", "tp"))


def _param_spec(path: str) -> P:
    """PartitionSpec for one parameter, keyed by its pytree path.

    torch-layout Linear weights are (out, in):
    - q/k/v projections + FFN w_1: column-parallel → shard OUT over tp
    - attention out-projection + FFN w_2: row-parallel → shard IN over tp
    - output_layer / ctc_lo: shard OUT (vocab) over tp
    - embeddings: shard vocab rows over tp
    - everything else (norms, convs, biases of row-parallel layers):
      replicated
    """
    is_weight = path.endswith("weight")
    if "linear_q" in path or "linear_k" in path or "linear_v" in path:
        return P("tp", None) if is_weight else P("tp")
    if "linear_out" in path:
        return P(None, "tp") if is_weight else P()
    if "w_1" in path:
        return P("tp", None) if is_weight else P("tp")
    if "w_2" in path:
        return P(None, "tp") if is_weight else P()
    if "linear_pos" in path:
        return P("tp", None) if is_weight else P("tp")
    if "output_layer" in path or "ctc_lo" in path:
        return P("tp", None) if is_weight else P("tp")
    if path.endswith("embed/weight"):  # token embedding (vocab, d)
        return P("tp", None)
    return P()


def _walk(tree: Any, prefix: str = "") -> Any:
    if isinstance(tree, dict):
        return {k: _walk(v, f"{prefix}/{k}") for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(_walk(v, f"{prefix}/{i}") for i, v in enumerate(tree))
    return _param_spec(prefix)


def param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec pytree matching a parameter pytree.

    Stacked layer arrays have a leading layer axis; the specs above apply to
    the per-layer dims, so prepend None for stacked leaves (detected by
    context: leaves under a "layers" subtree carry the extra axis).
    """

    def fix(path, spec_tree, param_tree):
        if isinstance(param_tree, dict):
            return {
                k: fix(f"{path}/{k}", spec_tree[k], param_tree[k])
                for k in param_tree
            }
        if isinstance(param_tree, (list, tuple)):
            return type(param_tree)(
                fix(f"{path}/{i}", s, p)
                for i, (s, p) in enumerate(zip(spec_tree, param_tree))
            )
        spec = spec_tree
        if "/layers/" in path:  # stacked: leading L axis is replicated
            spec = P(None, *spec)
        return spec

    raw = _walk(params)
    return fix("", raw, params)


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a parameter pytree onto the mesh per the tp rules."""
    specs = param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def batch_spec() -> P:
    return P("dp")


def shard_batch(tree: Any, mesh: Mesh) -> Any:
    """Shard arrays over dp on their leading (batch) axis."""
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("dp"))), tree
    )
