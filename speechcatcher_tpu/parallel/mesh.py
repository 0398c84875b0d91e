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
    if len(devices) < n_devices:
        platform = getattr(devices[0], "platform", "?") if devices else "none"
        raise ValueError(
            f"make_mesh: requested {n_devices} devices, only {len(devices)} "
            f"available on platform {platform!r}. For a virtual CPU mesh "
            f"set XLA_FLAGS=--xla_force_host_platform_device_count="
            f"{n_devices} and JAX_PLATFORMS=cpu before any JAX backend "
            f"initializes."
        )
    devices = np.asarray(devices[:n_devices])
    assert n_devices % tp == 0, (n_devices, tp)
    return Mesh(devices.reshape(n_devices // tp, tp), ("dp", "tp"))


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Join the JAX distributed runtime for multi-host (DCN) operation.

    SURVEY §2.9: the collective layer is ICI (intra-pod, jax.lax
    collectives under pjit meshes) AND DCN (multi-host, via the JAX
    distributed runtime). Call this once per process before any other JAX
    API; afterwards ``jax.devices()`` returns the GLOBAL device list and
    meshes built from it ride DCN across hosts.

    Returns True if the runtime was initialized, False when no coordinator
    was given (single-host operation — a no-op, so entry points can pass
    their CLI flags through unconditionally).
    """
    if coordinator_address is None:
        return False
    if num_processes is None or process_id is None:
        raise ValueError(
            "--coordinator requires --num-processes and --process-id"
        )
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def hybrid_device_grid(devices, tp: int = 1) -> np.ndarray:
    """Arrange a (possibly multi-host) device list as a (dp, tp) grid.

    Layout rule: a tp group must never span hosts — tp traffic (psums on
    every row-parallel matmul) must ride ICI, while the dp axis carries no
    hot-path collectives and may span DCN. Devices are therefore grouped
    by ``process_index`` (host) first, tp-partners drawn within a host,
    and the dp axis enumerates host-major so consecutive dp rows stay
    host-local as far as possible.

    Pure function of the device list → unit-testable with fakes; used by
    make_hybrid_mesh on the real global device list.
    """
    by_proc: Dict[int, list] = {}
    for d in devices:
        by_proc.setdefault(int(getattr(d, "process_index", 0)), []).append(d)
    n_local = {len(v) for v in by_proc.values()}
    if len(n_local) != 1:
        raise ValueError(
            f"hosts expose unequal local device counts: "
            f"{ {k: len(v) for k, v in by_proc.items()} }"
        )
    n_local = n_local.pop()
    if n_local % tp != 0:
        raise ValueError(
            f"tp={tp} does not divide the per-host device count {n_local}; "
            "a tp group must not span hosts (its psums would ride DCN)"
        )
    rows = []
    for p in sorted(by_proc):
        local = by_proc[p]
        for i in range(0, n_local, tp):
            rows.append(local[i : i + tp])
    return np.array(rows, dtype=object)


def make_hybrid_mesh(tp: int = 1) -> Mesh:
    """Global (dp, tp) mesh over every process's devices (DCN-aware).

    Requires initialize_distributed() first on multi-host; on a single
    host it degenerates to make_mesh(tp=tp).
    """
    return Mesh(hybrid_device_grid(jax.devices(), tp), ("dp", "tp"))


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
