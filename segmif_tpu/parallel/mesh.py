"""Device mesh + sharding layer.

The reference has zero working distribution (NCCL args exist but
init_process_group is commented out — /root/reference/train.py:39,119,271).
Here parallelism is first-class and TPU-native: a ('data', 'model') mesh,
batch sharded over 'data' (pure DP rides ICI all-reduce on gradients),
and optional tensor parallelism over 'model' realized with GSPMD sharding
constraints on the big Dense kernels (XLA inserts the collectives).

Everything is expressed with jax.sharding + jit; no hand-written
collectives are needed for DP/TP at this model scale.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(data: int = -1, model: int = 1,
              devices: Optional[list] = None) -> Mesh:
    """Create a ('data', 'model') mesh. data=-1 uses all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model <= n, (data, model, n)
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _tp_spec_for(path_keys, shape) -> P:
    """Tensor-parallel PartitionSpec for a param, by name + shape heuristics.

    Shards the output dim of q/kv/fc1/channel-proj kernels and the input dim
    of proj/fc2/end-proj kernels over 'model' — the Megatron-style split that
    needs a single all-reduce per block. Only applies when the dim divides
    evenly; everything else is replicated.
    """
    joined = "/".join(path_keys)
    # rank-2 (Dense) kernels only: the name heuristic must not catch conv
    # kernels that share a module name (e.g. the patch-embed 'proj' convs —
    # sharding their cin dim is GSPMD-legal but buys only resharding churn)
    if not joined.endswith("kernel") or len(shape) != 2:
        return P()
    name = path_keys[-2] if len(path_keys) >= 2 else ""
    col_split = name in ("q", "kv", "fc1", "channel_proj1", "channel_proj2",
                         "channel_proj3", "kv_seg", "kv1", "kv2")
    row_split = name in ("proj", "fc2", "end_proj1", "end_proj2")
    if col_split:
        spec = [None] * len(shape)
        spec[-1] = MODEL_AXIS
        return P(*spec)
    if row_split:
        spec = [None] * len(shape)
        spec[-2] = MODEL_AXIS
        return P(*spec)
    return P()


def param_shardings(mesh: Mesh, params: Any, tensor_parallel: bool = False):
    """NamedSharding tree for a param pytree. Replicated unless
    tensor_parallel and the mesh has a nontrivial 'model' axis."""
    tp = tensor_parallel and mesh.shape[MODEL_AXIS] > 1

    def one(path, leaf):
        if not tp:
            return NamedSharding(mesh, P())
        keys = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
        spec = _tp_spec_for(keys, leaf.shape)
        # only shard if divisible
        for dim, axis in enumerate(spec):
            if axis is not None and leaf.shape[dim] % mesh.shape[MODEL_AXIS] != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def put_batch(mesh: Mesh, batch: Any) -> Any:
    """Device_put a host batch with the batch axis sharded over 'data'
    (replicated fallback when the batch doesn't divide the data axis)."""
    sh = batch_sharding(mesh)
    rep = replicated(mesh)
    nd = mesh.shape[DATA_AXIS]

    def put(x):
        ok = x.ndim >= 1 and x.shape[0] % nd == 0
        return jax.device_put(x, sh if ok else rep)

    return jax.tree.map(put, batch)


def put_batch_chunk(mesh: Mesh, raws: Any) -> Any:
    """Device_put a STACKED chunk of raw batches ([K, B, ...] leaves) with
    the batch axis (axis 1) sharded over 'data' — the chunked train loop's
    staging transfer (one host->device copy per K iterations)."""
    nd = mesh.shape[DATA_AXIS]
    rep = replicated(mesh)

    def put(x):
        if x.ndim >= 2 and x.shape[1] % nd == 0:
            spec = [None] * x.ndim
            spec[1] = DATA_AXIS
            return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return jax.device_put(x, rep)

    return jax.tree.map(put, raws)


def put_replicated(mesh: Mesh, tree: Any) -> Any:
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
