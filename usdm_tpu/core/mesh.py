"""Device mesh and sharding helpers.

The reference's distribution story is NCCL via DDP/DeepSpeed/accelerate
(/root/reference/src/decoder/scripts/train.py:49, configs/ds_config_zero3_bf16.json).
On TPU, parallelism is declarative: build a `jax.sharding.Mesh` over the slice,
annotate arrays with `NamedSharding`, and let XLA emit collectives over ICI.

Axis conventions used across the framework:
  "data"  : data parallel; FSDP shards params/optimizer state here (ZeRO-3 ≙)
  "model" : tensor parallel; attention heads / MLP hidden are sharded here
"""

from __future__ import annotations

import contextlib

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
REPLICA_AXIS = "replica"  # multi-slice pods: plain DP across slices over DCN


def create_mesh(dp: int = -1, tp: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh.  dp=-1 means 'all remaining devices'."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp == -1:
        assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != devices({n})"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    return create_mesh(dp=1, tp=1, devices=jax.devices()[:1])


def create_dcn_mesh(num_slices: int, dp: int = -1, tp: int = 1,
                    devices=None) -> Mesh:
    """Build a (replica, data, model) mesh for a multi-slice pod.

    The reference scales past one node with accelerate's multi-machine NCCL
    launch (/root/reference/src/README.md:25-31; 64 nodes for pre-training,
    src/README.md:66).  The TPU equivalent is hierarchical: collectives over
    the `replica` axis cross slices on DCN, so only the cheap per-step grad
    all-reduce rides it — FSDP's per-layer param all-gathers stay on `data`
    (ICI, within a slice).  Batches shard over (replica, data); params keep
    their (data, model) specs and are replicated across slices (the unnamed
    axis), which is exactly DP-across-slices + ZeRO-within-slice.

    On real multi-slice hardware the device order comes from
    `mesh_utils.create_hybrid_device_mesh` (ICI-contiguous inner axes);
    elsewhere (virtual CPU meshes, single slice) `jax.devices()` is
    process-ordered, so reshaping puts the process/DCN boundary on the outer
    axis — the same topology the 4-process smoke test exercises.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    assert n % num_slices == 0, f"{n} devices not divisible by {num_slices} slices"
    per_slice = n // num_slices
    if dp == -1:
        assert per_slice % tp == 0
        dp = per_slice // tp
    assert num_slices * dp * tp == n, (num_slices, dp, tp, n)
    if any(getattr(d, "slice_index", None) not in (None, 0) for d in devices):
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            (1, dp, tp), (num_slices, 1, 1), devices=devices)
    else:
        arr = np.asarray(devices).reshape(num_slices, dp, tp)
    return Mesh(arr, (REPLICA_AXIS, DATA_AXIS, MODEL_AXIS))


def sharding(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Shard every leaf's leading dim over the data axis."""

    def _one(x):
        spec = P(DATA_AXIS, *([None] * (x.ndim - 1))) if hasattr(x, "ndim") and x.ndim >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(_one, batch)


def logical_to_sharding(mesh: Mesh, logical: Any) -> Any:
    """Map a pytree of PartitionSpecs to NamedShardings over `mesh`."""
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec),
        logical,
        is_leaf=lambda x: isinstance(x, P),
    )


def param_count(params: Any) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


@contextlib.contextmanager
def use_mesh(mesh: Mesh):
    with jax.sharding.use_mesh(mesh):
        yield
