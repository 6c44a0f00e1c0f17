"""Device mesh + sharding layout for CCDM training and inference.

The reference scales via single-node NCCL DDP (`ddpm_train.py:31-38`,
`ddpm/trainer.py:603-610`): replicated params, batch split across ranks,
implicit gradient all-reduce. The TPU-native equivalent is a 2-D
`Mesh(('data', 'model'))`:

- `data`: batch-dimension sharding. Gradient all-reduce is emitted by XLA
  from the sharded-batch `jit` (rides ICI; DCN across slices).
- `model`: tensor parallelism for wide layers. Conv/Dense kernels whose
  output-channel dim divides the axis are sharded on that dim; XLA inserts
  the matching all-gathers/reduce-scatters. With `model == 1` this
  degenerates to pure DP (the reference's regime).

"rank 0 only" I/O gating becomes `jax.process_index() == 0`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int
    model: int = 1

    @property
    def num_devices(self) -> int:
        return self.data * self.model


def make_mesh(config: Optional[MeshConfig] = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if config is None:
        config = MeshConfig(data=len(devices), model=1)
    if config.num_devices != len(devices):
        raise ValueError(
            f"mesh {config} needs {config.num_devices} devices, got {len(devices)}")
    dev_array = np.asarray(devices).reshape(config.data, config.model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch tensors: sharded on the leading (batch) dim over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def host_slice(n: int, process_index: Optional[int] = None,
               process_count: Optional[int] = None) -> list:
    """This host's strided slice of `n` globally-indexed work items.

    The standard eval-harness decomposition: host p of P scores items
    [p, p+P, p+2P, ...]; results recombine with `allgather_f64` partial
    sums. Per-item PRNG keys must derive from the GLOBAL index so any host
    count produces identical draws. The index/count default to the real
    process topology; pass them explicitly to simulate a layout.
    """
    p = jax.process_index() if process_index is None else process_index
    c = jax.process_count() if process_count is None else process_count
    return list(range(n))[p::c]


def pad_chunk(chunk: list, batch_size: int) -> tuple:
    """Pad a tail work chunk to `batch_size` by repeating its last item.

    Keeps the compiled program at ONE batch shape; returns `(idx, real)` —
    only the first `real` results may enter any metric. Repeating the last
    GLOBAL index also keeps per-item PRNG keys topology-independent (the
    padded duplicates draw the same noise as the real last item).
    """
    real = len(chunk)
    return chunk + [chunk[-1]] * (batch_size - real), real


def allgather_f64(values: np.ndarray) -> np.ndarray:
    """Allgather a float64 vector across hosts -> [process_count, len] rows.

    Rides `jax.enable_x64` for the transport: without it the gather
    silently truncates f64 partial sums (including integer confusion-matrix
    counts beyond 2^24) to f32. Callers reduce rows by + (counts/sums) or
    max (parallel wall-clock). Also a barrier: returns only after every
    host has contributed.
    """
    from jax.experimental import multihost_utils

    with jax.enable_x64(True):
        return np.asarray(multihost_utils.process_allgather(
            np.asarray(values, dtype=np.float64)))


def mesh_for_eval(generation_batch: int) -> Optional[Mesh]:
    """A local data mesh for eval-harness inference, or None.

    Single-process multi-chip runs shard the generation batch (images x
    samples-per-image) over all local devices; multi-process runs slice the
    dataset per host instead, so the local computation stays unsharded.
    None when sharding does not apply (one device, multi-process, or a
    batch the device count does not divide).
    """
    ndev = len(jax.local_devices())
    if jax.process_count() > 1 or ndev <= 1 or generation_batch % ndev != 0:
        return None
    return make_mesh()


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Parameters whose last dim is at least this wide are considered for TP
# sharding; below it the all-gather cost outweighs the memory/FLOP split.
_TP_MIN_WIDTH = 64


def param_partition_spec(path: tuple, leaf: Any, model_size: int) -> P:
    """Tensor-parallel layout rule for UNet params.

    Conv kernels are HWIO and Dense kernels IO in Flax: shard the trailing
    (output-feature) dim over 'model' when it divides evenly and is wide
    enough. Biases/scales stay replicated: they are tiny, and the matching
    activations remain fully replicated at layer boundaries, so XLA resolves
    each sharded matmul with one reduce-scatter/all-gather pair over ICI.
    """
    if model_size <= 1:
        return P()
    shape = getattr(leaf, "shape", ())
    if len(shape) < 2:
        return P()
    out_dim = shape[-1]
    if out_dim % model_size != 0 or out_dim < _TP_MIN_WIDTH:
        return P()
    return P(*([None] * (len(shape) - 1) + [MODEL_AXIS]))


def param_sharding_tree(tree, mesh: Mesh):
    """Pytree of NamedShardings under the shape-based TP rule.

    The rule depends only on leaf shape, so it applies uniformly to params,
    EMA params, and optimizer-state moments (which mirror param shapes);
    scalar/1-D leaves (step counters, biases, scales) replicate.
    """
    model_size = mesh.shape[MODEL_AXIS]
    return jax.tree.map(
        lambda leaf: NamedSharding(mesh, param_partition_spec((), leaf, model_size)),
        tree,
    )


def state_shardings(state, mesh: Mesh):
    """Sharding pytree for a TrainState, for jit in/out_shardings."""
    return state.replace(
        step=replicated(mesh),
        params=param_sharding_tree(state.params, mesh),
        ema_params=param_sharding_tree(state.ema_params, mesh),
        opt_state=param_sharding_tree(state.opt_state, mesh),
    )


def put_replicated_global(x, sharding: NamedSharding):
    """Place a host value every process holds IN FULL onto a (possibly
    multi-process) mesh. Single-process: plain device_put. Multi-process:
    `make_array_from_callback` hands each addressable device its slice of
    the globally-consistent value (params, RNG keys, restored checkpoints)."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    arr = np.asarray(x)
    return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])


def put_local_batch(x, sharding: NamedSharding):
    """Stage a PROCESS-LOCAL batch shard as a global array.

    Each process feeds its local slice of the global batch (EpochLoader's
    process sharding, the DistributedSampler analogue); the resulting global
    array concatenates all processes' shards along the batch dim. Global
    sample order then differs from the single-process run by a within-batch
    permutation, which the batch-mean loss is invariant to.
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, x)


def shard_train_state(state, mesh: Mesh):
    """Place a TrainState onto the mesh according to `state_shardings`."""
    sh = state_shardings(state, mesh)
    return jax.tree.map(put_replicated_global, state, sh)


def host_local_copy(tree):
    """Host-local numpy copy of a (possibly multi-process global) pytree.

    Used to run validation/qualitative sampling as ordinary process-local
    computation in multihost runs: replicated leaves read their local shard;
    leaves sharded across hosts are allgathered.
    """
    def get(x):
        try:
            return np.asarray(x)
        except RuntimeError:  # non-addressable shards (cross-host TP)
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(x, tiled=True))

    return jax.tree.map(get, tree)
