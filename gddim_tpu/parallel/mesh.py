"""Device mesh + sharding helpers (TPU-native replacement for pmap).

The reference parallelizes with `jax.pmap(lax.scan(step))` over one axis
(cld_jax/run_lib.py:144-149) and `lax.pmean` collectives (losses.py:142).
Here a `jax.sharding.Mesh` with `NamedSharding` drives one global `jit`:
the batch is sharded over the 'data' axis, parameters are replicated (or
FSDP-sharded over the same axis when configured), and XLA inserts the gradient
all-reduce over ICI automatically. Multi-host extends the same code path via
`jax.distributed.initialize` — no filesystem polling (reference
run_lib.py:560-617) needed.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over all (or n_data) devices."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None or n_data <= 0:
        n_data = len(devices)
    return Mesh(np.asarray(devices[:n_data]).reshape(n_data), ("data",))


def make_mesh_2d(n_data: int, n_model: int, devices=None) -> Mesh:
    """2-D (data, model) mesh for dp x tp/fsdp experiments."""
    devices = devices if devices is not None else jax.devices()
    assert n_data * n_model <= len(devices)
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def make_mesh_3d(n_data: int, n_fsdp: int, n_model: int, devices=None) -> Mesh:
    """3-D (data, fsdp, model) mesh: batch DP x ZeRO-3 x channel TP."""
    devices = devices if devices is not None else jax.devices()
    total = n_data * n_fsdp * n_model
    assert total <= len(devices), (total, len(devices))
    grid = np.asarray(devices[:total]).reshape(n_data, n_fsdp, n_model)
    return Mesh(grid, ("data", "fsdp", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over the 'data' mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_local_shard(x, sh: NamedSharding):
    """Place per-host data under a (possibly multi-host) sharding.

    Single-process: plain device_put. Multi-process: the host array is this
    process's slice of the global value (per-host batches from the data
    pipeline), assembled with make_array_from_process_local_data — the
    mesh-native replacement for the reference's per-host pmap batching
    (cld_jax/run_lib.py:144-162).
    """
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sh, np.asarray(x))
    return jax.device_put(x, sh)


def put_full_value(x, sh: NamedSharding):
    """Place a host value EVERY process holds in full under any sharding
    (replicated state, FSDP-sharded params): each process contributes the
    addressable slices of its copy."""
    if jax.process_count() > 1:
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])
    return jax.device_put(x, sh)


def shard_batch(batch, mesh: Mesh):
    """Place a host batch with its leading axis sharded over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: put_local_shard(x, sh), batch)


def replicate_to_mesh(tree, mesh: Mesh):
    """Replicate a pytree (params/state) across the mesh. Multi-process:
    every host holds the full value (states are created or restored
    identically on all processes)."""
    sh = replicated(mesh)
    return jax.tree.map(lambda x: put_full_value(x, sh), tree)


def fsdp_shard_params(params, mesh: Mesh, min_size: int = 2**16,
                      axis: str = "data"):
    """Shard large parameter leaves over a mesh axis (ZeRO-3 style).

    Each leaf whose largest dimension is divisible by the axis size and whose
    total size exceeds `min_size` is sharded along that dimension; the rest
    replicate. XLA then all-gathers weights on use and reduce-scatters grads —
    the standard FSDP schedule, expressed purely through shardings. On a 2-D
    (data, model) mesh pass axis='model' for dp x fsdp.
    """
    n = int(mesh.shape[axis])

    def shard_one(x):
        if x.size >= min_size:
            dim = int(np.argmax(x.shape))
            if x.shape[dim] % n == 0:
                spec = [None] * x.ndim
                spec[dim] = axis
                return put_full_value(x, NamedSharding(mesh, P(*spec)))
        return put_full_value(x, replicated(mesh))

    return jax.tree.map(shard_one, params)


def tp_shard_params(params, mesh: Mesh, axis: str = "model",
                    fsdp_axis: str | None = None, min_size: int = 2**12):
    """Megatron-style channel tensor parallelism, expressed through shardings.

    Every >=2-D weight above `min_size` is sharded on its OUTPUT-channel
    (last) dimension over `axis` — conv kernels (kh, kw, cin, cout),
    dense/NIN matrices (cin, cout) — so each device holds a channel slice of
    every layer. XLA's SPMD partitioner then derives the column-/row-parallel
    schedule the Megatron pattern hand-writes: activations stay
    channel-sharded through a block, and a contraction whose input channels
    arrive sharded becomes a partial sum with an all-reduce over `axis`
    (the scaling-book recipe — annotate shardings, let XLA insert the
    collectives; no hand-written psum needed). 1-D vectors (biases, norm
    scales) replicate: they are tiny and XLA fuses the broadcast-add.

    With `fsdp_axis`, the largest remaining dimension divisible by that axis
    size is additionally ZeRO-3-sharded (weights all-gather on use,
    gradients reduce-scatter), composing TP x FSDP on one mesh
    (make_mesh_3d). Replaces what the reference would need NCCL model
    parallelism for — it has none (SURVEY.md §2.3: pmap DP only).
    """
    n = int(mesh.shape[axis])
    n_f = int(mesh.shape[fsdp_axis]) if fsdp_axis else 1

    def shard_one(x):
        if x.ndim < 2 or x.size < min_size:
            return put_full_value(x, replicated(mesh))
        spec = [None] * x.ndim
        if x.shape[-1] % n == 0:
            spec[-1] = axis
        if fsdp_axis:
            rest = [
                d for d in range(x.ndim - 1)
                if x.shape[d] % n_f == 0 and x.shape[d] > 1
            ]
            if rest:
                dim = max(rest, key=lambda d: x.shape[d])
                spec[dim] = fsdp_axis
        if all(s is None for s in spec):
            return put_full_value(x, replicated(mesh))
        return put_full_value(x, NamedSharding(mesh, P(*spec)))

    return jax.tree.map(shard_one, params)
