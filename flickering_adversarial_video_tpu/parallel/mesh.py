"""Device mesh + sharding layout for the attack.

The reference scales with single-host data parallelism only —
nn.DataParallel over <=4 GPUs (model.py:575-578) and a constructed-but-
disabled MirroredStrategy (i3d_adversarial_main_universal.py:309-312).  The
TPU-native replacement is one mechanism that supersedes all of it
(SURVEY.md section 5.8):

  * a 1-D `jax.sharding.Mesh` over every chip, axis name 'data';
  * the video batch sharded over 'data' (leading axis), delta + victim params
    + optimizer state replicated;
  * the attack step jitted with these shardings — XLA inserts the psum for
    d(loss)/d(delta) over ICI automatically, since the gradient of a
    replicated leaf wrt a sharded batch is a cross-replica sum;
  * eval counters (miss, valid) come out replicated the same way.

Multi-host runs get per-host tfrecord shard assignment in data/tfrecord.py
plus jax.distributed initialization in the runner; nothing here changes.

Sizing note: keep the PER-CHIP batch at ~8 when scaling out (global batch =
8 * n_chips) — measured on v5e, per-chip batch 4 runs at only ~55% of the
batch-8 clips/s (PERF.md batch-scaling table), so sharding a fixed global
batch 8 across many chips wastes most of the mesh.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Multi-host bring-up: jax.distributed + per-host device discovery.

    Single mechanism for scaling past one host (DCN between hosts, ICI
    within): call this once per host process before building the mesh; the
    mesh then spans all global devices and `tfrecord_batches(...,
    host_id=jax.process_index(), num_hosts=jax.process_count())` assigns each
    host its shard subset.  No-ops in single-process runs.

    Returns jax.process_index().
    """
    if coordinator_address is not None:
        import jax

        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    import jax

    return jax.process_index()


def make_mesh(devices: Optional[Sequence[jax.Device]] = None, n_devices: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'; replicate the rest."""
    spec = P(DATA_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_replicated(mesh: Mesh, tree: Any) -> Any:
    """Replicate a host-side pytree onto every device of the mesh.

    Multi-process: each process holds the identical full value, so the
    process-local data IS every addressable shard —
    jax.make_array_from_process_local_data assembles the global array without
    any cross-host transfer. Single-process: plain device_put.
    """
    sh = replicated_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
            tree,
        )
    return jax.device_put(tree, sh)


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host-side batch pytree onto the mesh, batch-axis sharded.

    Single-process: jax.device_put with per-leaf NamedShardings (one
    host->device DMA per shard).  Multi-process: `batch` is this host's LOCAL
    slice (global batch = concatenation over process_index order, matching
    the per-host tfrecord shard assignment in data/tfrecord.py);
    jax.make_array_from_process_local_data assembles the global sharded
    array.  Exercised end-to-end by scripts/multihost_sim.py /
    tests/test_multihost.py on 2 processes x 4 CPU devices.
    """

    def put(x):
        x = np.asarray(x)
        sh = data_sharding(mesh, x.ndim)
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sh, x)
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(put, batch)
