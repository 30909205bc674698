"""Device mesh + sharding helpers.

The reference's only parallelism is single-host NCCL data-parallel
(training/trainer.py:114-121, utils/parallelWraper.py). The TPU-native
equivalent: a 1-D ``data`` mesh over all chips, batch sharded on it, params
replicated; XLA inserts the gradient all-reduce over ICI during jit.  The
``spatial`` axis is available for sharding very large images across chips
(sequence-parallel analog) — conv halo exchange is inserted by XLA when the
H dimension is sharded.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(n_devices: int | None = None, spatial: int = 1) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    arr = np.asarray(devices)
    if spatial > 1:
        return Mesh(arr.reshape(-1, spatial), ("data", "spatial"))
    return Mesh(arr.reshape(-1), ("data",))


def shard_batch(mesh: Mesh, batch):
    """Place a host array batch-sharded over the 'data' axis."""
    ndim = jax.tree_util.tree_leaves(batch)[0].ndim
    spec = P("data", *([None] * (ndim - 1)))
    sharding = NamedSharding(mesh, spec)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def shard_spatial(mesh: Mesh, x):
    """Shard an NHWC image over ('data', 'spatial'): batch on the data axis
    and image ROWS on the spatial axis.  XLA/GSPMD inserts the conv halo
    exchanges over ICI automatically — the framework's sequence-parallel
    analog for very large single images (SURVEY §2.11)."""
    sharding = NamedSharding(mesh, P("data", "spatial", None, None))
    return jax.device_put(x, sharding)
