"""Device mesh + data-parallel sharding helpers.

The reference's only parallelism is single-process nn.DataParallel
(SURVEY.md §2.4, §5.8).  The TPU-native equivalent: one jitted SPMD train
step over a 1-D ``data`` mesh — parameters replicated (prompt pytrees are
tiny), batches sharded on axis 0, gradients reduced by XLA-inserted psums
riding ICI.  The same code runs on 1 chip (trivial mesh) and a v5e-8 slice;
multi-host falls out of jax.distributed.initialize + per-host data feeding.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(devices=None):
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), ("data",))


def replicated(mesh):
    return NamedSharding(mesh, P())


def data_sharded(mesh):
    return NamedSharding(mesh, P("data"))


def shard_batch(batch, mesh):
    """Place a host numpy batch dict onto the mesh, sharded along axis 0.

    Batch axes not divisible by the mesh size are padded by repeating the
    last row; the ``valid`` mask (when present) is extended with False so
    padded rows never contribute — every train loss masks by batch['valid']
    (trainers/losses.py), so e.g. a batch-4 config on an 8-device mesh
    weights all four examples equally.

    Multi-host (jax.process_count() > 1): samplers are seeded, so every
    host assembles the identical global batch; each host then feeds ONLY
    its own contiguous row range to its local chips
    (jax.make_array_from_process_local_data) — per-host data sharding with
    no cross-host transfer.
    """
    n = mesh.devices.size
    sharding = data_sharded(mesh)
    b = next(v.shape[0] for k, v in batch.items() if k != "impath")
    pad = (-b) % n
    pc, pid = jax.process_count(), jax.process_index()

    def put(key, x):
        if pad:
            if key == "valid":
                fill = np.zeros((pad,) + x.shape[1:], dtype=x.dtype)
            else:
                fill = np.repeat(x[-1:], pad, axis=0)
            x = np.concatenate([np.asarray(x), fill], axis=0)
        if pc > 1:
            rows = x.shape[0] // pc
            local = np.asarray(x[pid * rows : (pid + 1) * rows])
            return jax.make_array_from_process_local_data(sharding, local)
        return jax.device_put(x, sharding)

    return {k: put(k, v) for k, v in batch.items() if k != "impath"}


def replicate(tree, mesh):
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
