"""Device mesh + sharding layer — the framework's parallelism backbone.

The reference's only parallelism is single-process ``nn.DataParallel``
(networks.py:122,181,200) plus DataLoader workers; there is no distributed
backend at all (SURVEY.md section 2.16).  The TPU-native replacement is a
first-class mesh layer:

  * ``data`` axis — batch-sharded data parallelism over ICI (the 1:1
    replacement for DataParallel; gradient psums are inserted by XLA when
    the loss is a mean over the sharded batch);
  * ``spatial`` axis — optional sharding of the image height dim for very
    large images (the conv/CEM filter halos become XLA-inserted collective
    permutes), the spatial analogue of sequence parallelism for this
    attention-free, conv-only model family;
  * multi-host: ``initialize_distributed`` wires ``jax.distributed`` so the
    same mesh spans hosts over DCN.

All shardings are expressed as ``NamedSharding``/``PartitionSpec``; compute
functions stay pure and are jit-compiled with these shardings attached.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host bring-up (no-op single-host).  Call before mesh creation."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_mesh(data: int | None = None, spatial: int = 1,
              devices=None) -> Mesh:
    """Mesh over all (or given) devices: ('data', 'spatial').

    ``data=None`` uses every available device on the data axis.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // spatial
    assert data * spatial == n, \
        f'mesh {data}x{spatial} != {n} devices'
    dev_array = np.asarray(devices).reshape(data, spatial)
    return Mesh(dev_array, ('data', 'spatial'))


@dataclasses.dataclass(frozen=True)
class ShardingRules:
    """Canonical shardings for the SR training/inference stack."""
    mesh: Mesh

    @property
    def batch(self) -> NamedSharding:
        """NHWC activations: batch on 'data', height on 'spatial'."""
        return NamedSharding(self.mesh, P('data', 'spatial', None, None))

    @property
    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def per_sample(self, ndim: int) -> NamedSharding:
        """Per-sample leaf of rank ``ndim`` (e.g. the JPEG loader's [B]
        'qf'): leading axis split on 'data'."""
        return NamedSharding(self.mesh,
                             P(*(('data',) + (None,) * (ndim - 1))))

    def batch_spec(self, x: Any) -> NamedSharding:
        """Sharding for one batch leaf: NHWC activations on
        (data, spatial); any other per-sample array leading-'data';
        scalars replicated."""
        nd = getattr(x, 'ndim', 0)
        if nd == 4:
            return self.batch
        if nd >= 1:
            return self.per_sample(nd)
        return self.replicated

    def shard_batch(self, batch: Any) -> Any:
        """Place a host batch pytree onto the mesh (leaf rules of
        :meth:`batch_spec`)."""
        return jax.tree.map(
            lambda x: jax.device_put(x, self.batch_spec(x)), batch)

    def replicate(self, tree: Any) -> Any:
        return jax.device_put(tree, self.replicated)

    def shard_host_batch(self, local_batch: Any) -> Any:
        """Assemble per-host batch slices into global arrays — the
        host-parallel input pipeline (each process loads only its
        ``local_batch_slice`` of the global batch and contributes it via
        ``jax.make_array_from_process_local_data``).  Single-process it
        degenerates to :meth:`shard_batch`."""
        if jax.process_count() == 1:
            return self.shard_batch(local_batch)

        def put(x):
            import numpy as _np
            # every leaf of a batch is per-sample (e.g. the JPEG
            # loader's [B] 'qf'): batch_spec shards its leading axis on
            # 'data' — a replicated spec here would treat each host's
            # SLICE as the whole value and assemble a wrong-shaped array
            return jax.make_array_from_process_local_data(
                self.batch_spec(x), _np.asarray(x))
        return jax.tree.map(put, local_batch)


def local_batch_slice(global_batch: int, process_index: int | None = None,
                      process_count: int | None = None) -> slice:
    """Per-host slice of the global batch for host-parallel input pipelines
    (the TPU equivalent of DataLoader sharding)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per_host = global_batch // pc
    return slice(pi * per_host, (pi + 1) * per_host)
