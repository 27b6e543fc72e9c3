"""SPMD scaling over a device mesh.

The reference's parallelism story is vestigial single-host DDP over NCCL
(nerf/utils.py:330-332, 939-954; never actually enabled — SURVEY.md §2.3).
The TPU-native equivalent is one `jax.sharding.Mesh` with a `data` axis over
ICI: the per-step ray batch (and every tensor derived from it: samples,
field activations, losses) is sharded along `data`; field params, occupancy
grid and optimizer state are replicated. Gradients are reduced by the
`psum` XLA inserts automatically for the replicated-param/sharded-batch
layout — no hand-written collectives in the hot path.

Eval image assembly uses the same constraint; outputs come back fully
addressable (the driver-side all_gather is XLA's).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None) -> Mesh:
    """1-D data-parallel mesh over all (or given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), ("data",))


def make_mesh_2d(n_data: int, n_model: int, devices=None) -> Mesh:
    """2-D (data x model) mesh: rays sharded over `data`, the hash-table
    level stack sharded over `model` (tensor parallelism for the encoder —
    the one parameter group that dominates memory and gradient bandwidth).

    Layout rationale (scaling-book recipe): `model` is the minor axis so
    the per-step feature all-gather ([M_local, L*F], a few hundred KB) and
    the table-grad reduce ride adjacent-chip ICI links.
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)[: n_data * n_model]
    return Mesh(devices.reshape(n_data, n_model), ("data", "model"))


def constrain(x, *spec):
    """`with_sharding_constraint(x, P(*spec))` against the AMBIENT mesh
    (`jax.sharding.set_mesh`), dropping axis names the mesh doesn't have.
    No-op when no mesh is set — lets model code carry sharding annotations
    that cost nothing single-chip."""
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or not getattr(mesh, "axis_names", ()):
        return x
    names = set(mesh.axis_names)
    spec = tuple(s if s in names else None for s in spec)
    if all(s is None for s in spec):
        return x
    return jax.lax.with_sharding_constraint(x, P(*spec))


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_rays(tree, mesh: Optional[Mesh]):
    """Constrain every array in `tree` to be sharded on its leading (ray)
    axis. No-op without a mesh."""
    if mesh is None:
        return tree
    return jax.tree.map(
        lambda x: jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(*(("data",) + (None,) * (x.ndim - 1))))
        ),
        tree,
    )


def find_batch_collectives(hlo_text: str, min_elems: int) -> list:
    """Scan a partitioned HLO module for batch-scale collectives.

    The DP scaling guard (PERFORMANCE.md round 4b): the flat-path train
    step must never all-gather the [N, C] march candidates — when it did,
    everything downstream of the gather (including the field, ~86% of the
    step) ran replicated and 8 chips trained at 1-chip speed. Small
    [N]-sized per-ray gathers (composite offsets, a few KB) are fine;
    anything holding >= `min_elems` elements is an offender. Used by
    tests/test_parallel.py and asserted on every driver round by
    __graft_entry__.dryrun_multichip."""
    import re

    pat = re.compile(
        r'^\s*(?:ROOT\s+)?%?[\w.\-]+ = (\S+) (all-gather|all-reduce|'
        r'reduce-scatter|all-to-all)\(', re.M)
    offenders = []
    for m in pat.finditer(hlo_text):
        shape = m.group(1)
        dims = re.findall(r'\[([0-9,]*)\]', shape)
        nelem = 1
        if dims and dims[0]:
            for d in dims[0].split(','):
                nelem *= int(d)
        if nelem >= min_elems:
            offenders.append(f"{m.group(2)} {shape}")
    return offenders
