"""SPMD sharding tests on the virtual 8-CPU mesh (conftest.py).

The reference's distributed story is vestigial single-host DDP
(nerf/utils.py:330-332, never enabled — SURVEY.md §2.3); the TPU-native
equivalent is GSPMD over a jax.sharding.Mesh. These tests pin down the two
supported layouts:
- 1-D data mesh: ray batch sharded, params replicated (dp).
- 2-D data x model mesh: ray batch over 'data', hash-table level stack over
  'model' (tensor parallelism, HashGridConfig.shard_levels).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seal3d_tpu.ops.hashgrid import HashGridConfig, hashgrid_encode, hashgrid_init
from seal3d_tpu.parallel.mesh import constrain, make_mesh, make_mesh_2d

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the virtual 8-device mesh")


def _encode_loss(table, x, cfg):
    return (hashgrid_encode(table, x, cfg) ** 2).sum()


def test_level_sharded_encode_matches_unsharded():
    """shard_levels under a 2-D mesh must be numerically identical to the
    plain xla path at the same (uniform) level packing, for both the output
    and the table gradient."""
    cfg = HashGridConfig(num_levels=8, level_dim=2, base_resolution=16,
                         log2_hashmap_size=10, desired_resolution=128,
                         shard_levels=True)
    key = jax.random.PRNGKey(0)
    table = hashgrid_init(key, cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))

    ref_out = jax.jit(lambda t: hashgrid_encode(t, x, cfg))(table)
    ref_grad = jax.jit(jax.grad(lambda t: _encode_loss(t, x, cfg)))(table)

    mesh = make_mesh_2d(4, 2)
    with jax.sharding.set_mesh(mesh):
        out = jax.jit(lambda t: hashgrid_encode(t, x, cfg))(table)
        grad = jax.jit(jax.grad(lambda t: _encode_loss(t, x, cfg)))(table)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(grad), np.asarray(ref_grad),
                                   atol=1e-6)


def test_level_sharded_table_never_gathered():
    """The compiled HLO must keep the table sharded: no all-gather whose
    result is the full [L, T, F] stack (the whole point of the layout is
    that only [M, L*F] features cross chips)."""
    cfg = HashGridConfig(num_levels=8, level_dim=2, base_resolution=16,
                         log2_hashmap_size=10, desired_resolution=128,
                         shard_levels=True)
    table = hashgrid_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    table_bytes = table.size * 4

    mesh = make_mesh_2d(4, 2)
    with jax.sharding.set_mesh(mesh):
        txt = (jax.jit(jax.grad(lambda t: _encode_loss(t, x, cfg)))
               .lower(table).compile().as_text())
    for line in txt.splitlines():
        if "all-gather(" not in line:
            continue
        # shape like f32[8,1024,2]{...} at the head of the instruction
        shape = line.split("=", 1)[1].strip().split("{")[0]
        dims = shape.split("[")[1].split("]")[0]
        n = int(np.prod([int(d) for d in dims.split(",") if d.strip()]))
        assert n * 4 < table_bytes, f"full-table all-gather found: {line[:120]}"


def _halo_cfg():
    # T=2^12 -> wrap period 16 (P^3=T, P%4==0): the smallest halo-legal table
    return HashGridConfig(num_levels=8, level_dim=2, base_resolution=16,
                          log2_hashmap_size=12, desired_resolution=128,
                          gridtype="wrap", backend="halo", shard_levels=True)


def test_halo_level_sharded_matches_unsharded():
    """The flagship halo kernel under shard_levels (shard_map over the level
    axis, VERDICT r2 item 8): output and master-table gradient must match
    the single-device halo path bit-for-bit in structure (small tolerance:
    the kernel accumulates in a different shard order)."""
    import dataclasses

    cfg = _halo_cfg()
    cfg0 = dataclasses.replace(cfg, shard_levels=False)
    key = jax.random.PRNGKey(0)
    table = hashgrid_init(key, cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (256, 3))

    ref_out = jax.jit(lambda t: hashgrid_encode(t, x, cfg0))(table)
    ref_grad = jax.jit(jax.grad(lambda t: _encode_loss(t, x, cfg0)))(table)

    mesh = make_mesh_2d(4, 2)
    with jax.sharding.set_mesh(mesh):
        out = jax.jit(lambda t: hashgrid_encode(t, x, cfg))(table)
        grad = jax.jit(jax.grad(lambda t: _encode_loss(t, x, cfg)))(table)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(grad), np.asarray(ref_grad),
                                   atol=1e-5)


def test_halo_level_sharded_table_never_gathered():
    """Compiled HLO of the level-sharded halo encode+grad must not all-gather
    anything as large as the full table (only [M, L*F] features cross chips)."""
    cfg = _halo_cfg()
    table = hashgrid_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (256, 3))
    table_bytes = table.size * 4

    mesh = make_mesh_2d(4, 2)
    with jax.sharding.set_mesh(mesh):
        txt = (jax.jit(jax.grad(lambda t: _encode_loss(t, x, cfg)))
               .lower(table).compile().as_text())
    for line in txt.splitlines():
        if "all-gather(" not in line:
            continue
        shape = line.split("=", 1)[1].strip().split("{")[0]
        dims = shape.split("[")[1].split("]")[0]
        n = int(np.prod([int(d) for d in dims.split(",") if d.strip()]))
        assert n * 4 < table_bytes, f"full-table all-gather found: {line[:120]}"


def test_constrain_noop_without_mesh():
    x = jnp.ones((8, 4))
    out = jax.jit(lambda v: constrain(v, "data", None) * 2.0)(x)
    np.testing.assert_allclose(np.asarray(out), 2 * np.ones((8, 4)))


def test_constrain_drops_unknown_axes():
    mesh = make_mesh()  # 1-D data mesh: no 'model' axis
    x = jnp.ones((8, 4))
    with jax.sharding.set_mesh(mesh):
        out = jax.jit(lambda v: constrain(v, "model", None) + 1.0)(x)
    np.testing.assert_allclose(np.asarray(out), 2 * np.ones((8, 4)))


@pytest.mark.slow
def test_dp_flat_pack_train_step_never_gathers_batch():
    """DP scaling guard (VERDICT r3 item 5): the partitioned flat-path train
    step must not contain a batch-scale collective. Without the per-shard
    pack (RenderOptions.pack_shards, ops.raymarch.compact_flat_sharded) the
    global packing sort all-gathered the [N, C] candidates and everything
    downstream — including the field, 86% of the step — ran replicated, so
    8 chips would train no faster than one. Small [N]-sized per-ray gathers
    (composite offsets/accumulators, a few KB) are allowed; anything at
    candidate scale (>= N*C/8 elements) fails."""
    import __graft_entry__ as g
    from seal3d_tpu.parallel.mesh import find_batch_collectives, replicate

    mesh = make_mesh(jax.devices()[:8])
    ngp, fcfg, opts, tcfg, ds, Trainer = g._setup(n_rays=512, h=16, w=16,
                                                  log2_hashmap=12)
    import dataclasses
    opts = dataclasses.replace(opts, flat_frac=0.5)
    tr = Trainer(ngp, fcfg, opts, tcfg, dataset=ds, mesh=mesh,
                 key=jax.random.PRNGKey(0))
    assert tr.opts.pack_shards == 8  # trainer derives it from the mesh
    state = jax.device_put(tr.init_state(), replicate(mesh))
    txt = tr._train_step.lower(state, jax.random.PRNGKey(2)).compile().as_text()

    offenders = find_batch_collectives(txt, 512 * opts.num_candidates // 8)
    assert not offenders, offenders

    # and the step still executes under the mesh
    state2, metrics = tr._train_step(state, jax.random.PRNGKey(2))
    assert bool(jnp.isfinite(metrics["loss"]))
