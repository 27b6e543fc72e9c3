"""Unit tests for the core ops layer (morton, bitfield, encoders, marching,
compositing). Testing strategy per SURVEY.md §4: dense numpy/scipy oracles +
float64 gradchecks, replacing the reference's eyeball-style testing/ scripts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seal3d_tpu.ops import (
    bitfield_lookup,
    freq_encode,
    hashgrid_encode,
    hashgrid_init,
    HashGridConfig,
    morton3d,
    morton3d_invert,
    near_far_from_aabb,
    packbits,
    sh_encode,
    trunc_exp,
)
from seal3d_tpu.ops.composite import composite_dense, composite_flat
from seal3d_tpu.ops.raymarch import candidate_ts, compact_samples, march_rays


def _morton_ref(x, y, z):
    out = 0
    for i in range(10):
        out |= ((x >> i) & 1) << (3 * i)
        out |= ((y >> i) & 1) << (3 * i + 1)
        out |= ((z >> i) & 1) << (3 * i + 2)
    return out


def test_morton_roundtrip():
    rng = np.random.default_rng(0)
    coords = rng.integers(0, 128, size=(256, 3)).astype(np.int32)
    codes = np.asarray(morton3d(jnp.asarray(coords)))
    expected = np.array([_morton_ref(*c) for c in coords], dtype=np.uint32)
    np.testing.assert_array_equal(codes, expected)
    back = np.asarray(morton3d_invert(jnp.asarray(codes)))
    np.testing.assert_array_equal(back, coords)


def test_packbits_and_lookup():
    rng = np.random.default_rng(1)
    grid = rng.uniform(-1, 1, size=(2, 128**3)).astype(np.float32)
    bf = packbits(jnp.asarray(grid), 0.5)
    cells = rng.integers(0, 128**3, size=(512,))
    cas = rng.integers(0, 2, size=(512,))
    bits = np.asarray(bitfield_lookup(bf, jnp.asarray(cas), jnp.asarray(cells, dtype=np.uint32)))
    np.testing.assert_array_equal(bits, grid[cas, cells] > 0.5)


def test_trunc_exp_grad():
    g = jax.grad(lambda x: trunc_exp(x))(20.0)
    assert np.isfinite(g)
    np.testing.assert_allclose(g, np.exp(15.0), rtol=1e-5)
    g2 = jax.grad(lambda x: trunc_exp(x))(1.5)
    np.testing.assert_allclose(g2, np.exp(1.5), rtol=1e-5)


def test_freq_encode_shape_and_values():
    x = jnp.array([[0.3, -0.2, 0.9]])
    out = freq_encode(x, degree=2)
    assert out.shape == (1, 3 * 5)
    np.testing.assert_allclose(out[0, :3], x[0], rtol=1e-6)
    np.testing.assert_allclose(out[0, 3:6], np.sin(np.asarray(x[0])), rtol=1e-5)
    np.testing.assert_allclose(out[0, 9:12], np.sin(2 * np.asarray(x[0])), rtol=1e-5)


def test_sh_orthonormality():
    """SH basis integrates to ~orthonormal over the sphere (Monte Carlo)."""
    rng = np.random.default_rng(2)
    d = rng.normal(size=(200000, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    for degree in (3, 4, 6):
        y = np.asarray(sh_encode(jnp.asarray(d, dtype=jnp.float32), degree))
        gram = y.T @ y / d.shape[0] * 4 * np.pi
        np.testing.assert_allclose(gram, np.eye(degree**2), atol=0.15)


def test_sh_degree4_matches_known_constants():
    d = jnp.array([[0.0, 0.0, 1.0]])
    y = np.asarray(sh_encode(d, 4))[0]
    np.testing.assert_allclose(y[0], 0.28209479, rtol=1e-6)
    np.testing.assert_allclose(y[2], 0.48860251, rtol=1e-6)  # z component
    np.testing.assert_allclose(y[1], 0.0, atol=1e-7)


def test_hashgrid_interpolation_consistency():
    """Feature field is continuous & exactly interpolates between corners on a
    dense (tiled) level."""
    cfg = HashGridConfig(num_levels=2, level_dim=2, base_resolution=4,
                         desired_resolution=8, log2_hashmap_size=16)
    key = jax.random.PRNGKey(0)
    table = hashgrid_init(key, cfg, std=0.5)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    out = hashgrid_encode(table, x, cfg)
    assert out.shape == (64, 4)
    # continuity: small perturbation -> small output change
    out2 = hashgrid_encode(table, x + 1e-5, cfg)
    np.testing.assert_allclose(out, out2, atol=1e-3)


def test_hashgrid_gradcheck():
    """float64-style gradcheck vs numerical differences (the reference uses
    torch.autograd.gradcheck, testing/test_hashgrid_grad.py:59-62)."""
    cfg = HashGridConfig(num_levels=2, level_dim=1, base_resolution=4,
                         desired_resolution=8, log2_hashmap_size=10)
    jax.config.update("jax_enable_x64", True)
    try:
        table = hashgrid_init(jax.random.PRNGKey(0), cfg, std=0.5).astype(jnp.float64)
        x = jax.random.uniform(jax.random.PRNGKey(1), (8, 3), dtype=jnp.float64) * 0.8 + 0.1

        def f(t):
            return hashgrid_encode(t, x, cfg).sum()

        g = jax.grad(f)(table)
        eps = 1e-5
        rng = np.random.default_rng(3)
        for _ in range(10):
            i = int(rng.integers(0, table.shape[0]))
            t1 = table.at[i, 0].add(eps)
            t2 = table.at[i, 0].add(-eps)
            num = (f(t1) - f(t2)) / (2 * eps)
            np.testing.assert_allclose(g[i, 0], num, rtol=1e-5, atol=1e-8)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_near_far_aabb():
    aabb = jnp.array([-1.0, -1, -1, 1, 1, 1])
    o = jnp.array([[0.0, 0, -3], [0, 0, -3]])
    d = jnp.array([[0.0, 0, 1], [0, 1, 0]])  # hit, miss
    near, far = near_far_from_aabb(o, d, aabb)
    np.testing.assert_allclose(near[0], 2.0, rtol=1e-5)
    np.testing.assert_allclose(far[0], 4.0, rtol=1e-5)
    assert near[1] > 1e8


def test_composite_dense_matches_bruteforce():
    rng = np.random.default_rng(4)
    n, k = 8, 16
    sig = jnp.asarray(rng.uniform(0, 5, (n, k)).astype(np.float32))
    rgb = jnp.asarray(rng.uniform(0, 1, (n, k, 3)).astype(np.float32))
    dts = jnp.asarray(rng.uniform(0.01, 0.1, (n, k)).astype(np.float32))
    ts = jnp.cumsum(dts, axis=-1)
    out = composite_dense(sig, rgb, dts, ts)
    # brute force
    T = np.ones(n)
    img = np.zeros((n, 3))
    wsum = np.zeros(n)
    for j in range(k):
        a = 1 - np.exp(-np.asarray(sig[:, j]) * np.asarray(dts[:, j]))
        w = T * a
        img += w[:, None] * np.asarray(rgb[:, j])
        wsum += w
        T = T * (1 - a)
    np.testing.assert_allclose(out["image"], img, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out["weights_sum"], wsum, rtol=1e-4, atol=1e-5)


def test_compact_and_flat_composite_match_dense():
    """The compacted flat path must reproduce the dense masked path exactly."""
    rng = np.random.default_rng(5)
    n, t = 16, 32
    rays_o = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    rays_d = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    ts = jnp.asarray(np.sort(rng.uniform(0.1, 3.0, (n, t)), axis=1).astype(np.float32))
    dts = jnp.asarray(rng.uniform(0.01, 0.05, (n, t)).astype(np.float32))
    valid = jnp.asarray(rng.uniform(size=(n, t)) > 0.4)
    budget = int(np.asarray(valid).sum()) + 3

    marched = compact_samples(ts, dts, valid, rays_o, rays_d, budget)
    sig_fn = lambda x: 2.0 + jnp.sin(x.sum(-1))
    rgb_fn = lambda x: jax.nn.sigmoid(x)

    sig_flat = sig_fn(marched.xyzs) * marched.valid
    rgb_flat = rgb_fn(marched.xyzs)
    out_flat = composite_flat(sig_flat, rgb_flat, marched.deltas, marched.ts,
                              marched.ray_id, marched.offsets, marched.valid, n)

    xyz_dense = rays_o[:, None] + ts[..., None] * rays_d[:, None]
    sig_dense = jnp.where(valid, sig_fn(xyz_dense), 0.0)
    out_dense = composite_dense(sig_dense, rgb_fn(xyz_dense), dts, ts, valid)

    np.testing.assert_allclose(out_flat["image"], out_dense["image"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out_flat["weights_sum"], out_dense["weights_sum"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out_flat["depth"], out_dense["depth"], rtol=1e-4, atol=1e-5)


def test_composite_flat_scan_matches_scatter():
    """seg_mode='scan' (eval default, trainer.py render_eval) must agree
    with the exact 'scatter' reduction to prefix-rounding tolerance —
    including tau_in/tau_out round chaining and an over-budget buffer whose
    tail slots are invalid pads (ADVICE r3 item 1: the scan path previously
    had no fast-lane unit coverage)."""
    rng = np.random.default_rng(11)
    n, t = 32, 24
    rays_o = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    rays_d = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    ts = jnp.asarray(np.sort(rng.uniform(0.1, 3.0, (n, t)), axis=1)
                     .astype(np.float32))
    dts = jnp.asarray(rng.uniform(0.01, 0.05, (n, t)).astype(np.float32))
    valid = jnp.asarray(rng.uniform(size=(n, t)) > 0.3)
    # over-provisioned budget -> invalid tail pads beyond the packed samples
    budget = int(np.asarray(valid).sum()) + 40
    marched = compact_samples(ts, dts, valid, rays_o, rays_d, budget)
    sig = (2.0 + jnp.sin(marched.xyzs.sum(-1))) * marched.valid
    rgb = jax.nn.sigmoid(marched.xyzs)
    tau_in = jnp.asarray(rng.uniform(0, 2, (n,)).astype(np.float32))

    args = (sig, rgb, marched.deltas, marched.ts, marched.ray_id,
            marched.offsets, marched.valid, n)
    for ti in (None, tau_in):
        o_scat = composite_flat(*args, tau_in=ti, seg_mode="scatter")
        o_scan = composite_flat(*args, tau_in=ti, seg_mode="scan")
        for k in o_scat:
            np.testing.assert_allclose(
                np.asarray(o_scan[k]), np.asarray(o_scat[k]),
                rtol=1e-3, atol=3e-3, err_msg=f"channel {k} tau={ti is not None}")
    assert "tau_out" in composite_flat(*args, tau_in=tau_in, seg_mode="scan")


def test_march_rays_hits_occupied_region():
    """March through a bitfield with one occupied octant; samples must land there."""
    from seal3d_tpu.ops.bitfield import GRID_CELLS
    from seal3d_tpu.ops.morton import morton3d_invert

    coords = morton3d_invert(jnp.arange(GRID_CELLS, dtype=jnp.uint32))
    # occupy cells with x,y,z all in upper half (world > 0 octant)
    occ = (np.asarray(coords) >= 64).all(-1).astype(np.float32)
    bf = packbits(jnp.asarray(occ)[None, :], 0.5)

    o = jnp.array([[0.5, 0.5, -2.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    m = march_rays(o, d, bf, bound=1.0, cascades=1, dt_gamma=0.0,
                   max_steps=256, budget=256)
    pts = np.asarray(m.xyzs)[np.asarray(m.valid)]
    assert len(pts) > 10
    assert (pts >= -0.02).all(), pts.min(0)


def test_hashgrid_pallas_backend_matches_xla():
    """The blocked one-hot kernel path must agree with the XLA gather path
    (kernel runs bf16 matmuls -> loose tolerance)."""
    import dataclasses

    cfg_x = HashGridConfig(num_levels=4, level_dim=2, base_resolution=4,
                           desired_resolution=64, log2_hashmap_size=14,
                           backend="xla")
    cfg_p = dataclasses.replace(cfg_x, backend="pallas")
    # pallas pads every level to 2^14; build its table, then scatter the
    # xla-layout values into it so both describe the same function
    key = jax.random.PRNGKey(0)
    table_p = hashgrid_init(key, cfg_p, std=0.5)
    t = 2**14
    # xla table with per-level offsets mapped into padded layout
    parts = []
    for (res, off, n, uh, _), (res2, off2, n2, uh2, _) in zip(
            cfg_x.level_params, cfg_p.level_params):
        parts.append(table_p[off2 : off2 + n])
    table_x = jnp.concatenate(parts)

    x = jax.random.uniform(jax.random.PRNGKey(1), (40, 3))
    out_x = hashgrid_encode(table_x, x, cfg_x)
    out_p = hashgrid_encode(table_p, x, cfg_p)
    np.testing.assert_allclose(out_p, out_x, rtol=2e-2, atol=2e-2)

    g = jax.grad(lambda tb: (hashgrid_encode(tb, x, cfg_p) ** 2).sum())(table_p)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


def test_hashgrid_bucket_backend_matches_xla():
    """The reference-capacity 'bucket' backend (take forward + sorted-bucket
    Pallas scatter backward) must match the xla path exactly in forward and
    to f32-accumulation tolerance in the table gradient."""
    import dataclasses

    cfg_x = HashGridConfig(num_levels=4, level_dim=2, base_resolution=4,
                           desired_resolution=64, log2_hashmap_size=14,
                           backend="xla")
    cfg_b = dataclasses.replace(cfg_x, backend="bucket")
    # identical level layout -> same table works for both
    assert cfg_x.level_params == cfg_b.level_params
    table = hashgrid_init(jax.random.PRNGKey(0), cfg_x, std=0.5)
    x = jax.random.uniform(jax.random.PRNGKey(1), (173, 3))

    out_x = hashgrid_encode(table, x, cfg_x)
    out_b = hashgrid_encode(table, x, cfg_b)
    np.testing.assert_allclose(out_b, out_x, rtol=1e-6, atol=1e-6)

    def loss(cfg):
        return lambda tb, xx: (hashgrid_encode(tb, xx, cfg) ** 2).sum()

    gt_x, gx_x = jax.grad(loss(cfg_x), argnums=(0, 1))(table, x)
    gt_b, gx_b = jax.grad(loss(cfg_b), argnums=(0, 1))(table, x)
    np.testing.assert_allclose(gt_b, gt_x, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(gx_b, gx_x, rtol=1e-4, atol=1e-5)


def test_bucket_scatter_add_hot_keys():
    """Duplicate-heavy scatter (coarse dense levels hammer few entries) must
    accumulate exactly: every request lands, independent of bucket load."""
    from seal3d_tpu.ops.pallas.bucket_grad import bucket_scatter_add

    rng = np.random.default_rng(3)
    r, t, f = 30000, 2**13, 3
    keys = rng.integers(0, t, r)
    keys[: r // 3] = 5  # a third of all requests hit one entry
    grads = rng.normal(size=(r, f)).astype(np.float32)
    got = np.asarray(bucket_scatter_add(jnp.asarray(keys, jnp.int32),
                                        jnp.asarray(grads), t))
    ref = np.zeros((t, f), np.float64)
    np.add.at(ref, keys, grads.astype(np.float64))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_sph_from_ray_on_sphere():
    from seal3d_tpu.ops.raymarch import sph_from_ray

    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])  # hits sphere at (0,0,r): theta=0, phi=0
    sph = np.asarray(sph_from_ray(o, d, radius=4.0))
    np.testing.assert_allclose(sph[0], [0.0, 0.0], atol=1e-5)
    d2 = jnp.array([[0.0, 1.0, 0.0]])  # +y pole: theta = pi/2 -> 1.0
    sph2 = np.asarray(sph_from_ray(o, d2, radius=4.0))
    np.testing.assert_allclose(sph2[0, 0], 1.0, atol=1e-5)


def test_wrap_gridtype_injective_and_local():
    """'wrap' indexing: injective over one period (a permutation of the
    table) and equal across period translations (the aliasing relation is
    exactly coords mod P)."""
    from seal3d_tpu.ops.hashgrid import _corner_indices

    p = 16
    g = np.stack(np.meshgrid(*[np.arange(p)] * 3, indexing="ij"),
                 -1).reshape(-1, 3)
    idx = np.asarray(_corner_indices(jnp.asarray(g), 64, False, p**3, 3,
                                     "wrap", level=3))
    assert len(np.unique(idx)) == p**3
    idx2 = np.asarray(_corner_indices(jnp.asarray(g + [p, 2 * p, p]), 64,
                                      False, p**3, 3, "wrap", level=3))
    np.testing.assert_array_equal(idx, idx2)


def test_hashgrid_halo_backend_matches_take_oracle():
    """The one-row-per-sample halo kernel must agree with a take-based
    gather over the identical wrap indexing — forward and table gradient
    (bf16 stored stack -> loose tolerance). Also checks that halo_expand's
    autodiff transpose routes duplicated halo-copy gradients back onto
    master entries (gradient nonzero pattern == oracle's)."""
    from seal3d_tpu.ops.hashgrid import corner_indices_weights

    cfg = HashGridConfig(log2_hashmap_size=12, num_levels=4,
                         desired_resolution=256, gridtype="wrap",
                         backend="halo")
    tab = hashgrid_init(jax.random.PRNGKey(0), cfg, std=0.5)
    x = jax.random.uniform(jax.random.PRNGKey(1), (300, 3))
    idx, w = corner_indices_weights(x, cfg)

    def oracle(t):
        f = jnp.take(t, idx.reshape(300, -1), axis=0).reshape(
            300, cfg.num_levels, 8, -1)
        return (f * w[..., None]).sum(axis=2).reshape(300, -1)

    ref = oracle(tab)
    out = hashgrid_encode(tab, x, cfg)
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)

    gk = jax.grad(lambda t: (hashgrid_encode(t, x, cfg) ** 2).sum())(tab)
    gr = jax.grad(lambda t: (oracle(t) ** 2).sum())(tab)
    scale = float(jnp.abs(gr).max())
    np.testing.assert_allclose(np.asarray(gk) / scale,
                               np.asarray(gr) / scale, atol=2e-2)


def test_candidate_ts_span_adaptive_covers_interval():
    """span_adaptive ladders must cover the whole [near, far] interval for
    every ray (long spans coarsen instead of truncating) while short spans
    keep the dt_min density of the uniform ladder."""
    from seal3d_tpu.ops.raymarch import SQRT3, candidate_ts

    nears = jnp.array([0.1, 0.1], jnp.float32)
    fars = jnp.array([0.3, 3.0], jnp.float32)  # short and long span
    c, max_steps = 128, 512
    dt_min = 2.0 * SQRT3 / max_steps
    ts, dts, valid = candidate_ts(nears, fars, c, 0.0, 1.0, max_steps,
                                  span_adaptive=True)
    # last candidate reaches the far bound (no truncation of the long ray)
    assert float(ts[1, -1]) >= float(fars[1]) - float(dts[1, 0]) * 1.5
    # short ray keeps dt_min spacing
    np.testing.assert_allclose(np.asarray(dts[0]), dt_min, rtol=1e-6)
    # uniform ladder (default) truncates the long ray at c * dt_min
    ts_u, _, valid_u = candidate_ts(nears, fars, c, 0.0, 1.0, max_steps)
    assert float(ts_u[1, -1]) < float(fars[1])


def test_hashgrid_halo_valid_mask_skip():
    """With a packed-valid mask, the halo kernel must (a) return features
    identical to the all-valid call on VALID rows, (b) zero features on
    invalid rows, and (c) route zero gradient from invalid rows even when
    their cotangent is nonzero (the chunk-skip path must not change any
    valid sample's value or gradient)."""
    cfg = HashGridConfig(log2_hashmap_size=12, num_levels=4,
                         desired_resolution=256, gridtype="wrap",
                         backend="halo")
    tab = hashgrid_init(jax.random.PRNGKey(0), cfg, std=0.5)
    m = 300
    x = jax.random.uniform(jax.random.PRNGKey(1), (m, 3))
    valid = jnp.arange(m) % 3 != 1  # interleaved invalid slots

    full = hashgrid_encode(tab, x, cfg)
    masked = hashgrid_encode(tab, x, cfg, valid=valid)
    np.testing.assert_allclose(np.asarray(masked)[np.asarray(valid)],
                               np.asarray(full)[np.asarray(valid)],
                               rtol=1e-6, atol=1e-6)
    assert np.abs(np.asarray(masked)[~np.asarray(valid)]).max() == 0.0

    # gradient: cotangent nonzero EVERYWHERE, but invalid rows contribute 0
    g_masked = jax.grad(lambda t: hashgrid_encode(t, x, cfg, valid=valid).sum())(tab)
    g_oracle = jax.grad(
        lambda t: jnp.where(valid[:, None],
                            hashgrid_encode(t, x, cfg), 0.0).sum())(tab)
    np.testing.assert_allclose(np.asarray(g_masked), np.asarray(g_oracle),
                               rtol=1e-4, atol=1e-4)

    # tail-packed mask (the real train layout: valid prefix, dead tail)
    valid_tail = jnp.arange(m) < 180
    masked_t = hashgrid_encode(tab, x, cfg, valid=valid_tail)
    np.testing.assert_allclose(np.asarray(masked_t)[:180],
                               np.asarray(full)[:180], rtol=1e-6, atol=1e-6)
    assert np.abs(np.asarray(masked_t)[180:]).max() == 0.0


def test_hashgrid_halo_bwd_level_blocked_parity(monkeypatch):
    """The backward's level-blocked gradient-table grid (the T=2^18 VMEM
    fix, round-4: halo_encode._BWD_TABLE_BYTES) must be bit-equivalent to
    the single-window path. Force lb=1 (4 level blocks) by shrinking the
    budget and compare table gradients against the default."""
    from seal3d_tpu.ops.pallas import halo_encode

    cfg = HashGridConfig(log2_hashmap_size=12, num_levels=4,
                         desired_resolution=256, gridtype="wrap",
                         backend="halo")
    tab = hashgrid_init(jax.random.PRNGKey(0), cfg, std=0.5)
    x = jax.random.uniform(jax.random.PRNGKey(1), (300, 3))

    def table_grad():
        return jax.grad(
            lambda t: (hashgrid_encode(t, x, cfg) ** 2).sum())(tab)

    assert halo_encode._bwd_level_block(4, 64, 2 * 128) == 4
    g_full = table_grad()
    monkeypatch.setattr(halo_encode, "_BWD_TABLE_BYTES", 64 * 2 * 128 * 4)
    assert halo_encode._bwd_level_block(4, 64, 2 * 128) == 1
    g_blocked = table_grad()
    np.testing.assert_array_equal(np.asarray(g_full), np.asarray(g_blocked))


def test_hashgrid_tv_loss():
    from seal3d_tpu.ops.hashgrid import hashgrid_tv_loss

    cfg = HashGridConfig(num_levels=2, level_dim=1, base_resolution=4,
                         desired_resolution=8, log2_hashmap_size=16)
    smooth = jnp.zeros((cfg.total_params, 1))
    assert float(hashgrid_tv_loss(smooth, cfg, level=0)) == 0.0
    rough = hashgrid_init(jax.random.PRNGKey(0), cfg, std=1.0)
    assert float(hashgrid_tv_loss(rough, cfg, level=0)) > 0.0
    g = jax.grad(lambda t: hashgrid_tv_loss(t, cfg))(rough)
    assert np.isfinite(np.asarray(g)).all()


def test_eff_distloss_zero_for_point_mass():
    from seal3d_tpu.utils.losses import eff_distloss

    # all weight on one sample with tiny interval -> near-zero distortion
    w = jnp.zeros((2, 8)).at[:, 3].set(1.0)
    ts = jnp.broadcast_to(jnp.linspace(0.1, 1.0, 8), (2, 8))
    deltas = jnp.full((2, 8), 1e-6)
    assert float(eff_distloss(w, ts, deltas)) < 1e-5
    # spread weights -> positive loss
    w2 = jnp.full((2, 8), 1.0 / 8)
    assert float(eff_distloss(w2, ts, deltas)) > 1e-4


def test_occ_aabb_tracks_occupied_region():
    from seal3d_tpu.render.occupancy import occupancy_init, occupancy_update

    occ = occupancy_init(cascades=1)

    def density_fn(x):
        inside = (jnp.abs(x - jnp.array([0.3, 0.0, -0.2])) < 0.2).all(-1)
        return 50.0 * inside

    occ = occupancy_update(occ, density_fn, jax.random.PRNGKey(0), bound=1.0,
                           density_thresh=10.0, full=True)
    aabb = np.asarray(occ.occ_aabb)
    np.testing.assert_allclose(aabb[:3], [0.1, -0.2, -0.4], atol=0.06)
    np.testing.assert_allclose(aabb[3:], [0.5, 0.2, 0.0], atol=0.06)


def test_hashgrid_matches_reference_kernel_oracle():
    """Exact-semantics oracle of the reference CUDA kernel
    (gridencoder.cu:67-84 get_grid_index, :138 fractional scale, :148 +0.5
    offset): per-level scale must be base*g^l - 1, NOT resolution-1, and
    dense strides use resolution+1 entries per axis (align_corners=False)."""
    from seal3d_tpu.ops.hashgrid import HashGridConfig, hashgrid_encode, hashgrid_init

    cfg = HashGridConfig(num_levels=4, level_dim=2, base_resolution=4,
                         desired_resolution=32, log2_hashmap_size=7)
    table = np.asarray(hashgrid_init(jax.random.PRNGKey(0), cfg, std=0.5))
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(1), (17, 3)))
    primes = (1, 2654435761, 805459861)

    S = np.log2(cfg.per_level_scale)
    H = cfg.base_resolution
    ref = np.zeros((x.shape[0], cfg.num_levels * cfg.level_dim))
    offset = 0
    for lvl in range(cfg.num_levels):
        scale = np.exp2(lvl * S) * H - 1.0
        resolution = int(np.ceil(scale)) + 1
        params = min(2**cfg.log2_hashmap_size, (resolution + 1) ** 3)
        params = int(np.ceil(params / 8) * 8)
        for bi in range(x.shape[0]):
            pos = x[bi] * scale + 0.5
            pg = np.floor(pos).astype(np.int64)
            f = pos - pg
            acc = np.zeros(cfg.level_dim)
            for c in range(8):
                off = np.array([(c >> d) & 1 for d in range(3)])
                w = np.prod(np.where(off == 1, f, 1 - f))
                cp = pg + off
                stride, index = 1, 0
                for d in range(3):
                    if stride > params:
                        break
                    index += int(cp[d]) * stride
                    stride *= resolution + 1
                if stride > params:
                    h = 0
                    for d in range(3):
                        h ^= (int(cp[d]) * primes[d]) & 0xFFFFFFFF
                    index = h & 0xFFFFFFFF
                acc += w * table[(index % params) + offset]
            ref[bi, lvl * cfg.level_dim:(lvl + 1) * cfg.level_dim] = acc
        offset += params

    got = np.asarray(hashgrid_encode(jnp.asarray(table), jnp.asarray(x), cfg))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_stacked_encode_matches_separate():
    """hashgrid_encode_stacked must equal two independent encodes (both
    backends route through it via models/ngp.apply)."""
    from seal3d_tpu.ops.hashgrid import (HashGridConfig, hashgrid_encode,
                                         hashgrid_encode_stacked, hashgrid_init)

    cfg = HashGridConfig(num_levels=3, level_dim=2, base_resolution=4,
                         desired_resolution=32, log2_hashmap_size=8)
    t1 = hashgrid_init(jax.random.PRNGKey(0), cfg, std=0.5)
    t2 = hashgrid_init(jax.random.PRNGKey(1), cfg, std=0.5)
    x = jax.random.uniform(jax.random.PRNGKey(2), (33, 3))
    a, b = hashgrid_encode_stacked((t1, t2), x, cfg)
    np.testing.assert_allclose(a, hashgrid_encode(t1, x, cfg), atol=1e-6)
    np.testing.assert_allclose(b, hashgrid_encode(t2, x, cfg), atol=1e-6)


def test_ngp_apply_matches_density_color():
    """The fused-gather apply must equal the density()+color() composition."""
    from seal3d_tpu.models import ngp
    from seal3d_tpu.models.ngp import NGPConfig

    for backend in ("xla", "pallas"):
        cfg = NGPConfig(bound=1.0, log2_hashmap_size=14, grid_backend=backend)
        params = ngp.init(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (40, 3)) * 1.6 - 0.8
        d = jax.random.normal(jax.random.PRNGKey(2), (40, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        s1, c1 = ngp.apply(params, cfg, x, d)
        out = ngp.density(params, cfg, x)
        c2 = ngp.color(params, cfg, x, d, out["geo_feat"])
        np.testing.assert_allclose(s1, out["sigma"], rtol=2e-5, atol=1e-5)
        np.testing.assert_allclose(c1, c2, rtol=2e-5, atol=1e-5)


def test_lpips_proxy_ranks_distortions():
    """The weight-free perceptual proxy must rank distortions sensibly:
    identical < slightly blurred < heavily noised/shuffled."""
    from seal3d_tpu.train.metrics import PerceptualMeter, lpips_proxy

    rng = np.random.default_rng(0)
    # structured image: smooth gradient + edges
    y, x = np.mgrid[0:64, 0:64] / 64.0
    img = np.stack([x, y, ((x * 8).astype(int) % 2).astype(float)], -1)
    assert lpips_proxy(img, img) < 1e-9
    blur = img.copy()  # horizontal blur (softens the vertical stripe edges)
    blur[:, 1:-1] = (img[:, :-2] + img[:, 1:-1] + img[:, 2:]) / 3
    noisy = np.clip(img + rng.normal(0, 0.3, img.shape), 0, 1)
    d_blur = lpips_proxy(img, blur)
    d_noise = lpips_proxy(img, noisy)
    assert 0 < d_blur < d_noise, (d_blur, d_noise)
    m = PerceptualMeter()
    assert m.kind == "lpips_proxy"  # no weights in this image
    m.update(img, noisy)
    assert m.measure() > 0


def test_encoder_factory():
    """get_encoder parity with the reference factory (encoding.py:44-77):
    names map to the right encoder and advertised output_dim matches."""
    from seal3d_tpu.ops.encoding import get_encoder
    from seal3d_tpu.ops.freq import freq_encode
    from seal3d_tpu.ops.sh import sh_encode

    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (17, 3))
    d = x / jnp.linalg.norm(x, axis=-1, keepdims=True)

    enc = get_encoder("None")
    assert enc.init(key) is None and enc.output_dim == 3
    np.testing.assert_array_equal(enc.encode(None, x), x)

    enc = get_encoder("frequency", multires=6)
    out = enc.encode(enc.init(key), x)
    assert out.shape == (17, enc.output_dim)
    np.testing.assert_allclose(out, freq_encode(x, 6))

    enc = get_encoder("sphere_harmonics", degree=4)
    out = enc.encode(enc.init(key), d)
    assert out.shape == (17, 16)
    np.testing.assert_allclose(out, sh_encode(d, 4))

    for name, gridtype in (("hashgrid", "hash"), ("tiledgrid", "tiled"),
                           ("wrapgrid", "wrap")):
        enc = get_encoder(name, num_levels=4, level_dim=2,
                          log2_hashmap_size=8, desired_resolution=64)
        assert enc.grid_cfg.gridtype == gridtype
        params = enc.init(key)
        out = enc.encode(params, x)  # x in [0,1]
        assert out.shape == (17, enc.output_dim) == (17, 8)
        assert jnp.isfinite(out).all()

    with pytest.raises(NotImplementedError):
        get_encoder("ash")
