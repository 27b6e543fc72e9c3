"""Shared CLI surface.

Typed replacement for the reference's per-main argparse blocks
(main_nerf.py:15-76 and friends). The `-O` macro maps to the TPU-native fast
path (occupancy march + pallas hash encode + blocked training) the way the
reference's `-O` enabled fp16 + cuda_ray + preload. `path` may be a scene
directory with transforms*.json or the literal 'synthetic[_dynamic]' to use
the built-in procedural scene (this image ships no NeRF datasets)."""

from __future__ import annotations

import argparse
import os

from seal3d_tpu.render.renderer import RenderOptions
from seal3d_tpu.train.trainer import TrainConfig


def enable_compile_cache():
    """Persistent on-disk XLA compilation cache for the CLIs.

    Multi-stage recipes (teacher train -> seal edit -> eval/video) run as
    separate processes, and on the tunneled TPU every jit compile is a
    10-60 s remote RPC; >=60% of the bbox-edit wall-clock was re-compiling
    programs an earlier stage already built (PERFORMANCE.md round 2). The
    cache serves identical executables across processes. TPU-only: XLA:CPU
    AOT reload warns about machine-feature mismatch with SIGILL risk.
    SEAL3D_CACHE_DIR relocates it; SEAL3D_NO_CACHE=1 disables.
    Call before the first device computation (backend init is fine)."""
    import jax

    if os.environ.get("SEAL3D_NO_CACHE"):
        return
    if jax.default_backend() in ("cpu",):
        return
    d = os.environ.get(
        "SEAL3D_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "seal3d_tpu", "xla"))
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    # Persist EVERYTHING: on the tunnel even a trivial eager op is a ~0.5 s
    # remote-compile RPC, and a process dispatches ~80 of them before its
    # first big program (measured round 5: 82 sub-1s misses = ~40 s/run
    # that a >=1s threshold would never cache).
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def common_parser(desc: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=desc)
    p.add_argument("path", type=str,
                   help="scene dir (transforms*.json) or 'synthetic'")
    p.add_argument("-O", action="store_true",
                   help="fast mode: occupancy march + pallas encoder")
    p.add_argument("--workspace", type=str, default="workspace")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--test", action="store_true", help="test mode (no training)")
    p.add_argument("--iters", type=int, default=30000)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--ckpt", type=str, default="latest")
    p.add_argument("--num_rays", type=int, default=4096)
    p.add_argument("--dense_render", action="store_true",
                   help="train through the dense (oracle) renderer")
    p.add_argument("--max_steps", type=int, default=1024)
    p.add_argument("--num_steps", type=int, default=128)
    p.add_argument("--upsample_steps", type=int, default=128)
    p.add_argument("--budget_per_ray", type=int, default=48)
    p.add_argument("--patch_size", type=int, default=1)
    p.add_argument("--bound", type=float, default=2.0)
    p.add_argument("--scale", type=float, default=0.33)
    p.add_argument("--offset", type=float, nargs=3, default=[0, 0, 0])
    p.add_argument("--dt_gamma", type=float, default=1 / 128)
    p.add_argument("--min_near", type=float, default=0.2)
    p.add_argument("--density_thresh", type=float, default=10.0)
    p.add_argument("--bg_radius", type=float, default=-1)
    p.add_argument("--downscale", type=int, default=1)
    p.add_argument("--error_map", action="store_true")
    p.add_argument("--color_space", type=str, default="srgb",
                   choices=["srgb", "linear"],
                   help="train against srgb images or linearized ones")
    p.add_argument("--grid_backend", type=str, default=None,
                   choices=["xla", "pallas", "bucket", "halo"],
                   help="hash-grid gather path: 'halo' = one-row-per-sample "
                        "VMEM kernel over the wrap gridtype (fastest; -O "
                        "default), 'pallas' = one-hot kernel with reference "
                        "hashing (T <= 2^16), 'bucket' = reference-capacity "
                        "take + sorted-bucket scatter (any T), 'xla' = plain "
                        "gathers (slow backward at large T)")
    p.add_argument("--coarse_steps", type=int, default=64,
                   help="per-ray coarse interval tightening steps "
                        "(0 disables; only active for single-cascade scenes)")
    p.add_argument("--num_candidates", type=int, default=None,
                   help="march candidate ladder length (default: 256 when "
                        "coarse tightening is active and dt_gamma == 0, "
                        "else max_steps)")
    p.add_argument("--occ_stride", type=int, default=4,
                   help="test occupancy at every s-th march candidate "
                        "(stride 4 measured faster AND better than 2; "
                        "see PERFORMANCE.md)")
    p.add_argument("--adaptive_budget", action="store_true", default=None,
                   help="adapt the sample budget to measured occupancy "
                        "(the reference mean_count analog); on with -O")
    p.add_argument("--log2_hashmap_size", type=int, default=None)
    p.add_argument("--eval_interval", type=int, default=50)
    p.add_argument("--num_views", type=int, default=0,
                   help="synthetic-scene train view count (0 = per-split "
                        "default; the reference's D-NeRF captures are dense "
                        "— use 48-100 for dynamic convergence runs)")
    p.add_argument("--views_per_time", type=int, default=0,
                   help="synthetic_dynamic: simultaneous train views per "
                        "time step (0 = scene default 2; 4 constrains "
                        "per-time geometry much harder)")
    p.add_argument("--gui", action="store_true")
    p.add_argument("--W", type=int, default=800)
    p.add_argument("--H", type=int, default=800)
    p.add_argument("--radius", type=float, default=3.0)
    p.add_argument("--fovy", type=float, default=60.0)
    p.add_argument("--save_mesh", action="store_true")
    p.add_argument("--mesh_resolution", type=int, default=256)
    return p


def build_options(args) -> RenderOptions:
    coarse = getattr(args, "coarse_steps", 64)
    num_candidates = getattr(args, "num_candidates", None)
    if num_candidates is None:
        # With per-ray coarse tightening the ladder only spans the occupied
        # interval, so 256 uniform (dt_gamma=0) candidates cover it — halves
        # the dominant march gather (bench.py operating point).
        if coarse > 0 and args.dt_gamma == 0:
            num_candidates = min(args.max_steps, 256)
        else:
            num_candidates = args.max_steps
    return RenderOptions(
        bound=args.bound, dt_gamma=args.dt_gamma, max_steps=args.max_steps,
        budget_per_ray=args.budget_per_ray, num_candidates=num_candidates,
        num_steps=args.num_steps, upsample_steps=args.upsample_steps,
        min_near=args.min_near, bg_radius=args.bg_radius,
        coarse_steps=coarse, occ_stride=getattr(args, "occ_stride", 4))


def build_train_config(args, family: str = "ngp") -> TrainConfig:
    adaptive = getattr(args, "adaptive_budget", None)
    if adaptive is None:
        adaptive = bool(getattr(args, "O", False))
    eval_kw = {}
    if getattr(args, "O", False):
        # Fast-path eval operating point (round 4): budget 48, scan
        # composite, two-level flat-packed march (kg=-1/g4/pool64 — the
        # round-3 regression-fixed point, val-view parity with single-level
        # at 35.66 vs 35.57 dB) with demand-adaptive per-chunk budgets
        # (TrainConfig.eval_adaptive: flat_frac 0.5 is the default bucket;
        # each chunk renders at the smallest lossless bucket its measured
        # demand fits).
        eval_kw = dict(eval_chunk=2**15, eval_budget_per_ray=48,
                       eval_flat_frac=0.5)
        if family == "tensorf":
            # TensoRF-family fields materialize [M, rank] plane/line feature
            # stacks per sample — 2^15-ray eval chunks OOM HBM (seen on
            # CCNeRF eval: 8.4M-sample temps). 4096-ray chunks keep
            # M*rank ~ 10^8 bounded with the same operating point.
            eval_kw["eval_chunk"] = 4096
    return TrainConfig(
        lr=args.lr, max_steps=args.iters, num_rays=args.num_rays,
        density_thresh=args.density_thresh,
        error_map=args.error_map, color_space=args.color_space,
        adaptive_budget=adaptive,
        workspace=args.workspace, **eval_kw)


def load_dataset(args, split: str = "trainval"):
    from seal3d_tpu.data.provider import NeRFDataset
    from seal3d_tpu.data.synthetic import DynamicSyntheticScene, SyntheticScene

    if args.path.startswith("synthetic"):
        scene = (DynamicSyntheticScene() if "dynamic" in args.path
                 else SyntheticScene())
        n = {"trainval": 24, "train": 20, "val": 4, "test": 8}.get(split, 8)
        if split in ("trainval", "train") and getattr(args, "num_views", 0):
            n = args.num_views
        seed = {"trainval": 0, "train": 0, "val": 1, "test": 2}.get(split, 2)
        kw = {}
        vpt = getattr(args, "views_per_time", 0)
        if vpt and "dynamic" in args.path:
            kw["views_per_time"] = vpt
        return scene.make_dataset(n_views=n, h=args.H // args.downscale,
                                  w=args.W // args.downscale, seed=seed, **kw)
    return NeRFDataset.load(args.path, split=split, downscale=args.downscale,
                            scale=args.scale, offset=tuple(args.offset),
                            use_error_map=args.error_map)


def grid_defaults(args):
    """Resolve backend/table-size/gridtype defaults: -O selects the
    TPU-native halo operating point — the one-row-per-sample kernel over
    the 'wrap' gridtype at T=2^15 (the capacity cliff sits at 2^14 -> 2^15,
    hard scene +18.8 dB; wrap BEATS hash by +1.2 dB at equal T and the
    kernel is ~1.6x the fused one-hot kernel, PERFORMANCE.md). 'bucket'
    (or plain mode) keeps reference-parity hashing at T=2^19."""
    backend = args.grid_backend or ("halo" if args.O else "xla")
    log2 = args.log2_hashmap_size or (
        15 if backend in ("pallas", "halo") else 19)
    gridtype = "wrap" if backend == "halo" else "hash"
    if backend == "halo" and log2 % 3 != 0:
        raise SystemExit(
            f"--grid_backend halo needs a cubic table (T = P^3, i.e. "
            f"log2_hashmap_size divisible by 3; got {log2}). Use 15 or 18, "
            f"or --grid_backend pallas (<= 2^16) / bucket (any size).")
    if backend == "halo" and log2 > 18:
        # VMEM feasibility (ops/pallas/halo_encode.check_halo_vmem_feasible):
        # at 2^21 the forward's bf16 stored stack alone is ~0.5 GB and one
        # level's f32 gradient window exceeds the backward budget.
        raise SystemExit(
            f"--grid_backend halo is VMEM-infeasible above 2^18 (got "
            f"2^{log2}): the stored stack / per-level gradient windows "
            f"exceed the chip's VMEM. Use --log2_hashmap_size 18 or "
            f"--grid_backend bucket (reference capacity, any size).")
    return backend, log2, gridtype
