"""CLI smoke tests: each main's arg surface parses and a micro run of the
NGP CLI completes end-to-end (tiny synthetic scene, dense path, CPU)."""

import os
import sys

import pytest


def _run_main(module, argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", argv)
    module.main()


def test_main_nerf_micro(tmp_path, monkeypatch):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import main_nerf

    ws = str(tmp_path / "ws")
    _run_main(main_nerf, [
        "main_nerf.py", "synthetic", "--workspace", ws,
        "--iters", "60", "--num_rays", "128", "--H", "32", "--W", "32",
        "--bound", "1.0", "--dense_render", "--num_steps", "32",
        "--upsample_steps", "0", "--min_near", "0.05",
        "--log2_hashmap_size", "13", "--eval_interval", "1000",
    ], monkeypatch)
    assert os.path.exists(os.path.join(ws, "results"))
    ckpts = os.listdir(os.path.join(ws, "checkpoints"))
    assert any(c.endswith(".npz") for c in ckpts)


def test_all_parsers_build():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import main_CCNeRF
    import main_SealNeRF
    import main_SealTensoRF
    import main_dnerf
    import main_sdf
    import main_tensoRF
    from main_SealNeRF import add_seal_args
    from seal3d_tpu.config import common_parser

    p = add_seal_args(common_parser("x"))
    args = p.parse_args(["synthetic", "--seal_config", "cfg", "-O"])
    assert args.O and args.seal_config == "cfg"
