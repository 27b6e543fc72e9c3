"""Interactive GUI (dearpygui frontend over the JAX trainers).

Equivalent of reference nerf/gui.py + SealNeRF/gui.py. The logic lives in
gui/state.py (testable headless); this module provides the dearpygui shell —
gated, since dearpygui is not installed in every environment (this image
ships without it)."""

from seal3d_tpu.gui.state import (DynamicBudget, EditSession, MaskPainter,
                                  OrbitCamera, SealController, ToolState,
                                  depth_lift, lift_pixels, texture_rect_config)

try:  # pragma: no cover - needs a display + dearpygui
    import dearpygui.dearpygui as dpg

    HAS_DPG = True
except Exception:  # pragma: no cover
    dpg = None
    HAS_DPG = False


def launch_gui(args, trainer):  # pragma: no cover - interactive
    """Viewer + live training (reference NeRFGUI, nerf/gui.py:55)."""
    if not HAS_DPG:
        raise RuntimeError(
            "dearpygui is not installed; run headless via the CLI instead "
            "(the reference GUI stack needs `pip install dearpygui`)")
    from seal3d_tpu.gui.viewer import NeRFViewer

    NeRFViewer(args, trainer).render()


def launch_seal_gui(args, field_mod, fcfg, make_trainer):  # pragma: no cover
    """Editing frontend (reference SealNeRF/gui.py:97)."""
    if not HAS_DPG:
        raise RuntimeError(
            "dearpygui is not installed; run headless edits via "
            "main_SealNeRF.py --seal_config <dir>")
    from seal3d_tpu.gui.viewer import SealViewer

    SealViewer(args, field_mod, fcfg, make_trainer).render()
