"""Deterministic seeding (reference nerf/utils.py:142-148, seed_everything)."""

from __future__ import annotations

import os
import random

import numpy as np


def seed_everything(seed: int):
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)
