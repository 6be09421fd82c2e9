"""Photographic texture pools bundled with installed packages.

This environment has zero egress and no real video datasets, so the
closest available stand-in for natural content is the set of REAL
PHOTOGRAPHS shipped as assets inside installed packages: material
photos (wood, skin, marble, grass, foil, metal) from dm_control /
gymnasium_robotics simulation assets, plus sklearn's sample photos and
matplotlib's grace_hopper portrait.  They carry genuine sensor
statistics — 1/f spectra, chroma correlation, texture at multiple
scales — that the procedural generators cannot fake.

The pool is split DISJOINTLY:

  * TRAIN: used by scripts/train_toy.py's clip generator,
  * HELDOUT: used only by scripts/eval_data.py's natural-composite
    family, so the evaluation never sees a training texture.

No real video enters this environment; documented in docs/STATUS.md.
All loaders degrade gracefully (a missing asset is skipped), and the
returned arrays are float32 RGB in [0, 1].
"""

from __future__ import annotations

from pathlib import Path
from typing import List

import numpy as np

_SITE = Path("/opt/venv/lib/python3.12/site-packages")
_GYM = _SITE / "gymnasium_robotics/envs/assets"
_DMC = _SITE / "dm_control"

_LAB = _SITE / "labmaze/assets"

# Material photographs used for TRAINING clips.  Families: material
# close-ups (wood/marble/metal/skin), outdoor photography (sky, grass,
# soccer pitch), fabric (jersey textures), and genuine SCREEN CONTENT
# (documentation screenshots) — the content class the reference's CLIC21
# screen-content clips cover.
TRAIN_TEXTURES = [
    _GYM / "kitchen_franka/kitchen_assets/textures/wood1.png",
    _GYM / "kitchen_franka/kitchen_assets/textures/white_marble_tile.png",
    _GYM / "kitchen_franka/kitchen_assets/textures/marble1.png",
    _GYM / "kitchen_franka/kitchen_assets/textures/metal1.png",
    _GYM / "adroit_hand/resources/textures/skin.png",
    _GYM / "adroit_hand/resources/textures/silverRaw.png",
    _DMC / "locomotion/arenas/assets/outdoor_natural/OutdoorSkybox2048.png",
    _DMC / "locomotion/arenas/assets/outdoor_natural/OutdoorGrassFloorD.png",
    _DMC / "suite/dog_assets/skin_texture.png",
    _DMC / "locomotion/soccer/assets/pitch/pitch_m.png",
    _DMC / "locomotion/walkers/assets/jumping_ball/jumping_ball_body.png",
    _DMC / "locomotion/soccer/assets/humanoid/B_01.png",
    _DMC / "locomotion/soccer/assets/humanoid/B_05.png",
    _DMC / "locomotion/soccer/assets/humanoid/R_03.png",
    _DMC / "suite/dog_assets/tennis_ball.png",
    _DMC / "blender/mujoco_exporter/doc/install_plugin.png",
    _DMC / "blender/mujoco_exporter/doc/limits.png",
    _LAB / "sky_01/up.png",
    _LAB / "style_01/floor_light_m.png",
    _LAB / "style_02/wall_purple_d.png",
    _LAB / "style_05/floor_blue_d.png",
    _LAB / "style_03/floor_orange_d.png",
]

# Photographs reserved for HELD-OUT evaluation (never trained on).
HELDOUT_TEXTURES = [
    _GYM / "adroit_hand/resources/textures/darkwood.png",
    _GYM / "adroit_hand/resources/textures/foil.png",
    _GYM / "adroit_hand/resources/textures/marble.png",
    _GYM / "kitchen_franka/kitchen_assets/textures/tile1.png",
    _GYM / "kitchen_franka/kitchen_assets/textures/white_marble_tile2.png",
]


def _load(path: Path):
    try:
        from PIL import Image

        im = Image.open(path).convert("RGB")
        return np.asarray(im, np.float32) / 255.0
    except Exception:
        return None


def _legacy_pool() -> List[np.ndarray]:
    """sklearn's two sample photos + matplotlib's grace_hopper (the
    round-1/2 pool; kept in TRAIN so old checkpoints' data distribution
    is a subset of the new one)."""
    pool = []
    try:
        from sklearn.datasets import load_sample_images

        for im in load_sample_images().images:
            pool.append(np.asarray(im, np.float32) / 255.0)
    except Exception:
        pass
    try:
        import matplotlib.cbook as cbook
        from PIL import Image

        with cbook.get_sample_data("grace_hopper.jpg") as f:
            pool.append(
                np.asarray(Image.open(f).convert("RGB"), np.float32) / 255.0)
    except Exception:
        pass
    return pool


def train_pool() -> List[np.ndarray]:
    """All training photographs (legacy photos + material textures)."""
    pool = _legacy_pool()
    for p in TRAIN_TEXTURES:
        im = _load(p)
        if im is not None:
            pool.append(im)
    return pool


def heldout_pool() -> List[np.ndarray]:
    """Held-out photographs (disjoint from train_pool)."""
    pool = []
    for p in HELDOUT_TEXTURES:
        im = _load(p)
        if im is not None:
            pool.append(im)
    return pool
