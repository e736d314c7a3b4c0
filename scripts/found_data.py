#!/usr/bin/env python
"""Collect natural-statistics images bundled in installed packages into a
training split (data/found/train), expanding the 18-image disjoint Kodak
split this zero-egress environment is otherwise limited to.

The reference trains on mini-ImageNet (reference setup.sh:34-60), which
cannot be downloaded here; the round-3 BD-rate analysis (RESULTS.md)
identified data volume as the binding constraint on absolute RD. This
script curates the photographic / natural-texture assets that ship with
already-installed packages (sklearn sample photos, dm_control +
gymnasium_robotics + labmaze environment textures: wood, marble, skin,
grass, sky, metal). Selection was made by natural-image statistics
(JPEG-q75 bpp, gradient energy) plus manual review — flat synthetic
tiles, logos, and figures are excluded.

Usage: python scripts/found_data.py [--dest data/found/train]
Idempotent; writes RGB PNGs named found_<pkg>_<name>.png. Large panoramas
are kept full-size (the loader crops 256x256 patches, so one 2048x1536
sky contributes ~48 crop-equivalents of smooth-region coverage).
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

from PIL import Image

SP = Path("/opt/venv/lib/python3.12/site-packages")

# (relative path, short name) — curated: photos first, then rich natural
# textures, then a few smooth sky gradients (natural smooth-region stats).
CURATED = [
    # real photographs
    ("sklearn/datasets/images/china.jpg", "china"),
    ("sklearn/datasets/images/flower.jpg", "flower"),
    ("matplotlib/mpl-data/sample_data/grace_hopper.jpg", "hopper"),
    # natural textures (high gradient energy, photographic origin)
    ("dm_control/locomotion/arenas/assets/outdoor_natural/OutdoorGrassFloorD.png", "grass"),
    ("dm_control/suite/dog_assets/skin_texture.png", "dogskin"),
    ("dm_control/suite/dog_assets/tennis_ball.png", "tennisball"),
    ("gymnasium_robotics/envs/assets/adroit_hand/resources/textures/skin.png", "skin"),
    ("gymnasium_robotics/envs/assets/adroit_hand/resources/textures/darkwood.png", "darkwood"),
    ("gymnasium_robotics/envs/assets/adroit_hand/resources/textures/marble.png", "marble"),
    ("gymnasium_robotics/envs/assets/adroit_hand/resources/textures/silverRaw.png", "silver"),
    ("gymnasium_robotics/envs/assets/adroit_hand/resources/textures/foil.png", "foil"),
    ("gymnasium_robotics/envs/assets/adroit_hand/resources/textures/dice.png", "dice"),
    ("gymnasium_robotics/envs/assets/kitchen_franka/kitchen_assets/textures/wood1.png", "wood"),
    ("gymnasium_robotics/envs/assets/kitchen_franka/kitchen_assets/textures/marble1.png", "marble2"),
    ("gymnasium_robotics/envs/assets/kitchen_franka/kitchen_assets/textures/metal1.png", "metal"),
    ("gymnasium_robotics/envs/assets/kitchen_franka/kitchen_assets/textures/tile1.png", "tile"),
    ("gymnasium_robotics/envs/assets/kitchen_franka/kitchen_assets/textures/white_marble_tile.png", "wmarble"),
    ("gymnasium_robotics/envs/assets/kitchen_franka/kitchen_assets/textures/white_marble_tile2.png", "wmarble2"),
    # labmaze floors with real texture content
    ("labmaze/assets/style_05/floor_blue_bright_d.png", "floor5b"),
    ("labmaze/assets/style_05/floor_orange_bright_d.png", "floor5o"),
    ("labmaze/assets/style_05/floor_orange_d.png", "floor5d"),
    ("labmaze/assets/style_02/floor_blue_d.png", "floor2b"),
    ("labmaze/assets/style_02/floor_green_bright_d.png", "floor2g"),
    ("labmaze/assets/style_01/floor_light_m.png", "floor1m"),
    # natural smooth gradients (sky panoramas; Kodak has large sky/water
    # regions and an 18-image crop set under-covers smooth statistics)
    ("dm_control/locomotion/arenas/assets/outdoor_natural/OutdoorSkybox2048.png", "skybox"),
    ("labmaze/assets/sky_01/ft.png", "sky1"),
    ("labmaze/assets/sky_02/ft.png", "sky2"),
    ("labmaze/assets/sky_03/bk.png", "sky3"),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dest", default="data/found/train")
    ap.add_argument("--max-side", type=int, default=2048,
                    help="downscale anything larger (keeps crops sharp)")
    args = ap.parse_args()
    dest = Path(args.dest)
    dest.mkdir(parents=True, exist_ok=True)

    n_ok = 0
    for rel, name in CURATED:
        src = SP / rel
        out = dest / f"found_{name}.png"
        if out.exists():
            n_ok += 1
            continue
        if not src.exists():
            print(f"missing (package layout changed?): {rel}",
                  file=sys.stderr)
            continue
        im = Image.open(src).convert("RGB")
        if max(im.size) > args.max_side:
            s = args.max_side / max(im.size)
            im = im.resize((round(im.width * s), round(im.height * s)),
                           Image.LANCZOS)
        im.save(out)
        n_ok += 1
        print(f"{out}  {im.size[0]}x{im.size[1]}")
    px = sum(Image.open(p).size[0] * Image.open(p).size[1]
             for p in dest.glob("found_*.png"))
    print(f"{n_ok}/{len(CURATED)} images, {px/1e6:.1f} MP total "
          f"(~{px // (768 * 512)} kodim-equivalents)")
    return 0 if n_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
