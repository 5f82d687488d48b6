"""Robot model ingest: URDF parsing and static chain specs.

Bundled assets (``assets/``):
  * ``ur3e.urdf``  — the reference test fixture (Drake-derived UR3e).
  * ``panda.urdf`` — Franka Panda 7-DoF (public franka_description values),
    the flagship benchmark model.
  * ``ur5.urdf``   — UR5 6-DoF (public ur_description values), the
    tight-joint-limit stress model.
"""

import pathlib

from .chain import ChainSpec
from .urdf import UrdfModel, find_chain, parse_urdf

ASSETS = pathlib.Path(__file__).parent / "assets"


def asset_path(name: str) -> pathlib.Path:
    return ASSETS / name


__all__ = ["ChainSpec", "UrdfModel", "parse_urdf", "find_chain", "ASSETS",
           "asset_path"]
