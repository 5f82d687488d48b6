"""Core compute ops: FK, Jacobians, objective/residual kernels."""

from . import kinematics, objective
from .kinematics import ChainParams

__all__ = ["kinematics", "objective", "ChainParams"]
