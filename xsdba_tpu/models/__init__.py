"""Adjustment model families (the public API surface of the framework)."""

from .base import Adjust, BaseAdjustment, TrainAdjust
from .eqm import EmpiricalQuantileMapping, QuantileDeltaMapping
from .scaling import LOCI, Scaling

__all__ = [
    "Adjust",
    "BaseAdjustment",
    "EmpiricalQuantileMapping",
    "LOCI",
    "QuantileDeltaMapping",
    "Scaling",
    "TrainAdjust",
]
