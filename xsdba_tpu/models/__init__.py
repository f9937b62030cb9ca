"""Adjustment model families (the public API surface of the framework)."""

from .base import Adjust, BaseAdjustment, TrainAdjust
from .dqm import DetrendedQuantileMapping
from .eqm import EmpiricalQuantileMapping, QuantileDeltaMapping
from .mbcn import MBCn, NpdfTransform
from .scaling import LOCI, Scaling

__all__ = [
    "Adjust",
    "BaseAdjustment",
    "DetrendedQuantileMapping",
    "EmpiricalQuantileMapping",
    "LOCI",
    "MBCn",
    "NpdfTransform",
    "QuantileDeltaMapping",
    "Scaling",
    "TrainAdjust",
]
