"""Adjustment model families (the public API surface of the framework)."""

from .base import Adjust, BaseAdjustment, TrainAdjust
from .dqm import DetrendedQuantileMapping
from .eqm import EmpiricalQuantileMapping, QuantileDeltaMapping
from .extremes import ExtremeValues
from .mbcn import MBCn, NpdfTransform
from .otc import OTC, dOTC
from .pca import PrincipalComponents
from .scaling import LOCI, Scaling

__all__ = [
    "Adjust",
    "BaseAdjustment",
    "DetrendedQuantileMapping",
    "EmpiricalQuantileMapping",
    "ExtremeValues",
    "LOCI",
    "MBCn",
    "NpdfTransform",
    "OTC",
    "PrincipalComponents",
    "QuantileDeltaMapping",
    "Scaling",
    "TrainAdjust",
    "dOTC",
]
