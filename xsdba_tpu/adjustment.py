"""Alias module mirroring the reference's ``xsdba.adjustment`` import path."""

from .models import (  # noqa: F401
    LOCI,
    OTC,
    Adjust,
    BaseAdjustment,
    DetrendedQuantileMapping,
    EmpiricalQuantileMapping,
    ExtremeValues,
    MBCn,
    NpdfTransform,
    PrincipalComponents,
    QuantileDeltaMapping,
    Scaling,
    TrainAdjust,
    dOTC,
)
from .models.sbck import generate_sbck_classes  # noqa: F401
