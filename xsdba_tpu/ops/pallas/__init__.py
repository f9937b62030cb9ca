"""Pallas TPU kernels for hot ops with a fallback XLA path."""

from .interp_kernel import interp_table_pallas, pallas_available
