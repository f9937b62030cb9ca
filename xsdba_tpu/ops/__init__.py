from .correction import ADDITIVE, MULTIPLICATIVE, apply_correction, ecdf, equally_spaced_nodes, get_correction, invert, map_cdf
from .interp import interp1d_table, interp_on_quantiles_grouped, searchsorted_batched
from .quantile import grouped_nan_quantile, nan_quantile, vecquantiles
from .rank import average_rank, pct_rank, rank_pct_rescaled
from .segment import gather_groups, grouped_mean, grouped_rank, grouped_std, scatter_back
