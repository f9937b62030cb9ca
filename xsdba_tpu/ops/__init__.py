from .quantile import grouped_nan_quantile, nan_quantile, vecquantiles
