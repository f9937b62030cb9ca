"""Principal-component adjustment (Hnilica 2017; reference
``adjustment.py:1053-1236``)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops.pca import pc_transform_matrix
from ..ops.segment import gather_groups
from ..utils.container import DataArray, Dataset
from ..utils.grouper import Grouper
from .base import TrainAdjust

__all__ = ["PrincipalComponents"]


def _blocks_MP(da: DataArray, gi, crd_dim: str):
    """[..., M, T]-ordered array -> blocks [..., G, M, L]."""
    dac = da.move_dim_last("time")
    ax = dac.dims.index(crd_dim)
    arr = jnp.moveaxis(jnp.asarray(dac.data), ax, 0)      # [M, ..., T]
    g = gather_groups(arr, gi.gather_idx)                  # [M, ..., G, L]
    return jnp.moveaxis(g, 0, -2)                          # [..., G, M, L]


class PrincipalComponents(TrainAdjust):
    r"""Map simulation values to observation space through principal
    components: ``scen = e_R + T (sim − e_S)`` with ``T = (R·orient) H⁻¹``
    per group (reference adjustment.py:1053-1236).
    """

    @classmethod
    def _train(
        cls,
        ref: DataArray,
        hist: DataArray,
        *,
        crd_dim: str,
        best_orientation: str = "simple",
        group: str | Grouper = "time",
    ):
        group = Grouper(group) if isinstance(group, str) else group
        if best_orientation not in ("simple", "full"):
            raise ValueError(f"Unknown `best_orientation` method: {best_orientation}.")
        gi = group.indexes(ref.time)
        refb = _blocks_MP(ref, gi, crd_dim)
        histb = _blocks_MP(hist, gi, crd_dim)
        trans, ref_mean, hist_mean = pc_transform_matrix(refb, histb, best_orientation=best_orientation)

        gdim = group.prop_name if gi.prop != "group" else "group"
        crd = np.asarray(ref.coords.get(crd_dim, np.arange(trans.shape[-1])))
        coords = {gdim: gi.coord, crd_dim: crd, crd_dim + "_out": crd}
        batch = tuple(d for d in ref.dims if d not in (crd_dim, "time"))
        ds = Dataset(
            {
                "trans": DataArray(trans, batch + (gdim, crd_dim + "_out", crd_dim), coords, {"long_name": "Transformation from training to target spaces."}, "trans"),
                "ref_mean": DataArray(ref_mean, batch + (gdim, crd_dim), coords, {"long_name": "Centroid point of target."}, "ref_mean"),
                "hist_mean": DataArray(hist_mean, batch + (gdim, crd_dim), coords, {"long_name": "Centroid point of training."}, "hist_mean"),
            }
        )
        return ds, {"group": group, "crd_dim": crd_dim, "best_orientation": best_orientation}

    def _adjust(self, sim: DataArray):
        group: Grouper = self.group
        gi = group.indexes(sim.time)
        crd_dim = self.crd_dim

        simc = sim.move_dim_last("time")
        ax = simc.dims.index(crd_dim)
        arr = jnp.moveaxis(jnp.asarray(simc.data), ax, -2)            # [..., M, T]

        # per-group mean of sim (reference adjustment.py:1219: vmean)
        g = gather_groups(arr, gi.gather_idx)                          # [..., M, G, L]
        sim_mean = jnp.nanmean(g, axis=-1)                             # [..., M, G]
        sim_mean = jnp.moveaxis(sim_mean, -1, -2)                      # [..., G, M]

        trans = jnp.asarray(self.ds["trans"].data)                     # [..., G, M, M]
        ref_mean = jnp.asarray(self.ds["ref_mean"].data)               # [..., G, M]

        gidx = jnp.asarray(gi.group_idx)
        # per-timestep: scen[:, t] = ref_mean[g(t)] + trans[g(t)] @ (sim[:, t] - sim_mean[g(t)])
        sm_t = jnp.moveaxis(sim_mean[..., gidx, :], -1, -2)            # [..., M, T]
        rm_t = jnp.moveaxis(ref_mean[..., gidx, :], -1, -2)            # [..., M, T]
        tr_t = trans[..., gidx, :, :]                                  # [..., T, M, M]
        centred = arr - sm_t
        scen = rm_t + jnp.einsum("...tij,...jt->...it", tr_t, centred)

        out = jnp.moveaxis(scen, -2, ax)
        res = DataArray(out, simc.dims, dict(simc.coords), dict(sim.attrs), "scen")
        if simc.dims != sim.dims:
            res = res.transpose(*sim.dims)
        return res
