"""Where does MBCn.train's public-API overhead go? (bench shape: 64x3x30yr)"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from xsdba_tpu import DataArray, MBCn, date_range
from xsdba_tpu.models.mbcn import _mbcn_train_block, _to_vtime_layout
from xsdba_tpu.models._wrap import to_device_cached
from xsdba_tpu.ops.rotation import rand_rot_matrix
from xsdba_tpu.ops.correction import equally_spaced_nodes
from xsdba_tpu.utils.grouper import Grouper

rng = np.random.default_rng(3)
S, V, T = 64, 3, 365 * 30
t = date_range("1981-01-01", periods=T, freq="D", calendar="noleap")
mv = np.array(["tasmax", "pr", "huss"])


def mk(seed):
    r = np.random.default_rng(seed)
    return DataArray(
        r.normal(10, 3, (S, V, T)).astype(np.float32),
        ("site", "multivar", "time"),
        {"time": t, "multivar": mv, "site": np.arange(S)},
        {"units": ""},
        "data",
    )


ref, hist = mk(1), mk(2)
kw = dict(base_kws={"nquantiles": 50, "group": "time"}, n_iter=20, n_escore=-1)

obj = MBCn.train(ref, hist, **kw)  # warm/compile
float(np.asarray(obj.ds["af_q"].data).ravel()[0])


def timed(name, f, n=3):
    t0 = time.perf_counter()
    for _ in range(n):
        r = f()
    dt = (time.perf_counter() - t0) / n
    print(f"{name:45s} {dt*1000:8.1f} ms", flush=True)
    return r


# full public call (the bench metric)
def full():
    o = MBCn.train(ref, hist, skip_input_checks=True, **kw)
    float(np.asarray(o.ds["af_q"].data).ravel()[0])


timed("FULL public train (fetch af_q[0])", full)

# stage dissection ---------------------------------------------------------
group = Grouper("time", 1)
timed("layout transpose + move_dim_last (host)", lambda: (
    _to_vtime_layout(ref, "multivar").move_dim_last("time").data,
    _to_vtime_layout(hist, "multivar").move_dim_last("time").data,
))
refa = to_device_cached(_to_vtime_layout(ref, "multivar").move_dim_last("time").data)
hista = to_device_cached(_to_vtime_layout(hist, "multivar").move_dim_last("time").data)
timed("to_device_cached x2 (should be cache hit)", lambda: (
    to_device_cached(_to_vtime_layout(ref, "multivar").move_dim_last("time").data),
    to_device_cached(_to_vtime_layout(hist, "multivar").move_dim_last("time").data),
))
timed("rand_rot_matrix(3, 20) dispatch", lambda: rand_rot_matrix(3, num=20))
rot = rand_rot_matrix(3, num=20)
timed("rand_rot_matrix + block", lambda: rand_rot_matrix(3, num=20).block_until_ready())
timed("group.indexes(ref.time)", lambda: group.indexes(ref.time))
gi = group.indexes(ref.time)
q = jnp.asarray(equally_spaced_nodes(50), dtype=jnp.float32)
gidx = jnp.asarray(gi.gather_idx)
rotj = jnp.asarray(rot, dtype=jnp.float32)

def core():
    af_q, esc = _mbcn_train_block(refa, hista, gidx, rotj, q, interp="nearest", extrap="constant", n_escore=-1)
    float(np.asarray(af_q).ravel()[0])

timed("core _mbcn_train_block + fetch[0]", core)

def core_fetchall():
    af_q, esc = _mbcn_train_block(refa, hista, gidx, rotj, q, interp="nearest", extrap="constant", n_escore=-1)
    np.asarray(af_q)

timed("core + fetch FULL af_q", core_fetchall)
