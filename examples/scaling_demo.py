"""TPU scaling surfaces the reference does not have (SURVEY.md §2.3:
its only concurrency is a PSOCK process cluster over independent fits):

1. replicate fits sharded over a device mesh — one fused AGHQ program
   per replicate, zero cross-device traffic until the final gather
   (parallel/replicates.replicate_fits);
2. lane-PACKED replicate fits — within each chip, up to 128/G fits
   share every band factorization in one Pallas kernel pass
   (replicate_fits_packed);
3. observation-axis data sharding of ONE large fit — the chunked O(n·w)
   design partitions over the mesh and the fused fit runs SPMD
   (model_fit(data_mesh=...)).

Runs on 8 virtual CPU devices by default so it works anywhere; on a
real multi-chip TPU slice drop the XLA_FLAGS line and the same code
shards over ICI.

Run: python examples/scaling_demo.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if not os.environ.get("BAYESGP_EXAMPLE_TPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

import bayesgp_tpu as bg
from bayesgp_tpu import terms as T
from bayesgp_tpu.model import build as B
from bayesgp_tpu.fast.iwp import build_fast_iwp
from bayesgp_tpu.parallel import data_sharded as DS
from bayesgp_tpu.parallel.mesh import make_mesh
from bayesgp_tpu.parallel.replicates import (replicate_fits,
                                             replicate_fits_packed)

devices = jax.devices()
print(f"{len(devices)} devices: {devices[0].platform}")

# ---- a shared design with R replicate responses --------------------
n_dev = len(devices)
n, k, R = 4000, 40, n_dev
rng = np.random.default_rng(0)
x = np.sort(rng.uniform(0.0, 100.0, n))
f_true = 1.0 + 0.5 * np.sin(x / 5)
ys = np.stack([rng.poisson(np.exp(f_true)).astype(float)
               for _ in range(R)])

inst = T.build_iwp_term("x", x, order=3, k=k)
dmf = [np.ones((n, 1))]
md = B.build_model_data([inst], dmf, ys[0], "Poisson")
xf = np.concatenate([inst.X] + dmf, axis=1)
pt = np.full(xf.shape[1], 0.01)
be = build_fast_iwp(inst, md, xf, pt, np.zeros_like(pt), inst.x_data)

mesh = make_mesh(devices, ("fits",), (n_dev,))

# 1. mesh-sharded replicate fits (one replicate per device here)
modes, lncs = replicate_fits(be, ys, k=3, mesh=mesh)
print("sharded replicate fits: modes", np.round(modes, 3))

# 2. lane-packed: all replicates through ONE batched program per chip
modes_p, lncs_p = replicate_fits_packed(be, ys, k=3)
print("packed replicate fits:  modes", np.round(modes_p, 3),
      "max |Δlnc| vs sharded:", float(np.abs(lncs_p - lncs).max()))

# 3. observation-axis sharding of one fit through the public API
fit = bg.model_fit("y ~ f(x, model='IWP', order=3, k=40)",
                   data={"y": ys[0], "x": x}, family="Poisson",
                   engine="banded", M=200,
                   data_mesh=DS.data_mesh(devices))
print("data-sharded single fit: mode", np.round(np.asarray(fit.mod.mode), 4),
      "lognormconst", round(float(fit.mod.lognormconst), 3))
pr = fit.predict("x")
print("predict head:", {kk: np.round(np.asarray(v[:3]), 3).tolist()
                        for kk, v in pr.items()})
