"""Capture a device trace of hessian_factor and print the top HLO ops by
self time (ground truth for where the 350 ms goes)."""
import glob
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
sys.path.insert(0, "/root/repo")

TRACE_DIR = "/tmp/jax_trace_hf"


def main():
    from bench import build_problem

    be = build_problem(n=100_000, k=2000)
    th = jnp.zeros((1,), be.dtype)
    V0, t0_ = be.init_state()
    hf = jax.jit(lambda V, tl: be.hessian_factor(V, tl, th))
    out = hf(V0, t0_)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)

    os.system(f"rm -rf {TRACE_DIR}")
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(3):
            out = hf(V0, t0_)
            jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)

    # parse the xplane
    files = glob.glob(f"{TRACE_DIR}/**/*.xplane.pb", recursive=True)
    print("xplane files:", files)
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
    for tool in ("framework_op_stats", "op_profile"):
        try:
            data, _ = rtd.xspace_to_tool_data(files, tool, {})
            fn = f"/tmp/hf_{tool}.out"
            mode = "wb" if isinstance(data, bytes) else "w"
            with open(fn, mode) as f:
                f.write(data)
            print("wrote", fn, len(data))
        except Exception as e:
            print(tool, "failed:", e)


if __name__ == "__main__":
    main()
