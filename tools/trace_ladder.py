"""Pass-by-pass eager trace of the lane-packed theta ladder at headline
scale (the debug hooks on _build_ladder_opt's `run`): one jit(body) call
per pass, printing the carry after each — ground truth for WHERE the
ladder spends its passes (far jumps / fine passes / stall) when the
fused while_loop's pass count disagrees with expectations."""
import math
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
jax.config.update("jax_include_full_tracebacks_in_locations", False)
sys.path.insert(0, "/root/repo")


def main():
    from bench import build_problem
    from bayesgp_tpu.inference import aghq

    be = build_problem()
    k = 4
    pk = aghq._packed_lane_view(be, max(k, 2, aghq._LADDER_R))
    assert pk is not None
    em_dim = float(np.asarray(be.em_dims)[0])
    alpha = float(np.asarray(be.md.alpha).reshape(-1)[0])
    u = float(np.asarray(be.md.u).reshape(-1)[0])
    em_phi = -math.log(alpha) / u
    # f32 compute-dtype constants of build_fused_run_1d
    h_fd, th_tol = 0.3, 1e-4
    run = aghq._build_ladder_opt(be, pk, 1e-9, 40, h_fd, em_dim,
                                 em_phi, th_tol)
    body = jax.jit(run.body)
    th0 = jnp.asarray(0.0, be.dtype)
    c = run.init_carry(th0, be.init_state())
    t0 = time.time()
    for i in range(40):
        c = body(c)
        jax.block_until_ready(c["th"])
        dt = time.time() - t0
        t0 = time.time()
        print(f"pass {int(c['it']):2d} {dt*1e3:7.1f}ms "
              f"th={float(c['th']):+9.4f} g={float(c['g']):+9.3f} "
              f"fb={float(c['fb']):.6e} "
              f"lo={float(c['lo']):+9.4f} hi={float(c['hi']):+9.4f} "
              f"w={float(c['hi'] - c['lo']):9.3e} "
              f"have={bool(c['have'])} fd={bool(c['seen_fd'])} "
              f"stall={int(c['stall'])} H={float(c['H']):+9.3f} "
              f"root={float(c['root']):+9.4f} done={bool(c['done'])}",
              flush=True)
        if bool(c["done"]):
            break


if __name__ == "__main__":
    main()
