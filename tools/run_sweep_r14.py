"""Round-14 prioritized on-chip bench sweep driver.

Runs bench_extra.py configs one subprocess at a time in VALUE order
(highest-priority numbers first, crash-prone configs last so a
v5-lite worker fault cannot poison the important measurements), with
a bounded health probe between configs and per-config watchdogs sized
to measured cold-compile times (BENCH_EXTRA_r13 first_compile_s).

Each config's stdout/stderr stream to /tmp/sweep_r14_<key>.{out,err}
as they happen (nothing is buffered in this process); after the config
exits or is killed, every JSON line already written to its .out file
is harvested into the main logfile — so a watchdog kill can only lose
metrics that were never measured.

Usage: python tools/run_sweep_r14.py [logfile] [key ...]
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (key, watchdog_s) — keys are bench_extra.py CLI keys
PLAN = [
    ("bigiid_scatter", 2400),    # q=1e4 via diag-first Schur engine
    ("two_smooths", 2700),       # s=3 steady number (VERDICT #3)
    ("lynx_fresh", 1800),        # fresh-process exe-cache path
    ("reps_packed64", 2400),     # BASELINE stretch config
    ("gauss2", 1500),
    ("cc", 1500),
    ("predict", 900),
    ("build", 600),              # host-only
    ("fitpredict", 1800),
    ("lynx", 1800),
    ("reps", 1500),
    ("reps_packed", 1800),
    ("mcmc", 2400),              # leapfrogs/s (VERDICT r4 #3)
    ("scattered_iid", 3600),     # dense-tail points are crash-prone: LAST
    # coxph LAST: its on-chip XLA compile ran past 1200+150 s twice
    # this round with the host CPU idle (server-side compile, stack in
    # backend_compile_and_load) — genuinely pathological, not a hang
    ("coxph", 3600),
]


def probe_ok(timeout=120):
    code = ("import jax, jax.numpy as jnp;"
            "print(float(jnp.arange(8.0).sum()))")
    try:
        p = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, timeout=timeout)
        return p.returncode == 0 and b"28.0" in p.stdout
    except subprocess.TimeoutExpired:
        return False


def run_one(key, watchdog, out):
    t0 = time.time()
    outpath = f"/tmp/sweep_r14_{key}.out"
    with open(outpath, "w") as cfg_out, \
         open(f"/tmp/sweep_r14_{key}.err", "w") as cfg_err:
        p = subprocess.Popen(
            [sys.executable, os.path.join(REPO, "bench_extra.py"), key],
            stdout=cfg_out, stderr=cfg_err, cwd=REPO)
        try:
            rc = p.wait(timeout=watchdog)
        except subprocess.TimeoutExpired:
            p.kill()
            p.wait()
            rc = "watchdog"
    n = 0
    with open(outpath) as f:
        for line in f:
            if line.startswith("{"):
                out.write(line)
                n += 1
    if rc == "watchdog":
        out.write(json.dumps({"metric": key, "value": -1, "unit": "s",
                              "error": f"watchdog {watchdog}s"}) + "\n")
    elif rc != 0 and n == 0:
        out.write(json.dumps({"metric": key, "value": -1, "unit": "s",
                              "error": f"subprocess rc={rc}"}) + "\n")
    elif rc != 0:
        # partial completion: some metrics landed, then the config
        # crashed — annotate so triage can tell it from a clean run
        out.write(json.dumps({"metric": key,
                              "note": f"rc={rc} after {n} metrics"}) + "\n")
    print(f"# {key}: rc={rc} metrics={n} in {time.time()-t0:.0f}s",
          flush=True)


def main():
    log = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sweep_r14.log"
    keys = sys.argv[2:] or [k for k, _ in PLAN]
    plan = [(k, w) for k, w in PLAN if k in keys]
    with open(log, "a", buffering=1) as out:
        for key, watchdog in plan:
            for attempt in range(6):
                if probe_ok():
                    break
                time.sleep(30 * (attempt + 1))
            else:
                out.write(json.dumps({"metric": key, "value": -1,
                                      "unit": "s",
                                      "error": "worker never recovered"})
                          + "\n")
                continue
            run_one(key, watchdog, out)


if __name__ == "__main__":
    main()
