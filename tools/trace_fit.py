"""Device trace of the fused AGHQ fit; prints top ops by self time."""
import sys, time, glob, os, gzip, json, collections
import numpy as np
import jax
sys.path.insert(0, "/root/repo")
from bench import build_problem
from bayesgp_tpu.inference import aghq


def main():
    be = build_problem()
    t0 = time.time(); aghq.aghq_fit(be, k=4)
    print(f"first {time.time()-t0:.1f}s", flush=True)
    t0 = time.time(); aghq.aghq_fit(be, k=4)
    print(f"steady {time.time()-t0:.3f}s", flush=True)
    TR = "/tmp/jax_trace_fit"
    os.system(f"rm -rf {TR}")
    with jax.profiler.trace(TR):
        aghq.aghq_fit(be, k=4)
    f = glob.glob(f"{TR}/**/*.trace.json.gz", recursive=True)[0]
    with gzip.open(f) as fh:
        tr = json.load(fh)
    ev = tr["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    tids = {(e["pid"], e["tid"]): e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "thread_name"}
    dur = collections.Counter(); cnt = collections.Counter(); mod = 0
    for e in ev:
        if e.get("ph") == "X" and "dur" in e and "TPU" in pids.get(e["pid"], ""):
            lane = tids.get((e["pid"], e["tid"]), "")
            if lane == "XLA Modules":
                mod += e["dur"]
            if lane == "XLA Ops":
                dur[e["name"]] += e["dur"]; cnt[e["name"]] += 1
    print(f"device module total: {mod/1e3:.1f} ms", flush=True)
    for name, d in dur.most_common(25):
        print(f"{d/1e3:9.2f} ms x{cnt[name]:6d}  {name[:78]}", flush=True)


if __name__ == "__main__":
    main()
