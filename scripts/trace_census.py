"""Re-aggregate a saved jax.profiler trace (vm.trace.json.gz) without
re-running the device step. Usage:
  python scripts/trace_census.py /tmp/grad_prof/plugins/profile/<ts> [steps]
Prints the same per-category / per-op census as probe_grad_profile."""
import collections
import glob
import gzip
import json
import re
import sys


def census(profile_dir, steps=10, top=40):
    path = glob.glob(f"{profile_dir}/*.trace.json.gz")[0]
    with gzip.open(path, "rt") as f:
        ev = json.load(f)["traceEvents"]
    tpu_pids = {e["pid"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    agg = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in tpu_pids:
            agg[e["name"]] += e.get("dur", 0)
    containers = {n for n in agg
                  if n.startswith(("jit_", "while", "body", "condition"))
                  or n.isdigit()}
    for n in containers:
        print(f"(container: {n} {agg[n]/steps/1e3:.3f} ms/step)")
        del agg[n]
    total = sum(agg.values())
    print(f"total device time {total/1e3:.2f} ms "
          f"({steps} steps => {total/steps/1e3:.2f} ms/step)")
    print("\n-- categories --")
    cats = collections.Counter()
    for name, d in agg.items():
        cats[re.sub(r"[.\d]+$", "", name)] += d
    for name, d in cats.most_common(20):
        print(f"{d/steps/1e3:8.3f} ms/step {100*d/total:5.1f}%  {name}")
    print("\n-- top ops --")
    for name, d in agg.most_common(top):
        print(f"{d/steps/1e3:8.3f} ms/step {100*d/total:5.1f}%  {name}")


if __name__ == "__main__":
    census(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 10)
