"""Summarize an xprof trace's device-op time.

Parses the vm.trace.json.gz Chrome-trace export inside a jax.profiler
trace directory and aggregates 'XLA Ops' thread durations by op-name
bucket. Used with scripts/profile_step.py's --trace output to decide
what to optimize (e.g. the round-2 finding that ~20% of the quirk-mode
step is the RPN-loss IoU matrix).

  python scripts/trace_summary.py outputs/xprof [--steps 3] [--top 25]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("trace_dir")
    parser.add_argument("--steps", type=int, default=3,
                        help="steps captured inside the trace context")
    parser.add_argument("--top", type=int, default=25)
    args = parser.parse_args()

    paths = sorted(glob.glob(os.path.join(
        args.trace_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {args.trace_dir}")
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)

    names = {}
    for e in tr["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            names[(e["pid"], e["tid"])] = e["args"]["name"]
    ops = [e for e in tr["traceEvents"] if e.get("ph") == "X"
           and names.get((e["pid"], e["tid"])) == "XLA Ops"]
    total = sum(e["dur"] for e in ops)
    n = args.steps
    print(f"{paths[-1]}")
    print(f"XLA Ops total: {total / 1e3:.2f} ms "
          f"({total / n / 1e3:.2f} ms/step over {n} steps)\n")

    by_kind = collections.Counter()
    by_name = collections.Counter()
    by_source = collections.Counter()
    by_tfop = collections.Counter()
    name_meta = {}
    for e in ops:
        by_name[e["name"]] += e["dur"]
        by_kind[re.sub(r"[.\d]+$", "", e["name"].split(".")[0])] += e["dur"]
        a = e.get("args", {})
        by_source[a.get("source", "?")] += e["dur"]
        # Last meaningful component of the jax op path, e.g.
        # "jit(step)/.../vmap()/gather:" -> the hlo-level jax op.
        tf = a.get("tf_op", "").rstrip(":").split("/")
        by_tfop["/".join(tf[-2:])] += e["dur"]
        name_meta.setdefault(e["name"], (a.get("source", "?"),
                                         a.get("tf_op", "")[-70:]))

    print("== by op kind ==")
    for k, v in by_kind.most_common(args.top):
        print(f"{v / n / 1e3:8.3f} ms/step  {100 * v / total:5.1f}%  {k}")
    print("\n== by source line ==")
    for k, v in by_source.most_common(args.top):
        print(f"{v / n / 1e3:8.3f} ms/step  {100 * v / total:5.1f}%  {k}")
    print("\n== by jax op ==")
    for k, v in by_tfop.most_common(args.top):
        print(f"{v / n / 1e3:8.3f} ms/step  {100 * v / total:5.1f}%  {k[:80]}")
    print("\n== top individual ops ==")
    for k, v in by_name.most_common(args.top):
        src, tf = name_meta.get(k, ("?", ""))
        print(f"{v / n / 1e3:8.3f} ms/step  {100 * v / total:5.1f}%  "
              f"{k[:40]:40s} {src.replace('/root/repo/', '')}")


if __name__ == "__main__":
    main()
