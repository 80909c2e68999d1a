"""Per-op self-time breakdown of a jax.profiler xplane capture.

Companion to tools/profile_trace.py: that script captures the trace
(TensorBoard profile-plugin format); this one turns the 100+ MB
``*.xplane.pb`` into the table docs/PERF.md cites — per-op SELF time on the
device plane, interval-nesting corrected so the rows sum exactly to the
traced wall time (naively summing event durations double-counts nested
fusions ~2x).

The xplane protobuf schema ships inside this image's TensorFlow wheel
(tensorflow.tsl.profiler.protobuf.xplane_pb2); tensorboard-plugin-profile's
own converter is protobuf-version-broken here, so we parse directly.

Usage:
  python tools/analyze_trace.py logs/r4/profile [--steps 30] [--top 25]
  (positional arg: the --log-dir given to profile_trace.py, or a direct
   path to a .xplane.pb file)
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os.path as osp
import re
import sys


def load_xspace(path: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    if osp.isdir(path):
        pbs = sorted(glob.glob(osp.join(path, "**", "*.xplane.pb"),
                               recursive=True))
        if not pbs:
            sys.exit(f"no *.xplane.pb under {path}")
        path = pbs[-1]
    print(f"parsing {path}", file=sys.stderr)
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def self_times(plane, line_name: str = "XLA Ops"):
    """(self_time_ps, count) per op name, nesting-corrected.

    Events on the device op line can nest (a fusion parent spans its
    sub-ops); sorting by start and subtracting each event's duration from
    its innermost enclosing parent yields exclusive times that sum to the
    union of busy time.
    """
    emeta = plane.event_metadata
    lines = [l for l in plane.lines if l.name == line_name]
    if not lines:
        return {}, {}
    evs = sorted(
        (e.offset_ps, e.duration_ps, emeta[e.metadata_id].name)
        for line in lines for e in line.events
    )
    stack = []
    self_t = collections.Counter()
    cnt = collections.Counter()
    for s, d, name in evs:
        end = s + d
        while stack and stack[-1][0] <= s:
            stack.pop()
        if stack:
            self_t[stack[-1][1]] -= d
        self_t[name] += d
        cnt[name] += 1
        stack.append((end, name))
    return self_t, cnt


def family(name: str) -> str:
    """Group '%resblocks_7._fused_attention.32 = ...' -> 'resblocks._fused_attention'."""
    base = name.split(" = ")[0].lstrip("%")
    base = re.sub(r"resblocks_\d+\.", "resblocks.", base)
    base = re.sub(r"\.\d+$", "", base)
    return re.sub(r"\d+$", "", base)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path", help="profile log dir or .xplane.pb file")
    ap.add_argument("--steps", type=int, default=0,
                    help="train steps in the traced window (for ms/step; "
                         "default: number of events on the 'Steps' line x "
                         "the chunk size is unknown, so 1)")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--json", dest="json_out", default=None,
                    help="also write the full table to this JSON file")
    args = ap.parse_args()

    xs = load_xspace(args.path)
    dev = [p for p in xs.planes
           if "/device:" in p.name and any(l.events for l in p.lines)]
    if not dev:
        sys.exit("no device plane with events (CPU-only capture?)")
    plane = dev[0]
    print(f"device plane: {plane.name}", file=sys.stderr)

    self_t, cnt = self_times(plane)
    steps = args.steps or 1
    total = sum(self_t.values())
    print(f"total device busy: {total / 1e9:.1f} ms over {steps} steps "
          f"= {total / 1e9 / steps:.2f} ms/step")

    fams = collections.Counter()
    fcnt = collections.Counter()
    for name, t in self_t.items():
        fams[family(name)] += t
        fcnt[family(name)] += cnt[name]
    print(f"\n{'ms/step':>9}  {'pct':>5}  {'n/step':>7}  family")
    for f, t in fams.most_common(args.top):
        print(f"{t / 1e9 / steps:9.3f}  {t / total * 100:4.1f}%  "
              f"{fcnt[f] / steps:7.1f}  {f}")

    print(f"\ntop single ops:")
    for name, t in sorted(self_t.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"{t / 1e9 / steps:9.3f}  {name[:140]}")

    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(
                {
                    "device_plane": plane.name,
                    "steps": steps,
                    "total_ms": total / 1e9,
                    "families_ms": {k: v / 1e9 for k, v in fams.items()},
                    # top ops only — the full map is megabytes of HLO names
                    "ops_ms": {k[:160]: v / 1e9 for k, v in
                               sorted(self_t.items(),
                                      key=lambda kv: -kv[1])[:200]},
                },
                f, indent=1,
            )
        print(f"json -> {args.json_out}", file=sys.stderr)


if __name__ == "__main__":
    main()
