"""Summarize an xplane trace: per-HLO-op device time, grouped by module.

Usage: python scripts/analyze_profile.py <xplane.pb> [top_n]

Parses the raw XSpace proto (tensorboard_plugin_profile's converter is
incompatible with the installed TF), attributes every "XLA Ops" event to
the enclosing "XLA Modules" event, and prints per-module totals plus the
top ops by summed device time with their HLO category.
"""

import sys
from collections import defaultdict


def main():
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    tpu = next(p for p in xs.planes if "TPU" in p.name)
    emeta = tpu.event_metadata
    smeta = tpu.stat_metadata
    lines = {ln.name: ln for ln in tpu.lines}

    # module windows: (start, end, name)
    modules = []
    for ev in lines["XLA Modules"].events:
        modules.append((ev.offset_ps, ev.offset_ps + ev.duration_ps,
                        emeta[ev.metadata_id].name))
    modules.sort()

    def module_of(t):
        for s, e, name in modules:
            if s <= t < e:
                return name.split("(")[0]
        return "<none>"

    per_mod = defaultdict(float)
    per_op = defaultdict(float)
    per_op_cnt = defaultdict(int)
    op_cat = {}
    for ev in lines["XLA Ops"].events:
        md = emeta[ev.metadata_id]
        name = md.name
        dur = ev.duration_ps / 1e9  # ps -> ms
        mod = module_of(ev.offset_ps)
        per_mod[mod] += dur
        key = (mod, name)
        per_op[key] += dur
        per_op_cnt[key] += 1
        for st in md.stats:
            if smeta[st.metadata_id].name == "hlo_category":
                op_cat[key] = st.str_value or st.ref_value

    print("== module totals (device ms over whole trace) ==")
    for mod, ms in sorted(per_mod.items(), key=lambda kv: -kv[1]):
        print(f"{ms:10.3f} ms  {mod}")

    print(f"\n== top {top_n} ops ==")
    rows = sorted(per_op.items(), key=lambda kv: -kv[1])[:top_n]
    for (mod, name), ms in rows:
        cat = op_cat.get((mod, name), "?")
        print(f"{ms:9.3f} ms x{per_op_cnt[(mod, name)]:<4d} "
              f"[{cat:<22s}] {mod.split('_')[0][:10]:10s} {name[:90]}")

    # category rollup per module
    print("\n== category rollup ==")
    cat_mod = defaultdict(float)
    for key, ms in per_op.items():
        cat_mod[(key[0], op_cat.get(key, "?"))] += ms
    for (mod, cat), ms in sorted(cat_mod.items(), key=lambda kv: -kv[1]):
        print(f"{ms:10.3f} ms  {mod[:28]:28s} {cat}")


if __name__ == "__main__":
    main()
