"""Attribute multichip harmonization padding per canonical key (CPU mesh).

Builds the dryrun's power-law input, packs per-chip plans exactly like
MultiChipSpMV._build_pallas (global relabel, strip partition, pinned
classes), then prints per-(P, stride, w8, ordinal) slice counts across
chips and per-class long tails — the elementwise-max union pads each chip
to the row maxima, so spread within a row IS the padding.
"""
import dataclasses
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from dasp_tpu.config import DEFAULT_CONFIG
from dasp_tpu.relabel import apply_sym_perm, choose_relabel
from dasp_tpu.sparse import powerlaw_like
from dasp_tpu.parallel import partition_strips, strips_csr
from dasp_tpu.wplan import (LANES, SUB, VREG, build_wplan, merge_class_keys)

n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
rng = np.random.default_rng(11)
csr = powerlaw_like(max(100_000, 13_000 * n), 1.8,
                    max(500_000, 65_000 * n), rng, col_alpha=1.6)

config = DEFAULT_CONFIG
perm = choose_relabel(csr, config.relabel_hub_deg, symmetric=True)
if perm is not None:
    csr = apply_sym_perm(csr, perm)
config = dataclasses.replace(config, relabel="off", row_sort="off")
strips, slab_nnz = partition_strips(csr, n, LANES)
chip_csrs = [strips_csr(csr, s) for s in strips]
plans = [build_wplan(c, config) for c in chip_csrs]
union = {}
for p in plans:
    for cls, stride, mass in p.stats["key_mass"]:
        union[(cls, stride)] = union.get((cls, stride), 0) + mass
gmap = merge_class_keys(union,
                        s_rows=(-(-max(csr.n_cols, 1) // VREG)) * SUB)
for d, p in enumerate(plans):
    own = {tuple(k): tuple(v) for k, v in p.stats["class_map"]}
    if any(gmap.get(k, k) != own[k] for k in own):
        plans[d] = build_wplan(chip_csrs[d], config, pin_classes=gmap)

# --- per-group attribution (mirrors the rank-matched harmonization) -----
def group_slices(plan):
    groups = {}
    for seg in plan.sell:
        s = plan.streams[seg.stream]
        g = groups.setdefault((s.P, s.stride, seg.stride), [])
        for k in range(seg.n_slices):
            g.append(seg.w8)
    for g in groups.values():
        g.sort(reverse=True)
    return groups

per_plan_groups = [group_slices(p) for p in plans]
all_keys = sorted({(s.P, s.stride) for p in plans for s in p.streams})
group_keys = sorted({gk for gs in per_plan_groups for gk in gs})
tails = {k: [0] * n for k in all_keys}
for d, p in enumerate(plans):
    for si, s in enumerate(p.streams):
        sell_v = sum(seg.n_slices * seg.w8 for seg in p.sell
                     if seg.stream == si)
        tails[(s.P, s.stride)][d] = s.n_vregs - sell_v

pad_total = real_total = 0
items = []
for gk in group_keys:
    n_max = max(len(gs.get(gk, ())) for gs in per_plan_groups)
    widths = [0] * n_max
    for gs in per_plan_groups:
        for r, w8 in enumerate(gs.get(gk, ())):
            widths[r] = max(widths[r], w8)
    canon = sum(widths)
    reals = [sum(gs.get(gk, ())) for gs in per_plan_groups]
    pad = canon * n - sum(reals)
    items.append((pad, gk, reals, sum(reals), widths))
    pad_total += pad
    real_total += sum(reals)
for key, per in tails.items():
    pad = max(per) * n - sum(per)
    items.append((pad, key + ("tail",), per, sum(per), None))
    pad_total += pad
    real_total += sum(per)
items.sort(key=lambda t: -t[0])
print(f"{'group (P,stride,segstride)':28s} {'minv':>6s} {'maxv':>6s} "
      f"{'pad_vregs':>10s}")
for pad, key, per, real, widths in items[:20]:
    w = ("" if widths is None else
         " ladder=" + ",".join(map(str, widths[:12]))
         + ("..." if len(widths) > 12 else ""))
    print(f"{str(key):28s} {min(per):6d} {max(per):6d} {pad:10d}  "
          f"(real {real}){w}")
print(f"\ntotal pad {pad_total} real {real_total} "
      f"ratio {(pad_total + real_total) / max(real_total, 1):.3f}")

# --- per-chip segment dump (origin diagnosis) ---------------------------
import collections
if "--segs" in sys.argv:
    for d, p in enumerate(plans[:3]):
        print(f"\n-- chip {d} segments (stream P/stride | w8 seg_stride "
              f"n_slices out_row) --")
        for seg in p.sell:
            s = p.streams[seg.stream]
            print(f"  P={s.P:3d} s={s.stride} | w8={seg.w8:3d} "
                  f"ss={seg.stride} n={seg.n_slices:4d} out={seg.out_row}")
