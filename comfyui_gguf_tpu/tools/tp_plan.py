"""TP mesh-sizing planner: per-shard byte budgets for the real model
dims, WITHOUT loading anything (CLI around parallel.tp_spec.
i8_plan_report — the analytic mirror of the planar padding + int8
footprint math).

Answers the deployment question "what tp do I need?": for each arch (or
one given arch) and tp ∈ {1, 2, 4, 8}, prints the per-shard packed
bytes of the rule-covered block weights, planar and fully-int8, plus
whether they fit under a per-chip budget (default 14.4 GB — the packed-
weight budget the measured campaigns deploy under, BASELINE.md).

    python -m comfyui_gguf_tpu.tools.tp_plan
    python -m comfyui_gguf_tpu.tools.tp_plan --arch qwen_image --budget-gb 14.4
"""

from __future__ import annotations

import argparse
import json
import sys


def _specs():
    from ..models import testing as T
    from ..parallel import tp_spec

    def ent(shape_fn, dims, rules):
        # head count (when the dims object carries one) gates which tp
        # values are actually runnable: a byte plan at a head-indivisible
        # tp would print "fits" for an unusable mesh (HiDream-I1's 20
        # heads are the first non-pow2-friendly count)
        heads = getattr(dims, "n_heads", None) or getattr(dims, "heads",
                                                          None)
        return (shape_fn(dims)[1], rules, heads)

    return {
        "flux": ent(T.flux_shape_spec, T.FLUX_DEV_DIMS,
                    tp_spec.flux_rules(T.FLUX_DEV_DIMS.hidden)),
        "qwen_image": ent(T.qwen_image_shape_spec, T.QWEN_IMAGE_20B_DIMS,
                          tp_spec.qwen_image_rules()),
        "wan": ent(T.wan_shape_spec, T.WAN_14B_DIMS, tp_spec.wan_rules()),
        "hyvid": ent(T.hyvid_shape_spec, T.HYVID_13B_DIMS,
                     tp_spec.hyvid_rules(T.HYVID_13B_DIMS.hidden)),
        "aura": ent(T.aura_shape_spec, T.AURA_V03_DIMS,
                    tp_spec.aura_rules()),
        "lumina2": ent(T.lumina2_shape_spec, T.LUMINA2_DIMS,
                       tp_spec.lumina2_rules(T.LUMINA2_DIMS.dim)),
        "cosmos": ent(T.cosmos_shape_spec, T.COSMOS_7B_DIMS,
                      tp_spec.cosmos_rules()),
        "hidream": ent(T.hidream_shape_spec, T.HIDREAM_I1_DIMS,
                       tp_spec.hidream_rules(
                           T.HIDREAM_I1_DIMS.n_experts)),
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--arch", default=None)
    ap.add_argument("--budget-gb", type=float, default=14.4)
    ap.add_argument("--qtype", default="Q4_K")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args(argv)

    from ..gguf.constants import GGMLQuantizationType as Q
    from ..parallel import tp_spec

    qtype = getattr(Q, args.qtype)
    budget = args.budget_gb * 1e9
    specs = _specs()
    archs = [args.arch] if args.arch else sorted(specs)
    out = []
    for arch in archs:
        if arch not in specs:
            print(f"error: no TP spec for {arch!r}; have "
                  f"{sorted(specs)}", file=sys.stderr)
            return 2
        groups, rules, heads = specs[arch]
        for tp in (1, 2, 4, 8):
            if heads is not None and heads % tp:
                continue  # head-indivisible tp: mesh not runnable
            try:
                rep = tp_spec.i8_plan_report(groups, rules, tp=tp,
                                             qtype=qtype)
            except ValueError:
                continue  # heads/segments not divisible at this tp
            row = {"arch": arch, "tp": tp,
                   "planar_gb_per_shard":
                       round(rep["planar_per_shard"] / 1e9, 2),
                   "i8_gb_per_shard":
                       round(rep["i8_per_shard"] / 1e9, 2),
                   "fits_planar": rep["planar_per_shard"] < budget,
                   "fits_i8": rep["i8_per_shard"] < budget}
            out.append(row)
            if not args.json:
                print(f"{arch:12s} tp={tp}  planar "
                      f"{row['planar_gb_per_shard']:6.2f} GB/shard "
                      f"{'fits' if row['fits_planar'] else 'OVER'}   "
                      f"int8 {row['i8_gb_per_shard']:6.2f} GB/shard "
                      f"{'fits' if row['fits_i8'] else 'OVER'}"
                      f"   (budget {args.budget_gb} GB)")
    if args.json:
        print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
