"""Migrate a trained reference (PyTorch Brevitas) checkpoint to brevitas_tpu.

Reference users keep their QAT/PTQ training investment: point this CLI at a
``.pth``/``.tar`` checkpoint (the bnn_pynq trainer's ``{'state_dict': ...}``
envelope or a bare state_dict, ``bnn_pynq/trainer.py:190-198``) and the
matching architecture, and it writes a brevitas_tpu orbax checkpoint ready
for the eval/serving CLIs.

Example:
    python -m brevitas_tpu.examples.import_torch \
        --checkpoint cnv_1w1a.tar --arch cnv_1w1a --out ./cnv_ckpt
"""

import argparse
import json

from flax import nnx


def build_arch(name: str):
    from brevitas_tpu.models import cnv, lfc, sfc, tfc
    from brevitas_tpu.models.mobilenetv1 import quant_mobilenet_v1
    from brevitas_tpu.models.vgg import quant_vgg11 as vgg

    rngs = nnx.Rngs(0)
    fams = {"tfc": tfc, "sfc": sfc, "lfc": lfc}
    if "_" in name and name.split("_")[0] in fams:
        fam, wa = name.split("_", 1)
        wb, ab = int(wa[0]), int(wa[2])
        return fams[fam](weight_bit_width=wb, act_bit_width=ab,
                         in_bit_width=8, rngs=rngs)
    if name.startswith("cnv_"):
        wa = name.split("_", 1)[1]
        return cnv(weight_bit_width=int(wa[0]), act_bit_width=int(wa[2]),
                   in_bit_width=8, rngs=rngs)
    if name == "mobilenet_v1_4b":
        return quant_mobilenet_v1(bit_width=4, rngs=rngs)
    if name == "vgg":
        return vgg(rngs=rngs)
    raise SystemExit(f"unknown arch {name!r}")


def main(argv=None):
    p = argparse.ArgumentParser("brevitas_tpu torch checkpoint import")
    p.add_argument("--checkpoint", required=True,
                   help="reference .pth/.tar state-dict checkpoint")
    p.add_argument("--arch", required=True,
                   help="tfc_1w1a|sfc_1w2a|lfc_2w2a|cnv_1w1a|..."
                        "|mobilenet_v1_4b|vgg")
    p.add_argument("--out", required=True, help="orbax checkpoint dir")
    p.add_argument("--pairs", default=None,
                   help="JSON list of [our_path, torch_prefix] pins")
    p.add_argument("--lenient", action="store_true",
                   help="don't fail on unmatched torch layers")
    args = p.parse_args(argv)

    from brevitas_tpu import checkpoint as ckpt
    from brevitas_tpu.interop import (import_torch_state_dict,
                                      load_torch_checkpoint)

    model = build_arch(args.arch)
    sd = load_torch_checkpoint(args.checkpoint)
    pairs = json.loads(args.pairs) if args.pairs else None
    report = import_torch_state_dict(model, sd, pairs=pairs,
                                     strict=not args.lenient)
    ckpt.save(args.out, model)
    out = {"arch": args.arch, "loaded": len(report.loaded),
           "skipped": report.skipped,
           "unmatched_torch": report.unmatched_torch,
           "unmatched_ours": report.unmatched_ours, "out": args.out}
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
