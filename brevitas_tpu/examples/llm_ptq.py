"""LLM-style PTQ entry point for the quantized transformer.

The analogue of later Brevitas's ``brevitas_examples/llm`` (the reference
snapshot has no attention at all, SURVEY.md §2.4): train (or restore) a float
char-LM, then run the modern LLM PTQ stack —

  SmoothQuant (LayerNorm → linear migration)  →  act-scale calibration
  →  GPTQ  →  optional dynamic per-token act quant  →  integer serving

and report perplexity (bits per character) at each stage.

Run: python -m brevitas_tpu.examples.llm_ptq --train-steps 200 --gptq
"""

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

import brevitas_tpu.graph as G
from brevitas_tpu.examples.lm import _batches, _CORPUS
from brevitas_tpu.models.transformer import QuantTransformer
from brevitas_tpu.quant import presets
from brevitas_tpu.utils import eval_mode


def smoothquant_regions(model, sample_tokens=None):
    """SmoothQuant migration sites: discovered automatically from a traced
    forward when ``sample_tokens`` is given (`graph.autograph.extract_act_
    equalization_regions` — works for ANY architecture, and on the built-in
    transformer finds a strict superset of the hand-written list, incl. the
    final-norm→head region); otherwise falls back to the per-architecture
    hand lists."""
    if sample_tokens is not None:
        from brevitas_tpu.graph.autograph import (
            extract_act_equalization_regions,
        )

        return extract_act_equalization_regions(model, sample_tokens)
    from brevitas_tpu.models.llama import (
        QuantLlama,
        llama_smoothquant_regions,
    )
    from brevitas_tpu.models.transformer import transformer_smoothquant_regions

    if isinstance(model, QuantLlama):
        return llama_smoothquant_regions(model)
    return transformer_smoothquant_regions(model)


def bits_per_char(model, xs, ys) -> float:
    import optax

    total, n = 0.0, 0
    for x, y in zip(xs, ys):
        logits = model(x, causal=True)
        total += float(optax.softmax_cross_entropy_with_integer_labels(
            logits, y).sum())
        n += int(np.prod(y.shape))
    return total / n / np.log(2.0)


def _train_float(model, xs, ys, lr):
    import optax

    opt = nnx.Optimizer(model, optax.adam(lr), wrt=nnx.Param)

    @nnx.jit
    def step(model, opt, x, y):
        loss, grads = nnx.value_and_grad(
            lambda m: optax.softmax_cross_entropy_with_integer_labels(
                m(x, causal=True), y).mean())(model)
        opt.update(model, grads)
        return loss

    for x, y in zip(xs, ys):
        step(model, opt, x, y)


def use_dynamic_act_quant(model: nnx.Module, bit_width: int = 8) -> int:
    """Swap every QuantLinear input quantizer for dynamic per-token int8 —
    no calibration state, per-request scales (the LLM serving pattern).
    Returns the number of swapped quantizers."""
    from brevitas_tpu.nn.linear import QuantLinear
    from brevitas_tpu.quant.quantizers import ActQuantizer

    cfg = presets.Int8DynamicActPerTokenFloat.let(bit_width=float(bit_width))
    n = 0
    for _, mod in G.find_modules(model, QuantLinear):
        mod.input_quant = ActQuantizer(cfg)
        n += 1
    return n


def main(argv=None):
    p = argparse.ArgumentParser("brevitas_tpu LLM-style PTQ")
    p.add_argument("--arch", choices=("gpt", "llama"), default="gpt",
                   help="gpt = LayerNorm/GELU-style QuantTransformer; "
                        "llama = RMSNorm + RoPE + SwiGLU QuantLlama")
    p.add_argument("--train-steps", type=int, default=300)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--seq-len", type=int, default=64)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--depth", type=int, default=2)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--bit-width", type=int, default=8)
    p.add_argument("--calib-batches", type=int, default=4)
    p.add_argument("--no-smoothquant", action="store_true")
    p.add_argument("--smoothquant-alpha", type=float, default=0.5)
    p.add_argument("--awq", action="store_true",
                   help="AWQ per-region alpha search instead of fixed-alpha "
                        "SmoothQuant (implies --no-smoothquant)")
    p.add_argument("--gptq", action="store_true")
    p.add_argument("--gpfq", action="store_true",
                   help="GPFQ greedy path-following weight quantization "
                        "(alternative to --gptq)")
    p.add_argument("--dynamic-act", action="store_true",
                   help="per-token dynamic act quant instead of calibrated "
                        "static scales")
    p.add_argument("--rotate", action="store_true",
                   help="QuaRot-style per-head Hadamard rotation on each "
                        "block's v_proj→out_proj before calibration")
    p.add_argument("--mx", action="store_true",
                   help="OCP-MX groupwise weights (po2 block scales) instead "
                        "of per-channel; GPTQ does not apply to MX weights")
    p.add_argument("--weight-group", type=int, default=32,
                   help="MX block size along the reduction dim")
    p.add_argument("--convert-int", action="store_true",
                   help="finish with integer-serving conversion")
    p.add_argument("--kv-bits", type=int, default=0,
                   help="quantize attention activations: q/probs at 8 bits, "
                        "K/V at this width (<=4 auto-packs the decode KV "
                        "cache two positions per byte under --convert-int); "
                        "0 leaves attention unquantized")
    p.add_argument("--text-file", type=str, default=None)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    if args.gptq and args.gpfq:
        p.error("--gptq and --gpfq are alternatives; pick one")

    text = _CORPUS
    if args.text_file:
        with open(args.text_file) as f:
            text = f.read()
    xs, ys, vocab = _batches(text, args.seq_len, args.batch,
                             args.train_steps + args.calib_batches + 2,
                             args.seed)
    train_x, train_y = xs[:args.train_steps], ys[:args.train_steps]
    calib = list(xs[args.train_steps:args.train_steps + args.calib_batches])
    test_x = xs[args.train_steps + args.calib_batches:]
    test_y = ys[args.train_steps + args.calib_batches:]

    # float model: the quant architecture with quantization disabled
    float_kw = dict(vocab_size=vocab, dim=args.dim, depth=args.depth,
                    num_heads=args.heads,
                    weight_quant=presets.NoneWeightQuant,
                    act_quant=presets.NoneActQuant,
                    uact_quant=presets.NoneActQuant,
                    rngs=nnx.Rngs(args.seed))
    if args.arch == "llama":
        from brevitas_tpu.models.llama import QuantLlama

        model = QuantLlama(**float_kw)
    else:
        model = QuantTransformer(max_len=args.seq_len, **float_kw)
    _train_float(model, train_x, train_y, args.lr)
    eval_mode(model)
    bpc_float = bits_per_char(model, test_x, test_y)

    # quantize: swap every Linear input/weight quantizer in place
    if args.mx:
        wq = presets.MXInt8Weight.let(bit_width=float(args.bit_width),
                                      scaling_per_group=args.weight_group)
    else:
        wq = presets.Int8WeightPerChannelFloat.let(
            bit_width=float(args.bit_width))
    aq = presets.Int8ActPerTensorFloat.let(
        bit_width=float(args.bit_width),
        collect_stats_steps=max(args.calib_batches, 1))
    from brevitas_tpu.nn.linear import QuantLinear
    from brevitas_tpu.quant.quantizers import ActQuantizer, ParameterQuantizer

    for _, mod in G.find_modules(model, QuantLinear):
        mod.weight_quant = ParameterQuantizer(wq, mod.weight[...],
                                              channel_axis=1)
        mod.input_quant = ActQuantizer(aq.let())

    if args.kv_bits:
        # quantize the attention core too: q and softmax probs at 8 bits,
        # K/V at --kv-bits (<=4 makes the serving twin pack the decode
        # cache two positions per byte — see PERF.md int4 KV section)
        from brevitas_tpu.nn.attention import QuantMultiheadAttention

        kvq = aq.let(bit_width=float(args.kv_bits))
        uq = presets.Uint8ActPerTensorFloat.let(
            collect_stats_steps=max(args.calib_batches, 1))
        for _, mha in G.find_modules(model, QuantMultiheadAttention):
            mha.q_quant = ActQuantizer(aq.let())
            mha.k_quant = ActQuantizer(kvq.let())
            mha.v_quant = ActQuantizer(kvq.let())
            mha.probs_quant = ActQuantizer(uq.let())

    forward = lambda m, b: m(b, causal=True)  # noqa: E731

    if args.rotate:
        pairs, head_dim = G.transformer_rotation_pairs(model)
        G.apply_rotation(model, pairs, block_size=head_dim)
    # migration regions from the traced graph (auto for any architecture)
    regions = smoothquant_regions(model, sample_tokens=calib[0][:1])
    if args.awq:
        G.apply_awq(model, regions, calib, forward_fn=forward)
    elif not args.no_smoothquant:
        G.apply_act_equalization(model, regions, calib,
                                 alpha=args.smoothquant_alpha,
                                 forward_fn=forward)
    if args.dynamic_act:
        use_dynamic_act_quant(model, args.bit_width)
    else:
        with G.calibration_mode(model):
            for b in calib:
                forward(model, b)
    if args.gptq:
        G.apply_gptq(model, calib, forward_fn=forward)
    if args.gpfq:
        G.apply_gpfq(model, calib, forward_fn=forward)
    eval_mode(model)
    bpc_quant = bits_per_char(model, test_x, test_y)

    served = False
    if args.convert_int:
        G.convert_integer_inference(model)
        served = True
    bpc_served = bits_per_char(model, test_x, test_y) if served else None

    result = {"arch": args.arch,
              "float_bpc": bpc_float, "quant_bpc": bpc_quant,
              "served_bpc": bpc_served, "bit_width": args.bit_width,
              "smoothquant": not args.no_smoothquant and not args.awq,
              "awq": args.awq, "gptq": args.gptq,
              "gpfq": args.gpfq,
              "dynamic_act": args.dynamic_act, "mx": args.mx, "rotate": args.rotate,
              "kv_bits": args.kv_bits, "vocab": vocab}
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
