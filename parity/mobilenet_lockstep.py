"""MobileNetV1 lockstep-divergence experiment (round-3 verdict #2).

The composite 4W4A head-to-head loses ~4 points while every per-op
elimination (weight quantizer, per-channel QuantReLU grads, conv numerics,
BN, import) checked out equivalent. This harness finds the FIRST divergent
quantity: import the UNTRAINED reference checkpoint into the twin (same
init), train BOTH frameworks in lockstep on the same batch order / loss /
optimizer, and log per-step losses plus per-layer weight / act-scale
trajectory deltas.

Run: python -m parity.mobilenet_lockstep [--steps N] [--log-every K]
"""

import argparse
import json

import jax
import numpy as np

jax.config.update("jax_default_matmul_precision", "highest")

from parity.run_parity import (  # noqa: E402
    MOBILENET_WIDTH,
    build_reference_mobilenet,
    build_tpu_mobilenet,
    digits_dataset,
    epoch_batches,
)


def named_ref_weights(model):
    import torch

    return {k: v.detach().cpu().numpy().copy()
            for k, v in model.state_dict().items()
            if k.endswith(".weight") and v.ndim >= 2}


def named_tpu_weights(model):
    from brevitas_tpu.graph.base import named_modules

    out = {}
    for path, mod in named_modules(model):
        w = getattr(mod, "weight", None)
        if w is not None and hasattr(w, "shape") and len(w.shape) >= 2:
            out[path] = np.asarray(w[...])
    return out


def tpu_act_scales(model):
    """Current scale value of every activation quantizer (path → scalar).

    MobileNetV1 act quantizers are learned-parameter scaled (log domain),
    so ``static_int_params()`` yields the same quantity the reference's
    ``proxy.scale()`` reports."""
    from brevitas_tpu.graph.base import named_modules
    from brevitas_tpu.quant.quantizers import ActQuantizer

    out = {}
    for path, mod in named_modules(model):
        if isinstance(mod, ActQuantizer):
            try:
                got = mod.static_int_params()
                if isinstance(got, tuple):
                    out[path] = float(np.ravel(np.asarray(got[0]))[0])
            except Exception:
                pass
    return out


def ref_act_scales(model):
    import torch

    out = {}
    for name, mod in model.named_modules():
        if type(mod).__name__ == "ActQuantProxyFromInjector" and \
                mod.is_quant_enabled:
            try:
                with torch.no_grad():
                    out[name] = float(mod.scale().reshape(-1)[0])
            except Exception:
                pass
    return out


def _match_weight_keys(ref_w, tpu_w):
    """Pair reference weight keys with twin paths via shape multiset order
    (both walks enumerate the same topology in construction order)."""
    pairs = []
    tpu_items = list(tpu_w.items())
    used = set()
    for rk, rv in ref_w.items():
        want_n = rv.size
        for i, (tk, tv) in enumerate(tpu_items):
            if i in used or tv.size != want_n:
                continue
            pairs.append((rk, tk))
            used.add(i)
            break
    return pairs


def _grad_check(ref, tpu, x_train, y_train, args):
    """Per-parameter gradient comparison at IDENTICAL weights, one batch.

    A training-semantics defect shows as a large RELATIVE mismatch in one
    layer kind; pure float noise stays tiny and uniform."""
    import torch

    import jax.numpy as jnp
    import optax
    from flax import nnx

    from brevitas_tpu.graph.base import named_modules
    from brevitas_tpu.utils import train_mode

    sel = np.arange(args.batch_size)
    xb, yb = x_train[sel], y_train[sel]

    ref.train()
    crit = torch.nn.CrossEntropyLoss()
    loss_r = crit(ref(torch.from_numpy(
        np.transpose(xb, (0, 3, 1, 2))).contiguous()),
        torch.from_numpy(yb.astype(np.int64)))
    loss_r.backward()
    ref_grads = {k: p.grad.detach().numpy().copy()
                 for k, p in ref.named_parameters()
                 if p.grad is not None and k.endswith(".weight")
                 and p.ndim >= 2}

    train_mode(tpu)

    xj, yj = jnp.asarray(xb), jnp.asarray(yb)

    @nnx.jit
    def gradfn(m, x, y):
        def loss_fn(mm):
            return optax.softmax_cross_entropy_with_integer_labels(
                mm(x), y).mean()

        return nnx.value_and_grad(loss_fn)(m)

    loss_t, grads = gradfn(tpu, xj, yj)
    # collect our conv/linear weight grads by module path
    tpu_grads = {}
    flat = nnx.to_flat_state(grads)
    for path_tuple, leaf in flat:
        path = "/".join(str(p) for p in path_tuple)
        if path.endswith("/weight") and getattr(
                leaf, "ndim", 0) >= 2:
            tpu_grads[path] = np.asarray(leaf)

    print(json.dumps({"event": "grad_losses",
                      "loss_ref": float(loss_r.item()),
                      "loss_tpu": float(loss_t)}), flush=True)

    pairs = _match_weight_keys(ref_grads, tpu_grads)
    rows = []
    for rk, tk in pairs:
        a, b = ref_grads[rk], tpu_grads[tk]
        if a.shape != b.shape:
            b = np.transpose(b, (3, 2, 0, 1)) if b.ndim == 4 else b.T
        if a.shape != b.shape:
            continue
        denom = np.abs(a).max() + 1e-12
        rel_l2 = float(np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-12))
        cos = float((a * b).sum() /
                    (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
        rows.append((rk, float(np.abs(a - b).max() / denom), rel_l2, cos,
                     float(np.abs(a).max())))
    rows.sort(key=lambda r: -r[2])
    for rk, relmax, rel_l2, cos, mag in rows[:12]:
        print(json.dumps({"event": "grad_dev", "layer": rk,
                          "relmaxdiff": round(relmax, 6),
                          "rel_l2": round(rel_l2, 6),
                          "cosine": round(cos, 6),
                          "ref_grad_absmax": round(mag, 8)}), flush=True)
    if rows:
        print(json.dumps({
            "event": "grad_summary", "n": len(rows),
            "median_relmaxdiff": float(np.median([r[1] for r in rows])),
            "median_rel_l2": float(np.median([r[2] for r in rows])),
            "min_cosine": float(min(r[3] for r in rows))}), flush=True)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=120)
    p.add_argument("--log-every", type=int, default=5)
    p.add_argument("--bit-width", type=int, default=4)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--lr", type=float, default=0.002)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--fast", action="store_true",
                   help="skip per-layer trajectory probes (loss trace only)")
    p.add_argument("--eval-at-end", action="store_true",
                   help="report both frameworks' test top-1 after training")
    p.add_argument("--grad-check", action="store_true",
                   help="compare per-layer gradients at identical weights "
                        "on one batch, then exit")
    args = p.parse_args(argv)

    import torch

    import jax.numpy as jnp
    import optax
    from flax import nnx

    from brevitas_tpu.interop.torch_import import import_torch_state_dict
    from brevitas_tpu.utils import train_mode

    x_train, y_train, _, _ = digits_dataset("cnv")

    ref = build_reference_mobilenet(args.bit_width, args.seed)
    tpu = build_tpu_mobilenet(args.bit_width, seed=0)

    # ---- identical init: import the untrained reference checkpoint -------
    sd = {k: v.detach().cpu().numpy() for k, v in ref.state_dict().items()}
    import_torch_state_dict(tpu, sd)

    # init-parity check (eval logits on one batch)
    from brevitas_tpu.utils import eval_mode
    xb = x_train[:32]
    ref.eval()
    with torch.no_grad():
        l_ref = ref(torch.from_numpy(
            np.transpose(xb, (0, 3, 1, 2))).contiguous()).numpy()
    eval_mode(tpu)
    l_tpu = np.asarray(tpu(jnp.asarray(xb)))
    init_maxdiff = float(np.abs(l_ref - l_tpu).max())
    print(json.dumps({"event": "init_parity",
                      "logit_maxdiff": init_maxdiff}), flush=True)

    if args.grad_check:
        _grad_check(ref, tpu, x_train, y_train, args)
        return

    # ---- lockstep training ----------------------------------------------
    ref.train()
    train_mode(tpu)
    ref_opt = torch.optim.Adam(ref.parameters(), lr=args.lr)
    crit = torch.nn.CrossEntropyLoss()
    tpu_opt = nnx.Optimizer(tpu, optax.adam(args.lr), wrt=nnx.Param)

    @nnx.jit
    def tpu_step(model, opt, x, y):
        def loss_fn(m):
            return optax.softmax_cross_entropy_with_integer_labels(
                m(x), y).mean()

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        opt.update(model, grads)
        return loss

    batches = []
    ep = 0
    while len(batches) < args.steps:
        batches.extend(epoch_batches(len(x_train), args.batch_size, seed=ep))
        ep += 1
    batches = batches[:args.steps]

    key_pairs = _match_weight_keys(named_ref_weights(ref),
                                   named_tpu_weights(tpu))
    print(json.dumps({"event": "matched_weights",
                      "n": len(key_pairs)}), flush=True)

    xt = torch.from_numpy(np.transpose(x_train, (0, 3, 1, 2))).contiguous()
    yt = torch.from_numpy(y_train.astype(np.int64))

    for step, sel in enumerate(batches):
        sel = np.asarray(sel)
        loss_r = crit(ref(xt[sel]), yt[sel])
        ref_opt.zero_grad()
        loss_r.backward()
        ref_opt.step()
        loss_t = tpu_step(tpu, tpu_opt, jnp.asarray(x_train[sel]),
                          jnp.asarray(y_train[sel]))
        rec = {"event": "step", "step": step,
               "loss_ref": round(float(loss_r.item()), 6),
               "loss_tpu": round(float(loss_t), 6),
               "loss_delta": round(float(loss_t) - float(loss_r.item()), 6)}
        if (step % args.log_every == 0 or step == args.steps - 1) \
                and not args.fast:
            rw, tw = named_ref_weights(ref), named_tpu_weights(tpu)
            diffs = {}
            for rk, tk in key_pairs:
                a, b = rw[rk], tw[tk]
                if a.shape != b.shape:
                    b = np.transpose(b, (3, 2, 0, 1)) if b.ndim == 4 else b.T
                if a.shape == b.shape:
                    diffs[rk] = float(np.abs(a - b).max())
            worst = sorted(diffs.items(), key=lambda kv: -kv[1])[:3]
            rec["worst_weight_dev"] = [(k, round(v, 6)) for k, v in worst]
            rs, ts = ref_act_scales(ref), tpu_act_scales(tpu)
            rec["n_act_scales"] = [len(rs), len(ts)]
            rvals = sorted(rs.values())
            tvals = sorted(ts.values())
            if len(rvals) == len(tvals) and rvals:
                sd_pairs = [abs(a - b) / (abs(a) + 1e-9)
                            for a, b in zip(rvals, tvals)]
                rec["act_scale_relmax"] = round(max(sd_pairs), 6)
        print(json.dumps(rec), flush=True)

    if args.eval_at_end:
        _, _, x_test, y_test = digits_dataset("cnv")
        ref.eval()
        with torch.no_grad():
            xe = torch.from_numpy(
                np.transpose(x_test, (0, 3, 1, 2))).contiguous()
            preds = []
            for i in range(0, len(xe), 256):
                preds.append(ref(xe[i:i + 256]).argmax(-1).numpy())
            acc_ref = float((np.concatenate(preds) == y_test).mean())
        eval_mode(tpu)

        @nnx.jit
        def infer(model, x):
            return jnp.argmax(model(x), -1)

        preds = []
        for i in range(0, len(x_test), 256):
            preds.append(np.asarray(
                infer(tpu, jnp.asarray(x_test[i:i + 256]))))
        acc_tpu = float((np.concatenate(preds) == y_test).mean())
        print(json.dumps({"event": "final_eval",
                          "ref_top1": round(acc_ref, 4),
                          "tpu_top1": round(acc_tpu, 4),
                          "delta_points": round(
                              100 * (acc_tpu - acc_ref), 2)}), flush=True)


if __name__ == "__main__":
    main()
